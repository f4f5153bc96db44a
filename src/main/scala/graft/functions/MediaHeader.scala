package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header sniffing for opaque media payloads — the honest part
  * of "image decode" that needs no codec library: magic bytes identify the
  * format, and the header encodes the pixel dimensions.
  *
  * Formats (all per their public specifications):
  *  - PNG:  8-byte signature, IHDR chunk → width/height as big-endian u32
  *    at offsets 16/20;
  *  - JPEG: FFD8 SOI, then marker segments; the SOFn segment (C0–CF minus
  *    C4/C8/CC) carries height/width as big-endian u16 at payload offsets
  *    3/5;
  *  - BMP:  "BM", width/height as little-endian i32 at offsets 18/22
  *    (negative height = top-down rows → absolute value);
  *  - GIF:  "GIF87a"/"GIF89a", width/height as little-endian u16 at 6/8.
  *
  * Anything else (including truncated headers) is `("unknown", null,
  * null)` — never an exception: corrupt bytes are data, not errors, in a
  * 100 TB scan.
  */
object MediaHeaderKernel {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xFF) << 24) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)

  private def row(fmt: String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private val Unknown = row("unknown", null, null)

  /** `(format, width, height)` from a payload's container header. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    // PNG: 89 'P' 'N' 'G' 0D 0A 1A 0A, then len+「IHDR」+dims
    if (n >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A &&
        (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // JPEG: FF D8 then marker segments until SOFn
    if (n >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
        (b(2) & 0xFF) == 0xFF) {
      var i = 2
      while (i + 3 < n) {
        if ((b(i) & 0xFF) != 0xFF) return Unknown
        val marker = b(i + 1) & 0xFF
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2 // standalone
        else {
          val len = be16(b, i + 2)
          if (len < 2) return Unknown
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            // SOF payload: [len][precision][height u16][width u16]…
            if (i + 8 < n) return row("jpeg", be16(b, i + 7), be16(b, i + 5))
            return Unknown
          }
          i += 2 + len
        }
      }
      return Unknown
    }
    // BMP: 'B' 'M', dims in the BITMAPINFOHEADER
    if (n >= 26 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // GIF: "GIF87a" | "GIF89a"
    if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    Unknown
  }
}

/** `media_header(binary) -> struct<format string, width int, height int>`. */
case class MediaHeader(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expects binary, got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_header"
  override protected def nullSafeEval(input: Any): Any =
    MediaHeaderKernel.parse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHeaderKernel.parse($c)")
  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}
