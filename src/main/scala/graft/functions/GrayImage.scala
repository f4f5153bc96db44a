package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grayscale image kernels for the multimodal pipeline: decode (behind a
  * pluggable codec seam), nearest-neighbor resize, and ViT-style patch
  * statistics — all per-row codegen'd projections, so the stages scale
  * with scan throughput and shuffle nothing.
  *
  * The DECODER is the documented codec boundary ([[GrayDecoder]]): this
  * environment ships no image codec, so the default [[TileDecoder]]
  * derives pixels deterministically from the payload bytes
  * (`pixel(i) = content[i mod len]`) — pure byte arithmetic, which is
  * exactly what makes the whole decode→resize→patchify chain
  * REPLICABLE IN SQL and therefore hash-checkable cross-engine
  * (`mm_patch_grid`). A real binding (ImageIO, JNI libjpeg) implements
  * the same one-method trait and drops in without touching the plan
  * shape: per-row, fully parallel.
  */
trait GrayDecoder extends Serializable {
  /** Decode `content` into `width·height` row-major gray pixels (1 B each). */
  def decode(content: Array[Byte], width: Int, height: Int): Array[Byte]
}

/** Deterministic stand-in codec: tiles the payload bytes across the
  * pixel grid. Empty payloads decode to black.
  */
object TileDecoder extends GrayDecoder {
  override def decode(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    // declared-dim overflow degrade (never-throw): width·height past
    // Int.MaxValue would overflow the allocation size negative
    if (width <= 0 || height <= 0 ||
      width.toLong * height > Int.MaxValue) return Array.emptyByteArray
    if (content.isEmpty) new Array[Byte](width * height)
    else Array.tabulate(width * height)(i => content(i % content.length))
  }
}

/** REAL pixel codec over the JDK's `javax.imageio` (public API shipped
  * with every JRE — no new dependency): PNG, BMP, GIF (first frame) and
  * JPEG, i.e. whatever the JRE's reader registry resolves. Closes the
  * multimodal surface's one documented codec boundary.
  *
  * Contract (all integer arithmetic — bit-deterministic across JVMs):
  *  - the payload decodes at its INTRINSIC size; gray-encoded containers
  *    (single-band, non-palette) read their raster samples EXACTLY
  *    (rescaled `(s·255 + max/2)/max` for >8-bit depths) — not through
  *    `getRGB`, whose linear-gray→sRGB conversion gamma-shifts stored
  *    values; color pixels luma by integer BT.601,
  *    `(299·r + 587·g + 114·b + 500) / 1000`; alpha is ignored;
  *  - when intrinsic dims differ from the DECLARED `width`×`height`, the
  *    luma plane nearest-neighbor-resamples with [[GrayResize]]'s exact
  *    convention — `out(x,y) = in((y·ih)/height, (x·iw)/width)` — NOT
  *    Java2D's interpolating `drawImage`, whose output is
  *    implementation-defined;
  *  - corrupt or undecodable payloads (and non-positive dims) yield BLACK
  *    (all-zero) pixels and NEVER throw — the [[MediaHeader]] `unknown`
  *    degrade convention: one bad producer must not fail a batch. Callers
  *    that need to quarantine such rows route on
  *    `media_header(content).format = 'unknown'` to dead-letter first.
  *
  * Thread-safety: `ImageIO.read` constructs a fresh reader per call, so
  * concurrent executor tasks don't share decoder state. The JVM-global
  * disk-cache toggle is left alone; reads come from in-memory
  * `ByteArrayInputStream`s, which the stream cache wraps without IO.
  */
object ImageIoDecoder extends GrayDecoder {
  override def decode(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    // non-positive AND overflowing declared dims degrade to empty — a
    // 50000×50000 declaration would overflow the Int product negative and
    // throw NegativeArraySizeException, violating the never-throw contract
    if (width <= 0 || height <= 0 ||
      width.toLong * height > Int.MaxValue) return Array.emptyByteArray
    val black = new Array[Byte](width * height)
    if (content == null || content.isEmpty) return black
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return black // unreadable container == corrupt
    try {
      val iw = img.getWidth
      val ih = img.getHeight
      // intrinsic dims come from the container — same overflow degrade
      if (iw <= 0 || ih <= 0 || iw.toLong * ih > Int.MaxValue) return black
      val luma = new Array[Byte](iw * ih)
      val raster = img.getRaster
      // gray-encoded containers: read the RASTER samples — the exact
      // stored values. getRGB on a TYPE_BYTE_GRAY image routes through a
      // linear-gray -> sRGB ColorSpace conversion that gamma-shifts every
      // pixel (stored 11 reads back 59), which would break pixel-exact
      // goldens. Palette images (IndexColorModel) are excluded: their one
      // band holds palette INDICES, not intensities.
      val grayDirect = raster.getNumBands == 1 &&
        !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      if (grayDirect) {
        val maxVal = (1 << img.getColorModel.getComponentSize(0)) - 1
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            val s = raster.getSample(x, y, 0)
            luma(y * iw + x) =
              (if (maxVal == 255) s else (s * 255 + maxVal / 2) / maxVal).toByte
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            luma(y * iw + x) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
            x += 1
          }
          y += 1
        }
      }
      if (iw == width && ih == height) luma
      else {
        val out = new Array[Byte](width * height)
        var oy = 0
        while (oy < height) {
          val sy = oy.toLong * ih / height
          var ox = 0
          while (ox < width) {
            val sx = ox.toLong * iw / width
            out(oy * width + ox) = luma((sy * iw + sx).toInt)
            ox += 1
          }
          oy += 1
        }
        out
      }
    } catch { case scala.util.control.NonFatal(_) => black }
  }
}

/** `png_gray_encode(pixels, w, h) -> binary` — encode `w·h` row-major gray
  * pixels as a REAL PNG container via `javax.imageio` (the JDK writer; no
  * new dependency). PNG is lossless and the gray samples land in the
  * raster verbatim, so [[ImageIoDecoder]]'s raster-exact gray read
  * round-trips every pixel bit-identically — which is what lets
  * `mm_image_decode_real` run the SHIPPED container decoder inside the
  * cross-engine hash gate: the payload is a genuine encoded PNG while the
  * pixel plane stays arithmetic the SQL oracle can replicate.
  *
  * Degrade contract (never-throw, mirroring the decoders): non-positive
  * or overflowing dims, or a pixel buffer shorter than `w·h`, yield an
  * EMPTY payload (which [[ImageIoDecoder]] in turn decodes to black).
  * PNG byte-stream identity across JVMs is NOT contracted — only pixel
  * round-trip identity, which is all the gate consumes.
  */
case class PngGrayEncode(first: Expression, second: Expression, third: Expression)
  extends GrayTernary {
  override protected def wantTypes: (DataType, String) = (BinaryType, "binary")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_gray_encode"

  def kernel(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue ||
      px.length < w * h) return Array.emptyByteArray
    try {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h,
        if (px.length == w * h) px else java.util.Arrays.copyOf(px, w * h))
      val bos = new java.io.ByteArrayOutputStream()
      // every JRE ships a PNG ImageWriter; a false return (no writer)
      // degrades to empty like a corrupt payload would on the read side
      if (javax.imageio.ImageIO.write(img, "png", bos)) bos.toByteArray
      else Array.emptyByteArray
    } catch {
      case scala.util.control.NonFatal(_) => Array.emptyByteArray
    }
  }

  override protected def nullSafeEval(c: Any, w: Any, h: Any): Any =
    kernel(c.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pngGrayEncode", this,
      classOf[PngGrayEncode].getName)
    nullSafeCodeGen(ctx, ev,
      (c, w, h) => s"${ev.value} = $ref.kernel($c, $w, $h);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PngGrayEncode =
    copy(first = f, second = s, third = t)
}

private[functions] trait GrayTernary extends TernaryExpression {
  protected def wantTypes: (DataType, String)
  override def checkInputDataTypes(): TypeCheckResult = {
    val (firstType, label) = wantTypes
    if (first.dataType == firstType &&
        second.dataType == IntegerType && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ($label, int, int), got " +
        s"${children.map(_.dataType.simpleString(10)).mkString(", ")}")
  }
}

/** `gray_decode(content, w, h) -> binary` — decode a payload to w·h gray
  * pixels through the configured [[GrayDecoder]].
  */
case class GrayDecode(decoder: GrayDecoder, first: Expression,
                      second: Expression, third: Expression)
  extends GrayTernary {
  override protected def wantTypes: (DataType, String) = (BinaryType, "binary")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gray_decode"

  def kernel(c: Array[Byte], w: Int, h: Int): Array[Byte] =
    decoder.decode(c, w, h)

  override protected def nullSafeEval(c: Any, w: Any, h: Any): Any =
    kernel(c.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("grayDecode", this, classOf[GrayDecode].getName)
    nullSafeCodeGen(ctx, ev,
      (c, w, h) => s"${ev.value} = $ref.kernel($c, $w, $h);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GrayDecode =
    copy(first = f, second = s, third = t)
}

/** `gray_resize(pixels, w, h) -> binary` — nearest-neighbor resample to
  * `outW·outH`: out(x, y) = in((y·h)/outH, (x·w)/outW), integer division
  * (the convention the SQL oracle mirrors).
  */
case class GrayResize(outW: Int, outH: Int, first: Expression,
                      second: Expression, third: Expression)
  extends GrayTernary {
  require(outW > 0 && outH > 0, s"bad output dims ${outW}x$outH")
  override protected def wantTypes: (DataType, String) = (BinaryType, "binary")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gray_resize"

  def kernel(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y.toLong * h / outH
      var x = 0
      while (x < outW) {
        val sx = x.toLong * w / outW
        val si = sy * w + sx
        out(y * outW + x) = if (si < px.length) px(si.toInt) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  override protected def nullSafeEval(c: Any, w: Any, h: Any): Any =
    kernel(c.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("grayResize", this, classOf[GrayResize].getName)
    nullSafeCodeGen(ctx, ev,
      (c, w, h) => s"${ev.value} = $ref.kernel($c, $w, $h);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GrayResize =
    copy(first = f, second = s, third = t)
}

/** `gray_patch_stats(pixels, w, h) -> array<struct<py, px, mean, std>>` —
  * per-`p`×`p`-patch brightness mean and population std (ViT patchify
  * summary), patches in row-major order. Mean = Σ/p², std =
  * √(Σ²/p² − mean²), both rounded to 6 — mirrored exactly by the SQL
  * oracle. Pixels are unsigned (0–255).
  */
case class GrayPatchStats(p: Int, first: Expression,
                          second: Expression, third: Expression)
  extends GrayTernary {
  require(p > 0, s"bad patch size $p")
  override protected def wantTypes: (DataType, String) = (BinaryType, "binary")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("py", IntegerType, nullable = false),
      StructField("px", IntegerType, nullable = false),
      StructField("mean", DoubleType, nullable = false),
      StructField("std", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gray_patch_stats"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def kernel(px: Array[Byte], w: Int, h: Int): Any = {
    val ny = h / p
    val nx = w / p
    val rows = new Array[InternalRow](ny * nx)
    var py = 0
    while (py < ny) {
      var pxi = 0
      while (pxi < nx) {
        var sum = 0L
        var sumSq = 0L
        var dy = 0
        while (dy < p) {
          var dx = 0
          while (dx < p) {
            // buffer shorter than declared w*h (corrupt row / mismatched
            // dims): read 0, like gray_resize's si < px.length degrade
            val si = (py * p + dy) * w + (pxi * p + dx)
            val v = if (si < px.length) px(si) & 0xFF else 0
            sum += v; sumSq += v.toLong * v
            dx += 1
          }
          dy += 1
        }
        val np = (p * p).toDouble
        val mean = sum / np
        val variance = sumSq / np - mean * mean
        rows(py * nx + pxi) = InternalRow(py, pxi, r6(mean),
          r6(math.sqrt(math.max(variance, 0.0))))
        pxi += 1
      }
      py += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(c: Any, w: Any, h: Any): Any =
    kernel(c.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("grayPatchStats", this,
      classOf[GrayPatchStats].getName)
    nullSafeCodeGen(ctx, ev, (c, w, h) => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $ref.kernel($c, $w, $h);
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GrayPatchStats =
    copy(first = f, second = s, third = t)
}
