package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `pcm16_frames(content) -> array<struct<frame, n, rms, zcr, peak>>` —
  * REAL audio decode + framed feature extraction: the payload is
  * interpreted as little-endian signed 16-bit PCM (the actual encoding of
  * WAV data chunks — no codec library involved), split into frames of
  * `frameLen` samples (trailing partial kept with its own `n`), and each
  * frame summarized by the classic VAD/segmentation features:
  * RMS energy (√(Σs²/n), rounded 6), zero-crossing count (adjacent
  * sample pairs with strictly opposite signs), and peak |amplitude|.
  *
  * One codegen'd per-row projection — the audio twin of the image
  * [[GrayPatchStats]] chain: scan-speed, shuffle-free, and pure integer/
  * IEEE arithmetic, so the whole decode→frame→featurize pipeline is
  * SQL-replicable and hash-checkable cross-engine (`mm_audio_frames`).
  * An odd trailing byte (torn sample) is ignored, never an exception.
  */
case class Pcm16Frames(frameLen: Int, child: Expression)
  extends UnaryExpression {

  require(frameLen > 0, s"frameLen must be positive, got $frameLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pcm16_frames expects binary, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("frame", IntegerType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zcr", IntegerType, nullable = false),
      StructField("peak", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pcm16_frames"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def kernel(bytes: Array[Byte]): Any = {
    val nSamples = bytes.length / 2
    val nFrames = (nSamples + frameLen - 1) / frameLen
    val rows = new Array[InternalRow](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameLen
      val end = math.min(start + frameLen, nSamples)
      var sumSq = 0L
      var zcr = 0
      var peak = 0
      var prev = 0
      var i = start
      while (i < end) {
        val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt
        sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > start && prev.toLong * s < 0) zcr += 1
        prev = s
        i += 1
      }
      val n = end - start
      rows(f) = InternalRow(f, n, r6(math.sqrt(sumSq.toDouble / n)), zcr, peak)
      f += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(bytes: Any): Any =
    kernel(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcm16Frames", this, classOf[Pcm16Frames].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($b);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Pcm16Frames =
    copy(child = newChild)
}
