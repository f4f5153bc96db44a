package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `pq_adc_score(codes binary, lut array<float>) -> double` — asymmetric
  * distance computation for product-quantized vectors: the score of a code
  * word is `Σ_j lut[j·ksub + codes[j]]`, where the lookup table holds the
  * query's per-subspace dot products against every codebook centroid
  * (computed ONCE per query, driver-side, m·ksub floats).
  *
  * This is the scan kernel that makes PQ pay: ranking reads m BYTES per
  * vector (8 B at m=8 vs 256 B of float32 for 64 dims) and does m table
  * lookups instead of `dim` multiply-adds. `ksub` is inferred from
  * `lut.length / codes.length` per row, so one expression serves any
  * (m, ksub) codebook geometry.
  *
  * The LUT is memoized per byte-array reference (same contract as
  * [[BloomMightContain]]): one ArrayData→Array[Float] conversion per task
  * for the broadcast/literal shapes, not per row.
  */
case class PqAdcScore(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(ByteType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (binary | array<tinyint>, array<float>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_score"

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedLut: Array[Float] = _

  def score(codesAny: Any, lut: ArrayData): Double = {
    if (cachedRef ne lut) {
      cachedLut = lut.toFloatArray()
      cachedRef = lut
    }
    val codes = codesAny match {
      case b: Array[Byte] => b
      case a: ArrayData => a.toByteArray()
    }
    val m = codes.length
    val ksub = cachedLut.length / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += cachedLut(j * ksub + (codes(j) & 0xFF))
      j += 1
    }
    s
  }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    score(codes, lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (c, l) => s"${ev.value} = $ref.score($c, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
