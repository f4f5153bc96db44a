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

/** `pq_encode(vec array<float>, books array<float>, m, ksub) ->
  * array<tinyint>` — assign each of the vector's `m` subvectors to its
  * nearest codebook centroid in ONE map pass. `books` is the flat codebook
  * laid out `[(j·ksub + cid)·dsub + i]`; ties break to the lowest cid
  * (strict `<`), so encoding is deterministic.
  *
  * This is what keeps PQ training/encoding shuffle-free at scale: the
  * naive relational formulation joins N·m subvector rows against ksub
  * codebook rows per subspace — a ksub× row explosion (200 B intermediate
  * rows at 100 M vectors, m=8, ksub=256) — where this expression does the
  * same argmin inside whole-stage codegen with the broadcast/literal
  * codebook memoized per reference, touching each vector row exactly once.
  * Cids above 127 encode as their two's-complement byte; readers
  * ([[PqAdcScore]]) decode unsigned (`& 0xFF`).
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression {
  require(m > 0 && ksub > 0 && ksub <= 256,
    s"pq_encode needs 0<m and 0<ksub<=256, got m=$m ksub=$ksub")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<float>, array<float>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedBooks: Array[Float] = _

  def encode(vecAny: Any, books: ArrayData): ArrayData = {
    if (cachedRef ne books) {
      cachedBooks = books.toFloatArray()
      cachedRef = books
    }
    val u = vecAny.asInstanceOf[ArrayData].toFloatArray()
    val dsub = u.length / m
    require(u.length == m * dsub && cachedBooks.length == m * ksub * dsub,
      s"pq_encode geometry mismatch: dim=${u.length}, books=" +
        s"${cachedBooks.length}, m=$m, ksub=$ksub")
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var i = 0
        val cOff = (j * ksub + c) * dsub
        val uOff = j * dsub
        while (i < dsub) {
          val diff = u(uOff + i) - cachedBooks(cOff + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def nullSafeEval(vec: Any, books: Any): Any =
    encode(vec, books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (v, b) => s"${ev.value} = $ref.encode($v, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
