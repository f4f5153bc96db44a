package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric int8 vector quantization for embedding storage at corpus
  * scale: a float32 vector becomes one byte per dimension plus a
  * per-vector float scale (`max |v| / 127`) — 4× smaller on disk and in
  * shuffle, which at 100 TB of embeddings is the difference between an
  * index that fits the cluster and one that doesn't.
  *
  * Cosine similarity is SCALE-INVARIANT, so ranking quantized vectors
  * needs no dequantization at all ([[Int8Cosine]] works directly on the
  * byte payloads); the stored scale exists to reconstruct magnitudes
  * (dot products, dequantized vectors) when a consumer needs them.
  * Quantization error on 64-dim unit vectors perturbs cosines by ~1e-3 —
  * recall against the float ranking is asserted in SimilaritySpec.
  */
object QuantizeKernels {
  def scaleOf(v: ArrayData): Float = {
    var m = 0.0f
    var i = 0
    val n = v.numElements()
    while (i < n) { val a = math.abs(v.getFloat(i)); if (a > m) m = a; i += 1 }
    if (m == 0.0f) 1.0f else m / 127.0f
  }

  def quantize(v: ArrayData): Array[Byte] = {
    val s = scaleOf(v)
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.round(v.getFloat(i) / s).toByte
      i += 1
    }
    out
  }

  def cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) 0.0 else dot.toDouble / denom
  }
}

/** `i8_quantize(array<float>) -> binary` — one byte per dimension. */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "i8_quantize"
  override protected def nullSafeEval(v: Any): Any =
    QuantizeKernels.quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeKernels.quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** `i8_scale(array<float>) -> float` — the per-vector dequantization scale. */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got $other")
  }
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "i8_scale"
  override protected def nullSafeEval(v: Any): Any =
    QuantizeKernels.scaleOf(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeKernels.scaleOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8Scale =
    copy(child = newChild)
}

/** `cosine_i8(binary, binary) -> double` — cosine over int8 payloads; all
  * accumulation in exact integer arithmetic (64-dim int8 dot fits a long
  * with ~2^40 headroom), one float division at the end.
  */
case class Int8Cosine(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (binary, binary), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_i8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizeKernels.cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantizeKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
