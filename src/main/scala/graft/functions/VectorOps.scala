package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels over Catalyst [[ArrayData]] (float32 vectors),
  * shared by interpreted eval and generated code. Accumulation is a plain
  * sequential double loop — deterministic, and bit-compatible with a
  * straightforward columnar implementation of cosine similarity over
  * float inputs widened to double.
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm2(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Fused fixed-point-quantize + integer dot: for each component,
    * `q = floor(double(x)·2^20 + 0.5)` (the
    * [[graft.operators.Similarity.fixedPointQuantize]] contract — every
    * step exact IEEE), then `Σ qa·qb` in int64. On the embedding-family
    * contract inputs — equal-dimension vectors with non-null elements —
    * this is BIT-IDENTICAL to quantizing both arrays and folding the
    * products (spec-pinned in SimilaritySpec), but one codegen'd
    * primitive-loop pass with zero array allocation: the two-step
    * `transform` + `zip_with`/`aggregate` form runs interpreted and
    * allocates two long arrays per pair (measured 32 s → 2.6 s on a
    * 3.2 M-pair top-k build at sf0.1). OFF-contract inputs differ
    * deliberately: ragged lengths fold over min(len) and a null element
    * reads as its slot's raw bits instead of poisoning the sum to NULL
    * the way `zip_with` padding did — a malformed embedding should be
    * rejected at ingest, not silently change one pair's similarity.
    */
  def intDotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val qa = math.floor(a.getFloat(i).toDouble * 1048576.0 + 0.5).toLong
      val qb = math.floor(b.getFloat(i).toDouble * 1048576.0 + 0.5).toLong
      s += qa * qb
      i += 1
    }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

abstract class Float32VectorBinary extends BinaryExpression {
  private def isFloatArray(t: DataType) =
    t.isInstanceOf[ArrayType] && t.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** `cosine_similarity(array<float>, array<float>) -> double`.
  *
  * Codegen'd via a static kernel so ANN / near-dup scans stay inside
  * whole-stage codegen (SURVEY §2.9 north-star: similarity search).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends Float32VectorBinary {
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `int_dot_q(array<float>, array<float>) -> bigint` — the fused
  * fixed-point-quantize + exact int64 dot ([[VectorKernels.intDotQ]]),
  * the integer-exact similarity contract's hot kernel kept inside
  * whole-stage codegen.
  */
case class IntDotQ(left: Expression, right: Expression)
    extends Float32VectorBinary {
  override def prettyName: String = "int_dot_q"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.intDotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.intDotQ($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `l2_norm(array<float>) -> double` — the vector's Euclidean norm.
  *
  * Computed ONCE per vector at the sketch stage, it turns per-candidate
  * cosine into `dot / (nrm_a · nrm_b)` — bit-identical to
  * [[CosineSimilarity]] (the three accumulators of the fused kernel are
  * independent, so splitting them changes no rounding) while the verify
  * join evaluates one dot instead of dot + two norms per candidate pair.
  */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.norm2(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.norm2($c)")
  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** `dot_product(array<float>, array<float>) -> double`. */
case class DotProduct(left: Expression, right: Expression)
    extends Float32VectorBinary {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
