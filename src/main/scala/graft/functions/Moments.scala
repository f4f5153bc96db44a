package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vector_moments(array<float|double>) ->
  * struct<n: bigint, mean: array<double>, m2: array<double>>` — count,
  * element-wise mean, and the FLATTENED d×d second-moment matrix
  * `E[v vᵀ]` (row-major) of an embedding column, in ONE aggregate pass.
  *
  * The covariance input of [[graft.operators.Similarity.whiten]]. Same
  * scale argument as [[VectorAvg]]: each vector row updates a dense
  * per-group double buffer and partials combine map-side, so the shuffle
  * carries one `1 + d + d²` buffer per partition — independent of N —
  * where any explode formulation would push N·d² rows. d is sized from
  * the first vector; mismatched lengths throw (corrupt input).
  */
case class VectorMoments(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_moments"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("m2", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_moments needs array<float|double>, got ${other.simpleString(10)}")
  }

  // buffer: [n, sum_0..sum_{d-1}, op_00, op_01, .., op_{d-1,d-1}]
  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  private def elemAt(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Double](1 + d + d * d)
      else buffer
    require(buf.length == 1 + d + d * d,
      s"vector_moments: length $d vector in a ${dimOf(buf)}-dim group")
    buf(0) += 1.0
    var i = 0
    while (i < d) {
      val vi = elemAt(arr, i)
      buf(1 + i) += vi
      var j = 0
      val row = 1 + d + i * d
      while (j < d) { buf(row + j) += vi * elemAt(arr, j); j += 1 }
      i += 1
    }
    buf
  }

  private def dimOf(buf: Array[Double]): Int =
    ((math.sqrt(4.0 * (buf.length - 1) + 1) - 1) / 2).round.toInt

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    require(b1.length == b2.length,
      "vector_moments: merging buffers of different dims")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.isEmpty || buffer(0) == 0.0) return null
    val d = dimOf(buffer)
    val n = buffer(0)
    val mean = Array.tabulate(d)(i => buffer(1 + i) / n)
    val m2 = Array.tabulate(d * d)(i => buffer(1 + d + i) / n)
    InternalRow(n.toLong, new GenericArrayData(mean), new GenericArrayData(m2))
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMoments =
    copy(child = newChildren.head)
}

/** `mat_vec_center(vec) -> array<double>` — `W · (v − μ)` against a
  * torrent-broadcast row-major d×d matrix and mean vector: the whitening
  * (or any linear post-processing) transform as a zero-shuffle codegen'd
  * map — the [[BpeDictEncode]] broadcast-handle shape for linear algebra.
  */
case class MatVecCenter(w: Broadcast[Array[Double]],
                        mean: Broadcast[Array[Double]],
                        child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_center needs array<float|double>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "mat_vec_center"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def apply(arr: ArrayData): ArrayData = {
    val d = mean.value.length
    require(arr.numElements() == d,
      s"mat_vec_center: ${arr.numElements()}-dim vector, $d-dim transform")
    val c = new Array[Double](d)
    var k = 0
    while (k < d) {
      val vk = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
      c(k) = vk - mean.value(k)
      k += 1
    }
    val out = new Array[Double](d)
    val m = w.value
    var j = 0
    while (j < d) {
      var s = 0.0
      val row = j * d
      var i = 0
      while (i < d) { s += m(row + i) * c(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    apply(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecCenter", this,
      classOf[MatVecCenter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.apply($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecCenter =
    copy(child = newChild)
}

/** Deterministic cyclic Jacobi eigendecomposition of a small symmetric
  * matrix — the driver-side step of [[graft.operators.Similarity.whiten]]
  * (d ≤ a few hundred; O(d³) per sweep is planning-scale work). Fixed
  * sweep order (p ascending, q ascending) → bit-reproducible.
  */
object Jacobi {

  /** Returns (eigenvalues, eigenvectors-as-columns flattened row-major):
    * `a = V diag(λ) Vᵀ` with `V[i*d + j]` = component i of eigenvector j.
    */
  def eigen(a0: Array[Double], d: Int, sweeps: Int = 64,
            tol: Double = 1e-22): (Array[Double], Array[Double]) = {
    require(a0.length == d * d, s"expected ${d * d} entries, got ${a0.length}")
    val a = a0.clone()
    val v = new Array[Double](d * d)
    var i = 0
    while (i < d) { v(i * d + i) = 1.0; i += 1 }

    var sweep = 0
    var off = offDiag(a, d)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > tol / (d * d)) {
            val app = a(p * d + p)
            val aqq = a(q * d + q)
            val theta = (aqq - app) / (2.0 * apq)
            val denom = math.abs(theta) + math.sqrt(theta * theta + 1.0)
            val t = if (theta >= 0) 1.0 / denom else -1.0 / denom
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, d, p, q, c, s)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a, d)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }

  private def offDiag(a: Array[Double], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i * d + j) * a(i * d + j); j += 1 }
      i += 1
    }
    s
  }

  private def rotate(a: Array[Double], v: Array[Double], d: Int,
                     p: Int, q: Int, c: Double, s: Double): Unit = {
    var k = 0
    while (k < d) {
      val akp = a(k * d + p)
      val akq = a(k * d + q)
      a(k * d + p) = c * akp - s * akq
      a(k * d + q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p * d + k)
      val aqk = a(q * d + k)
      a(p * d + k) = c * apk - s * aqk
      a(q * d + k) = s * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < d) {
      val vkp = v(k * d + p)
      val vkq = v(k * d + q)
      v(k * d + p) = c * vkp - s * vkq
      v(k * d + q) = s * vkp + c * vkq
      k += 1
    }
  }
}
