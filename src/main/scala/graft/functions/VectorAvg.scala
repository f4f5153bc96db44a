package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `vector_avg(array<float|double>) -> array<float>` — element-wise mean of
  * equal-length vectors, as a native aggregate.
  *
  * The alternative (posexplode → groupBy(key, pos) → avg → re-collect)
  * pushes N·dim rows through TWO shuffles and materializes position structs;
  * this aggregate keeps each vector row intact, accumulates into one dense
  * double buffer per group, and combines partials map-side — the shuffle
  * carries one buffer per (partition, group), independent of N. At
  * 100 TB-scale embedding tables (N·dim in the trillions) the explode plan
  * is a non-starter; this is the centroid-refinement kernel for
  * [[graft.operators.IvfIndex]].
  *
  * Buffer layout: `[count, sum_0, …, sum_{dim-1}]`, lazily sized from the
  * first non-null vector. Null vectors and null groups contribute nothing;
  * an all-null group yields null. Mismatched lengths throw (corrupt input).
  */
case class VectorAvg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vector_avg"

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_avg needs array<float|double>, got ${other.simpleString(10)}")
    }

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  private def elemAt(arr: org.apache.spark.sql.catalyst.util.ArrayData, i: Int): Double =
    elemType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val dim = arr.numElements()
    val buf =
      if (buffer.length == 0) new Array[Double](dim + 1)
      else {
        require(buffer.length == dim + 1,
          s"vector_avg: length mismatch (${buffer.length - 1} vs $dim)")
        buffer
      }
    buf(0) += 1
    var i = 0
    while (i < dim) { buf(i + 1) += elemAt(arr, i); i += 1 }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"vector_avg: partial length mismatch (${b1.length - 1} vs ${b2.length - 1})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.length == 0 || buffer(0) == 0) return null
    val n = buffer(0)
    val out = new Array[Float](buffer.length - 1)
    var i = 0
    while (i < out.length) { out(i) = (buffer(i + 1) / n).toFloat; i += 1 }
    new GenericArrayData(out)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)
}
