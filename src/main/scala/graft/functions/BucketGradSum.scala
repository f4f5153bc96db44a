package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `bucket_grad_sum(bs, cnts, r, size) -> array<bigint>` — the logistic-
  * regression gradient accumulator: for every aligned pair `(bs(i),
  * cnts(i))` of a row, add `r · cnts(i)` into slot `bs(i) + 1` of a
  * FIXED-SIZE long array (`size` slots; the `+1` shift puts the bias
  * pseudo-feature `b = -1` at slot 0, matching [[BucketWeightSum]]'s
  * weight layout). Out-of-range buckets are ignored, like
  * [[BucketWeightSum]] ignores them on the margin side.
  *
  * Why an aggregate and not `explode → groupBy(b) → sum` (the r17 shape):
  * the exploded form shuffles one row per (task, bucket) through a
  * bucket-keyed exchange and needs a second aggregate behind it — per
  * TRAINING ITERATION. This kernel folds the whole gradient into one
  * `buckets+1`-slot array per task (partial aggregation, no grouping
  * key), so each iteration is ONE job whose exchange carries exactly one
  * ~8·size-byte row per map task, invariant to AQE partition sizing and
  * to corpus scale. Long addition is commutative/associative, so the
  * result is bit-identical to the grouped form for any partitioning —
  * the distributed-equals-serial contract `lrTrainSerial` pins is
  * untouched.
  *
  * Update/merge are pure long-array arithmetic; the buffer serializes as
  * 8 bytes per slot (big-endian), `size` is a literal by contract.
  */
case class BucketGradSum(bs: Expression, cnts: Expression, r: Expression,
                         size: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(bs, cnts, r)
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_grad_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isLongArray(t: DataType) =
    t.isInstanceOf[ArrayType] &&
      t.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(bs.dataType) && isLongArray(cnts.dataType) &&
        r.dataType == LongType && size > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucket_grad_sum expects (array<bigint>, array<bigint>, bigint) " +
        s"with size > 0, got (${bs.dataType.simpleString(10)}, " +
        s"${cnts.dataType.simpleString(10)}, ${r.dataType.simpleString(10)}, " +
        s"size=$size)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bv = bs.eval(input)
    val cv = cnts.eval(input)
    val rv = r.eval(input)
    if (bv != null && cv != null && rv != null) {
      val ba = bv.asInstanceOf[ArrayData]
      val ca = cv.asInstanceOf[ArrayData]
      val rl = rv.asInstanceOf[Long]
      val n = math.min(ba.numElements(), ca.numElements())
      var i = 0
      while (i < n) {
        val idx = ba.getLong(i) + 1
        if (idx >= 0 && idx < size) buf(idx.toInt) += rl * ca.getLong(i)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](8 * size)
    var i = 0
    while (i < size) {
      val v = buf(i)
      var j = 0
      while (j < 8) { out(8 * i + j) = (v >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](size)
    var i = 0
    while (i < size && 8 * i + 8 <= bytes.length) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (bytes(8 * i + j) & 0xFFL); j += 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketGradSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketGradSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketGradSum =
    copy(bs = newChildren(0), cnts = newChildren(1), r = newChildren(2))
}
