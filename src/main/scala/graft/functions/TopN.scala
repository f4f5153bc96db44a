package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-n-by-score aggregate: the n `value`s with the highest
  * `score` per group (ties to the smaller value — a total order, so the
  * result is deterministic), best-first.
  *
  * The point is the SHUFFLE bound: a window (`row_number over
  * partitionBy(group) orderBy score`) shuffles every candidate row —
  * group·candidate rows — where this aggregate's partials carry at most n
  * entries per group per task and combine map-side (the mergeable-
  * summaries shape, exact here because top-n under a total order is
  * itself mergeable: top-n of a union is computable from the per-part
  * top-ns). The n-successive-argmax formulation ([[graft.operators
  * .KnnGraph]]'s original nprobe loop) has the same shuffle bound but
  * pays one full scan of the candidate relation PER RANK plus an
  * exclusion join — this is one scan for all n.
  */
object TopNKernels {

  /** Unsorted bounded buffer; O(capacity) insert — capacity is small by
    * contract (probe counts, not corpus sizes).
    */
  final class TopNBuffer(val capacity: Int) {
    val scores = new Array[Double](capacity)
    val values = new Array[Long](capacity)
    var size: Int = 0

    private def better(s1: Double, v1: Long, s2: Double, v2: Long): Boolean =
      s1 > s2 || (s1 == s2 && v1 < v2)

    def insert(score: Double, value: Long): Unit = {
      if (size < capacity) {
        scores(size) = score; values(size) = value; size += 1
      } else {
        // replace the worst entry if the newcomer beats it
        var worst = 0
        var i = 1
        while (i < size) {
          if (better(scores(worst), values(worst), scores(i), values(i)))
            worst = i
          i += 1
        }
        if (better(score, value, scores(worst), values(worst))) {
          scores(worst) = score; values(worst) = value
        }
      }
    }

    def mergeIn(other: TopNBuffer): Unit = {
      var i = 0
      while (i < other.size) { insert(other.scores(i), other.values(i)); i += 1 }
    }

    /** Values best-first: score desc, then value asc. */
    def sortedValues(): Array[Long] = {
      val idx = (0 until size).sortBy(i => (-scores(i), values(i)))
      idx.map(values).toArray
    }
  }

  def serialize(b: TopNBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.scores(i)); out.writeLong(b.values(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): TopNBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopNBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.insert(in.readDouble(), in.readLong()); i += 1 }
    b
  }
}

/** `top_n_by(value: bigint, score: double, n) -> array<bigint>` —
  * per-group top-n values by (score desc, value asc), best-first.
  *
  * Session conf that matters: raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (the
  * Bench/Verify builders use 10 000 000) — at the 128-keys-per-task
  * default Spark silently falls back from ObjectHashAggregate to
  * sort-based aggregation for TypedImperativeAggregates, which sorts
  * every candidate row per task and re-introduces the window-shaped
  * cost this bounded buffer exists to avoid (correctness unaffected).
  */
case class TopNBy(value: Expression, score: Expression, n: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNKernels.TopNBuffer] {

  require(n > 0, s"n must be positive, got $n")

  override def children: Seq[Expression] = Seq(value, score)
  override def nullable: Boolean = false
  override def prettyName: String = "top_n_by"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, score.dataType) match {
      case (LongType | IntegerType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, s) => TypeCheckResult.TypeCheckFailure(
        s"top_n_by expects (bigint|int, double), got (${v.simpleString(10)}, ${s.simpleString(10)})")
    }

  override def createAggregationBuffer(): TopNKernels.TopNBuffer =
    new TopNKernels.TopNBuffer(n)

  override def update(buffer: TopNKernels.TopNBuffer,
                      input: InternalRow): TopNKernels.TopNBuffer = {
    val v = value.eval(input)
    val s = score.eval(input)
    if (v != null && s != null) {
      val vl = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      buffer.insert(s.asInstanceOf[Double], vl)
    }
    buffer
  }

  override def merge(b1: TopNKernels.TopNBuffer,
                     b2: TopNKernels.TopNBuffer): TopNKernels.TopNBuffer = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: TopNKernels.TopNBuffer): Any =
    new GenericArrayData(buffer.sortedValues())

  override def serialize(buffer: TopNKernels.TopNBuffer): Array[Byte] =
    TopNKernels.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): TopNKernels.TopNBuffer =
    TopNKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNBy =
    copy(value = newChildren(0), score = newChildren(1))
}

/** [[TopNBy]] that KEEPS the scores:
  * `top_n_by_scored(value, score, n) -> array<struct<v: bigint, s: double>>`
  * best-first (score desc, value asc). Same bounded mergeable buffer —
  * ≤ n entries per group per task, map-side combinable — for consumers
  * that need the ranking's score column in the output (e.g. the k-NN
  * graph's `(nbr, cos, rank)` rows, where a window over the candidate
  * relation would shuffle every candidate instead of N·k partials).
  * `posexplode` of the result yields the rank as `pos + 1` under the
  * identical total order a `row_number() over (orderBy score desc,
  * value asc)` window would assign.
  */
case class TopNByScored(value: Expression, score: Expression, n: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNKernels.TopNBuffer] {

  require(n > 0, s"n must be positive, got $n")

  override def children: Seq[Expression] = Seq(value, score)
  override def nullable: Boolean = false
  override def prettyName: String = "top_n_by_scored"
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("s", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, score.dataType) match {
      case (LongType | IntegerType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, s) => TypeCheckResult.TypeCheckFailure(
        s"top_n_by_scored expects (bigint|int, double), got " +
          s"(${v.simpleString(10)}, ${s.simpleString(10)})")
    }

  override def createAggregationBuffer(): TopNKernels.TopNBuffer =
    new TopNKernels.TopNBuffer(n)

  override def update(buffer: TopNKernels.TopNBuffer,
                      input: InternalRow): TopNKernels.TopNBuffer = {
    val v = value.eval(input)
    val s = score.eval(input)
    if (v != null && s != null) {
      val vl = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      buffer.insert(s.asInstanceOf[Double], vl)
    }
    buffer
  }

  override def merge(b1: TopNKernels.TopNBuffer,
                     b2: TopNKernels.TopNBuffer): TopNKernels.TopNBuffer = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: TopNKernels.TopNBuffer): Any = {
    val idx = (0 until buffer.size)
      .sortBy(i => (-buffer.scores(i), buffer.values(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(buffer.values(i), buffer.scores(i))).toArray[Any])
  }

  override def serialize(buffer: TopNKernels.TopNBuffer): Array[Byte] =
    TopNKernels.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): TopNKernels.TopNBuffer =
    TopNKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNByScored =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNByScored =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNByScored =
    copy(value = newChildren(0), score = newChildren(1))
}
