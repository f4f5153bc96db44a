package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL) for distribution
  * profiling at corpus scale: per-group quality/length/score quantiles in
  * ONE streaming pass, where the exact interpolated percentile needs the
  * full value multiset shuffled and sorted per group.
  *
  * The aggregate's RESULT is the serialized sketch itself (binary), not a
  * quantile: unlike `approx_percentile`, the sketch column can be STORED
  * with a shard's stats and re-merged later — profile 10 000 shards
  * independently, then combine profiles into corpus quantiles without
  * touching the data again (`kll_merge_agg`), the shape incremental
  * dataset releases need. Quantiles are extracted from a sketch column
  * with [[KllQuantiles]].
  *
  * KLL guarantees (k = 200 default): rank error ≤ ~1.65% with high
  * probability, sketch size a few KB — error is on RANK, not value, so
  * extracted thresholds are exact order statistics of a near-correct rank.
  */
object KllKernels {
  def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_agg(doubleCol, k) -> binary` — build a KLL sketch per group;
  * partials merge map-side (KLL merge is lossless in its error contract).
  */
case class KllAgg(child: Expression, k: Int = 200,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_agg expects double, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)
}

/** `kll_merge_agg(sketchBinary, k) -> binary` — re-merge STORED sketches
  * (shard profiles → corpus profile) without revisiting the data.
  */
case class KllMergeAgg(child: Expression, k: Int = 200,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects a serialized KLL sketch (binary), got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllKernels.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** `kll_quantiles(sketchBinary, ranks) -> array<double>` — extract
  * quantiles (INCLUSIVE search criteria, the DataSketches default) from a
  * serialized sketch column; null for an empty sketch. Deserialization is
  * memoized per byte-array reference — one heapify per task for the usual
  * broadcast/grouped shapes, not per row.
  */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
  extends UnaryExpression {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be within [0, 1], got $ranks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles expects a serialized KLL sketch (binary), got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedSketch: KllDoublesSketch = _

  def quantiles(bytes: Array[Byte]): Any = {
    if (cachedRef ne bytes) {
      cachedSketch = KllKernels.deserialize(bytes)
      cachedRef = bytes
    }
    if (cachedSketch.isEmpty) null
    else new GenericArrayData(
      cachedSketch.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE))
  }

  override protected def nullSafeEval(bytes: Any): Any =
    quantiles(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllQuantiles", this,
      classOf[KllQuantiles].getName)
    val tmp = ctx.freshName("kllOut")
    nullSafeCodeGen(ctx, ev, b => s"""
      Object $tmp = $ref.quantiles($b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}
