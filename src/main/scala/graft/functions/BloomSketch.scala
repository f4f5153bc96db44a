package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build + membership probe — the join-prefilter
  * pair behind [[graft.operators.Curation.contaminationReportScalable]].
  *
  * Spark's own runtime filtering uses exactly this shape (an internal
  * bloom aggregate feeding an internal might-contain probe), but only
  * injects it when the optimizer elects to; these expressions make the
  * pattern a first-class, caller-directed operator over the PUBLIC
  * `org.apache.spark.util.sketch.BloomFilter`, so a pipeline can prefilter
  * an arbitrarily large probe side against a set that is too big to
  * broadcast as a hash relation but fits fine as a bit array (~1.2 bytes
  * per item at 1% fpp — 10^9 eval shingles ≈ 1.2 GB where the exact
  * distinct-string relation would be tens of GB).
  *
  * The filter carries 64-bit hashes (`putLong`/`mightContainLong`), not
  * strings: both sides hash identically (callers use `xxhash64`), and the
  * probe stays a long-only codegen'd kernel. False positives only ever
  * ADMIT rows into a later exact join, never decide membership.
  */
object BloomKernels {
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** `bloom_agg(longCol, expectedItems, fpp) -> binary` — build one Bloom
  * filter over a column of 64-bit hashes. Partials combine map-side
  * (`mergeInPlace` is a bit-OR: all partials are sized identically from the
  * constructor parameters), so the shuffle carries one bit array per
  * partition, independent of row count.
  */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a bigint hash column, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(expectedItems, 1L), fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buffer: BloomFilter): Any = BloomKernels.serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] =
    BloomKernels.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** `bloom_might_contain(filterBinary, longCol) -> boolean`. The serialized
  * filter typically arrives via a broadcast one-row relation (never a
  * driver collect), so it is NOT foldable; the expression memoizes the
  * deserialized filter per byte-array reference — one deserialization per
  * task, not per row. Codegen routes through [[mightContain]] on the
  * referenced instance, keeping the probe inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  // per-task memo: tasks deserialize their own expression tree, so no
  // cross-thread sharing; within a task the filter bytes are one stable
  // broadcast reference
  @transient private var cachedRef: AnyRef = _
  @transient private var cachedFilter: BloomFilter = _

  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    if (cachedRef ne bytes) {
      cachedFilter = BloomKernels.deserialize(bytes)
      cachedRef = bytes
    }
    cachedFilter.mightContainLong(v)
  }

  override protected def nullSafeEval(f: Any, v: Any): Any =
    mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (f, v) => s"${ev.value} = $ref.mightContain($f, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
