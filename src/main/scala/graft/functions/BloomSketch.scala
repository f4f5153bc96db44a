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
  * filter arrives as a COLUMN (typically via a broadcast one-row relation),
  * which carries a per-row cost this expression can only soften, not avoid:
  * `UnsafeRow.getBinary` materializes a FRESH copy of the byte array on
  * every access, so a reference-keyed memo never hits — the filter would be
  * copied and re-parsed per probe row (measured: ~125 s for 2.6 M probes
  * against a 350 KB filter). The memo is therefore keyed on a cheap content
  * fingerprint (length + 3 sampled longs); the copy itself still happens
  * per row. For large probe sides use [[BloomBroadcastProbe]], which holds
  * the filter as a torrent-broadcast object and touches no binary column at
  * all — this column form exists for the SQL surface and small inputs.
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

  // per-task memo, content-fingerprint keyed (see scaladoc): one filter
  // flows through a given plan, so a cheap fingerprint distinguishing
  // "same filter as last row" is all that's needed to skip re-parsing
  @transient private var cachedKey: Long = -1L
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  private def fingerprint(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var k = n.toLong
    var i = 0
    while (i < 3) { // sample front / middle / back words
      val off = math.min(n - 8, i * math.max(1, (n - 8) / 2))
      if (off >= 0) {
        var w = 0L
        var j = 0
        while (j < 8) { w = (w << 8) | (bytes(off + j) & 0xffL); j += 1 }
        k = k * 0x9e3779b97f4a7c15L + w
      }
      i += 1
    }
    k
  }

  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val key = fingerprint(bytes)
    // fingerprint match is only a hint: two same-config filters share the
    // serialization header and, at low fill, zero bit-words — confirm with
    // a full byte compare (costs no more than the getBinary copy already
    // paid) so a colliding filter can never be silently reused
    if (cachedFilter == null || key != cachedKey ||
        !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedFilter = BloomKernels.deserialize(bytes)
      cachedKey = key
      cachedBytes = bytes.clone()
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

/** Broadcast-handle Bloom probe: `child` is the 64-bit hash; the filter
  * rides a torrent `Broadcast[Array[Byte]]` captured in the expression —
  * the same shape Spark's own injected runtime bloom filters use (filter
  * evaluated once, shipped once per executor, zero per-row column traffic).
  * Tasks deserialize the filter once (lazy, per expression instance) and
  * every probe is then a codegen'd `mightContainLong` — no byte-array
  * copies on the row path at all, unlike [[BloomMightContain]]'s column
  * form.
  */
case class BloomBroadcastProbe(
    filter: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_broadcast_probe expects a bigint hash column, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_broadcast_probe"

  @transient private lazy val bf: BloomFilter =
    BloomKernels.deserialize(filter.value)

  def probe(v: Long): Boolean = bf.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBroadcastProbe", this,
      classOf[BloomBroadcastProbe].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBroadcastProbe =
    copy(child = newChild)
}
