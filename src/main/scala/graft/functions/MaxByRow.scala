package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Kernel state for [[MaxByRow]]: the winning (ord, serialized row) so far.
  * The row travels as UnsafeRow bytes — a fixed, self-contained binary
  * layout — so partials serialize with one array copy and ties can be
  * broken by a deterministic byte comparison.
  */
object MaxByRowKernels {
  final class MaxRowBuffer {
    var has: Boolean = false
    var ord: Long = 0L
    var bytes: Array[Byte] = null
  }

  /** Lexicographic unsigned byte order (shorter prefix first) — a total,
    * deterministic order over serialized rows for the duplicate-ord
    * tie-break. Rows with identical values have identical UnsafeRow bytes,
    * so equal rows always tie equal.
    */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}

/** `max_by_row(row: struct, ord: bigint) -> struct` — the row with the
  * per-group MAXIMUM `ord`, as a TypedImperativeAggregate so the plan is an
  * **ObjectHashAggregate**: hash-based, with PARTIAL aggregation combining
  * each key map-side to one (ord, row) record per task.
  *
  * Why it exists: Spark's `max_by(struct(...), ord)` carries the candidate
  * struct in its declarative aggregation buffer, and a buffer holding
  * strings/arrays is not mutable — the planner silently demotes the whole
  * aggregate to SortAggregate, which sorts every map partition by the group
  * key. For latest-wins over a CDC log (W1) that sort is pure overhead:
  * this aggregate keeps the same minimal shuffle (≤ one pre-combined record
  * per key per task — the property that absorbs a 20 % hot key) without
  * sorting anything, and `plan_violations`-style audits can assert the
  * HashAggregate family by name.
  *
  * Ties (duplicate `ord` within a group): the row with the smaller
  * serialized byte image wins — DETERMINISTIC (unlike `max_by`'s
  * first-seen), but still a different law than the window form's full sort
  * order, so callers needing window-identical results under duplicate
  * offsets keep `row_number` (see [[graft.operators.CdcFold.latestWinsAgg]]).
  *
  * Session conf that matters (same as [[TopNBy]]): raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — the
  * 128-keys-per-task default silently falls back to sort-based aggregation.
  */
case class MaxByRow(row: Expression, ord: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxByRowKernels.MaxRowBuffer] {

  override def children: Seq[Expression] = Seq(row, ord)
  override def nullable: Boolean = true
  override def prettyName: String = "max_by_row"
  override def dataType: DataType = row.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (row.dataType, ord.dataType) match {
      case (_: StructType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (r, o) => TypeCheckResult.TypeCheckFailure(
        s"max_by_row expects (struct, bigint), got " +
          s"(${r.simpleString(10)}, ${o.simpleString(10)})")
    }

  private lazy val rowSchema = row.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe =
    UnsafeProjection.create(rowSchema.fields.map(_.dataType))

  private def rowBytes(r: Any): Array[Byte] = {
    val ur = toUnsafe(r.asInstanceOf[InternalRow])
    java.util.Arrays.copyOf(ur.getBytes, ur.getSizeInBytes)
  }

  override def createAggregationBuffer(): MaxByRowKernels.MaxRowBuffer =
    new MaxByRowKernels.MaxRowBuffer

  override def update(buf: MaxByRowKernels.MaxRowBuffer,
                      input: InternalRow): MaxByRowKernels.MaxRowBuffer = {
    val o = ord.eval(input)
    val r = row.eval(input)
    if (o != null && r != null) {
      val ov = o.asInstanceOf[Long]
      if (!buf.has || ov > buf.ord) {
        buf.has = true; buf.ord = ov; buf.bytes = rowBytes(r)
      } else if (ov == buf.ord) {
        val cand = rowBytes(r)
        if (MaxByRowKernels.compareBytes(cand, buf.bytes) < 0) buf.bytes = cand
      }
    }
    buf
  }

  override def merge(b1: MaxByRowKernels.MaxRowBuffer,
                     b2: MaxByRowKernels.MaxRowBuffer): MaxByRowKernels.MaxRowBuffer = {
    if (b2.has && (!b1.has || b2.ord > b1.ord ||
        (b2.ord == b1.ord &&
          MaxByRowKernels.compareBytes(b2.bytes, b1.bytes) < 0))) {
      b1.has = true; b1.ord = b2.ord; b1.bytes = b2.bytes
    }
    b1
  }

  override def eval(buf: MaxByRowKernels.MaxRowBuffer): Any =
    if (!buf.has) null
    else {
      val ur = new UnsafeRow(rowSchema.size)
      ur.pointTo(buf.bytes, buf.bytes.length)
      ur
    }

  override def serialize(buf: MaxByRowKernels.MaxRowBuffer): Array[Byte] =
    if (!buf.has) Array.emptyByteArray
    else {
      val out = new Array[Byte](8 + buf.bytes.length)
      var i = 0
      while (i < 8) { out(i) = (buf.ord >>> (56 - 8 * i)).toByte; i += 1 }
      System.arraycopy(buf.bytes, 0, out, 8, buf.bytes.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): MaxByRowKernels.MaxRowBuffer = {
    val buf = new MaxByRowKernels.MaxRowBuffer
    if (bytes.nonEmpty) {
      var ov = 0L
      var i = 0
      while (i < 8) { ov = (ov << 8) | (bytes(i) & 0xFFL); i += 1 }
      buf.has = true
      buf.ord = ov
      buf.bytes = java.util.Arrays.copyOfRange(bytes, 8, bytes.length)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxByRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxByRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaxByRow =
    copy(row = newChildren(0), ord = newChildren(1))
}
