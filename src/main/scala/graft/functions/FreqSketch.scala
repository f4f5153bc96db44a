package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch: a bounded `capacity`-counter summary
  * of a string stream whose survivors are guaranteed to include EVERY item
  * with true frequency > N/(capacity+1), with per-item estimates
  * `true − N/(capacity+1) ≤ est ≤ true`. Merging follows Agarwal et al.
  * 2012 ("Mergeable Summaries"): add counters pointwise, then subtract the
  * (capacity+1)-th largest counter and drop non-positives — the error
  * bound survives arbitrary merge trees, so map-side partials and
  * stored shard profiles re-merge freely (the KLL contract, for
  * frequencies).
  *
  * Why it earns a place next to the exact `topNgrams`: the exact operator
  * shuffles every distinct token; at corpus scale the distinct-token
  * relation IS the corpus (tail-heavy Zipf). The sketch caps per-task
  * state and shuffle bytes at `capacity` counters regardless of N, and
  * its survivor set makes a LOSSLESS candidate prune for an exact
  * second pass (`TextAnalysis.heavyHitters`) — the standard two-pass
  * exact heavy-hitters at a bounded shuffle.
  *
  * The aggregate's result is the serialized sketch (binary), storable and
  * re-mergeable via [[MgMergeAgg]]; decode survivors with [[MgItems]].
  */
object MgKernels {

  /** Counter state. `decrement-all` runs amortized O(1) per update (each
    * decrement pays for a prior increment).
    */
  final class MgBuffer(val capacity: Int) {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def update(item: String): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None if counts.size < capacity => counts.update(item, 1L)
        case None =>
          // decrement-all; drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(counts.remove)
      }
    }

    /** Pointwise add, then shrink back to `capacity` by subtracting the
      * (capacity+1)-th largest counter value (Agarwal et al. merge).
      */
    def mergeIn(other: MgBuffer): Unit = {
      other.counts.foreach { case (k, c) =>
        counts.update(k, counts.getOrElse(k, 0L) + c)
      }
      if (counts.size > capacity) {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        val sub = vals(vals.length - capacity - 1) // (capacity+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - sub)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
      }
    }
  }

  def serialize(b: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.counts.size)
    // deterministic order so equal sketches serialize equally
    b.counts.toArray.sortBy(_._1).foreach { case (k, c) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      b.counts.update(new String(arr, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }
}

/** `mg_agg(stringCol, capacity) -> binary` — build a Misra–Gries sketch
  * per group; partials merge map-side under the mergeable-summaries bound.
  */
case class MgAgg(child: Expression, capacity: Int = 256,
                 mutableAggBufferOffset: Int = 0,
                 inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgKernels.MgBuffer] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_agg expects string, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): MgKernels.MgBuffer =
    new MgKernels.MgBuffer(capacity)

  override def update(buffer: MgKernels.MgBuffer,
                      input: InternalRow): MgKernels.MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: MgKernels.MgBuffer,
                     b2: MgKernels.MgBuffer): MgKernels.MgBuffer = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: MgKernels.MgBuffer): Any =
    MgKernels.serialize(buffer)

  override def serialize(buffer: MgKernels.MgBuffer): Array[Byte] =
    MgKernels.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MgKernels.MgBuffer =
    MgKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgAgg =
    copy(child = newChildren.head)
}

/** `mg_merge_agg(sketchBinary, capacity) -> binary` — re-merge STORED
  * sketches (shard profiles → corpus heavy hitters) without revisiting
  * the data; same bound as building in one pass.
  */
case class MgMergeAgg(child: Expression, capacity: Int = 256,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgKernels.MgBuffer] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_merge_agg expects a serialized MG sketch (binary), got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): MgKernels.MgBuffer =
    new MgKernels.MgBuffer(capacity)

  override def update(buffer: MgKernels.MgBuffer,
                      input: InternalRow): MgKernels.MgBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeIn(MgKernels.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(b1: MgKernels.MgBuffer,
                     b2: MgKernels.MgBuffer): MgKernels.MgBuffer = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: MgKernels.MgBuffer): Any =
    MgKernels.serialize(buffer)

  override def serialize(buffer: MgKernels.MgBuffer): Array[Byte] =
    MgKernels.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MgKernels.MgBuffer =
    MgKernels.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgMergeAgg =
    copy(child = newChildren.head)
}

/** `mg_items(sketchBinary) -> array<struct<item:string, est:long>>` —
  * decode a sketch's survivors, ordered by (est desc, item) so the array
  * is deterministic for equal sketches.
  */
case class MgItems(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_items expects a serialized MG sketch (binary), got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_items"

  def items(bytes: Array[Byte]): Any = {
    val b = MgKernels.deserialize(bytes)
    val sorted = b.counts.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override protected def nullSafeEval(bytes: Any): Any =
    items(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mgItems", this, classOf[MgItems].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.items($b);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MgItems =
    copy(child = newChild)
}
