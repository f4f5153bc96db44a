package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, UpdateSketch}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable THETA sketches (Apache DataSketches) — approximate DISTINCT
  * sets with full set algebra: union, intersection, and a-not-b over
  * STORED sketches. This is the set-operations member of the profile
  * family (KLL = quantiles, Misra–Gries = frequencies): per-shard
  * distinct-token/entity sketches persist with a release, and questions
  * like "how much does corpus A's vocabulary overlap corpus B's?" are
  * answered from kilobytes without rescanning either corpus — the
  * cross-corpus contamination/coverage triage HLL cannot express
  * (HLL unions but never intersects).
  *
  * Exactness contract: below the sketch's nominal entries (2^lgK, default
  * 4096) the sketch is in EXACT mode — estimates are true counts, so
  * small-scale oracles compare exactly; above it, relative error
  * ~1/√(2^lgK) on unions (intersections compound per the DataSketches
  * error analysis).
  */
object ThetaKernels {
  /** Aggregation buffer: raw updates go to an UpdateSketch; merged inputs
    * accumulate in a lazily-created Union. `result` unions the live
    * UpdateSketch in — re-unioning a grown sketch is safe because theta
    * union has set semantics (duplicates collapse).
    */
  final class ThetaBuf(val lgK: Int) {
    private val upd: UpdateSketch =
      UpdateSketch.builder().setLogNominalEntries(lgK).build()
    private var un: org.apache.datasketches.theta.Union = _

    private def union(): org.apache.datasketches.theta.Union = {
      if (un == null)
        un = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      un
    }

    def update(s: UTF8String): Unit = upd.update(s.getBytes)
    def mergeSketch(sk: Sketch): Unit = union().union(sk)
    def mergeIn(other: ThetaBuf): Unit = union().union(other.result)

    def result: CompactSketch =
      if (un == null) upd.compact()
      else { un.union(upd.compact()); un.getResult }
  }

  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))
}

/** `theta_agg(stringCol, lgK) -> binary` — distinct sketch per group. */
case class ThetaAgg(child: Expression, lgK: Int = 12,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaKernels.ThetaBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_agg expects string, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): ThetaKernels.ThetaBuf =
    new ThetaKernels.ThetaBuf(lgK)

  override def update(buffer: ThetaKernels.ThetaBuf,
                      input: InternalRow): ThetaKernels.ThetaBuf = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(b1: ThetaKernels.ThetaBuf,
                     b2: ThetaKernels.ThetaBuf): ThetaKernels.ThetaBuf = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: ThetaKernels.ThetaBuf): Any =
    buffer.result.toByteArray

  override def serialize(buffer: ThetaKernels.ThetaBuf): Array[Byte] =
    buffer.result.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaKernels.ThetaBuf = {
    val b = new ThetaKernels.ThetaBuf(lgK)
    b.mergeSketch(ThetaKernels.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaAgg =
    copy(child = newChildren.head)
}

/** `theta_union_agg(sketchBinary, lgK) -> binary` — union STORED
  * sketches (shard profiles → corpus distinct set).
  */
case class ThetaUnionAgg(child: Expression, lgK: Int = 12,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaKernels.ThetaBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects a serialized theta sketch (binary), got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): ThetaKernels.ThetaBuf =
    new ThetaKernels.ThetaBuf(lgK)

  override def update(buffer: ThetaKernels.ThetaBuf,
                      input: InternalRow): ThetaKernels.ThetaBuf = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeSketch(ThetaKernels.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(b1: ThetaKernels.ThetaBuf,
                     b2: ThetaKernels.ThetaBuf): ThetaKernels.ThetaBuf = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: ThetaKernels.ThetaBuf): Any =
    buffer.result.toByteArray

  override def serialize(buffer: ThetaKernels.ThetaBuf): Array[Byte] =
    buffer.result.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaKernels.ThetaBuf = {
    val b = new ThetaKernels.ThetaBuf(lgK)
    b.mergeSketch(ThetaKernels.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** `theta_estimate(sketchBinary) -> double` — the distinct estimate
  * (exact below nominal entries).
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a serialized theta sketch (binary), got ${other.simpleString(10)}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_estimate"

  def estimate(bytes: Array[Byte]): Double =
    ThetaKernels.wrap(bytes).getEstimate

  override protected def nullSafeEval(bytes: Any): Any =
    estimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaEstimate", this,
      classOf[ThetaEstimate].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.estimate($b);")
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(a, b) -> binary` / `theta_a_not_b(a, b) -> binary` —
  * pairwise set algebra over serialized sketches.
  */
abstract class ThetaPairOp extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two serialized theta sketches, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  def op(a: Array[Byte], b: Array[Byte]): Array[Byte]

  override protected def nullSafeEval(a: Any, b: Any): Any =
    op(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaPairOp", this, classOf[ThetaPairOp].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.op($a, $b);")
  }
}

case class ThetaIntersect(left: Expression, right: Expression) extends ThetaPairOp {
  override def prettyName: String = "theta_intersect"
  override def op(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(ThetaKernels.wrap(a))
    inter.intersect(ThetaKernels.wrap(b))
    inter.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

case class ThetaANotB(left: Expression, right: Expression) extends ThetaPairOp {
  override def prettyName: String = "theta_a_not_b"
  override def op(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val anotb = SetOperation.builder().buildANotB()
    anotb.setA(ThetaKernels.wrap(a))
    anotb.notB(ThetaKernels.wrap(b))
    anotb.getResult(true).toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}
