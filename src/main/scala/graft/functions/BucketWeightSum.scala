package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bucket_weight_sum(weightsBcast, buckets, counts) -> long` — the exact
  * integer dot product `Σᵢ w[bucketsᵢ+1] · countsᵢ` against a
  * torrent-broadcast dense weight array (index 0 carries the bias bucket
  * `b = -1`).
  *
  * This is the zero-shuffle margin kernel for the logistic-regression
  * trainer ([[graft.operators.Classifier.lrTrain]]): per-document margins
  * become one codegen'd array fold over the row — no per-iteration join,
  * no per-document aggregation shuffle. Weights live on the trainer's
  * integer nano-grid, so the sum is an exact `long` fold — associative,
  * partition-order-free, bit-stable.
  *
  * Out-of-range buckets contribute 0 (a scoring-time vocabulary larger
  * than the trained array must not throw).
  */
case class BucketWeightSum(weights: Broadcast[Array[Long]],
                           buckets: Expression, counts: Expression)
  extends BinaryExpression {

  override def left: Expression = buckets
  override def right: Expression = counts
  override def prettyName: String = "bucket_weight_sum"

  private def isLongArray(t: DataType) =
    t.isInstanceOf[ArrayType] &&
      t.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(buckets.dataType) && isLongArray(counts.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucket_weight_sum expects (array<bigint>, array<bigint>), got " +
        s"${buckets.dataType.simpleString(10)}, ${counts.dataType.simpleString(10)}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = buckets.nullable || counts.nullable

  def dot(bs: ArrayData, cs: ArrayData): Long = {
    val w = weights.value
    val n = math.min(bs.numElements(), cs.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val idx = bs.getLong(i) + 1
      if (idx >= 0 && idx < w.length) acc += w(idx.toInt) * cs.getLong(i)
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(bs: Any, cs: Any): Any =
    dot(bs.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this,
      classOf[BucketWeightSum].getName)
    nullSafeCodeGen(ctx, ev, (b, c) => s"${ev.value} = $ref.dot($b, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketWeightSum =
    copy(buckets = newLeft, counts = newRight)
}
