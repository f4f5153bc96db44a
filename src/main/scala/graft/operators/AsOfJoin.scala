package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right row
  * (same key, `right.ts <= left.ts`).
  *
  * Implementation is the union + ordered-window carry-forward pattern:
  * tag both sides, union, and `last(value, ignoreNulls)` over
  * `(key) ORDER BY (ts, tag, tieBreak) ROWS UNBOUNDED PRECEDING..CURRENT` —
  * right rows sort before left rows at equal timestamps, so the inclusive
  * `<=` semantic falls out of the sort order.
  *
  * Scale: ONE shuffle on the key (the window partition), no range
  * explosion, no broadcast requirement on either side — this is the shape
  * that survives both sides being large, unlike a broadcast-nested-loop
  * range condition. Skewed keys can be salted upstream.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    *                  (renamed as given in `as` pairs)
    * @param tieBreak  right-side column ordering rows that share a
    *                  timestamp (latest wins), for determinism
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[(String, String)],
               tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rv = struct(valueCols.map { case (c, as) => col(c).as(as) }: _*)

    val rightSide = right.select(
      col(key).as("__key"), col(rightTs).as("__ts"),
      col(tieBreak).as("__tb"), lit(0).as("__tag"),
      rv.as("__rv"), lit(null).cast(left.schema).as("__lv"))
    val leftSide = left.select(
      col(key).as("__key"), col(leftTs).as("__ts"),
      lit(Long.MaxValue).as("__tb"), lit(1).as("__tag"),
      lit(null).cast(rightSide.schema("__rv").dataType).as("__rv"),
      struct(leftCols.map(col): _*).as("__lv"))

    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSide.unionByName(leftSide)
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
        valueCols.map { case (_, as) => col(s"__carried.$as").as(as) }: _*)
  }
}
