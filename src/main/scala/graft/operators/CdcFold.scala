package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins materialization of a change log — the reference's core
  * semantic: "ignore an event if its replayId is ≤ the stored one for that
  * record" (`setup.md:542,772`), plus delete-through for
  * `changeType = 'DELETE'` (`setup.md:806-809`).
  *
  * Scale notes: one shuffle on the key (window partition), no driver-side
  * state; at 100 TB the shuffle is keyed on `sfId`-cardinality which is the
  * minimum possible data movement for this semantic. Duplicate replayIds
  * (at-least-once delivery, T6) are neutralized by a deterministic
  * tiebreaker on the full ordering.
  */
object CdcFold {

  /** Keep the highest-`offset` row per `key` (W1 latest-wins ranking). */
  def latestWins(df: DataFrame, key: Column, offset: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(offset.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skew-immune twin of [[latestWins]]: the whole row with the maximum
    * `offset` per key under a HASH aggregate instead of a `row_number`
    * window. PARTIAL aggregation combines a hot key's rows map-side, so a
    * key holding 20 % of the corpus costs one reducer a single
    * pre-combined record per upstream partition — where the window form
    * must sort that key's entire row set in one task.
    *
    * Implementation (r18): [[graft.functions.max_by_row]], a
    * TypedImperativeAggregate, so the plan is an ObjectHashAggregate. The
    * obvious `max_by(struct(...), offset)` is NOT equivalent at scale: a
    * declarative buffer holding strings/arrays is non-mutable and Spark
    * silently demotes the whole aggregate to SortAggregate — a map-side
    * sort per partition that buys nothing here (the r15 buffer-mutability
    * lesson, now with the fix instead of the fallback).
    *
    * Requires `offset` to be UNIQUE per key (true for replay ids within a
    * topic, `setup.md:542`): on duplicate offsets `max_by_row` breaks ties
    * by a deterministic byte order, while the window form breaks them by
    * its full sort order, so the two can disagree — callers with
    * at-least-once duplicate offsets keep [[latestWins]]. Equality of the
    * two paths under a planted 20 % hot key is asserted in the ScaleSmoke
    * `coreskew` stage; the declared `q10b_latest_wins_agg` query gates the
    * output against q10's oracle.
    */
  def latestWinsAgg(df: DataFrame, key: Column, offset: Column): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(key)
      .agg(graft.functions.max_by_row(payload, offset).as("__row"))
      .select(col("__row.*"))
  }

  /** Fold a change log to final table state: latest-wins per key, then
    * delete-through rows whose winning change is a DELETE (S8 + S9).
    */
  def fold(changeLog: DataFrame, key: Column, offset: Column,
           changeType: Column, deleteType: String = "DELETE"): DataFrame =
    latestWins(changeLog, key, offset).filter(changeType =!= deleteType)

  /** Batch MERGE emulation (S8): apply a folded change batch over a target
    * snapshot keyed by `key` — upsert matched/new keys, delete-through
    * DELETEs. Emulates `MERGE INTO target USING batch ON t.key = b.key
    * WHEN MATCHED AND b.type='DELETE' THEN DELETE WHEN MATCHED THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT` without a Delta dependency.
    *
    * Requires `target` and `changes` to share the data schema; `changes`
    * additionally carries `offsetCol` + `changeTypeCol`.
    */
  def mergeBatch(target: DataFrame, changes: DataFrame, keyCol: String,
                 offsetCol: String, changeTypeCol: String,
                 deleteType: String = "DELETE"): DataFrame = {
    val dataCols = target.columns.toSeq
    val folded = latestWins(changes, col(keyCol), col(offsetCol))
    val survivors = folded.filter(col(changeTypeCol) =!= deleteType)
      .select(dataCols.map(col): _*)
    val touched = folded.select(col(keyCol)).distinct()
    // anti-join drops every key the batch touched (updates + deletes);
    // union re-inserts the surviving new versions.
    target.join(touched, Seq(keyCol), "left_anti").unionByName(survivors)
  }
}
