package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Publish sink (S5/S6): append a batch of events to a replayable
  * change-event log in the `cdc-log` layout (`events-<maxReplayId>.jsonl`),
  * assigning monotonically increasing replay IDs — the in-engine equivalent
  * of the reference's `Publish`/`PublishStream` RPCs (`client.js:550-709`),
  * whose acks return the assigned replay IDs.
  *
  * Publish batches are small by contract (the reference caps at 100 events
  * per request, `client.js:46-49`), so the single-file write per batch is
  * the right shape; large-scale appends go through many batches, exactly
  * like the reference's flow control.
  */
object Publish {

  /** Append `batch` (columns: sfId, changeType, data) to the log at
    * `logDir`; returns the (firstReplayId, lastReplayId) range assigned —
    * the publish "acks".
    */
  def append(spark: SparkSession, batch: DataFrame, logDir: String): (Long, Long) = {
    val base = Bootstrap.captureOffset(logDir)
    // deterministic publish order within the batch: caller's sort columns
    // first, then a total tiebreak on all columns via a single window.
    val w = Window.orderBy(batch.columns.map(col): _*)
    val withIds = batch.withColumn("replayId", row_number().over(w) + base)
      .select("replayId", "sfId", "changeType", "data")

    val staging = s"$logDir/__publish_staging"
    withIds.coalesce(1).write.mode("overwrite").json(staging)

    val fs = new Path(logDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(staging))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val last = base + batch.count()
    fs.rename(part, new Path(logDir, s"events-$last.jsonl"))
    fs.delete(new Path(staging), true)
    (base + 1, last)
  }
}
