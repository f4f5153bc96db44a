package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Count-min sketch maintained INCREMENTALLY under a document stream —
  * the point-frequency side of the streaming data card
  * ([[StreamingProfile]] carries the Misra–Gries survivor set; this
  * carries "how frequent is THIS term" for arbitrary probes), and the
  * live half of a drift monitor: freeze a reference grid from the
  * training corpus, keep this one rolling over the ingest stream, and
  * compare term estimates whenever the alarm fires.
  *
  * Each micro-batch condenses to its own `depth×width`-bounded grid in
  * the [[PartialLog]] `__batch=b<id>/` layout — idempotent overwrite per
  * batch, so redelivery cannot double-count — and grids ADD pointwise
  * (the sum-combinable sketch property, [[TextAnalysis.countMinMerge]]),
  * so [[read]] folds ≤ `#batches · depth · width` tiny rows and the
  * merged grid is BIT-EQUAL to one built over the whole history in
  * batch, which is exactly what the spec pins. [[compact]] folds the
  * per-batch partitions crash-safely with the [[MaterializedAgg]]
  * manifest machinery; the compacted grid stays re-mergeable with
  * future batches.
  */
object StreamingCms {

  /** Apply one micro-batch (idempotent; skips/overwrites batches already
    * folded).
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  gridDir: String, textCol: String, depth: Int = 4,
                  width: Int = 1024): Unit =
    PartialLog.upsertBatch(spark, gridDir, batchId,
      TextAnalysis.countMinGrid(batch, textCol, depth, width))

  /** Start checkpointed grid maintenance over a document stream. */
  def start(spark: SparkSession, stream: DataFrame, gridDir: String,
            checkpointDir: String, textCol: String, depth: Int = 4,
            width: Int = 1024, availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          upsertBatch(spark, batch, batchId, gridDir, textCol, depth, width)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The merged corpus grid `(row_i, col_j, cnt)`. */
  def read(spark: SparkSession, gridDir: String): DataFrame =
    PartialLog.readRecovered(spark, gridDir)
      .groupBy("row_i", "col_j").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `terms` against the merged grid. */
  def estimate(spark: SparkSession, gridDir: String, terms: Seq[String],
               depth: Int = 4, width: Int = 1024): DataFrame =
    TextAnalysis.countMinEstimate(read(spark, gridDir), terms, depth, width)

  /** Fold all per-batch grids into one partition (crash-safe manifest
    * swap); the folded grid stays re-mergeable with future batches.
    */
  def compact(spark: SparkSession, gridDir: String): Unit =
    PartialLog.compact(spark, gridDir)(read(spark, gridDir))
}
