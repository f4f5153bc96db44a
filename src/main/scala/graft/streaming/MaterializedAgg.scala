package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregate table (a streaming materialized
  * view): per-key counts and exact-decimal sums kept current under a
  * change stream WITHOUT ever recomputing the full aggregate — the
  * streaming rendering of the reference's per-topic event counters
  * (`setup.md` ingest metrics), generalized to any grouped additive
  * aggregate.
  *
  * Layout: `targetDir/__batch=b<id>/` holds micro-batch `id`'s PARTIAL
  * aggregate (one groupBy of the batch — map-side combinable, O(batch)).
  * The write is an overwrite of exactly that partition directory, so
  * redelivery of a batch after a crash is IDEMPOTENT — it overwrites the
  * same partials with the same content, never double-counts (the classic
  * batchId-keyed `foreachBatch` exactly-once pattern). A redelivered batch
  * whose partition was already FOLDED AWAY by [[compact]] (crash before
  * checkpoint commit, compact before restart) is detected via the fold's
  * batch-id tag and skipped, not rewritten — see [[upsertBatch]]. No
  * target read on the hot path at all: per-batch cost is O(batch) plus
  * one directory listing, independent of both table and history size.
  *
  * Reads ([[read]]) merge the partials with one groupBy — associative
  * (counts and decimal sums), so any subset of batch partitions merges
  * correctly. Read cost grows with the number of batch partitions;
  * [[compact]] folds them back to one.
  *
  * Compaction crash safety (additive partials tolerate NEITHER loss NOR
  * duplication, so the swap is manifest-arbitrated):
  *  1. the fold is written to a staging dir, together with a `_SOURCES`
  *     manifest naming the partitions it folded, then `_SUCCESS`;
  *  2. the source partitions are deleted;
  *  3. the compacted partition renames into the table; staging is removed.
  * [[recover]] (run by every writer entry point) finishes an interrupted
  * run from the manifest: with `_SUCCESS` present it re-deletes any listed
  * source still on disk, renames the fold in if missing, and drops
  * staging; without `_SUCCESS` the sources were never touched and the
  * staging wreckage is discarded. Readers can transiently under-report
  * between 2 and 3, but can never double-count, and the next write
  * converges the table.
  */
object MaterializedAgg {

  /** Partial aggregate of one batch: count + exact-decimal sum per value
    * column, grouped by `keyCols`. Decimal(28,6) holds 2-decimal currency
    * sums to ~10^21 rows per key.
    */
  private def partial(batch: DataFrame, keyCols: Seq[String],
                      valueCols: Seq[String]): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(v =>
          sum(col(v).cast(DecimalType(28, 6))).as(s"sum_$v")): _*)

  /** Apply one micro-batch: write its partial aggregate to the batch's own
    * partition (idempotent overwrite — safe under redelivery).
    *
    * Redelivery of an ALREADY-COMPACTED batch is skipped entirely: if the
    * stream crashed after this partition was written but before the
    * checkpoint committed, and a compact() ran before restart, the batch's
    * rows live on inside the `c` fold (whose tag is ≥ this batchId) while
    * its own partition is gone — rewriting it would count the batch twice.
    * Checkpointed replay of a batch is deterministic, so "id ≤ newest fold
    * tag" is exactly "already folded" and skipping is safe.
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  targetDir: String, keyCols: Seq[String],
                  valueCols: Seq[String]): Unit =
    PartialLog.upsertBatch(spark, targetDir, batchId,
      partial(batch, keyCols, valueCols))

  /** Start the checkpointed incremental maintenance. */
  def start(spark: SparkSession, stream: DataFrame, targetDir: String,
            checkpointDir: String, keyCols: Seq[String],
            valueCols: Seq[String],
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          upsertBatch(spark, batch, batchId, targetDir, keyCols, valueCols)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The current aggregate: merge all batch partials (associative), with
    * counts and exact-decimal sums per value column. One small groupBy over
    * ≤ batches·keys partial rows — never a scan of the ingested data.
    */
  def read(spark: SparkSession, targetDir: String, keyCols: Seq[String],
           valueCols: Seq[String]): DataFrame =
    PartialLog.readRecovered(spark, targetDir)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        valueCols.map(v => sum(s"sum_$v").as(s"sum_$v")): _*)

  /** Fold every batch partition into one, bounding read cost. Safe to run
    * between (not during) writer batches; crash-recoverable via the
    * staging manifest (see object scaladoc).
    */
  def compact(spark: SparkSession, targetDir: String, keyCols: Seq[String],
              valueCols: Seq[String]): Unit =
    // cast the re-aggregated sums back to the partial-side type: sum over
    // DECIMAL(28,6) widens to (38,6), and a table whose partitions disagree
    // on decimal width makes mergeSchema-less reads depend on which file's
    // footer Spark samples first
    PartialLog.compact(spark, targetDir)(
      read(spark, targetDir, keyCols, valueCols)
        .select(keyCols.map(col) ++ (col("cnt") +:
          valueCols.map(v =>
            col(s"sum_$v").cast(DecimalType(28, 6)).as(s"sum_$v"))): _*))
}
