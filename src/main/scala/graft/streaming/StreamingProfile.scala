package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{kll_agg, kll_merge_agg, kll_quantiles, mg_agg, mg_items, mg_merge_agg}
import graft.operators.TextOps

/** Streaming corpus profiling — the data card maintained INCREMENTALLY
  * under a document stream, without ever re-reading ingested data: each
  * micro-batch condenses to ONE profile row (doc/token counts + a
  * Misra–Gries token-frequency sketch + a KLL document-length sketch),
  * persisted in the [[PartialLog]] `__batch=b<id>/` layout (idempotent
  * overwrite per batch, so redelivery cannot double-count; compaction
  * folds history crash-safely with the [[MaterializedAgg]] manifest
  * machinery).
  *
  * Everything in the profile row is MERGEABLE — counts add, MG merges
  * under the Agarwal et al. bound (every token with corpus frequency
  * > N/(capacity+1) survives), KLL merges losslessly in its rank-error
  * contract — so [[read]] produces corpus-level heavy hitters and length
  * quantiles from ≤ #batches tiny rows. The same rows double as SHARD
  * profiles: ship them with a dataset release and downstream consumers
  * re-merge statistics across releases without touching the text.
  */
object StreamingProfile {

  /** One profile row for a (micro-)batch of documents. */
  def profileRow(batch: DataFrame, textCol: String,
                 capacity: Int = 256, kllK: Int = 200): DataFrame = {
    val toks = batch.select(size(TextOps.tokens(col(textCol)))
        .cast("long").as("n_toks"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    // one pass over the exploded token stream: the doc count rides the
    // first-position marker so docs and tokens agree with the same scan
    batch.agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("n_tokens"),
        kll_agg(size(TextOps.tokens(col(textCol))).cast("double"), kllK)
          .as("len_sketch"))
      .crossJoin(
        toks.agg(mg_agg(col("tok"), capacity).as("tok_sketch")))
  }

  /** Apply one micro-batch (idempotent; skips batches already folded). */
  def upsertBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  profileDir: String, textCol: String,
                  capacity: Int = 256, kllK: Int = 200): Unit =
    PartialLog.upsertBatch(spark, profileDir, batchId,
      profileRow(batch, textCol, capacity, kllK))

  /** Start checkpointed profile maintenance over a document stream. */
  def start(spark: SparkSession, stream: DataFrame, profileDir: String,
            checkpointDir: String, textCol: String,
            capacity: Int = 256, kllK: Int = 200,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          upsertBatch(spark, batch, batchId, profileDir, textCol,
            capacity, kllK)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The merged corpus profile: one row with totals plus the merged
    * sketches, decoded — heavy-hitter survivors (est desc) and length
    * quantiles at `ranks`. Cost: one pass over ≤ #batches profile rows.
    */
  def read(spark: SparkSession, profileDir: String,
           capacity: Int = 256, kllK: Int = 200,
           ranks: Seq[Double] = Seq(0.1, 0.5, 0.9)): DataFrame =
    PartialLog.readRecovered(spark, profileDir)
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        mg_merge_agg(col("tok_sketch"), capacity).as("tok_sketch"),
        kll_merge_agg(col("len_sketch"), kllK).as("len_sketch"))
      .select(col("n_docs"), col("n_tokens"),
        mg_items(col("tok_sketch")).as("top_tokens"),
        kll_quantiles(col("len_sketch"), ranks).as("len_quantiles"))

  /** Fold all profile rows into one partition (crash-safe manifest swap);
    * the merged sketches stay re-mergeable with future batches.
    */
  def compact(spark: SparkSession, profileDir: String,
              capacity: Int = 256, kllK: Int = 200): Unit =
    PartialLog.compact(spark, profileDir)(
      spark.read.parquet(profileDir)
        .agg(sum("n_docs").cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("n_tokens"),
          mg_merge_agg(col("tok_sketch"), capacity).as("tok_sketch"),
          kll_merge_agg(col("len_sketch"), kllK).as("len_sketch")))
}
