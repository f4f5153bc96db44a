package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Classifier

/** Streaming Naive Bayes training — the counts-are-associative
  * counterpart of [[StreamingLr]]: each micro-batch contributes its
  * per-(label, bucket) feature counts and per-label document counts as an
  * idempotent [[PartialLog]] partial, and the model is DERIVED from the
  * merged counts at read time. Because NB training is a pure count
  * aggregate, the streamed model is BIT-IDENTICAL to batch
  * [[Classifier.nbTrain]] over the same documents — not just
  * equivalent-up-to-rounding (spec-asserted) — and arrives without ever
  * re-reading ingested data.
  *
  * Layout: one partial relation `(label, b, n)` per batch, with the
  * per-label document count riding the `b = -1` row (the
  * [[StreamingLr]] bias-bucket trick). Redelivery overwrites the batch's
  * own partition; compaction folds history crash-safely via the shared
  * manifest machinery.
  */
object StreamingNb {

  /** One batch's partial: hashed-feature counts + the `b = -1` doc-count
    * row per label.
    */
  def partial(batch: DataFrame, idCol: String, textCol: String,
              labelCol: String, buckets: Int): DataFrame = {
    val f = Classifier.featureRows(batch, idCol, textCol, buckets)
      .join(batch.select(col(idCol).as("id"), col(labelCol).as("label")), "id")
      .groupBy("label", "b").agg(count(lit(1)).as("n"))
    f.unionByName(
      batch.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("n"))
        .select(col("label"), lit(-1L).as("b"), col("n")))
  }

  /** Apply one micro-batch (idempotent; skips batches already folded). */
  def upsertBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  countsDir: String, idCol: String, textCol: String,
                  labelCol: String, buckets: Int = 4096): Unit =
    PartialLog.upsertBatch(spark, countsDir, batchId,
      partial(batch, idCol, textCol, labelCol, buckets))

  /** Start checkpointed incremental NB training. */
  def start(spark: SparkSession, stream: DataFrame, countsDir: String,
            checkpointDir: String, idCol: String, textCol: String,
            labelCol: String, buckets: Int = 4096,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          upsertBatch(spark, batch, batchId, countsDir, idCol, textCol,
            labelCol, buckets)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Derive the current `(model, priors)` from the merged count partials —
    * numerically identical to [[Classifier.nbTrain]] on the ingested
    * corpus (same smoothed-log formulas on the same counts). Feed straight
    * to [[Classifier.nbScore]].
    */
  def currentModel(spark: SparkSession, countsDir: String,
                   buckets: Int = 4096,
                   smoothK: Double = 0.5): (DataFrame, DataFrame) = {
    val merged = PartialLog.readRecovered(spark, countsDir)
      .groupBy("label", "b").agg(sum("n").cast("long").as("n"))
    val totals = merged.filter(col("b") >= 0)
      .groupBy("label").agg(sum("n").as("t"))
    val model = merged.filter(col("b") >= 0).join(totals, "label")
      .select(col("label"), col("b"),
        round(log((col("n") + smoothK) / (col("t") + smoothK * buckets)),
          6).as("llh"))
    val nDocs = merged.filter(col("b") === -1L)
      .agg(sum("n")).head().getLong(0).toDouble
    val priors = merged.filter(col("b") === -1L)
      .select(col("label"), col("n").as("nc"))
      .join(totals, "label")
      .select(col("label"),
        round(log(col("nc") / nDocs), 6).as("prior"),
        round(log(lit(smoothK) / (col("t") + smoothK * buckets)),
          6).as("llh0"))
    (model, priors)
  }

  /** Fold the count log to one partition (crash-safe manifest swap). */
  def compact(spark: SparkSession, countsDir: String): Unit =
    PartialLog.compact(spark, countsDir)(
      spark.read.parquet(countsDir)
        .groupBy("label", "b").agg(sum("n").cast("long").as("n")))
}
