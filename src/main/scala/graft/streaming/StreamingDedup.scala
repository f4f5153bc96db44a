package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Streaming corpus deduplication: first-seen exact dedup over a document
  * stream, with a PERSISTENT fingerprint index — the streaming rendering of
  * [[graft.operators.Dedup.exactGroups]] for continuous ingest (new crawl
  * snapshots arriving as a stream, only never-seen-before documents
  * admitted to the corpus).
  *
  * Per micro-batch (inside `foreachBatch`, checkpointed):
  *  1. fingerprint each doc (md5 of normalized text) and fold the batch
  *     to one candidate per fingerprint (min id — deterministic);
  *  2. anti-join against ONLY the fingerprint-index buckets the batch
  *     touches (`__bucket = pmod(xxhash64(fp), N)` partition pruning — the
  *     same layout contract as the ingest MERGE target);
  *  3. append the survivors to the output corpus AND their fingerprints to
  *     the index's touched buckets (append-only: dedup state only grows,
  *     so no read-modify-write of existing files, unlike the MERGE sink).
  *
  * At-least-once safe: a redelivered batch's fingerprints are already in
  * the index, so its docs anti-join away — output duplicates can only
  * arise from a crash BETWEEN the two appends in one batch, the same
  * at-least-once window every foreachBatch sink has; downstream exact
  * dedup of the (small) output, or idempotent-by-id consumers, absorb it.
  *
  * Scale shape: one shuffle for the per-fp fold, one bucket-pruned join
  * per batch; index I/O is O(batch + touched buckets), never O(corpus).
  */
object StreamingDedup {

  /** One micro-batch of first-seen dedup. Returns the survivors written. */
  def dedupBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                 textCol: String, indexDir: String, outDir: String,
                 numBuckets: Int = CdcIngest.DefaultNumBuckets): Unit = {
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // 1. fingerprint + within-batch fold (keep the smallest id per fp)
    val withFp = batch.withColumn("__fp", md5(TextOps.normalized(col(textCol))))
    val folded = withFp
      .groupBy("__fp")
      .agg(min_by(struct(batch.columns.map(col): _*), col(idCol)).as("doc"))
      .select(col("__fp"), col("doc.*"))
      .withColumn("__bucket", CdcIngest.bucketOf(col("__fp"), numBuckets))
      .cache()
    try {
      // 2. anti-join against only the touched index buckets
      val touched = folded.select("__bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      val survivors =
        if (!fs.exists(new Path(indexDir)) || touched.isEmpty) folded
        else {
          val seen = spark.read.parquet(indexDir)
            .filter(col("__bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
            .select(col("fp").as("__fp"))
          folded.join(seen, Seq("__fp"), "left_anti")
        }

      // 3. append survivors to the corpus, fingerprints to the index
      val out = survivors.cache()
      try {
        if (!out.isEmpty) {
          out.drop("__fp", "__bucket")
            .write.mode("append").parquet(outDir)
          out.select(col("__fp").as("fp"), col("__bucket"))
            .write.mode("append").partitionBy("__bucket").parquet(indexDir)
        }
      } finally out.unpersist()
    } finally folded.unpersist()
  }

  /** Start the checkpointed streaming dedup. */
  def start(spark: SparkSession, stream: DataFrame, idCol: String,
            textCol: String, indexDir: String, outDir: String,
            checkpointDir: String,
            numBuckets: Int = CdcIngest.DefaultNumBuckets,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retry.withBackoff() {
          dedupBatch(spark, batch, idCol, textCol, indexDir, outDir, numBuckets)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
