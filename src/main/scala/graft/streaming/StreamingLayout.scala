package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout maintained UNDER A STREAM — ingest lands query-ready:
  * each micro-batch clusters its rows under the frozen bucket law and
  * writes into `__batch=bN/z_bin=K/` partitions, so a min/max-pruning
  * reader ([[prunedRead]]) sees every batch the moment it commits and
  * still prunes directories on `z_bin` (partition pruning composes across
  * the outer batch dirs).
  *
  * At-least-once safety is the [[MaterializedAgg]] idempotency shape:
  * batch `bN` DYNAMICALLY OVERWRITES its own partitions — a redelivered
  * batch rewrites the same `__batch=bN` dirs instead of double-appending,
  * and its per-batch stats partition overwrites likewise, so the
  * read-side stats merge (associative min/min, max/max, rows+rows over
  * per-batch partials) never double-counts. The law is established by
  * the FIRST batch ([[Layout.lawFor]] over its exact ranges; re-derived
  * identically under batch-0 redelivery) and frozen in `path/meta`; later
  * batches clamp out-of-range values to edge cells exactly like
  * [[Layout.mergeClustered]]. A maintenance pass can periodically fold
  * old batches into one via `Layout.writeClustered` over the read-back
  * table (the [[Compaction]] economics).
  *
  * The idempotent overwrite makes the checkpoint dir and `path` ONE
  * durable unit (the [[StreamingKnn.start]] contract): a reset
  * checkpoint restarts batchIds at 0, and the new `__batch=b0` would
  * OVERWRITE the surviving old batch 0's data — delete both dirs or
  * neither.
  */
object StreamingLayout {

  /** Idempotent micro-batch apply — the `foreachBatch` body. */
  def applyBatch(spark: SparkSession, batch: DataFrame, cols: Seq[String],
                 bits: Int, log2Bins: Int, path: String,
                 batchId: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val metaDir = new Path(s"$path/meta")
    val fs = metaDir.getFileSystem(conf)
    val law =
      if (fs.exists(metaDir)) Layout.readMeta(spark, path)
      else {
        val l = Layout.lawFor(batch, cols, bits, log2Bins)
        Layout.writeMeta(spark, path, l)
        l
      }
    val z = Layout.zorderWith(batch, law, clamp = true)
      .withColumn("__batch", lit(s"b$batchId"))
    z.repartitionByRange(col("z_bin"))
      .sortWithinPartitions("z_value")
      .write.partitionBy("__batch", "z_bin")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$path/data")
    Layout.binStats(z.drop("__batch"), "z_bin", cols)
      .withColumn("__batch", lit(s"b$batchId"))
      .write.partitionBy("__batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$path/stats")
  }

  /** Bounded read over the live layout: merge the per-batch stats
    * partials (tiny — ≤ batches · 2^log2Bins rows), select candidate bins
    * driver-side, prune `z_bin` directories, residual-filter exactly.
    */
  def prunedRead(spark: SparkSession, path: String,
                 bounds: Seq[(String, Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "need at least one bound")
    val aggs = bounds.map(_._1).distinct.flatMap(c =>
      Seq(min(col(s"${c}_min")).as(s"${c}_min"),
        max(col(s"${c}_max")).as(s"${c}_max")))
    val merged = spark.read.parquet(s"$path/stats")
      .groupBy("bin").agg(aggs.head, aggs.tail: _*)
    val hit = bounds.map { case (c, lo, hi) =>
      col(s"${c}_min") <= lit(hi) && col(s"${c}_max") >= lit(lo)
    }.reduce(_ && _)
    val bins = merged.filter(hit).select("bin").collect().map(_.getLong(0))
    spark.read.parquet(s"$path/data")
      .filter(col("z_bin").isin(bins.toIndexedSeq.map(Long.box): _*))
      .filter(bounds.map { case (c, lo, hi) =>
        col(c) >= lit(lo) && col(c) <= lit(hi)
      }.reduce(_ && _))
  }
}
