package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.CdcFold

/** Structured-Streaming ingest of a replayable change-event log into a
  * latest-wins materialized table — the Spark-native rendering of the
  * reference's subscribe → decode → upsert pipeline
  * (`index.ts:26-87`, `setup.md:1137-1156`):
  *
  *  - source: append-only file log (stand-in for the gRPC subscribe source
  *    S1; same offset/replay semantics via the file-source's committed log);
  *  - per micro-batch: latest-wins fold + MERGE into the target (S8/S9),
  *    duplicates across redelivery neutralized by replay-ID monotonicity
  *    (T6) — the fold is idempotent, and the target overwrite is
  *    batchId-agnostic so restarts re-applying a batch converge to the
  *    same state;
  *  - checkpointed resume (T1): offsets live in `checkpointDir`, so a
  *    restarted query continues after the last committed batch;
  *  - dead-letter side output (S10): rows failing the validity predicate
  *    are appended to `<targetDir>_dead_letter` with their replay IDs.
  *
  * Scale notes: the only shuffle is the per-key window inside the fold,
  * keyed on `key` — the minimal movement for keyed upsert. The target
  * rewrite is the no-Delta-dependency MERGE emulation (SURVEY §7.4.1); on a
  * real deployment the target write would be a partitioned overwrite of
  * only affected partitions (partition by bucket(key)).
  */
object CdcIngest {

  /** Merge one (micro-)batch into the parquet target at `targetDir`.
    * Read-modify-overwrite with a staging directory + atomic-ish rename so
    * a crash mid-write never leaves a half-written target; re-running the
    * same batch after restart converges (idempotent MERGE).
    */
  def mergeIntoTarget(spark: SparkSession, batch: DataFrame, targetDir: String,
                      dataCols: Seq[String], key: String, offset: String,
                      changeType: String): Unit = {
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = if (fs.exists(new Path(targetDir))) {
      spark.read.parquet(targetDir)
    } else {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(batch.select(dataCols.map(col): _*).schema.fields))
    }
    val merged = CdcFold.mergeBatch(target, batch, key, offset, changeType)
    val staging = new Path(targetDir + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(targetDir)
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(staging, dest)
  }

  /** Start the ingest stream over a parquet file log. `valid` filters rows
    * into the main path; failing rows go to the dead-letter table.
    */
  def start(spark: SparkSession, logDir: String, logSchema: StructType,
            targetDir: String, checkpointDir: String, dataCols: Seq[String],
            key: String = "sfId", offset: String = "replayId",
            changeType: String = "changeType",
            valid: DataFrame => DataFrame = identity,
            availableNow: Boolean = true): StreamingQuery =
    startWith(spark, spark.readStream.schema(logSchema).parquet(logDir),
      targetDir, checkpointDir, dataCols, key, offset, changeType, valid,
      availableNow)

  /** Same, over an arbitrary streaming DataFrame (e.g. the `cdc-log` DSv2
    * source with replay positioning).
    */
  def startWith(spark: SparkSession, stream: DataFrame,
                targetDir: String, checkpointDir: String, dataCols: Seq[String],
                key: String = "sfId", offset: String = "replayId",
                changeType: String = "changeType",
                valid: DataFrame => DataFrame = identity,
                availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val checked = valid(batch).cache()
        try {
          val bad = batch.exceptAll(checked)
          if (!bad.isEmpty) {
            bad.withColumn("dead_letter_at", current_timestamp())
              .write.mode("append").parquet(targetDir + "_dead_letter")
          }
          mergeIntoTarget(spark, checked, targetDir, dataCols, key, offset, changeType)
        } finally checked.unpersist()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Per-topic routed ingest (P7 + S8's `tableForTopic`,
    * `setup.md:1130-1134`): one materialized table per topic under
    * `targetRoot/<topic>`. The batch's topic list is collected driver-side
    * (it is the set of topic NAMES, bounded by the subscription list, not
    * data volume) and each topic's slice merges into its own table —
    * per-topic ordering falls out of the per-key fold within each slice.
    */
  def startRouted(spark: SparkSession, stream: DataFrame, topicCol: String,
                  targetRoot: String, checkpointDir: String,
                  dataCols: Seq[String], key: String = "sfId",
                  offset: String = "replayId", changeType: String = "changeType",
                  availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          val topics = b.select(topicCol).distinct().collect().map(_.getString(0))
          topics.foreach { t =>
            mergeIntoTarget(spark, b.filter(col(topicCol) === t),
              s"$targetRoot/$t", dataCols, key, offset, changeType)
          }
        } finally b.unpersist()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
