package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Snapshot-then-stream bootstrap (S11/T10/O3) — the reference's
  * `fullSyncWorkflow` (`setup.md:221-249,1278-1292`):
  *
  *  1. capture a safe replay offset BEFORE the snapshot export starts;
  *  2. bulk-load the snapshot into the target table;
  *  3. stream from the captured offset, so changes that happened during the
  *     export replay OVER the snapshot — the overlap is de-duplicated by the
  *     latest-wins fold (O3: snapshot ∪ stream merge).
  *
  * Driver-side orchestration is plain Scala control flow around Spark jobs;
  * each step is resumable because the stream's checkpoint carries the
  * offset and the snapshot write is idempotent (overwrite).
  */
object Bootstrap {

  /** Current max replay ID of the log — the "safe offset" captured before a
    * snapshot export (reference captures it by peeking one event,
    * `setup.md:245-249`; here the log's file names carry it, so it's a pure
    * listing).
    */
  def captureOffset(path: String): Long =
    graft.sources.ChangeEventLog.listFiles(path)
      .map(graft.sources.ChangeEventLog.fileMaxReplayId).foldLeft(0L)(math.max)

  /** Full bootstrap: write `snapshot` as the target's initial state, then
    * start the change-log stream from `capturedOffset`. Returns the running
    * query; the caller owns lifecycle (cancellation = stopping the query,
    * matching the workflow's cancellable semantics).
    */
  def snapshotThenStream(spark: SparkSession, snapshot: DataFrame,
                         logDir: String,
                         targetDir: String, checkpointDir: String,
                         dataCols: Seq[String], key: String = "sfId",
                         numBuckets: Int = CdcIngest.DefaultNumBuckets,
                         commitDir: Option[String] = None,
                         nowMillis: Long = System.currentTimeMillis()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    val capturedOffset = captureOffset(logDir)
    // write the snapshot in the ingest target's bucket layout so the
    // streaming merge can prune/rewrite per bucket from the first batch
    snapshot
      .withColumn("__bucket", CdcIngest.bucketOf(col(key), numBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(targetDir)
    // T2/T4: record the snapshot itself as a commit at the captured offset,
    // so a just-resynced topic is no longer flagged stale even before the
    // first post-snapshot event arrives (the reference's fullSync updates
    // cdcSyncState.lastSyncStartedAt, setup.md:1278-1292). batchId=-1 is
    // reserved for the snapshot row; stream batches re-number from 0.
    commitDir.foreach { cd =>
      SyncState.commitOffsets(
        snapshot.limit(1).select(lit(capturedOffset).as("replayId")),
        batchId = -1L, lit(new org.apache.hadoop.fs.Path(targetDir).getName),
        col("replayId"), cd, nowMillis)
    }
    val stream = spark.readStream
      .format("graft.sources.ChangeEventLogProvider")
      .option("path", logDir)
      .option("startingReplayId", capturedOffset.toString)
      .load()
    CdcIngest.startWith(spark, stream, targetDir, checkpointDir, dataCols,
      commitDir = commitDir)
  }
}
