package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CdcFold

/** Control-plane tables + watchdog — the reference's `cdcSyncState` /
  * `cdcCheckpoints` / stale-replay cron (`setup.md:933-957,1325-1348`),
  * kept as small DataFrames over parquet.
  *
  * Schema (FIXTURES A.6): `topicName STRING, lastReplayId LONG,
  * snapshotCompleted BOOLEAN, lastSyncStartedAt LONG,
  * fullResyncRequested BOOLEAN, errorCount LONG`.
  */
object SyncState {

  /** Max-offset checkpoint aggregation over a processed batch (A1):
    * one row per topic with the highest replay ID seen.
    */
  def checkpointAgg(batch: DataFrame, topicCol: String, offsetCol: String): DataFrame =
    batch.groupBy(col(topicCol).as("topicName"))
      .agg(max(col(offsetCol)).as("lastReplayId"), count(lit(1)).as("eventCount"))

  /** Latest-wins upsert of new checkpoints into the sync-state table
    * (keyed by topicName, monotone on lastReplayId).
    */
  def advance(state: DataFrame, checkpoints: DataFrame): DataFrame =
    CdcFold.latestWins(
      state.select("topicName", "lastReplayId")
        .unionByName(checkpoints.select("topicName", "lastReplayId")),
      col("topicName"), col("lastReplayId"))

  /** Stale-replay watchdog (T4/O2): flag topics whose checkpoint is older
    * than `staleMillis` (reference: 70 h vs the 72 h retention window,
    * `setup.md:376`) — these need a full resync (T3 recovery path).
    */
  def staleTopics(state: DataFrame, nowMillis: Long,
                  staleMillis: Long = 70L * 3600 * 1000): DataFrame =
    state.filter(col("lastSyncStartedAt") < nowMillis - staleMillis)
      .withColumn("fullResyncRequested", lit(true))

  /** Failure-rate report (A3): dead-letter counts per topic over a window —
    * the workpool's backlog/failure reporting analog (`setup.md:743`).
    */
  def failureReport(deadLetter: DataFrame, topicCol: String): DataFrame =
    deadLetter.groupBy(col(topicCol).as("topicName"))
      .agg(count(lit(1)).as("failureCount"),
        max(col("dead_letter_at")).as("lastFailureAt"))

  /** Per-topic offset commit (T2) — the managed-subscription
    * `commitReplayId` analog (`client.js:515-541`). One row per (batch,
    * topic): the topic's max replay ID in the batch, the event count, and
    * the commit time. Rows land under `commitDir/batchId=N/` with overwrite,
    * so a batch re-delivered after a restart rewrites its own partition with
    * identical content — the reference's UUID-request-id dedup becomes
    * directory-keyed idempotence.
    */
  def commitOffsets(batch: DataFrame, batchId: Long, topic: Column,
                    offsetCol: Column, commitDir: String,
                    nowMillis: Long = System.currentTimeMillis()): Unit =
    batch.groupBy(topic.as("topicName"))
      .agg(max(offsetCol).as("lastReplayId"), count(lit(1)).as("eventCount"))
      .withColumn("committedAt", lit(nowMillis))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$commitDir/batchId=$batchId")

  /** Latest committed offset per topic over the whole commit log — the
    * external-store view a restarted worker would resume from. Emits the
    * sync-state columns ([[staleTopics]] reads `lastSyncStartedAt`).
    */
  def committedOffsets(spark: SparkSession, commitDir: String): DataFrame =
    spark.read.parquet(commitDir)
      .groupBy("topicName")
      .agg(max("lastReplayId").as("lastReplayId"),
        sum("eventCount").as("eventCount"),
        max("committedAt").as("lastSyncStartedAt"))

  /** Close the T3/T4 loop (`setup.md:259,306,1331-1348`): topics whose last
    * commit is older than `staleMillis` (i.e. past the log's retention
    * window — their checkpoint can no longer be replayed) get a full resync
    * via `resync`, typically [[Bootstrap.snapshotThenStream]] with a fresh
    * checkpoint dir. Returns the topics resynced, sorted.
    */
  def resyncIfStale(spark: SparkSession, commitDir: String, nowMillis: Long,
                    staleMillis: Long = 70L * 3600 * 1000)
                   (resync: String => Unit): Seq[String] = {
    val stale = staleTopics(committedOffsets(spark, commitDir), nowMillis, staleMillis)
      .select("topicName").collect().map(_.getString(0)).toSeq.sorted
    stale.foreach(resync)
    stale
  }
}
