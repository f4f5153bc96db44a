package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
