package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Publish sink (S5/S6): append a batch of events to a replayable
  * change-event log in the `cdc-log` layout (`events-<maxReplayId>-n<rows>.jsonl`),
  * assigning monotonically increasing replay IDs — the in-engine equivalent
  * of the reference's `Publish`/`PublishStream` RPCs (`client.js:550-709`),
  * whose acks return the assigned replay IDs.
  *
  * Publish batches are small by contract (the reference caps at 100 events
  * per request, `client.js:46-49`), so the single-file write per batch is
  * the right shape; large-scale appends go through many batches, exactly
  * like the reference's flow control.
  */
object Publish {

  /** Envelope columns written to the log: the core four always; the
    * per-event `schemaId` (registry-dispatched decode, `proto:58`) and
    * `headers` (`proto:65`) ride along when the batch carries them.
    */
  private def envelopeCols(batch: DataFrame): Seq[String] =
    Seq("replayId", "sfId", "changeType", "data") ++
      Seq("schemaId", "headers").filter(batch.columns.contains)

  /** Append `batch` (columns: sfId, changeType, data, and optionally
    * schemaId/headers) to the log at `logDir`; returns the
    * (firstReplayId, lastReplayId) range assigned — the publish "acks".
    * An empty batch publishes nothing and returns the empty range
    * `(base+1, base)` (first > last).
    *
    * Single-writer by contract, like the reference's per-topic publisher:
    * replay IDs are assigned from the log's current max, so two concurrent
    * appends to the same log would race on the same base offset. Callers
    * needing fan-in should serialize through one publishing query.
    */
  def append(spark: SparkSession, batch: DataFrame, logDir: String): (Long, Long) = {
    val base = Bootstrap.captureOffset(logDir)
    // deterministic publish order within the batch: caller's sort columns
    // first, then a total tiebreak on all columns via a single window.
    val w = Window.orderBy(batch.columns.toIndexedSeq.map(col): _*)
    // cache: the id-assignment pass is read twice (count + file write), and
    // the count also derives `last` so the batch lineage runs exactly once.
    val withIds = batch.withColumn("replayId", row_number().over(w) + base)
      .select(envelopeCols(batch).map(col): _*)
      .cache()
    try {
      val n = withIds.count()
      if (n == 0) return (base + 1, base)
      val last = base + n

      writeLogFile(spark, withIds, logDir, last, n)
      (base + 1, last)
    } finally withIds.unpersist()
  }

  /** Append with per-event acks (S6): `batch` additionally carries a
    * `correlationKeyCol`; the returned ack table maps each event's
    * correlation key to its assigned replay ID — the `PublishStream` ack
    * shape (`client.js:616-668`: every PublishResult carries the event's
    * correlationKey so the client can settle its in-flight map). The
    * correlation key is NOT written to the log; it exists only in the ack.
    *
    * Acks are collected driver-side (publish batches are ≤100 events by
    * the reference's contract) so the returned frame is stable after the
    * log write, not a lazy recompute.
    */
  def appendWithAcks(spark: SparkSession, batch: DataFrame, logDir: String,
                     correlationKeyCol: String = "correlationKey"): DataFrame = {
    import spark.implicits._
    val base = Bootstrap.captureOffset(logDir)
    val w = Window.orderBy(batch.columns.toIndexedSeq.map(col): _*)
    val withIds = batch.withColumn("replayId", row_number().over(w) + base).cache()
    try {
      val acks = withIds.select(col(correlationKeyCol), col("replayId"))
        .as[(String, Long)].collect()
      if (acks.nonEmpty) {
        val last = base + acks.length
        writeLogFile(spark,
          withIds.select(envelopeCols(batch).map(col): _*), logDir, last,
          acks.length.toLong)
      }
      acks.toSeq.toDF(correlationKeyCol, "replayId")
    } finally withIds.unpersist()
  }

  /** Producer-side payload cap: the reference's Pub/Sub rejects oversize
    * events server-side with a per-event error result; here the cap fails
    * fast at the producer with the same per-event granularity.
    */
  val MaxEventBytes = 1048576

  /** Default publish validity: an event needs a key and a payload within
    * the size cap. */
  def defaultPublishValid: Column =
    col("sfId").isNotNull &&
      coalesce(octet_length(col("data")), lit(0)) <= MaxEventBytes

  /** Publish with RESPONSE-TYPE dispatch (the `PublishStream` consumer
    * surface, `client.js:638-684`: results arrive as `publishResponse` OR
    * `error` per event, and the client settles its in-flight map from
    * whichever comes): events failing `valid` are NOT written to the log
    * and come back as `status='error'` rows with the failure in `error`;
    * valid events are written and acked `status='ack'` with their assigned
    * replay IDs. One bad event never fails the batch — exactly the
    * reference's per-result settlement, where an error result frees its
    * correlationKey while the rest of the batch publishes.
    *
    * Returns `(correlationKey, replayId, status, error)`; like
    * [[appendWithAcks]] the response table is collected driver-side
    * (publish batches are ≤100 events by contract) so it is stable after
    * the write, never a lazy recompute.
    */
  def appendWithResponses(spark: SparkSession, batch: DataFrame, logDir: String,
                          correlationKeyCol: String = "correlationKey",
                          valid: Column = defaultPublishValid): DataFrame = {
    import spark.implicits._
    val flagged = batch.withColumn("__valid", valid).cache()
    try {
      // null predicate results (three-valued logic) are failures too
      val errKeys = flagged.filter(col("__valid").isNull || !col("__valid"))
        .select(col(correlationKeyCol)).as[String].collect()
      val good = flagged.filter(col("__valid")).drop("__valid")
      val ackRows = appendWithAcks(spark, good, logDir, correlationKeyCol)
        .as[(String, Long)].collect()
      val responses =
        ackRows.toSeq.map { case (k, rid) => (k, Some(rid), "ack", None: Option[String]) } ++
          errKeys.toSeq.map(k =>
            (k, None: Option[Long], "error", Some(s"validation failed: $valid")))
      responses.toDF(correlationKeyCol, "replayId", "status", "error")
    } finally flagged.unpersist()
  }

  /** One-file atomic append: write via a staging dir, rename into the log
    * as `events-<last>-n<rows>.jsonl` — the name carries the file's max
    * replay ID (offset math) and row count (row-accurate source admission
    * even under sparse replay IDs).
    */
  private def writeLogFile(spark: SparkSession, rows: DataFrame,
                           logDir: String, last: Long, n: Long): Unit = {
    val staging = s"$logDir/__publish_staging"
    rows.coalesce(1).write.mode("overwrite").json(staging)
    val fs = new Path(logDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(staging))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    fs.rename(part, new Path(logDir, s"events-$last-n$n.jsonl"))
    fs.delete(new Path(staging), true)
  }
}
