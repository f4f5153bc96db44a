package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    (T6) — the fold is idempotent, and the per-bucket overwrite is
  *    batchId-agnostic so restarts re-applying a batch converge to the
  *    same state;
  *  - checkpointed resume (T1): offsets live in `checkpointDir`, so a
  *    restarted query continues after the last committed batch;
  *  - dead-letter side output (S10): rows failing the validity predicate
  *    are appended to `<targetDir>_dead_letter` with their replay IDs, the
  *    failed predicate as the error cause, and the raw event JSON —
  *    field parity with the reference's `eventParseError.js:7-55`;
  *  - sink writes retry with exponential backoff (T7, `setup.md:973-1009`)
  *    before failing the query.
  *
  * '''Scale design (S8 hot path).''' The target is laid out as hash-bucket
  * partitions `__bucket=N/` with `N = pmod(xxhash64(key), numBuckets)`.
  * A micro-batch touches only the buckets its keys hash into, so the MERGE
  *  1. reads ONLY those buckets back (partition pruning on `__bucket`),
  *  2. folds the batch over that slice (one shuffle keyed on `key`),
  *  3. rewrites ONLY those buckets.
  * Cost per batch is O(touched buckets), not O(table): at 100× the table
  * with `numBuckets` sized so a bucket ≈ a few file-split units, a small
  * batch rewrites a small, bounded byte volume. Untouched buckets' files
  * are never opened or rewritten (asserted in CdcIngestSpec).
  *
  * '''Crash safety.''' The merged buckets are written to a staging dir
  * first; only after the job completes (its `_SUCCESS` marker exists) are
  * bucket dirs swapped into the target one rename apiece. Recovery on the
  * next merge: a complete staging (has `_SUCCESS`) re-plays any missing
  * renames before merging; an incomplete one is discarded (target was
  * never touched). There is no window where the table as a whole is
  * deleted — at worst a single bucket is mid-swap, and its content is
  * restored from staging before the next merge reads it.
  */
object CdcIngest {

  /** Default bucket count. Sized for tests/local; at 100 TB pick
    * `numBuckets` so one bucket ≈ 1–4 file-split units (e.g. 4096 buckets
    * for a 1 TB materialized table at 256 MB splits).
    */
  val DefaultNumBuckets = 32

  private val BucketCol = "__bucket"

  /** Deterministic bucket assignment for a key column. */
  def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(xxhash64(key), lit(numBuckets.toLong)).cast("int")

  /** Read the materialized table without its physical layout column. */
  def readTarget(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(BucketCol)

  private def stagingPath(targetDir: String) = new Path(targetDir + "__staging")

  /** Re-play an interrupted bucket swap. A staging dir with `_SUCCESS`
    * holds the complete merged output of the interrupted batch: any bucket
    * dir still in staging whose target dir is missing was deleted-but-not-
    * renamed mid-swap — rename it in (the checkpoint will re-deliver the
    * batch, and the merge is idempotent over either pre- or post-merge
    * bucket state). A staging dir without `_SUCCESS` is an incomplete
    * write; the target was never touched, so it is simply discarded.
    */
  private def recoverStaging(fs: FileSystem, targetDir: String): Unit = {
    val staging = stagingPath(targetDir)
    if (!fs.exists(staging)) return
    if (fs.exists(new Path(staging, "_SUCCESS"))) {
      val target = new Path(targetDir)
      if (!fs.exists(target)) fs.mkdirs(target)
      fs.listStatus(staging).filter(_.getPath.getName.startsWith(BucketCol + "="))
        .foreach { s =>
          val dest = new Path(target, s.getPath.getName)
          if (!fs.exists(dest)) fs.rename(s.getPath, dest)
        }
    }
    fs.delete(staging, true)
  }

  /** Merge one (micro-)batch into the bucket-partitioned parquet target at
    * `targetDir`: fold the batch latest-wins, apply it over the touched
    * buckets only, and swap the rewritten buckets in. Idempotent — re-running
    * the same batch after a restart converges to the same table.
    */
  def mergeIntoTarget(spark: SparkSession, batch: DataFrame, targetDir: String,
                      dataCols: Seq[String], key: String, offset: String,
                      changeType: String,
                      numBuckets: Int = DefaultNumBuckets): Unit = {
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverStaging(fs, targetDir)

    // Buckets this batch touches: a driver-side list bounded by numBuckets
    // (NOT by data volume — it is the distinct of a hash-mod).
    val touched = batch.select(bucketOf(col(key), numBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val targetExists = fs.exists(new Path(targetDir))
    val targetSlice = if (targetExists) {
      // partition pruning: only the touched buckets' files are read
      spark.read.parquet(targetDir)
        .filter(col(BucketCol).isin(touched.toSeq: _*))
        .select(dataCols.map(col): _*)
    } else {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(batch.select(dataCols.map(col): _*).schema.fields))
    }

    val merged = CdcFold.mergeBatch(targetSlice, batch, key, offset, changeType)
      .withColumn(BucketCol, bucketOf(col(key), numBuckets))

    val staging = stagingPath(targetDir)
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)

    // swap: per touched bucket, drop the old dir and move the new one in.
    // A bucket with no survivors has no staging dir — the delete alone is
    // the correct final state (the bucket emptied out).
    val target = new Path(targetDir)
    if (!fs.exists(target)) fs.mkdirs(target)
    touched.foreach { b =>
      val name = s"$BucketCol=$b"
      val dest = new Path(target, name)
      val src = new Path(staging, name)
      if (fs.exists(dest)) fs.delete(dest, true)
      if (fs.exists(src)) fs.rename(src, dest)
    }
    fs.delete(staging, true)
  }

  /** Start the ingest stream over a parquet file log. Rows failing `valid`
    * go to the dead-letter table with the failed predicate as their cause.
    */
  def start(spark: SparkSession, logDir: String, logSchema: StructType,
            targetDir: String, checkpointDir: String, dataCols: Seq[String],
            key: String = "sfId", offset: String = "replayId",
            changeType: String = "changeType",
            valid: Column = lit(true),
            availableNow: Boolean = true,
            numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    startWith(spark, spark.readStream.schema(logSchema).parquet(logDir),
      targetDir, checkpointDir, dataCols, key, offset, changeType, valid,
      availableNow, numBuckets)

  /** Same, over an arbitrary streaming DataFrame (e.g. the `cdc-log` DSv2
    * source with replay positioning).
    */
  def startWith(spark: SparkSession, stream: DataFrame,
                targetDir: String, checkpointDir: String, dataCols: Seq[String],
                key: String = "sfId", offset: String = "replayId",
                changeType: String = "changeType",
                valid: Column = lit(true),
                availableNow: Boolean = true,
                numBuckets: Int = DefaultNumBuckets,
                commitDir: Option[String] = None,
                commitTopic: Option[Column] = None): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // single-pass valid/invalid split: ONE flag column computed once over
        // the cached batch, filtered both ways — no exceptAll set-difference
        // shuffle, no second evaluation of the predicate.
        val flagged = batch.withColumn("__valid", valid).cache()
        try {
          val bad = flagged.filter(!col("__valid")).drop("__valid")
          if (!bad.isEmpty) {
            Retry.withBackoff() {
              bad
                // eventParseError.js:7-55 parity: replayId/topic already ride
                // along as batch columns; add the cause + raw event + time.
                .withColumn("cause", lit(s"validation failed: ${valid.toString}"))
                .withColumn("raw_event", to_json(struct(batch.columns.toIndexedSeq.map(col): _*)))
                .withColumn("dead_letter_at", current_timestamp())
                .write.mode("append").parquet(targetDir + "_dead_letter")
            }
          }
          val good = flagged.filter(col("__valid")).drop("__valid")
          Retry.withBackoff() {
            mergeIntoTarget(spark, good, targetDir, dataCols, key, offset,
              changeType, numBuckets)
          }
          // T2: external offset-commit AFTER the merge — a crash between the
          // two re-delivers the batch, and the commit write is idempotent
          // (batchId-keyed overwrite).
          commitDir.foreach { cd =>
            val topic = commitTopic.getOrElse(lit(new Path(targetDir).getName))
            Retry.withBackoff() {
              SyncState.commitOffsets(good, batchId, topic, col(offset), cd)
            }
          }
        } finally flagged.unpersist()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Schema-dispatched ingest — the reference's hot path END-TO-END
    * through the streaming source (`client.js:758-764`: per-event
    * `schemaId` → registry lookup → decode; `proto:57-80`): each envelope
    * row carries `schemaIdCol` and a BASE64 Avro payload in `payloadCol`
    * (the JSONL log is a text container; base64 is its binary encoding).
    * Per micro-batch:
    *
    *  1. the batch's distinct schema ids are collected (bounded by the
    *     topic's schema count, not data volume) and split into resolvable
    *     vs not via the registry (S4 — fetch-once, cached);
    *  2. resolvable rows decode per schema id in one codegen'd pass per id
    *     ([[graft.sources.SchemaRegistry.decode]]), heterogeneous decoded
    *     structs merging into their field superset (append-only schema
    *     evolution: old events read null for new fields);
    *  3. decoded fields are flattened beside the envelope keys and merged
    *     latest-wins into the bucket-partitioned target (S8);
    *  4. rows with unresolvable/unknown schema ids dead-letter with the id
    *     in the cause (S10) — a batch never fails on one bad producer.
    */
  def startSchemaDispatched(spark: SparkSession, stream: DataFrame,
                            registry: graft.sources.SchemaRegistry,
                            targetDir: String, checkpointDir: String,
                            key: String = "sfId", offset: String = "replayId",
                            changeType: String = "changeType",
                            schemaIdCol: String = "schemaId",
                            payloadCol: String = "data",
                            availableNow: Boolean = true,
                            numBuckets: Int = DefaultNumBuckets): StreamingQuery = {
    def deadLetter(rows: DataFrame, cause: Column): Unit =
      Retry.withBackoff() {
        rows.withColumn("cause", cause)
          .withColumn("raw_event", to_json(struct(rows.columns.toIndexedSeq.map(col): _*)))
          .withColumn("dead_letter_at", current_timestamp())
          .write.mode("append").parquet(targetDir + "_dead_letter")
      }
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          val ids = b.select(schemaIdCol).distinct().collect()
            .flatMap(r => Option(r.getString(0)))
          val known = ids.filter(registry.resolvable).toSeq.sorted
          if (known.isEmpty) {
            if (!b.isEmpty)
              deadLetter(b, concat(lit("unresolvable schemaId: "), col(schemaIdCol)))
          } else {
            val decoded = registry.decode(
              b.withColumn("__payload", unbase64(col(payloadCol))),
              schemaIdCol, "__payload", known).cache()
            try {
              val bad = decoded.filter(col("decoded").isNull)
                .drop("decoded", "__payload")
              if (!bad.isEmpty)
                deadLetter(bad, concat(lit("unresolvable schemaId: "), col(schemaIdCol)))
              val flat = decoded.filter(col("decoded").isNotNull)
                .select(col(offset) +: col(key) +: col(changeType) +:
                  decoded.schema("decoded").dataType
                    .asInstanceOf[StructType].fieldNames.toSeq
                    .map(f => col(s"decoded.`$f`")): _*)
              Retry.withBackoff() {
                mergeIntoTarget(spark, flat, targetDir, flat.columns.toSeq, key,
                  offset, changeType, numBuckets)
              }
            } finally decoded.unpersist()
          }
        } finally b.unpersist()
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
                  availableNow: Boolean = true,
                  numBuckets: Int = DefaultNumBuckets,
                  mergeParallelism: Int = 4): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          val topics = b.select(topicCol).distinct().collect().map(_.getString(0))
          // Per-topic merges land in DISJOINT table dirs, so they can run as
          // concurrent Spark jobs: a bounded driver-side pool keeps many
          // small topics from serializing into #topics sequential jobs
          // (each merge's own stages still parallelize across the cluster).
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.max(1, math.min(mergeParallelism, topics.length)))
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          try {
            val merges = topics.toSeq.map { t =>
              scala.concurrent.Future {
                Retry.withBackoff() {
                  mergeIntoTarget(spark, b.filter(col(topicCol) === t),
                    s"$targetRoot/$t", dataCols, key, offset, changeType, numBuckets)
                }
              }
            }
            scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(merges),
              scala.concurrent.duration.Duration.Inf)
            ()
          } finally pool.shutdown()
        } finally b.unpersist()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
