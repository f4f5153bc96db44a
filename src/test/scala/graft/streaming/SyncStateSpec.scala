package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Control-plane specs: offset-commit table (T2), checkpoint advance (A1),
  * failure report (A3), and the stale-checkpoint → full-resync loop
  * (T3/T4, reference `setup.md:259,306,1331-1348`).
  */
class SyncStateSpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600L * 1000

  test("commitOffsets is idempotent per batch; committedOffsets takes the max") {
    val dir = Files.createTempDirectory("commits").toString
    val b0 = Seq(("t1", 5L), ("t1", 9L), ("t2", 3L)).toDF("topic", "replayId")
    val b1 = Seq(("t1", 12L)).toDF("topic", "replayId")

    SyncState.commitOffsets(b0, 0, col("topic"), col("replayId"), dir, nowMillis = 1000)
    SyncState.commitOffsets(b1, 1, col("topic"), col("replayId"), dir, nowMillis = 2000)
    // redelivery of batch 0 after a restart: overwrites its own partition
    SyncState.commitOffsets(b0, 0, col("topic"), col("replayId"), dir, nowMillis = 3000)

    val got = SyncState.committedOffsets(spark, dir)
      .select("topicName", "lastReplayId", "eventCount")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("t1", 12L, 3L), ("t2", 3L, 1L)))
  }

  test("advance is a monotone latest-wins upsert of checkpoints") {
    val state = Seq(("t1", 9L), ("t2", 3L)).toDF("topicName", "lastReplayId")
    val ckpts = Seq(("t1", 7L), ("t2", 5L), ("t3", 1L)) // t1 regression ignored
      .toDF("topicName", "lastReplayId")
    val got = SyncState.advance(state, ckpts)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("t1", 9L), ("t2", 5L), ("t3", 1L)))
  }

  test("failureReport counts dead-letter rows per topic with last failure time") {
    val dead = Seq(
      ("t1", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      ("t1", java.sql.Timestamp.valueOf("2026-01-01 12:00:00")),
      ("t2", java.sql.Timestamp.valueOf("2026-01-01 11:00:00")))
      .toDF("topic", "dead_letter_at")
    val got = SyncState.failureReport(dead, "topic")
      .select("topicName", "failureCount", "lastFailureAt")
      .as[(String, Long, java.sql.Timestamp)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(("t1", 2L), ("t2", 1L)))
    assert(got(0)._3 == java.sql.Timestamp.valueOf("2026-01-01 12:00:00"))
  }

  test("ingest with commitDir writes per-batch commit rows (T2)") {
    val base = Files.createTempDirectory("cdc_commit").toString
    val logDir = s"$base/log"
    val commitDir = s"$base/commits"
    Seq((1L, "a", "CREATE", "v1"), (2L, "b", "CREATE", "b1"))
      .toDF("replayId", "sfId", "changeType", "value")
      .write.mode("append").parquet(logDir)
    val schema = spark.read.parquet(logDir).schema

    val q = CdcIngest.startWith(spark,
      spark.readStream.schema(schema).parquet(logDir),
      s"$base/target", s"$base/ckpt", Seq("sfId", "value"),
      commitDir = Some(commitDir))
    q.awaitTermination()

    val got = SyncState.committedOffsets(spark, commitDir)
      .select("topicName", "lastReplayId").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("target", 2L)))
  }

  test("stale checkpoint triggers auto full resync; state equals batch fold") {
    val base = Files.createTempDirectory("resync")
    val logDir = base.resolve("log")
    val targetDir = base.resolve("target").toString
    val commitDir = base.resolve("commits").toString
    Files.createDirectories(logDir)

    def ev(rid: Long, sfId: String, ct: String, data: String) =
      s"""{"replayId":$rid,"sfId":"$sfId","changeType":"$ct","data":"$data"}"""
    Files.write(logDir.resolve("events-2.jsonl"),
      Seq(ev(1, "a", "CREATE", "a1"), ev(2, "b", "CREATE", "b1"))
        .mkString("\n").getBytes)
    Files.write(logDir.resolve("events-4.jsonl"),
      Seq(ev(3, "a", "UPDATE", "a2"), ev(4, "c", "CREATE", "c1"))
        .mkString("\n").getBytes)

    val now = 1000L * hour
    // the worker last committed 80 h ago at replayId 2 — beyond the 70 h
    // retention window, so its checkpoint can no longer be replayed (T3)
    SyncState.commitOffsets(Seq(2L).toDF("replayId"), 0,
      lit("target"), col("replayId"), commitDir, nowMillis = now - 80 * hour)

    // the snapshot a resync would export: state as of the capture offset
    val snapshot = Seq(("a", "a2"), ("b", "b1"), ("c", "c1")).toDF("sfId", "data")

    val resynced = SyncState.resyncIfStale(spark, commitDir, now) { topic =>
      assert(topic == "target")
      val q = Bootstrap.snapshotThenStream(spark, snapshot, logDir.toString,
        targetDir, base.resolve(s"ckpt_resync").toString, Seq("sfId", "data"),
        commitDir = Some(commitDir), nowMillis = now)
      q.awaitTermination()
    }
    assert(resynced == Seq("target"))

    // state equals the batch fold of the full log
    val got = CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", "a2"), ("b", "b1"), ("c", "c1")))

    // the resync refreshed the commit table: no longer stale
    assert(SyncState.resyncIfStale(spark, commitDir, now)(_ => fail()).isEmpty)
  }
}
