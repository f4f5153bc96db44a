package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot-then-stream bootstrap (S11/T10/O3): changes that arrive during
  * the snapshot export replay OVER the snapshot; watchdog flags stale
  * topics (T4).
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rid: Long, sfId: String, ct: String, data: String) =
    s"""{"replayId":$rid,"sfId":"$sfId","changeType":"$ct","data":"$data"}"""

  test("snapshot + overlapping change stream converge via latest-wins") {
    val base = Files.createTempDirectory("bootstrap")
    val logDir = base.resolve("log")
    Files.createDirectories(logDir)
    // log already contains events 1..2 (pre-snapshot history, must be skipped)
    Files.write(logDir.resolve("events-2.jsonl"),
      Seq(ev(1, "a", "CREATE", "stale-a"), ev(2, "b", "CREATE", "stale-b"))
        .mkString("\n").getBytes)

    // snapshot reflects state as of replayId 2
    val snapshot = Seq(("a", "snap-a"), ("b", "snap-b")).toDF("sfId", "data")

    val q = Bootstrap.snapshotThenStream(spark, snapshot,
      logDir.toString, base.resolve("target").toString,
      base.resolve("ckpt").toString, Seq("sfId", "data"))
    q.awaitTermination()
    // no post-snapshot events yet: target == snapshot
    val t0 = CdcIngest.readTarget(spark, base.resolve("target").toString)
      .as[(String, String)].collect().sortBy(_._1)
    assert(t0.toSeq == Seq(("a", "snap-a"), ("b", "snap-b")))

    // changes arriving after capture replay over the snapshot
    Files.write(logDir.resolve("events-4.jsonl"),
      Seq(ev(3, "a", "UPDATE", "new-a"), ev(4, "c", "CREATE", "new-c"))
        .mkString("\n").getBytes)
    val q2 = CdcIngest.startWith(spark,
      spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", logDir.toString).option("startingReplayId", "2").load(),
      base.resolve("target").toString, base.resolve("ckpt").toString,
      Seq("sfId", "data"))
    q2.awaitTermination()
    val t1 = CdcIngest.readTarget(spark, base.resolve("target").toString)
      .as[(String, String)].collect().sortBy(_._1)
    assert(t1.toSeq == Seq(("a", "new-a"), ("b", "snap-b"), ("c", "new-c")))
  }

  test("sync-state checkpoint aggregation + stale watchdog") {
    val batch = Seq(("t1", 5L), ("t1", 9L), ("t2", 3L))
      .toDF("topic", "replayId")
    val ckpt = SyncState.checkpointAgg(batch, "topic", "replayId")
    val rows = ckpt.select("topicName", "lastReplayId")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("t1", 9L), ("t2", 3L)))

    val hour = 3600L * 1000
    val now = 100L * hour
    val state = Seq(
      ("t1", 9L, now - 80 * hour), // stale (> 70 h)
      ("t2", 3L, now - 10 * hour))
      .toDF("topicName", "lastReplayId", "lastSyncStartedAt")
    val stale = SyncState.staleTopics(state, now)
    assert(stale.select("topicName").as[String].collect().toSeq == Seq("t1"))
    assert(stale.select("fullResyncRequested").as[Boolean].collect().forall(identity))
  }
}
