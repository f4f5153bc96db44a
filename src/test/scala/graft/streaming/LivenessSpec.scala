package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class LivenessSpec extends SparkSpec {
  import spark.implicits._

  private def awaitBeat(m: LivenessMonitor, name: String,
                        pred: LivenessMonitor.Heartbeat => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + 20000
    while (System.currentTimeMillis() < deadline &&
      !m.heartbeat(name).exists(pred)) Thread.sleep(50)
    assert(m.heartbeat(name).exists(pred),
      s"no matching heartbeat for $name: ${m.heartbeat(name)}")
  }

  test("progress events record heartbeats with the source's latest replay id") {
    val log = Files.createTempDirectory("live_log").toString
    val events = Seq(("a", "UPDATE", "{}"), ("b", "CREATE", "{}"))
      .toDF("sfId", "changeType", "data")
    val (_, last) = Publish.append(spark, events, log)

    val m = Liveness.install(spark)
    try {
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", log).load()
        .writeStream
        .queryName("live_cdc")
        .option("checkpointLocation", Files.createTempDirectory("live_ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q.awaitTermination()
      // listener bus is async: wait for the progress receipt. The keepalive
      // payload is the receipt time + the source's latestReplayId (DSv2
      // custom sources don't feed numInputRows without ReportsSourceMetrics).
      awaitBeat(m, "live_cdc", hb => hb.batchId >= 0 &&
        hb.latestReplayId.contains(last))
    } finally Liveness.uninstall(spark, m)
  }

  test("unnamed queries are tracked under their id (no NPE on null name)") {
    val log = Files.createTempDirectory("live_log_unnamed").toString
    val events = Seq(("a", "UPDATE", "{}")).toDF("sfId", "changeType", "data")
    Publish.append(spark, events, log)

    val m = Liveness.install(spark)
    try {
      // NOTE: no .queryName(...) — event.name/progress.name are null, the
      // monitor must fall back to the stable query id
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", log).load()
        .writeStream
        .option("checkpointLocation", Files.createTempDirectory("live_ck_unnamed").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q.awaitTermination()
      awaitBeat(m, q.id.toString, hb => hb.batchId >= 0)
    } finally Liveness.uninstall(spark, m)
  }

  test("silent queries are flagged dead and restarted exactly once per sweep") {
    val m = new LivenessMonitor
    val now = System.currentTimeMillis()
    m.record("fresh", LivenessMonitor.Heartbeat(now, 3L, 10L, Some(42L)))
    m.record("stale", LivenessMonitor.Heartbeat(now - 60000, 1L, 5L, Some(7L)))

    assert(m.deadQueries(now, timeoutMillis = 30000) === Seq("stale"))

    var restarted = List.empty[String]
    assert(m.superviseOnce(now, 30000)(n => restarted ::= n) === Seq("stale"))
    assert(restarted === List("stale"))
    // heartbeat refreshed: an immediate second sweep restarts nothing
    assert(m.superviseOnce(System.currentTimeMillis(), 30000)(
      n => restarted ::= n).isEmpty)
    assert(restarted === List("stale"))
  }
}
