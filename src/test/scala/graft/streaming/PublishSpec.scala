package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Publish → subscribe round trip (the reference's core integration test
  * shape, `spec/integration/client.spec.js:46-101`): published events come
  * back through the replayable source with their assigned replay IDs.
  */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  test("published events round-trip through the cdc-log source") {
    val base = Files.createTempDirectory("publish")
    val logDir = base.resolve("log").toString
    Files.createDirectories(base.resolve("log"))

    val batch1 = Seq(("a", "CREATE", """{"v":1}"""), ("b", "CREATE", """{"v":2}"""))
      .toDF("sfId", "changeType", "data")
    val (r1, r2) = Publish.append(spark, batch1, logDir)
    assert((r1, r2) == (1L, 2L))

    val batch2 = Seq(("a", "UPDATE", """{"v":3}""")).toDF("sfId", "changeType", "data")
    val (r3, r4) = Publish.append(spark, batch2, logDir)
    assert((r3, r4) == (3L, 3L))

    val out = base.resolve("out").toString
    val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
      .option("path", logDir).option("startingReplayId", "earliest").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .select("replayId", "sfId", "changeType")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", "CREATE"), (2L, "b", "CREATE"),
      (3L, "a", "UPDATE")))
  }

  test("per-event correlation-key acks map each event to its replay ID (S6)") {
    val base = Files.createTempDirectory("publish_acks")
    val logDir = base.resolve("log").toString
    Files.createDirectories(base.resolve("log"))

    val batch = Seq(
      ("ck-1", "a", "CREATE", """{"v":1}"""),
      ("ck-2", "b", "CREATE", """{"v":2}"""),
      ("ck-3", "c", "CREATE", """{"v":3}"""))
      .toDF("correlationKey", "sfId", "changeType", "data")
    val acks = Publish.appendWithAcks(spark, batch, logDir)
      .as[(String, Long)].collect().sortBy(_._2)

    // every event acked once, ids dense from base+1, keys preserved
    assert(acks.map(_._1).toSet == Set("ck-1", "ck-2", "ck-3"))
    assert(acks.map(_._2).toSeq == Seq(1L, 2L, 3L))

    // the correlation key is an ack-only field: not written to the log
    val logged = spark.read.json(s"$logDir/events-3-n3.jsonl")
    assert(!logged.columns.contains("correlationKey"))
    assert(logged.count() == 3)

    // a second publish continues the id sequence
    val acks2 = Publish.appendWithAcks(spark,
      Seq(("ck-4", "d", "CREATE", """{"v":4}"""))
        .toDF("correlationKey", "sfId", "changeType", "data"), logDir)
      .as[(String, Long)].collect()
    assert(acks2.toSeq == Seq(("ck-4", 4L)))
  }

  test("response-type dispatch: invalid events error per-event, valid ones still ack (client.js:638-684)") {
    val base = Files.createTempDirectory("publish_resp")
    val logDir = base.resolve("log").toString
    Files.createDirectories(base.resolve("log"))

    val oversize = "x" * (Publish.MaxEventBytes + 1)
    val batch = Seq(
      ("ck-ok-1", "a", "CREATE", """{"v":1}"""),
      ("ck-big", "b", "CREATE", oversize), // oversize payload
      ("ck-nokey", null, "CREATE", """{"v":2}"""), // missing key
      ("ck-ok-2", "c", "CREATE", """{"v":3}"""))
      .toDF("correlationKey", "sfId", "changeType", "data")

    val resp = Publish.appendWithResponses(spark, batch, logDir)
      .as[(String, Option[Long], String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // valid events acked with dense ids; invalid ones errored, not acked
    assert(resp("ck-ok-1")._2 == "ack" && resp("ck-ok-2")._2 == "ack")
    assert(Set(resp("ck-ok-1")._1, resp("ck-ok-2")._1) == Set(Some(1L), Some(2L)))
    assert(resp("ck-big")._2 == "error" && resp("ck-big")._1.isEmpty)
    assert(resp("ck-nokey")._2 == "error" && resp("ck-nokey")._1.isEmpty)
    assert(resp("ck-big")._3.exists(_.contains("validation failed")))

    // only the valid events reached the log (one bad event never fails or
    // pollutes the batch)
    val logged = spark.read.json(s"$logDir/events-2-n2.jsonl")
    assert(logged.count() == 2)
    assert(logged.select("sfId").as[String].collect().toSet == Set("a", "c"))
  }
}
