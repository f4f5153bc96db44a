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
}
