package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Per-topic routing (P7/S8): events fan out to one table per topic. */
class RoutedIngestSpec extends SparkSpec {
  import spark.implicits._

  test("routed ingest materializes one latest-wins table per topic") {
    val base = Files.createTempDirectory("routed").toString
    val logDir = s"$base/log"
    Seq(
      (1L, "accounts", "a", "CREATE", "a1"),
      (2L, "contacts", "c", "CREATE", "c1"),
      (3L, "accounts", "a", "UPDATE", "a2"),
      (4L, "contacts", "c", "DELETE", null.asInstanceOf[String]),
      (5L, "contacts", "d", "CREATE", "d1"))
      .toDF("replayId", "topic", "sfId", "changeType", "value")
      .write.mode("append").parquet(logDir)
    val schema = spark.read.parquet(logDir).schema

    val q = CdcIngest.startRouted(spark,
      spark.readStream.schema(schema).parquet(logDir),
      "topic", s"$base/tables", s"$base/ckpt", Seq("sfId", "value"))
    q.awaitTermination()

    val accounts = CdcIngest.readTarget(spark, s"$base/tables/accounts")
      .as[(String, String)].collect().sortBy(_._1)
    val contacts = CdcIngest.readTarget(spark, s"$base/tables/contacts")
      .as[(String, String)].collect().sortBy(_._1)
    assert(accounts.toSeq == Seq(("a", "a2")))
    assert(contacts.toSeq == Seq(("d", "d1"))) // c deleted through
  }
}
