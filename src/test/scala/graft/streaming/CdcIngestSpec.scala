package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming fold with restart (SURVEY §5.2 item 4): append change-log
  * files, run the ingest to completion, append more, restart from the
  * checkpoint — final table state must equal a batch fold of the full log.
  */
class CdcIngestSpec extends SparkSpec {
  import spark.implicits._

  test("latest-wins ingest survives restart and matches batch fold") {
    val base = Files.createTempDirectory("cdc_ingest").toString
    val logDir = s"$base/log"
    val targetDir = s"$base/target"
    val checkpointDir = s"$base/ckpt"

    val part1 = Seq(
      (1L, "a", "CREATE", "v1"),
      (2L, "b", "CREATE", "b1"),
      (3L, "a", "UPDATE", "v2"))
    val part2 = Seq(
      (3L, "a", "UPDATE", "v2"), // duplicate redelivery across restart
      (4L, "b", "DELETE", null.asInstanceOf[String]),
      (5L, "c", "CREATE", "c1"))

    def append(rows: Seq[(Long, String, String, String)]): Unit =
      rows.toDF("replayId", "sfId", "changeType", "value")
        .coalesce(1).write.mode("append").parquet(logDir)

    append(part1)
    val schema = spark.read.parquet(logDir).schema
    val dataCols = Seq("sfId", "value")

    def runOnce(): Unit = {
      val q = CdcIngest.start(spark, logDir, schema, targetDir, checkpointDir, dataCols)
      q.awaitTermination()
    }

    runOnce()
    val mid = spark.read.parquet(targetDir).as[(String, String)].collect().sortBy(_._1)
    assert(mid.toSeq == Seq(("a", "v2"), ("b", "b1")))

    append(part2)
    runOnce() // restart from checkpoint; only part2 is a new batch
    val fin = spark.read.parquet(targetDir).as[(String, String)].collect().sortBy(_._1)
    assert(fin.toSeq == Seq(("a", "v2"), ("c", "c1")))
  }

  test("invalid rows are dead-lettered, valid rows merge") {
    val base = Files.createTempDirectory("cdc_dead").toString
    val logDir = s"$base/log"
    val targetDir = s"$base/target"

    Seq((1L, "a", "CREATE", "ok"), (2L, null.asInstanceOf[String], "CREATE", "bad"))
      .toDF("replayId", "sfId", "changeType", "value")
      .write.mode("append").parquet(logDir)
    val schema = spark.read.parquet(logDir).schema

    val q = CdcIngest.start(spark, logDir, schema, targetDir, s"$base/ckpt",
      Seq("sfId", "value"), valid = _.filter(col("sfId").isNotNull))
    q.awaitTermination()

    assert(spark.read.parquet(targetDir).count() == 1)
    val dead = spark.read.parquet(targetDir + "_dead_letter")
    assert(dead.count() == 1)
    assert(dead.select("replayId").as[Long].collect().toSeq == Seq(2L))
  }
}
