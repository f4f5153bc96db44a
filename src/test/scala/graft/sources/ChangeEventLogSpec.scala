package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** DSv2 `cdc-log` source: replay positioning (S2), micro-batch offsets,
  * checkpointed resume (T1).
  */
class ChangeEventLogSpec extends SparkSpec {
  import spark.implicits._

  private def writeLog(dir: Path, name: String, rows: Seq[String]): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes)

  private def ev(rid: Long, sfId: String, ct: String, data: String) =
    s"""{"replayId":$rid,"sfId":"$sfId","changeType":"$ct","data":"$data"}"""

  test("earliest replay reads everything; custom skips past offset") {
    val dir = Files.createTempDirectory("cdclog")
    writeLog(dir, "events-3.jsonl", Seq(ev(1, "a", "CREATE", "x"),
      ev(2, "b", "CREATE", "y"), ev(3, "a", "UPDATE", "z")))
    writeLog(dir, "events-5.jsonl", Seq(ev(4, "c", "CREATE", "w"), ev(5, "a", "DELETE", "")))

    def readFrom(start: String): Seq[Long] = {
      val out = Files.createTempDirectory("cdcout").toString
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", dir.toString)
        .option("startingReplayId", start)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).select("replayId").as[Long].collect().sorted.toSeq
    }

    assert(readFrom("earliest") == Seq(1L, 2L, 3L, 4L, 5L))
    assert(readFrom("2") == Seq(3L, 4L, 5L))
    assert(readFrom("latest").isEmpty)
  }

  test("checkpointed resume picks up only appended events (T1)") {
    val dir = Files.createTempDirectory("cdclog2")
    val out = Files.createTempDirectory("cdcout2").toString
    writeLog(dir, "events-2.jsonl", Seq(ev(1, "a", "CREATE", "x"), ev(2, "b", "CREATE", "y")))

    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", dir.toString).option("startingReplayId", "earliest").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    run()
    assert(spark.read.parquet(out).count() == 2)
    writeLog(dir, "events-4.jsonl", Seq(ev(3, "c", "CREATE", "z"), ev(4, "a", "UPDATE", "w")))
    run()
    val all = spark.read.parquet(out).select("replayId").as[Long].collect().sorted.toSeq
    assert(all == Seq(1L, 2L, 3L, 4L)) // no re-read of committed offsets
  }
}
