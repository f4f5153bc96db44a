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

  test("one fat backlog file plans multiple byte-range partitions, same output") {
    val dir = Files.createTempDirectory("cdclog_split")
    // one file, ~200 events of varying line lengths (split boundaries must
    // not align with line boundaries)
    writeLog(dir, "events-200.jsonl",
      (1L to 200L).map(i => ev(i, s"k${i % 7}", "CREATE", "v" * (i % 13).toInt)))

    val partitionCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
      .option("path", dir.toString)
      .option("startingReplayId", "earliest")
      .option("splitBytes", "512") // tiny ranges to force many splits
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("cdcckpt_split").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        partitionCounts.synchronized { partitionCounts += batch.rdd.getNumPartitions }
        val ids = batch.select("replayId").as[Long].collect()
        seen.synchronized { seen ++= ids }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(partitionCounts.exists(_ > 1),
      s"a fat file must fan out over several input partitions: $partitionCounts")
    assert(seen.sorted.toSeq == (1L to 200L), "every line exactly once across ranges")
  }

  test("row-counted file names make admission row-accurate under sparse IDs") {
    val dir = Files.createTempDirectory("cdclog_sparse")
    // 6 files x 50 rows with huge ID gaps between files (compacted-log
    // shape). Span-based admission would advance 100 IDs per batch and
    // need ~30 batches for the first file alone; row-accurate admission
    // takes 2 whole files per 100-row batch.
    (0 until 6).foreach { f =>
      val ids = (1L to 50L).map(_ + f * 10000L)
      writeLog(dir, s"events-${ids.last}-n50.jsonl",
        ids.map(i => ev(i, s"k${i % 7}", "CREATE", s"v$i")))
    }
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
      .option("path", dir.toString)
      .option("startingReplayId", "earliest")
      .option("maxEventsPerBatch", "100")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("cdcckpt_sparse").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batchSizes.toSeq == Seq(100L, 100L, 100L),
      s"sparse backlog must drain in 3 full batches, got: $batchSizes")
  }

  test("admission control drains a backlog in capped batches and resumes (S3)") {
    val dir = Files.createTempDirectory("cdclog3")
    // first half of the backlog: 500 events in files of 250 (file boundaries
    // deliberately NOT aligned with the 100-event cap)
    def appendEvents(from: Long, to: Long): Unit =
      (from to to).grouped(250).foreach { g =>
        writeLog(dir, s"events-${g.last}.jsonl",
          g.map(i => ev(i, s"k${i % 7}", "CREATE", s"v$i")))
      }
    appendEvents(1, 500)

    val ckpt = Files.createTempDirectory("cdcckpt3").toString
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]

    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", dir.toString)
        .option("startingReplayId", "earliest")
        .option("maxEventsPerBatch", "100")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.select("replayId").as[Long].collect()
          batchSizes.synchronized { batchSizes += ids.length.toLong }
          seen.synchronized { seen ++= ids }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain() // 500-event backlog -> 5 capped batches
    assert(batchSizes.size == 5, s"got batches: $batchSizes")

    // second half lands while the stream is down; the restart resumes from
    // the mid-backlog checkpoint and drains the rest in capped batches
    appendEvents(501, 1000)
    drain()

    assert(batchSizes.size == 10, s"got batches: $batchSizes")
    assert(batchSizes.forall(_ <= 100), s"a batch exceeded the cap: $batchSizes")
    assert(seen.sorted.toSeq == (1L to 1000L), "every event exactly once")
  }
}
