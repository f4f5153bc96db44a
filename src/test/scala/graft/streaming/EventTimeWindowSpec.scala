package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventTimeWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ntz(rows: Seq[(String, String, Double)]): DataFrame =
    rows.toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  /** Append one file-batch to the log with an EXPLICIT modification time:
    * FileStreamSource orders by modTime, and same-second writes (1 s
    * granularity on some filesystems) would make "sentinel last"
    * nondeterministic — a sentinel processed FIRST jumps the watermark
    * past every real event and append mode drops them all.
    */
  private def writeBatch(df: DataFrame, log: String, modTime: Long): Unit = {
    val dir = new java.io.File(log)
    val before =
      Option(dir.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    // one data file per batch: several same-modTime files are consumed in
    // arbitrary order, and a sibling holding older ts than an already-seen
    // one gets watermark-dropped — the equality would flap
    df.coalesce(1).write.mode("append").parquet(log)
    val fresh = dir.listFiles().filter(f => !before(f.getName) &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(fresh.length === 1, s"expected 1 data file, got ${fresh.length}")
    assert(fresh.head.setLastModified(modTime))
  }

  private def sinkRows(out: String): Set[Seq[Any]] =
    spark.read.parquet(out).filter(col("k") =!= "__sentinel")
      .collect().map(_.toSeq).toSet

  test("watermarked tumbling windows: sink equals batch once the sentinel flushes") {
    val log = Files.createTempDirectory("etw_log").toString + "/data"
    val out = Files.createTempDirectory("etw_out").toString + "/win"
    val ckpt = Files.createTempDirectory("etw_ckpt").toString
    val b1 = Seq(("u1", "2026-01-01 10:01:00", 1.0),
      ("u2", "2026-01-01 10:03:00", 2.0))
    val b2 = Seq(("u1", "2026-01-01 10:12:00", 3.0),
      ("u1", "2026-01-01 10:04:00", 4.0))
    // strictly later than maxTs + width + delay: every real window closes
    val sentinel = Seq(("__sentinel", "2026-01-02 00:00:00", 0.0))

    val t0 = System.currentTimeMillis() - 60000
    writeBatch(ntz(b1), log, t0)
    writeBatch(ntz(b2), log, t0 + 10000)
    writeBatch(ntz(sentinel), log, t0 + 20000)

    val schema = ntz(b1).schema
    def runOnce(): Unit =
      EventTimeWindow.start(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(log),
        "ts", Seq("k"), Seq("v"), "10 minutes", "1 second", out, ckpt)
        .awaitTermination()
    runOnce()

    val want = EventTimeWindow.batchReference(ntz(b1 ++ b2), "ts",
      Seq("k"), Seq("v"), "10 minutes").collect().map(_.toSeq).toSet
    assert(want.size === 3) // (10:00,u1) (10:00,u2) (10:10,u1)
    assert(sinkRows(out) === want)

    // restart from the same checkpoint, no new files: exactly-once — the
    // sink must not grow (windows already emitted can never re-emit)
    runOnce()
    assert(sinkRows(out) === want)

    // a LATE row (event time far behind the watermark) is dropped by
    // contract: its window already finalized; no duplicate, no new row
    writeBatch(ntz(Seq(("u9", "2026-01-01 10:02:00", 9.0))),
      log, t0 + 30000)
    runOnce()
    assert(sinkRows(out) === want)
  }

  test("sliding windows: each row lands in width/slide overlapping windows, streamed equals batch") {
    val log = Files.createTempDirectory("etw_slog").toString + "/data"
    val out = Files.createTempDirectory("etw_sout").toString + "/win"
    val ckpt = Files.createTempDirectory("etw_sckpt").toString
    val rows = Seq(("u1", "2026-01-01 10:01:00", 1.0),
      ("u1", "2026-01-01 10:07:00", 2.0),
      ("u2", "2026-01-01 10:12:00", 4.0))
    val sentinel = Seq(("__sentinel", "2026-01-02 00:00:00", 0.0))
    val t0 = System.currentTimeMillis() - 60000
    writeBatch(ntz(rows), log, t0)
    writeBatch(ntz(sentinel), log, t0 + 10000)

    EventTimeWindow.start(spark,
      spark.readStream.schema(ntz(rows).schema)
        .option("maxFilesPerTrigger", "1").parquet(log),
      "ts", Seq("k"), Seq("v"), "10 minutes", "1 second", out, ckpt,
      slide = "5 minutes").awaitTermination()

    val want = EventTimeWindow.batchReference(ntz(rows), "ts", Seq("k"),
        Seq("v"), "10 minutes", slide = "5 minutes")
      .collect().map(_.toSeq).toSet
    // epoch-aligned starts: 10:01 -> [9:55, 10:00], 10:07 -> [10:00, 10:05],
    // 10:12 -> [10:05, 10:10]; u1 shares the 10:00 window => 5 (window, key)
    // rows, and the overlap window aggregates BOTH u1 rows
    assert(want.size === 5)
    assert(sinkRows(out) === want)
  }

  test("MaterializedAgg tumbling twin: redelivered batch cannot double-count a window") {
    val tgt = Files.createTempDirectory("etw_ma").toString + "/agg"
    def bucketed(rows: Seq[(String, String, Double)]) =
      ntz(rows).withColumn("w_start", window(col("ts"), "10 minutes")("start"))
    val b0 = Seq(("u1", "2026-01-01 10:01:00", 1.0),
      ("u2", "2026-01-01 10:03:00", 2.0))
    val b1 = Seq(("u1", "2026-01-01 10:04:00", 4.0),
      ("u1", "2026-01-01 10:12:00", 3.0))
    MaterializedAgg.upsertBatch(spark, bucketed(b0), 0, tgt,
      Seq("w_start", "k"), Seq("v"))
    MaterializedAgg.upsertBatch(spark, bucketed(b1), 1, tgt,
      Seq("w_start", "k"), Seq("v"))
    // redelivery of batch 1 (crash between sink write and checkpoint
    // commit): idempotent partition overwrite, never double-counted
    MaterializedAgg.upsertBatch(spark, bucketed(b1), 1, tgt,
      Seq("w_start", "k"), Seq("v"))
    val got = MaterializedAgg.read(spark, tgt, Seq("w_start", "k"), Seq("v"))
      .collect().map(_.toSeq).toSet
    val want = bucketed(b0 ++ b1).groupBy("w_start", "k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("sum_v"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }
}
