package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def expected(rows: Seq[(String, Double)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(DecimalType(28, 6))).as("sum_v"))

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"mismatch:\n${a.collect().mkString("\n")}\nvs\n${b.collect().mkString("\n")}")

  test("streamed partials merge to the batch aggregate across restarts") {
    val log = Files.createTempDirectory("ma_log").toString + "/data"
    val tgt = Files.createTempDirectory("ma_tgt").toString + "/agg"
    val ckpt = Files.createTempDirectory("ma_ckpt").toString
    val schema = Seq(("", 0.0)).toDF("k", "v").schema

    def runOnce(): Unit = {
      val q = MaterializedAgg.start(spark,
        spark.readStream.schema(schema).parquet(log),
        tgt, ckpt, Seq("k"), Seq("v"))
      q.awaitTermination()
    }

    val b1 = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0))
    val b2 = Seq(("a", 4.0), ("c", 7.25))
    b1.toDF("k", "v").write.mode("append").parquet(log)
    runOnce()
    b2.toDF("k", "v").write.mode("append").parquet(log)
    runOnce() // restart from the same checkpoint

    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")),
      expected(b1 ++ b2))
  }

  test("redelivered batch overwrites its partition: no double counting") {
    val tgt = Files.createTempDirectory("ma_tgt2").toString + "/agg"
    val rows = Seq(("a", 3.0), ("b", 4.0))
    val batch = rows.toDF("k", "v")
    MaterializedAgg.upsertBatch(spark, batch, batchId = 7, tgt, Seq("k"), Seq("v"))
    MaterializedAgg.upsertBatch(spark, batch, batchId = 7, tgt, Seq("k"), Seq("v"))
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")), expected(rows))
  }

  test("redelivered batch already folded by compact is skipped, not re-counted") {
    val tgt = Files.createTempDirectory("ma_tgt4").toString + "/agg"
    val b0 = Seq(("a", 1.0), ("b", 2.0))
    val b1 = Seq(("a", 4.0))
    MaterializedAgg.upsertBatch(spark, b0.toDF("k", "v"), 0, tgt, Seq("k"), Seq("v"))
    // crash window: batch 1's partition was written but its checkpoint
    // never committed…
    MaterializedAgg.upsertBatch(spark, b1.toDF("k", "v"), 1, tgt, Seq("k"), Seq("v"))
    // …and an operator ran compact() before the stream restarted (fold
    // tag c1 now contains batch 1's rows)
    MaterializedAgg.compact(spark, tgt, Seq("k"), Seq("v"))
    // restart redelivers batch 1 — it must be skipped, not written fresh
    MaterializedAgg.upsertBatch(spark, b1.toDF("k", "v"), 1, tgt, Seq("k"), Seq("v"))
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")),
      expected(b0 ++ b1))
    // a genuinely new batch (id above the fold tag) still lands
    val b2 = Seq(("c", 9.0))
    MaterializedAgg.upsertBatch(spark, b2.toDF("k", "v"), 2, tgt, Seq("k"), Seq("v"))
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")),
      expected(b0 ++ b1 ++ b2))
  }

  test("compacted partition keeps the partial-side decimal schema") {
    val tgt = Files.createTempDirectory("ma_tgt5").toString + "/agg"
    MaterializedAgg.upsertBatch(spark, Seq(("a", 1.0)).toDF("k", "v"), 0, tgt,
      Seq("k"), Seq("v"))
    MaterializedAgg.upsertBatch(spark, Seq(("a", 2.0)).toDF("k", "v"), 1, tgt,
      Seq("k"), Seq("v"))
    MaterializedAgg.compact(spark, tgt, Seq("k"), Seq("v"))
    val fs = new Path(tgt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cPart = fs.listStatus(new Path(tgt)).map(_.getPath.getName)
      .find(_.startsWith("__batch=c")).get
    // every partition must carry the partial-side DECIMAL(28,6), so reads
    // never depend on which file's footer Spark samples first
    assert(spark.read.parquet(s"$tgt/$cPart").schema("sum_v").dataType ==
      DecimalType(28, 6))
  }

  test("compact folds partitions, preserves totals, survives a crash window") {
    val tgt = Files.createTempDirectory("ma_tgt3").toString + "/agg"
    val all = (0 until 6).map(i => (s"k${i % 2}", i * 1.25))
    all.grouped(2).zipWithIndex.foreach { case (rows, id) =>
      MaterializedAgg.upsertBatch(spark, rows.toDF("k", "v"), id, tgt,
        Seq("k"), Seq("v"))
    }
    val fs = new Path(tgt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(tgt)).count(_.getPath.getName.startsWith("__batch=")) == 3)

    MaterializedAgg.compact(spark, tgt, Seq("k"), Seq("v"))
    assert(fs.listStatus(new Path(tgt)).count(_.getPath.getName.startsWith("__batch=")) == 1)
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")), expected(all))

    // crash window: sources deleted but compacted partition NOT renamed in
    // (staging left complete with its manifest) — the next write must
    // recover to the exact same totals
    val extra = Seq(("k0", 100.0))
    MaterializedAgg.upsertBatch(spark, extra.toDF("k", "v"), 10, tgt,
      Seq("k"), Seq("v"))
    MaterializedAgg.compact(spark, tgt, Seq("k"), Seq("v")) // c10 now holds everything
    // simulate: re-stage the current partition as if a compact crashed
    // mid-swap — move the live partition into staging with _SOURCES naming
    // a ghost (already-deleted) source, mark complete
    val live = fs.listStatus(new Path(tgt))
      .map(_.getPath.getName).find(_.startsWith("__batch=")).get
    val staging = new Path(tgt + "__agg_staging")
    fs.mkdirs(staging)
    fs.rename(new Path(tgt, live), new Path(staging, live))
    val out = fs.create(new Path(staging, "_SOURCES"), true)
    out.write("__batch=bghost\n".getBytes("UTF-8")); out.close()
    fs.createNewFile(new Path(staging, "_SUCCESS"))

    MaterializedAgg.upsertBatch(spark, Seq(("k1", 0.5)).toDF("k", "v"), 11, tgt,
      Seq("k"), Seq("v")) // triggers recover() first
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")),
      expected(all ++ extra ++ Seq(("k1", 0.5))))
    assert(!fs.exists(staging))
  }

  test("read-side recovers an interrupted compaction without a writer") {
    val tgt = Files.createTempDirectory("ma_tgt4").toString + "/agg"
    val all = Seq(("k0", 1.0), ("k1", 2.0), ("k0", 3.0), ("k1", 4.0))
    all.grouped(2).zipWithIndex.foreach { case (rows, id) =>
      MaterializedAgg.upsertBatch(spark, rows.toDF("k", "v"), id, tgt,
        Seq("k"), Seq("v"))
    }
    MaterializedAgg.compact(spark, tgt, Seq("k"), Seq("v"))

    // crash window: live partition sits renamed-out in staging (manifest
    // complete, _SUCCESS present), sources already deleted — a raw
    // spark.read.parquet here would see an EMPTY directory and silently
    // derive an undercounted aggregate. Pure readers must recover first.
    val fs = new Path(tgt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(new Path(tgt))
      .map(_.getPath.getName).find(_.startsWith("__batch=")).get
    val staging = new Path(tgt + "__agg_staging")
    fs.mkdirs(staging)
    fs.rename(new Path(tgt, live), new Path(staging, live))
    val out = fs.create(new Path(staging, "_SOURCES"), true)
    out.write("__batch=bghost\n".getBytes("UTF-8")); out.close()
    fs.createNewFile(new Path(staging, "_SUCCESS"))

    // read() alone (no upsertBatch/compact in between) must see everything
    assertSame(MaterializedAgg.read(spark, tgt, Seq("k"), Seq("v")),
      expected(all))
    assert(!fs.exists(staging))
  }
}
