package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Layout

class StreamingLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(ids: Range) =
    ids.map(i => (i.toLong, (i * 2654435761L % 4096).abs, i.toLong))
      .toDF("id", "u", "e")

  test("micro-batches land query-ready; redelivery is idempotent") {
    val path = Files.createTempDirectory("slayout").toString
    val b0 = mkBatch(0 until 2000)
    val b1 = mkBatch(2000 until 4000)
    val b2 = mkBatch(4000 until 6000)
    StreamingLayout.applyBatch(spark, b0, Seq("u", "e"), 8, 5, path, 0L)
    StreamingLayout.applyBatch(spark, b1, Seq("u", "e"), 8, 5, path, 1L)
    // redeliver batch 1 (at-least-once), then batch 2
    StreamingLayout.applyBatch(spark, b1, Seq("u", "e"), 8, 5, path, 1L)
    StreamingLayout.applyBatch(spark, b2, Seq("u", "e"), 8, 5, path, 2L)

    val all = b0.unionByName(b1).unionByName(b2)
    val got = StreamingLayout.prunedRead(spark, path,
        Seq(("u", 1000L, 1500L)))
      .select("id").collect().map(_.getLong(0)).sorted
    val want = all.filter(col("u").between(1000, 1500))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq) // no duplicates from the redelivery
    // stats never double-count either
    val statRows = spark.read.parquet(s"$path/stats")
      .groupBy("bin").agg(sum("n_rows").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(statRows === 6000L)
  }

  test("later batches clamp to the batch-0 law; pruning still bites") {
    val path = Files.createTempDirectory("slayout2").toString
    StreamingLayout.applyBatch(spark, mkBatch(0 until 2000),
      Seq("u", "e"), 8, 5, path, 0L)
    // batch 1's e range (5000-7000) exceeds batch 0's law (0-1999): clamps
    StreamingLayout.applyBatch(spark, mkBatch(5000 until 7000),
      Seq("u", "e"), 8, 5, path, 1L)
    val law = Layout.readMeta(spark, path)
    assert(law.mins(1) === 0L)
    val got = StreamingLayout.prunedRead(spark, path,
        Seq(("e", 5500L, 6000L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === (5500 to 6000).map(_.toLong).toSet)
    // pruning: the e-band read touches a strict subset of data files
    val pr = StreamingLayout.prunedRead(spark, path, Seq(("u", 100L, 150L)))
    val rows = pr.collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$path/data").inputFiles.length
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val read = scans(pr.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(read > 0 && read < total, s"read $read of $total files")
  }
}
