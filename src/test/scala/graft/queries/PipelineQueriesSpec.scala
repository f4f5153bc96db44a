package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.operators.{Dedup, IndexCatalog}

class PipelineQueriesSpec extends SparkSpec {

  test("q10b_latest_wins_agg: hash-aggregate plan (no Window), equals q10") {
    val q10b = SparkEntry.queries("q10b_latest_wins_agg")(spark, sfDir)
    val plan = q10b.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), s"skew-immune form must not sort per key:\n$plan")
    val q10 = SparkEntry.queries("q10_latest_wins")(spark, sfDir)
    assert(q10b.exceptAll(q10).isEmpty && q10.exceptAll(q10b).isEmpty,
      "aggregate twin must equal the window form (event_id unique per user)")
  }

  test("q14b_sliding_window: hour-aligned slices equal tumbling q14; 2 windows/row") {
    val q14b = SparkEntry.queries("q14b_sliding_window")(spark, sfDir)
    // sliding windows whose start is hour-aligned cover [start, start+1h)
    // — exactly q14's tumbling buckets
    val hourAligned = q14b.filter(minute(col("w_start")) === 0)
      .select(col("w_start").as("window_start"), col("n"), col("sum_value"))
    val q14 = SparkEntry.queries("q14_event_window")(spark, sfDir)
    assert(hourAligned.exceptAll(q14).isEmpty && q14.exceptAll(hourAligned).isEmpty)
    // width/slide = 2: every event contributes to exactly two windows
    val total = q14b.agg(sum("n")).head().getLong(0)
    assert(total == 2 * graft.Tables.events(spark, sfDir).count())
  }

  test("dupClusterTable builds once per input version, then serves a parquet scan") {
    val root = Files.createTempDirectory("graft-cluster-cache").toString
    val prev = spark.conf.getOption("spark.graft.index.root")
    spark.conf.set("spark.graft.index.root", root)
    IndexCatalog.invalidateMemo()
    try {
      PipelineQueries.dupClusterTable(spark, sfDir).count()
      def entry() = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("dup-clusters-")) match {
        case Array(one) => one
        case other => fail(s"expected exactly one cluster-table entry, got ${other.length}")
      }
      val files = entry().listFiles().map(f => (f.getName, f.lastModified)).toSet

      // second invocation in the session: the pairs→CC run must NOT happen
      // again — the artifact stays byte-identical and the served plan is a
      // scan of the materialized table (the amortization ns_curate_keep_best
      // rides on)
      IndexCatalog.invalidateMemo() // force the FS path, not the JVM memo
      val second = PipelineQueries.dupClusterTable(spark, sfDir)
      second.count()
      val files2 = entry().listFiles().map(f => (f.getName, f.lastModified)).toSet
      assert(files2 == files, "second invocation must not rebuild the cluster table")
      assert(second.queryExecution.executedPlan.toString.contains("dup-clusters-"),
        "consumers must read the materialized table")

      // and the memoized table equals the direct pairs→CC computation
      val docs = graft.Tables.documents(spark, sfDir)
      val direct = Dedup.dupClusters(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8), docs, "doc_id")
      assert(second.exceptAll(direct).isEmpty && direct.exceptAll(second).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.index.root", v)
        case None => spark.conf.unset("spark.graft.index.root")
      }
      IndexCatalog.invalidateMemo()
    }
  }
}
