package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Dedup, IndexCatalog}

class PipelineQueriesSpec extends SparkSpec {

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
