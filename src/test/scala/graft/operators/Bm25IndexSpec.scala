package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

  test("index probe equals the full scan bit-for-bit on real data") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("bm25_idx").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 16)
    val terms = Seq("join", "stream", "dup")
    val scan = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 10))
    val probe = rows(Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16))
    assert(probe === scan)
  }

  test("underfill: rare terms backfill zero-score docs in scan order") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "eta theta")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("bm25_idx2").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 4)
    // only docs 1-2 match; k=4 forces two zero-score backfills (ids 3, 4)
    val terms = Seq("alpha")
    val scan = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 4))
    val probe = rows(Bm25Index.topK(spark, dir, terms, 4, numBuckets = 4))
    assert(probe === scan)
    assert(probe.count(_._2 == 0.0) === 2)
    assert(probe.filter(_._2 == 0.0).map(_._1) === Seq(3L, 4L))
    // a term matching nothing at all: pure backfill
    val none = rows(Bm25Index.topK(spark, dir, Seq("nosuchterm"), 3,
      numBuckets = 4))
    assert(none === rows(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("nosuchterm"), 3)))
    assert(none.map(_._1) === Seq(1L, 2L, 3L) && none.forall(_._2 == 0.0))
  }

  test("incremental merge equals a full build bit-for-bit") {
    val docs = Tables.documents(spark, sfDir)
    val full = Files.createTempDirectory("bm25_full").toString
    val inc = Files.createTempDirectory("bm25_inc").toString
    Bm25Index.build(docs, "doc_id", "text", full, numBuckets = 16)
    Bm25Index.build(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      inc, numBuckets = 16)
    Bm25Index.merge(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      inc, numBuckets = 16)
    // corpus constants identical after the parquet round-trip recompute
    val sFull = spark.read.parquet(s"$full/stats").head()
    val sInc = spark.read.parquet(s"$inc/stats").head()
    assert(sInc.getDouble(0) === sFull.getDouble(0))
    assert(sInc.getDouble(1) === sFull.getDouble(1))
    val terms = Seq("join", "stream", "dup")
    val mergedProbe = rows(Bm25Index.topK(spark, inc, terms, 10,
      numBuckets = 16))
    assert(mergedProbe === rows(Bm25Index.topK(spark, full, terms, 10,
      numBuckets = 16)))
    assert(mergedProbe === rows(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 10)))
  }

  test("delete masks immediately, compact reclaims, deleted ids re-merge") {
    val docs = Tables.documents(spark, sfDir)
    val deadIds = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val live = docs.filter(col("doc_id") % 7 =!= 3)
    val dir = Files.createTempDirectory("bm25_del").toString
    val ref = Files.createTempDirectory("bm25_del_ref").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 16)
    Bm25Index.build(live, "doc_id", "text", ref, numBuckets = 16)
    val terms = Seq("join", "stream", "dup")

    // LOGICAL delete: probe ≡ probe on an index built without the docs,
    // bit for bit — live df, live stats, masked candidates
    Bm25Index.delete(spark, dir, deadIds, "doc_id")
    assert(rows(Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16)) ===
      rows(Bm25Index.topK(spark, ref, terms, 10, numBuckets = 16)))
    val (sDel, sRef) = (spark.read.parquet(s"$dir/stats").head(),
      spark.read.parquet(s"$ref/stats").head())
    assert(sDel.getDouble(0) === sRef.getDouble(0))
    assert(sDel.getDouble(1) === sRef.getDouble(1))
    // batch path masks identically
    val qs = Seq("qa" -> Seq("join", "stream"), "qb" -> Seq("hash", "scan"))
    assert(Bm25Index.batchTopK(spark, dir, qs, 5, numBuckets = 16)
      .collect().toSeq ===
      Bm25Index.batchTopK(spark, ref, qs, 5, numBuckets = 16)
        .collect().toSeq)

    // PHYSICAL compact: same answers, rows actually gone, tombstones empty
    Bm25Index.compact(spark, dir)
    assert(rows(Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16)) ===
      rows(Bm25Index.topK(spark, ref, terms, 10, numBuckets = 16)))
    assert(spark.read.parquet(s"$dir/postings")
      .join(deadIds, "doc_id").count() === 0L)
    assert(spark.read.parquet(s"$dir/doclen")
      .join(deadIds, "doc_id").count() === 0L)
    assert(Bm25Index.tombstones(spark, dir).count() === 0L)

    // the update path completes: re-merge the deleted docs after compact
    // — the index must equal the original full build again
    Bm25Index.merge(docs.filter(col("doc_id") % 7 === 3), "doc_id", "text",
      dir, numBuckets = 16)
    assert(rows(Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16)) ===
      rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 10)))
  }

  test("deleted docs never backfill as zero-score candidates") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "eta theta")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("bm25_del_zero").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 4)
    Bm25Index.delete(spark, dir, Seq(3L).toDF("doc_id"), "doc_id")
    val live = docs.filter(col("doc_id") =!= 3L)
    // k=4 over one matching term: backfill must pick live ids (4, 5),
    // skipping the tombstoned 3 the old doclen would have offered
    val probe = rows(Bm25Index.topK(spark, dir, Seq("alpha"), 4,
      numBuckets = 4))
    assert(probe === rows(
      TextAnalysis.bm25TopK(live, "doc_id", "text", Seq("alpha"), 4)))
    assert(probe.filter(_._2 == 0.0).map(_._1) === Seq(4L, 5L))
  }

  test("batch retrieval equals per-query probes, query by query") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("bm25_batch").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 16)
    val queries = Seq(
      "q_join_stream" -> Seq("join", "stream"),
      "q_hash_scan" -> Seq("hash", "scan"),
      "q_merge_filter" -> Seq("merge", "filter"))
    val batch = Bm25Index.batchTopK(spark, dir, queries, 10, numBuckets = 16)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    queries.foreach { case (qid, terms) =>
      val single = rows(Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16))
      assert(batch(qid) === single, s"qid=$qid")
    }
  }

  test("batch retrieval ranks matching docs only — no zero backfill") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"),
      (4L, "epsilon zeta"), (5L, "eta theta")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("bm25_batch2").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 4)
    val out = Bm25Index.batchTopK(spark, dir,
        Seq("qa" -> Seq("alpha"), "qnone" -> Seq("nosuchterm")), k = 4,
        numBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    // only the two alpha docs rank; the no-match query returns nothing
    assert(out.toSeq === Seq(("qa", 2L, 1), ("qa", 1L, 2)))
  }

  test("more-like-this equals scan-derived retrieval minus the anchor") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("bm25_mlt").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 16)
    val anchors = Seq(11L, 42L, 123L)
    val got = Bm25Index.moreLikeThis(spark, dir, docs, "doc_id", "text",
        anchors, m = 3, k = 10, numBuckets = 16)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    anchors.foreach { a =>
      // independent path: derive the anchor's top terms driver-side, run
      // the FULL SCAN at k+1, drop the anchor, renumber
      val text = docs.filter(col("doc_id") === a).head().getAs[String]("text")
      val terms = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => (t, o.length) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
      val scan = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 11))
      val expected = scan.filterNot(_._1 == a).take(10)
        .zipWithIndex.map { case ((id, sc, _), i) => (id, sc, i + 1) }
      assert(got(a.toString) === expected, s"anchor=$a terms=$terms")
    }
  }

  test("probe reads only the buckets the query terms hash into") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("bm25_idx3").toString
    Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 16)
    val terms = Seq("join", "stream")
    val probe = Bm25Index.topK(spark, dir, terms, 10, numBuckets = 16)
    probe.collect()
    // this plan shuffles (groupBy/join/window), so under AQE the scans sit
    // inside materialized QueryStageExec subtrees that plain collect()
    // does not enter — unwrap stages and reused exchanges explicitly
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val postingsScans = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postingsScans.nonEmpty)
    val totalFiles = spark.read.parquet(s"$dir/postings").inputFiles.length
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(16L)).cast("int"))
      .collect().map(_.getInt(0)).toSet
    postingsScans.foreach { sc =>
      val n = sc.metrics("numFiles").value
      assert(n > 0 && n < totalFiles,
        s"postings scan read $n of $totalFiles files — no partition pruning")
    }
    // the assertion bites: more buckets exist than the probe touches
    assert(spark.read.parquet(s"$dir/postings")
      .select("__bucket").distinct().count() > buckets.size)
  }
}
