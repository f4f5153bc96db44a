package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized BM25 inverted index — the lexical-retrieval sibling of the
  * ANN index family: postings `(term, doc_id, tf)` live in
  * `__bucket = pmod(xxhash64(term), numBuckets)` parquet partitions, so a
  * query's candidate scan opens ONLY the buckets its terms hash into
  * (literal partition pruning, the [[Similarity.buildIndex]] contract),
  * instead of re-tokenizing the corpus per query the way the full-scan
  * [[TextAnalysis.bm25TopK]] does.
  *
  * Exactness contract: the probe reproduces the full scan BIT-FOR-BIT —
  * same Lucene idf, same rounding, same tie order — because
  *  - per-term `df` is the postings count of that term (postings exist
  *    exactly where tf > 0, the scan's df definition);
  *  - `n`/`avgdl` are computed at build time by the same aggregate the
  *    scan runs, and round-trip parquet exactly;
  *  - the score is the SAME shared expression tree
  *    ([[TextAnalysis.bm25ScoreCol]]) over the same double values;
  *  - documents matching no term score round(0, 4) = 0.0 in the scan; the
  *    probe backfills them (by ascending doc_id, the zero-tie order) only
  *    when the candidate set alone cannot decide the top-k — candidates
  *    fewer than k, or a candidate score rounding to ≤ 0 — so the common
  *    probe never touches corpus-sized state beyond the doc-length join.
  * BM25IndexSpec asserts probe ≡ scan on real data including the
  * underfilled-rare-term case, and that only matching bucket partitions
  * are read.
  *
  * Scale shape: build is one tokenize + one (term, doc) count shuffle —
  * paid once per corpus version ([[IndexCatalog]] memoizes). A probe
  * reads |terms| buckets (≈ corpus/numBuckets each), aggregates
  * per-document tf columns, joins doc lengths on the candidate set, and
  * finishes with TakeOrdered.
  */
object Bm25Index {

  /** The tombstone set `(doc_id)` — the LOGICAL-delete side of the CDC
    * update path. Absent directory = empty set (fresh builds write no
    * tombstones), so pre-delete artifacts stay readable unchanged.
    */
  private[operators] def tombstones(spark: SparkSession,
                                    indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$indexDir/tombstones")
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** doclen minus tombstoned docs — the live corpus the probes rank. */
  private def liveDoclen(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/doclen")
      .join(broadcast(tombstones(spark, indexDir)), Seq("doc_id"),
        "left_anti")

  /** `stats` (n, avgdl) from a doclen relation by build's own aggregate —
    * long count/sum are exact, so every maintenance op that recomputes
    * stats over the same live rows lands the identical doubles.
    */
  private def writeStats(spark: SparkSession, doclen: DataFrame,
                         indexDir: String): Unit = {
    val Array(n2, avgdl2) = doclen
      .agg(count(lit(1)).cast("double").as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    import spark.implicits._
    Seq((n2, avgdl2)).toDF("n", "avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/stats")
  }

  def build(docs: DataFrame, idCol: String, textCol: String,
            indexDir: String, numBuckets: Int = 64): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        col("__toks"))
    base.select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("__bucket",
        pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int"))
      .repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$indexDir/postings")
    base.select("doc_id", "dl")
      .write.mode("overwrite").parquet(s"$indexDir/doclen")
    // the scan's corpus constants, by the scan's own aggregate
    base.agg(count(lit(1)).cast("double").as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/stats")
  }

  /** Incremental maintenance: append NEW documents' postings into an
    * existing index without rebuilding — at corpus scale the difference
    * between a usable materialized index and a nightly full re-shuffle.
    *
    * Exactness contract: after `build(A); merge(B)` the index is
    * BIT-IDENTICAL in effect to `build(A ∪ B)` — delta postings/doclen
    * rows land in the same bucket layout (same term hash), per-term df
    * is a row count so disjoint unions add exactly, and `stats` is
    * recomputed from the full doclen by the SAME aggregate expression
    * build uses (long count/sum round-trip parquet exactly; the one
    * double division is performed on identical values). Bm25IndexSpec
    * pins probe-after-merge ≡ probe-on-full-build ≡ full scan, and
    * `ns_text_bm25_merge` proves it through the driver's oracle.
    *
    * Contract: `docs` must carry doc_ids not present in doclen — live OR
    * tombstoned (duplicate ids would double-count df; a tombstoned id's
    * re-added postings would be masked along with its old ones). The CDC
    * update path is [[delete]] (correct immediately) → [[compact]]
    * (amortized) → merge of the new version.
    */
  def merge(docs: DataFrame, idCol: String, textCol: String,
            indexDir: String, numBuckets: Int = 64): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = docs.sparkSession
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        col("__toks"))
    base.select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("__bucket",
        pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int"))
      .repartition(col("__bucket"))
      .write.mode("append").partitionBy("__bucket")
      .parquet(s"$indexDir/postings")
    base.select("doc_id", "dl")
      .write.mode("append").parquet(s"$indexDir/doclen")
    // recompute the corpus constants from the now-complete LIVE doclen
    // (tombstone-aware: a delete between merges must keep stats on the
    // live corpus) with build's aggregate; writeStats materializes before
    // overwriting the dir read from
    writeStats(spark, liveDoclen(spark, indexDir), indexDir)
  }

  /** LOGICAL delete — the O(delta) half of the CDC update path
    * ([[graft.streaming.CdcIngest]]'s delete-through semantics carried to
    * the retrieval index): append the ids to `tombstones/` and recompute
    * `stats` over the remaining live doclen. Every probe masks tombstoned
    * docs and counts df over live postings only, so a probe after
    * delete(D) is BIT-IDENTICAL to a probe on an index built without D —
    * no postings rewrite on the delete path at all.
    *
    * The tombstone set rides probes as a broadcast anti-join: keep it
    * bounded by running [[compact]] once deletes accumulate (the LSM
    * discipline — cheap logical deletes, amortized physical reclaim).
    * Deleting ids not in the index is a no-op. Updating a document is
    * `delete(old)` (correct immediately) then, after a [[compact]],
    * [[merge]] of the new version — merge ids must stay disjoint from
    * ALL ids present in doclen, live or dead, because postings carry no
    * version column that could distinguish re-added rows from masked
    * ones.
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame,
             idCol: String): Unit = {
    ids.select(col(idCol).as("doc_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$indexDir/tombstones")
    writeStats(spark, liveDoclen(spark, indexDir), indexDir)
  }

  /** PHYSICAL reclaim: rewrite `postings`/`doclen` without the
    * tombstoned rows (same bucket layout), recompute `stats` with
    * build's aggregate, truncate the tombstone set. After compact the
    * index is byte-layout-equivalent to a fresh build of the live
    * corpus, and previously-deleted ids may be re-merged. O(index) —
    * the amortized maintenance op, run from the single-maintainer path
    * ([[IndexCatalog.replaceDir]]'s contract).
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val dead = tombstones(spark, indexDir)
    if (dead.head(1).isEmpty) return
    val cleanPostings = spark.read.parquet(s"$indexDir/postings")
      .join(broadcast(dead), Seq("doc_id"), "left_anti")
    cleanPostings.repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$indexDir/.postings-compact")
    IndexCatalog.replaceDir(spark, s"$indexDir/.postings-compact",
      s"$indexDir/postings")
    val cleanDoclen = spark.read.parquet(s"$indexDir/doclen")
      .join(broadcast(dead), Seq("doc_id"), "left_anti")
    cleanDoclen.write.mode("overwrite").parquet(s"$indexDir/.doclen-compact")
    IndexCatalog.replaceDir(spark, s"$indexDir/.doclen-compact",
      s"$indexDir/doclen")
    writeStats(spark, spark.read.parquet(s"$indexDir/doclen"), indexDir)
    // truncate tombstones: an empty same-schema relation built from the
    // schema alone (never from the source dir being overwritten)
    spark.createDataFrame(java.util.Collections.emptyList[
        org.apache.spark.sql.Row](), dead.schema)
      .write.mode("overwrite").parquet(s"$indexDir/tombstones")
  }

  /** Probe: exact BM25 top-k for `terms` against the materialized index.
    * Output `(doc_id, score, rank)` — identical to
    * [[TextAnalysis.bm25TopK]] over the indexed corpus.
    */
  def topK(spark: SparkSession, indexDir: String, terms: Seq[String],
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
           numBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    import spark.implicits._
    // the terms' buckets, by the same hash the build used (one tiny job)
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).distinct.sorted
    // tombstone mask BEFORE df: a probed term's postings — dead or live
    // — all live in that term's bucket, so masking the pruned slice
    // yields the exact LIVE df with no extra bucket reads
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("__bucket").isin(buckets.map(Integer.valueOf).toSeq: _*) &&
        col("term").isin(terms: _*))
      .join(broadcast(tombstones(spark, indexDir)), Seq("doc_id"),
        "left_anti")
    // per-term document frequency = postings row count (tf > 0 by
    // construction): ≤ |terms| rows, collected as literals
    val dfMap = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val statsRow = spark.read.parquet(s"$indexDir/stats").head()
    val (n, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))

    val tfCols = terms.indices.map(i =>
      coalesce(sum(when(col("term") === terms(i), col("tf"))), lit(0L))
        .cast("double").as(s"tf$i"))
    val cand = postings.groupBy("doc_id")
      .agg(tfCols.head, tfCols.tail: _*)
      .join(spark.read.parquet(s"$indexDir/doclen"), "doc_id")
      .withColumn("n", lit(n)).withColumn("avgdl", lit(avgdl))
    val scored = terms.indices.foldLeft(cand)((df0, i) =>
        df0.withColumn(s"df$i", lit(dfMap.getOrElse(terms(i), 0.0))))
      .select(col("doc_id"),
        round(TextAnalysis.bm25ScoreCol(terms.length, k1, b), 4).as("score"))
    val agg = scored.agg(count(lit(1)), min("score")).head()
    val (candCount, minScore) =
      (agg.getLong(0), if (agg.isNullAt(1)) 1.0 else agg.getDouble(1))
    val pool =
      if (candCount >= k && minScore > 0.0) scored
      else {
        // underfill / zero-rounded candidates: the scan ranks zero-score
        // docs by ascending doc_id — backfill the k smallest non-candidate
        // ids at score 0.0 (any id beyond those cannot enter the top-k)
        val zeros = liveDoclen(spark, indexDir)
          .join(scored.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit(0.0).as("score"))
          .orderBy("doc_id").limit(k)
        scored.unionByName(zeros)
      }
    TextAnalysis.bm25RankTail(pool, k)
  }

  /** Distributed batch retrieval: exact BM25 top-k over MATCHING
    * documents for MANY queries in one plan — the shape lexical
    * hard-negative mining needs (one probe per anchor would serialize
    * thousands of driver round-trips; this is one bucket-pruned scan +
    * one candidate-sized shuffle for the whole batch).
    *
    * Semantics: standard retrieval top-k — only documents matching ≥1
    * query term are ranked (no zero-score backfill; a query with fewer
    * than k matching docs returns fewer rows). When every query has ≥k
    * positive-score candidates this equals [[topK]] row-for-row
    * (Bm25IndexSpec pins it).
    *
    * Bit-determinism: each posting row contributes
    * [[TextAnalysis.bm25TermContrib]] (the single-term tree the pivoted
    * paths also use); per-(query, doc) contributions fold in term-index
    * order via a sorted-struct aggregate, reproducing the pivoted
    * left-fold exactly (absent terms contribute an exact +0.0 there, and
    * x + 0.0 == x for the non-negative contributions involved), so the
    * scores — and the DuckDB oracle — match the single-query paths
    * bit-for-bit.
    *
    * Output: `(qid, doc_id, score, rank)` ordered by (qid, rank).
    */
  def batchTopK(spark: SparkSession, indexDir: String,
                queries: Seq[(String, Seq[String])], k: Int = 10,
                k1: Double = 1.2, b: Double = 0.75,
                numBuckets: Int = 64,
                exclude: Seq[(String, Long)] = Seq.empty): DataFrame = {
    require(queries.nonEmpty, "batch BM25 needs at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs >= 1 term")
    require(queries.forall(q => q._2.distinct.size == q._2.size),
      "query terms must be distinct within a query")
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val buckets = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).distinct.sorted
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("__bucket").isin(buckets.map(Integer.valueOf).toSeq: _*) &&
        col("term").isin(allTerms: _*))
      .join(broadcast(tombstones(spark, indexDir)), Seq("doc_id"),
        "left_anti") // live df + live candidates, as in topK
    val dfMap = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val statsRow = spark.read.parquet(s"$indexDir/stats").head()
    val (n, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))
    // (qid, term-slot, term, corpus df): |queries|·|terms| rows, broadcast
    val qt = queries.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t, dfMap.getOrElse(t, 0.0)) }
    }.toDF("qid", "ti", "term", "df")
    val contrib = TextAnalysis.bm25TermContrib(col("tf").cast("double"),
      col("df"), col("dl"), lit(n), lit(avgdl), k1, b)
    val scored = postings.join(broadcast(qt), "term")
      .join(spark.read.parquet(s"$indexDir/doclen"), "doc_id")
      .select(col("qid"), col("doc_id"),
        struct(col("ti"), contrib.as("c")).as("tc"))
      .groupBy("qid", "doc_id")
      .agg(aggregate(sort_array(collect_list(col("tc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("raw"))
      .select(col("qid"), col("doc_id"), round(col("raw"), 4).as("score"))
    // per-query excluded docs (e.g. the anchor itself in more-like-this
    // retrieval), removed BEFORE ranking so the top-k stays dense
    val pruned =
      if (exclude.isEmpty) scored
      else scored.join(
        broadcast(exclude.toDF("qid", "doc_id")), Seq("qid", "doc_id"),
        "left_anti")
    import org.apache.spark.sql.expressions.Window
    pruned.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id")))
        .cast("int"))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** More-like-this retrieval for a bounded batch of ANCHOR documents —
    * the doc-to-doc form of [[batchTopK]] that lexical hard-negative
    * mining and near-dup triage actually call: each anchor's query is its
    * own `m` highest-tf terms (ties broken lexicographically, both
    * deterministic and SQL-replicable), retrieval excludes the anchor
    * itself, output ranks stay dense.
    *
    * The anchor batch is training-batch-sized (one tiny aggregation job
    * derives the term profiles, collected as ≤ |anchors|·m rows) — for
    * corpus×corpus similarity use the dedup family, not retrieval.
    *
    * `ns_text_bm25_mlt` oracles this END-TO-END relationally in DuckDB —
    * anchor term profiles, per-term df, ti-ordered contribution fold,
    * self-exclusion, ranks — no literal scores anywhere.
    */
  def moreLikeThis(spark: SparkSession, indexDir: String, docs: DataFrame,
                   idCol: String, textCol: String, anchorIds: Seq[Long],
                   m: Int = 3, k: Int = 10, k1: Double = 1.2,
                   b: Double = 0.75, numBuckets: Int = 64): DataFrame = {
    require(anchorIds.nonEmpty, "more-like-this needs at least one anchor")
    require(m > 0, s"need a positive per-anchor term count, got $m")
    import org.apache.spark.sql.expressions.Window
    val profile = docs.filter(col(idCol).isin(anchorIds.map(Long.box): _*))
      .select(col(idCol).cast("long").as("aid"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("aid", "term").agg(count(lit(1)).as("tf"))
      .withColumn("r", row_number().over(
        Window.partitionBy("aid").orderBy(col("tf").desc, col("term"))))
      .filter(col("r") <= m)
      .orderBy("aid", "r")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byAnchor = profile.groupBy(_._1)
    val queries = anchorIds.distinct.sorted.flatMap { a =>
      byAnchor.get(a).map(ts => a.toString -> ts.map(_._2).toSeq)
    }
    require(queries.nonEmpty, "no anchor id matched a document")
    batchTopK(spark, indexDir, queries, k, k1, b, numBuckets,
      exclude = queries.map { case (qid, _) => qid -> qid.toLong })
  }
}
