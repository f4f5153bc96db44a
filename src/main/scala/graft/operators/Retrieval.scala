package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-retrieval composition and evaluation — the serving/eval layer a
  * production search stack puts ON TOP of the lexical ([[Bm25Index]],
  * [[TextAnalysis.bm25TopK]]) and dense ([[Similarity]]) retrievers:
  * hybrid rank fusion of multiple result lists, and graded relevance
  * metrics (recall@k, MRR@k, nDCG@k) against a qrels table.
  *
  * Scale shape: both operators consume RESULT LISTS, never the corpus —
  * input cardinality is queries × k × lists, so their cost is independent
  * of corpus size by construction. The corpus-sized work (scans, index
  * probes) happened inside the retrievers that produced the lists; fusion
  * and evaluation are cheap relational tails that Spark plans as a few
  * small shuffles. That separation is what makes hybrid search viable at
  * 100 TB: each retriever runs its own optimal plan (bucket-pruned
  * postings probe, partition-pruned IVF scan) and the fusion never forces
  * them into one monolithic join.
  *
  * Float determinism (the cross-engine oracle rules): RRF contributions
  * `1/(k0 + rank)` are exact IEEE divisions of exact small integers —
  * bit-equal in any engine — and are summed in LIST-INDEX order via the
  * position-ordered fold convention (array_sort + aggregate ≡ DuckDB
  * `list_sum(list(c ORDER BY li))`); only the final sum is rounded (6).
  * DCG terms are rounded to 6 BEFORE the rank-ordered fold (they contain
  * a `log2`), and final metrics round to 4.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009: "Reciprocal
    * rank fusion outperforms Condorcet and individual rank learning
    * methods") of N ranked lists: per (qid, id),
    * `rrf = Σ_lists 1/(k0 + rank_in_list)` over the lists the doc appears
    * in, then per-qid re-rank by (rrf desc, id). The standard hybrid
    * lexical+dense combiner — score scales never need calibrating because
    * only RANKS enter the sum (k0=60 is the paper's constant).
    *
    * Each input must have columns `(qid, id, rank)`; ranks are 1-based
    * within (list, qid), and each `(qid, id)` must appear AT MOST ONCE
    * per list (true of any real retriever's output — a duplicate would
    * contribute twice to the sum, silently, same for [[weightedFuse]]).
    * Returns `(qid, id, rrf, rank)` with `rank <= topK` per qid.
    * Contributions fold in list order (list 0 first), so the sum is
    * reproducible cross-engine and across partitionings.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one result list")
    require(k0 > 0 && topK > 0, "need k0 > 0 and topK > 0")
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("qid"), col("id"), lit(i).as("li"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as("c"))
    }.reduce(_ unionByName _)
    val fused = tagged.groupBy("qid", "id")
      .agg(round(aggregate(
        transform(array_sort(collect_list(struct(col("li"), col("c")))),
          s => s.getField("c")),
        lit(0.0), (acc, x) => acc + x), 6).as("rrf"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .orderBy("qid", "rank")
  }

  /** Weighted linear score fusion — the OTHER standard hybrid combiner
    * (when score scales ARE calibrated, weights express retriever trust;
    * [[rrfFuse]] is the rank-only fallback when they are not): per list
    * and query, min-max normalize the scores to [0,1] (a degenerate
    * all-equal list normalizes to 1.0), then per (qid, id) sum
    * `weight_i · norm_i` over the lists the doc appears in, folding in
    * list order. Inputs have `(qid, id, score)`; returns
    * `(qid, id, fused, rank)`.
    *
    * Determinism: normalized scores round to 6 before the weight
    * multiply; contributions fold in list order; the fused sum rounds to
    * 6; ranks tie to the smaller id. Same corpus-independent cost shape
    * as [[rrfFuse]] — result lists in, result lists out.
    */
  def weightedFuse(lists: Seq[DataFrame], weights: Seq[Double],
                   topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "weightedFuse needs at least one result list")
    require(lists.size == weights.size, "one weight per list")
    require(topK > 0, "need topK > 0")
    val w = Window.partitionBy("qid")
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("qid"), col("id"), col("score").cast("double").as("s"),
          lit(i).as("li"))
        .withColumn("mn", min("s").over(w))
        .withColumn("mx", max("s").over(w))
        .select(col("qid"), col("id"), col("li"),
          (when(col("mx") === col("mn"), lit(1.0))
            .otherwise(round((col("s") - col("mn")) /
              (col("mx") - col("mn")), 6)) * lit(weights(i))).as("c"))
    }.reduce(_ unionByName _)
    val fused = tagged.groupBy("qid", "id")
      .agg(round(aggregate(
        transform(array_sort(collect_list(struct(col("li"), col("c")))),
          s => s.getField("c")),
        lit(0.0), (acc, x) => acc + x), 6).as("fused"))
    val rw = Window.partitionBy("qid").orderBy(col("fused").desc, col("id"))
    fused.withColumn("rank", row_number().over(rw).cast("int"))
      .filter(col("rank") <= topK)
      .orderBy("qid", "rank")
  }

  /** Graded ranked-retrieval evaluation: per query, recall@k, MRR@k, and
    * nDCG@k of `results` against `qrels` — the report a retrieval team
    * reads before shipping a ranker change.
    *
    * `results` has `(qid, id, rank)` (1-based); `qrels` has
    * `(qid, id, grade)` with integer grades, `grade > 0` = relevant.
    * Returns one row per qid present in the (relevant) qrels:
    * `(qid, n_rel, recall_at_k, mrr, ndcg_at_k)`; a query whose top-k
    * contains no relevant doc scores zeros.
    *
    * Definitions: recall@k = |relevant ∩ top-k| / n_rel; MRR@k = 1/rank
    * of the first relevant result within the top k (0 if none);
    * DCG@k = Σ_{hits} (2^grade − 1)/log2(rank + 1) summed in rank order,
    * IDCG@k the same over the n_rel grades sorted descending at ideal
    * positions 1.., nDCG = DCG/IDCG. Equal grades at swapped ideal
    * positions produce identical term sequences, so no id tie-break is
    * needed for determinism.
    */
  def evalMetrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "need k > 0")
    def dcgTerm(grade: org.apache.spark.sql.Column,
                pos: org.apache.spark.sql.Column) =
      round((pow(lit(2.0), grade.cast("double")) - 1.0) /
        log2(pos.cast("double") + 1.0), 6)

    // r18: relevance judgments are label-bounded (|queries|·grades rows by
    // nature — they are human/reference annotations, never corpus-sized),
    // and the per-qid aggregates below are one row per query. Catalyst
    // cannot estimate sizes through the upstream windows/aggregates and
    // planned every join sort-merge (6 exchanges at sf0.1); broadcast
    // hints pick the strategy the cardinalities dictate (guide §3.1).
    val rel = qrels.filter(col("grade") > 0)
      .select(col("qid"), col("id"), col("grade"))
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    // retrieved relevant docs within the cutoff, with their system rank
    val hits = results.filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"))
      .join(broadcast(rel), Seq("qid", "id"))
    val perQ = hits.groupBy("qid").agg(
      count(lit(1)).as("n_hit"),
      min("rank").as("first_rank"),
      aggregate(
        transform(array_sort(collect_list(struct(col("rank"), col("grade")))),
          s => dcgTerm(s.getField("grade"), s.getField("rank"))),
        lit(0.0), (acc, x) => acc + x).as("dcg"))
    // ideal DCG: grades sorted descending, positions 1..min(k, n_rel)
    val ideal = rel.groupBy("qid").agg(
      aggregate(
        zip_with(
          slice(reverse(array_sort(collect_list(col("grade")))), 1, k),
          sequence(lit(1),
            least(lit(k), count(lit(1)).cast("int"))),
          (g, p) => dcgTerm(g, p)),
        lit(0.0), (acc, x) => acc + x).as("idcg"))
    nRel.join(broadcast(perQ), Seq("qid"), "left")
      .join(broadcast(ideal), Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 4).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rank").cast("double"),
          lit(0.0)), 4).as("mrr"),
        round(coalesce(col("dcg") / col("idcg"), lit(0.0)), 4)
          .as("ndcg_at_k"))
      .orderBy("qid")
  }
}
