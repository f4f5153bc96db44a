package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, HyperplaneKernels}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the correctness baseline;
  * sign-random-projection (hyperplane LSH) bucketing is the scale path —
  * candidate generation cost O(N·planes·dim) + a bucket-pruned scan instead
  * of a full O(N·dim) scan per query (and O(N²) for all-pairs).
  */
object Similarity {

  /** Brute-force cosine top-k against a single query vector (given as the
    * row of `embs` with `idCol == queryId`). The one-row query side is
    * broadcast; the scan stays fully parallel and codegen'd; TakeOrdered
    * handles the top-k without a global sort.
    */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val query = embs.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    embs.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("cos", round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily select k results maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)` — the dedup-aware serving
    * layer over a near-duplicate-heavy corpus, where plain top-k returns
    * k copies of the same document.
    *
    * Scale shape — the production split: candidate generation is the
    * DISTRIBUTED stage (the full corpus scanned by the codegen'd cosine,
    * top `k·candidateFactor` via TakeOrdered — or swap in the LSH/IVF
    * probes for a hot path); the greedy diversification runs driver-side
    * over those ≤ k·candidateFactor rows — an O(k²·factor) loop on data
    * that must fit the response anyway, never a corpus-sized iteration.
    *
    * Determinism: relevance is the Spark-computed rounded-3 cosine;
    * pairwise diversity uses the same float→double kernel arithmetic
    * ([[graft.functions.VectorKernels.cosine]]-equivalent, driver-side)
    * rounded 3; ties break to the smaller id. At `lambda = 1.0` the
    * penalty vanishes and the selection provably equals brute-force
    * top-k (the oracle-equality hook `ns_ann_mmr_lambda1` exploits).
    */
  /** The MMR greedy loop's cosine — sequential-fold dot/norms in Double,
    * the SAME op order as the Catalyst kernel
    * ([[graft.functions.VectorKernels.cosine]]) and DuckDB's
    * `list_cosine_similarity`, so all three implementations agree
    * bit-for-bit on identical float inputs. Bit-equality to the Catalyst
    * kernel is spec-pinned over the fixture vectors (SimilaritySpec
    * "driverCos ≡ cosine_similarity"); the boundary distance of the
    * values the λ=0.6 oracle actually consumes is certified by
    * `scripts/margin_audit.py` (mmr candidate rel + pairwise rows).
    */
  private[graft] def driverCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def mmrTopK(embs: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, lambda: Double,
              candidateFactor: Int = 4): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val query = embs.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    val cands = embs.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("rel", round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol).as("id"), col("rel"), col(vecCol).as("vec"))
      .orderBy(col("rel").desc, col("id"))
      .limit(k * candidateFactor)
      .as[(Long, Double, Array[Float])].collect()

    def cos(a: Array[Float], b: Array[Float]): Double = driverCos(a, b)
    def r3(x: Double): Double =
      BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

    val selected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float])]
    val pool = scala.collection.mutable.ArrayBuffer.from(cands)
    while (selected.size < k && pool.nonEmpty) {
      val best = pool.zipWithIndex.map { case ((id, rel, vec), i) =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => r3(cos(vec, s._3))).max
        (lambda * rel - (1 - lambda) * maxSim, -id, i)
      }.max
      selected += pool(best._3)
      pool.remove(best._3)
    }
    selected.zipWithIndex
      .map { case ((id, rel, _), i) => (i + 1, id, rel) }
      .toSeq.toDF("rank", "vec_id", "rel")
  }

  /** Bucket expression: for each of `numPlanes` pseudo-random ±1
    * hyperplanes (components from fixed hashes — reproducible across
    * executors with no plane-matrix broadcast), bit p =
    * [dot(vec, plane_p) > 0]; bucket = bits as an integer. One codegen'd
    * multiply-add pass ([[graft.functions.HyperplaneBands]], bands = 1).
    */
  def bucketExpr(vec: Column, numPlanes: Int): Column =
    element_at(graft.functions.hyperplane_bands(vec, numPlanes, 1), 1)

  /** LSH-bucketed ANN top-k: prune to vectors whose bucket is within
    * `maxHamming` bits of the query's bucket (multi-probe), then exact
    * cosine + top-k on the pruned candidate set. Buckets here are computed
    * by a full scan per query — fine for ad-hoc one-shots; the repeated-
    * query scale path is [[buildIndex]] + [[indexTopK]], which prunes the
    * SCAN, not just the cosine.
    */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int = 8,
              maxHamming: Int = 2): DataFrame = {
    val withBucket = embs.withColumn("bucket", bucketExpr(col(vecCol), numPlanes))
    val query = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("bucket").as("query_bucket"))
    withBucket.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .filter(bit_count(col("bucket").bitwiseXOR(col("query_bucket"))) <= maxHamming)
      .withColumn("cos", round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the ANN index: `(id, vec)` written ONCE, laid out as
    * `bucket=K/` partition dirs (hyperplane bucket of the vector). Build
    * cost is one codegen'd pass + one write; queries then never scan
    * non-matching buckets ([[indexTopK]]).
    */
  def buildIndex(embs: DataFrame, idCol: String, vecCol: String,
                 indexDir: String, numPlanes: Int = 8): Unit =
    embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", bucketExpr(col("vec"), numPlanes))
      // cluster by bucket before the partitioned write: each bucket's rows
      // land in ONE task, so the layout is one file per bucket instead of
      // (tasks × buckets) small files
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(indexDir)

  /** All buckets within `maxHamming` sign flips of `queryBucket`. */
  def probeBuckets(queryBucket: Long, numPlanes: Int, maxHamming: Int): Seq[Long] =
    (0 to maxHamming).flatMap(k => (0 until numPlanes).combinations(k)
      .map(_.foldLeft(queryBucket)((b, bit) => b ^ (1L << bit))))

  /** BATCH brute-force: exact cosine top-k for EVERY query vector in
    * `queries` at once — the realistic pipeline shape (ANN labeling of a
    * query table), not a per-vector loop. The (small) query side is
    * broadcast so the embedding scan stays one parallel pass; ranking is a
    * window PARTITIONED by query id (each partition = one query's
    * candidates — bounded, and at scale you pre-prune candidates with
    * [[indexTopKBatch]] so the window never sees the full corpus).
    */
  def bruteForceTopKBatch(embs: DataFrame, idCol: String, vecCol: String,
                          queries: DataFrame, qidCol: String, qvecCol: String,
                          k: Int, excludeSelf: Boolean = true): DataFrame =
    batchScoredTopK(embs, idCol, vecCol,
      queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec")),
      if (excludeSelf) col(idCol) =!= col("qid") else lit(true), k, Nil)

  /** Fixed-point quantization of a float embedding to BIGINT components:
    * `q_i = floor(double(e_i) · 2^20 + 0.5)`. Every step is EXACT IEEE
    * arithmetic — float→double widening is lossless, multiplying by a
    * power of two only shifts the exponent (no rounding), adding 0.5 to a
    * value < 2^21 is exact, and floor is exact — so ANY IEEE-754 engine
    * (any Spark build, any DuckDB build, numpy) produces the identical
    * integers from the identical parquet bits. This is the foundation of
    * the integer-exact similarity contracts: a scale of 10^k would
    * instead put a 1-ulp product error next to a round() boundary, which
    * is exactly the cross-engine fragility this kernel exists to remove.
    */
  // NOTE: fixedPointQuantize/intDot are the REFERENCE implementation of
  // the quantized-dot contract — the hot paths run the fused codegen'd
  // graft.functions.int_dot_q, whose bit-equality to this composition
  // is spec-pinned (SimilaritySpec); any change to the scale or rounding
  // must land in BOTH.
  def fixedPointQuantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1048576.0) + lit(0.5)))

  /** Exact INTEGER dot product of two [[fixedPointQuantize]]d vectors —
    * `Σ qa_i·qb_i` as pure int64 (dim·2^40-bounded for unit-ish inputs,
    * nowhere near overflow), codegen'd zip_with/aggregate, no shuffle.
    * On unit-norm embeddings `dot / 2^40` IS the cosine to quantization
    * precision (~1e-6), but unlike a rounded double it is bit-identical
    * across engines — two engines can disagree about a float sum, never
    * about an integer one.
    */
  def intDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** BATCH exact top-k by INTEGER dot product — [[bruteForceTopKBatch]]
    * with the float cosine replaced by the fixed-point-quantize /
    * int64-dot contract ([[fixedPointQuantize]]/[[intDot]] are the
    * reference implementation; the hot path fuses them into the
    * codegen'd [[graft.functions.int_dot_q]], bit-equality spec-pinned),
    * for consumers that fold similarity into downstream integer
    * arithmetic (graph edge weights, propagation trajectories) where a
    * rounded double within 1 ulp of its rounding boundary would make
    * the result depend on the engine build. Ranking is (dot DESC,
    * id ASC) — a total order on integers, so the graph is a pure
    * function of the parquet bits. Plan shape: broadcast query side,
    * one codegen'd corpus scan, ranking through the BOUNDED
    * [[graft.functions.TopNBy]] aggregate (|Q|·k shuffle — see the body
    * comment for why a window is catastrophic here), exact dots
    * recomputed for the selected pairs via join-back.
    */
  def intDotTopKBatch(embs: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String, qvecCol: String,
                      k: Int, excludeSelf: Boolean = true): DataFrame = {
    // Two scale decisions, both load-bearing at N² candidate volume:
    //  - the dot is the fused codegen'd kernel (quantize + int64 fold in
    //    one primitive loop, [[graft.functions.int_dot_q]]) — bit-equal
    //    to fixedPointQuantize + intDot, but the interpreted
    //    higher-order form allocated two long arrays per pair and ran
    //    outside codegen (32 s -> 2.6 s on the 3.2M-pair sf0.1 build);
    //  - ranking is the BOUNDED [[graft.functions.TopNBy]] aggregate,
    //    NOT a window: a window shuffles every candidate row (N·|Q| —
    //    a terabyte at 200 k², where this build became unrunnable),
    //    while top-n partials carry ≤ k entries per query per task and
    //    combine map-side, so the shuffle is |Q|·k. The aggregate ranks
    //    on the dot cast to double — EXACT while |dot| < 2^53
    //    (unit-norm-ish quantized vectors up to dim 8192; the family
    //    contract) — and ties break to the smaller id, the same total
    //    order as the window form. The exact int64 dot is then
    //    recomputed for only the |Q|·k selected pairs via a join-back,
    //    and GUARDED there: a selected pair with |dot| >= 2^53 raises
    //    at runtime instead of returning a silently mis-ranked top-k.
    //    Guarding only selected pairs is sound because the double cast
    //    is monotone (non-strict): a candidate with exact dot >= 2^53
    //    casts to a double >= 2^53, above every in-contract selected
    //    score, so it would itself have been selected (positive side);
    //    dots <= -2^53 rank at the bottom and cannot displace a top-k
    //    entry. Within the guarded range the cast is injective, so
    //    ranking stays integer-exact.
    //  NOTE (library consumers): run with
    //    spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    //    raised (Bench/Verify sessions use 10 000 000) — at the 128-key
    //    default Spark silently collapses the TopNBy ObjectHashAggregate
    //    to sort-based per task, re-introducing the N·|Q| sort cost the
    //    bounded aggregate exists to avoid (correctness unaffected).
    val corpus = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qqv"))
    val picked = corpus.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .groupBy("qid")
      .agg(graft.functions.top_n_by(col("id"),
        graft.functions.int_dot_q(col("v"), col("qqv")).cast("double"),
        k).as("ids"))
      .select(col("qid"), posexplode(col("ids")).as(Seq("p", "id")))
      .select(col("qid"), col("id"), (col("p") + 1).cast("int").as("rank"))
    picked
      .join(corpus, "id")
      .join(q, "qid")
      .withColumn("dot", graft.functions.int_dot_q(col("v"), col("qqv")))
      // off-contract guard (see header comment): |dot| >= 2^53 on a
      // selected pair proves the double-cast ranking could have
      // diverged from the integer order — fail loudly, never silently.
      .withColumn("dot",
        when(abs(col("dot")) >= lit(1L << 53),
          raise_error(concat(
            lit("intDotTopKBatch contract violation: |dot| >= 2^53 "
              + "(dim too large or components beyond ~unit scale); "
              + "double-cast ranking is no longer integer-exact. qid="),
            col("qid").cast("string"), lit(" id="),
            col("id").cast("string"))).cast("long"))
          .otherwise(col("dot")))
      .select(col("qid"), col("id"), col("dot"), col("rank"))
  }

  /** Shared core of the batch scorers: broadcast the query table, score
    * the corpus map-side (codegen'd cosine), keep rows passing `keep`,
    * rank per query. The ONE shuffle is the per-query top-k window.
    */
  private def batchScoredTopK(embs: DataFrame, idCol: String, vecCol: String,
                              q: DataFrame, keep: Column, k: Int,
                              extraOut: Seq[Column]): DataFrame = {
    val scored = embs.crossJoin(broadcast(q))
      .filter(keep)
      .withColumn("cos", round(cosine_similarity(col(vecCol), col("qvec")), 3))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("qid"), col(idCol).as("id")) ++ extraOut ++
        Seq(col("cos"), col("rank")): _*)
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * top-k most-similar corpus vectors whose LABEL DIFFERS from the
    * anchor's — "hard" because they sit close in embedding space yet carry
    * a negative label, exactly the negatives a contrastive loss learns
    * most from. Emits the cosine as the margin signal for loss weighting /
    * curriculum ordering.
    *
    * Scale shape = [[bruteForceTopKBatch]] with a label disqualifier:
    * anchors are a training batch or sampled slice — small by nature, so
    * broadcast; the corpus scan scores map-side (codegen'd cosine kernel,
    * no shuffle) and the only shuffle is the per-anchor top-k window over
    * candidate rows. For corpora where even one scored scan per batch is
    * too hot, feed `embs` from an IVF/LSH candidate set first — the
    * operator only assumes (id, vec, label).
    *
    * Null labels are EXCLUDED on both sides (an anchor or candidate with
    * no label cannot participate in a label-differs contract) — a non-
    * null-safe inequality would instead silently drop every candidate of
    * a null-labeled anchor.
    */
  def hardNegatives(embs: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, anchors: DataFrame, qidCol: String,
                    qvecCol: String, qlabelCol: String, k: Int): DataFrame =
    batchScoredTopK(
      embs.filter(col(labelCol).isNotNull), idCol, vecCol,
      anchors.filter(col(qlabelCol).isNotNull)
        .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"),
          col(qlabelCol).as("qlabel")),
      col(idCol) =!= col("qid") && col(labelCol) =!= col("qlabel"), k,
      Seq(col(labelCol).as("neg_label")))

  /** Contrastive TRIPLET mining — the training-example builder for
    * embedding/retrieval models: per anchor, the highest-cosine
    * SAME-label vector (the positive), the highest-cosine
    * DIFFERENT-label vector (the hard negative — [[hardNegatives]] at
    * k=1), and the contrastive margin `cos_pos − cos_neg` (negative
    * margin = the anchor's hardest negative outranks its best positive,
    * exactly the examples a contrastive loss learns most from). One
    * broadcast of the anchor table, one corpus scan, two per-anchor
    * window ranks on the scored candidates. Ties break to the smaller
    * id (the rounded-cosine convention throughout).
    */
  def tripletMine(embs: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, anchors: DataFrame, qidCol: String,
                  qvecCol: String, qlabelCol: String): DataFrame = {
    val scored = embs.filter(col(labelCol).isNotNull)
      .crossJoin(broadcast(anchors.filter(col(qlabelCol).isNotNull)
        .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"),
          col(qlabelCol).as("qlabel"))))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos",
        round(cosine_similarity(col(vecCol), col("qvec")), 3))
      .select(col("qid"), col("qlabel"), col(idCol).as("id"),
        col(labelCol).as("lbl"), col("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("id"))
    def top1(side: DataFrame, pfx: String) = side
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("id").as(s"${pfx}_id"),
        col("cos").as(s"${pfx}_cos"))
    top1(scored.filter(col("lbl") === col("qlabel")), "pos")
      .join(top1(scored.filter(col("lbl") =!= col("qlabel")), "neg"), "qid")
      .select(col("qid"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 3).as("margin"))
  }

  /** BATCH probe of the materialized index: every query's multi-probe
    * bucket list is computed as columns (one codegen'd pass over the query
    * table), the union of probe buckets — bounded by Q·probes, collected
    * driver-side — becomes a LITERAL partition filter on the index scan
    * (planning-time pruning, like [[indexTopK]]), and an equi-join on
    * `bucket` pairs each query with only its probed buckets' vectors.
    * Exact cosine + per-query window rank finish on the candidate set.
    */
  def indexTopKBatch(spark: SparkSession, indexDir: String, queries: DataFrame,
                     qidCol: String, qvecCol: String, k: Int,
                     numPlanes: Int = 8, maxHamming: Int = 2,
                     excludeSelf: Boolean = true): DataFrame = {
    val masks = (0 to maxHamming).flatMap(h => (0 until numPlanes).combinations(h)
      .map(_.foldLeft(0L)((m, bit) => m | (1L << bit))))
    val qb = bucketExpr(col("qvec"), numPlanes)
    val probes = queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .withColumn("qb", qb)
      .select(col("qid"), col("qvec"),
        explode(array(masks.map(m => col("qb").bitwiseXOR(lit(m))): _*)).as("bucket"))
      .cache()
    try {
      val bucketList = probes.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      val candidates = spark.read.parquet(indexDir)
        .filter(col("bucket").isin(bucketList.toIndexedSeq: _*)) // literal: partition-pruned
        .join(probes, Seq("bucket"))
        .filter(if (excludeSelf) col("id") =!= col("qid") else lit(true))
        // no dedup needed: a vector lives in exactly ONE bucket partition
        // and a query's probe buckets are distinct, so (qid, id) pairs are
        // unique by construction
        .select(col("qid"), col("id"), col("vec"), col("qvec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("id"))
      candidates
        .withColumn("cos", round(cosine_similarity(col("vec"), col("qvec")), 3))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("id"), col("cos"), col("rank"))
    } finally probes.unpersist()
  }

  /** Int8-quantized brute-force top-k: vectors are stored/scanned as one
    * byte per dimension (4× less I/O and shuffle than float32 — at 100 TB
    * of embeddings, the difference between an index that fits the cluster
    * and one that doesn't), and ranking runs [[graft.functions.cosine_i8]]
    * directly on the byte payloads — cosine is scale-invariant, so
    * symmetric per-vector quantization needs NO dequantization to rank.
    * Quantization perturbs cosines by ~1e-3 on unit vectors; recall vs the
    * float ranking is asserted in SimilaritySpec.
    *
    * `quantized` (from [[quantize]]) is the materialized compact table; at
    * scale it is written once and scanned by every query, like the LSH
    * index — and composes with it (bucket the quantized payloads).
    */
  def quantize(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs.select(col(idCol).as("id"),
      graft.functions.i8_scale(col(vecCol)).as("scale"),
      graft.functions.i8_quantize(col(vecCol)).as("qvec"))

  def quantizedTopK(quantized: DataFrame, queryQvec: Array[Byte],
                    queryId: Long, k: Int): DataFrame =
    quantized.filter(col("id") =!= queryId)
      .withColumn("cos",
        round(graft.functions.cosine_i8(col("qvec"), lit(queryQvec)), 3))
      .select(col("id"), col("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** Sign-bit binarization: 1 bit per dimension ([vec(i) > 0]), packed 32
    * dims per long word (bit j of word w = dimension 32w+j) — the 32×
    * compression of binary-embedding retrieval. On unit vectors Hamming
    * distance tracks angular distance (each bit is a fixed-axis
    * hyperplane sign, the [[bucketExpr]] idea with axis-aligned planes),
    * so a binary scan is a cheap high-recall FIRST pass over 1/32 the
    * bytes; [[binaryRerank]] restores exact ranking on the survivors.
    * Packing 32 (not 64) bits per word keeps every word positive and
    * shift-free on both engine and oracle sides. Deterministic bit-exact.
    */
  def binarize(vec: Column): Column = {
    val pow2 = lit((0 until 32).map(1L << _).toArray)
    // empty input must yield an empty bit array: unguarded, the word
    // sequence(0, -1) is the DESCENDING [0, -1] and would emit two
    // phantom zero words (slice reading from the array end at w = -1)
    when(size(vec) > 0,
      transform(sequence(lit(0),
        ((size(vec) + 31) / lit(32)).cast("int") - 1), w =>
        aggregate(
          zip_with(slice(vec, w * 32 + 1, lit(32)), sequence(lit(0), lit(31)),
            (x, j) => when(x > 0f, element_at(pow2, j + 1)).otherwise(lit(0L))),
          lit(0L), (acc, b) => acc + b)))
      .when(size(vec) === 0, typedLit(Array.empty[Long])) // null stays null
  }

  /** Hamming distance between two packed bit arrays ([[binarize]]
    * output): Σ_words popcount(xor) — a handful of ALU ops per word.
    */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h)

  /** Binary top-k: scan the packed-bit relation, rank by (Hamming asc,
    * id). At scale the packed table is materialized once ([[quantize]]'s
    * pattern) and every query scans 1/32 the bytes of the float scan;
    * the one-row query side broadcasts and TakeOrdered avoids a global
    * sort. Exact over the binary space, so fully oracle-checkable.
    */
  def binaryTopK(embs: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val packed = embs.select(col(idCol).as("id"),
      binarize(col(vecCol)).as("bits"))
    val q = packed.filter(col("id") === queryId)
      .select(col("bits").as("qbits"))
    packed.filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("hamming", hammingDist(col("bits"), col("qbits")).cast("int"))
      .select(col("id").as(idCol), col("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(k)
  }

  /** The binary-then-rerank cascade — production binary retrieval: a
    * Hamming shortlist of `k · candidateFactor` (cheap first pass), then
    * exact float cosine re-ranking of only the shortlist. With a
    * candidateFactor covering the corpus this EQUALS [[bruteForceTopK]]
    * (asserted in SimilaritySpec), which is what makes the cascade's
    * recall knob honest: factor trades scan savings against recall, never
    * correctness of the rerank itself.
    */
  def binaryRerank(embs: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int,
                   candidateFactor: Int = 4): DataFrame = {
    val shortlist = binaryTopK(embs, idCol, vecCol, queryId,
      k * candidateFactor)
    val query = embs.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    embs.join(broadcast(shortlist.select(col(idCol))), Seq(idCol))
      .crossJoin(broadcast(query))
      .withColumn("cos",
        round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ZCA whitening of an embedding column — the standard post-processing
    * that equalizes feature variances and removes correlations before
    * cosine retrieval (Su et al. 2021 "Whitening Sentence Representations"
    * observed large retrieval gains on anisotropic encoder outputs):
    * `v ↦ V diag((λ+eps)^(-1/2)) Vᵀ (v − μ)` with `C = V diag(λ) Vᵀ` the
    * corpus covariance.
    *
    * Scale shape: ONE map-side-combinable moments pass
    * ([[graft.functions.VectorMoments]] — the shuffle carries a
    * `1 + d + d²` buffer per partition, never N·d² rows), a driver-side
    * d×d Jacobi eigendecomposition (planning-scale: d ≤ a few hundred),
    * then one zero-shuffle codegen'd transform
    * ([[graft.functions.MatVecCenter]]) — the whole operator touches the
    * corpus exactly twice, both at scan speed.
    *
    * Deterministic: fixed-order Jacobi sweeps on driver doubles; the
    * transform is a pure function of (corpus, eps). Returns
    * `(idCol, w)` with `w` the whitened `array<double>`. Verified by
    * `ns_embed_whiten_audit`: whitened mean ≈ 0, whitened covariance ≈ I
    * (diag shrunk by exactly λ/(λ+eps)), rerun-identical.
    */
  def whiten(embs: DataFrame, idCol: String, vecCol: String,
             eps: Double = 1e-5): DataFrame = {
    val (mean, w) = whitenParams(embs, vecCol, eps)
    whitenWith(embs, idCol, vecCol, mean, w)
  }

  /** Fit the ZCA transform only: `(mean, W)` with `W = V diag((λ+eps)^
    * (-1/2)) Vᵀ` row-major — one [[graft.functions.vector_moments]] pass
    * + driver Jacobi (d² state, geometry-bounded). Exposed so callers
    * can publish the learned transform (the OracleFeed path) and so the
    * fit is paid once when both the transform and its parameters are
    * needed.
    */
  def whitenParams(embs: DataFrame, vecCol: String,
                   eps: Double = 1e-5): (Array[Double], Array[Double]) = {
    val row = embs.agg(graft.functions.vector_moments(col(vecCol))
      .as("m")).select("m.n", "m.mean", "m.m2").head()
    require(!row.isNullAt(0),
      "whiten: no vectors to fit (empty or all-null input)")
    val mean = row.getSeq[Double](1).toArray
    val m2 = row.getSeq[Double](2).toArray
    val d = mean.length
    val cov = Array.tabulate(d * d)(i =>
      m2(i) - mean(i / d) * mean(i % d))
    val (lambda, v) = graft.functions.Jacobi.eigen(cov, d)
    // W = V diag((λ+eps)^(-1/2)) Vᵀ  (row-major)
    val w = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var s = 0.0
        var k = 0
        while (k < d) {
          s += v(i * d + k) * v(j * d + k) /
            math.sqrt(math.max(lambda(k), 0.0) + eps)
          k += 1
        }
        w(i * d + j) = s
        j += 1
      }
      i += 1
    }
    (mean, w)
  }

  /** Apply a fitted ZCA transform: `W·(v − μ)` as a zero-shuffle
    * codegen'd map over broadcast parameters. */
  def whitenWith(embs: DataFrame, idCol: String, vecCol: String,
                 mean: Array[Double], w: Array[Double]): DataFrame = {
    val sc = embs.sparkSession.sparkContext
    embs.select(col(idCol),
      graft.functions.mat_vec_center(sc.broadcast(w), sc.broadcast(mean),
        col(vecCol)).as("w"))
  }

  /** Matryoshka truncation report (Kusupati et al. 2022: MRL-trained
    * embeddings concentrate signal in the leading dims, so retrieval can
    * run on a prefix at a fraction of the scan cost): per vector, the
    * full and m-dim-prefix norms and the ENERGY RATIO ‖v[:m]‖²/‖v‖² —
    * the number that says whether a corpus's embeddings tolerate
    * truncation before you re-index at the smaller dim. Pure codegen'd
    * projection, zero shuffle; same left-to-right double accumulation as
    * [[embedStats]] so the rounded values hash cross-engine.
    */
  def matryoshkaEnergy(embs: DataFrame, idCol: String, vecCol: String,
                       m: Int): DataFrame = {
    require(m > 0, s"prefix dims must be positive, got $m")
    def sumSq(v: Column) = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val full = sumSq(col(vecCol))
    val head = sumSq(slice(col(vecCol), 1, m))
    embs.select(col(idCol), size(col(vecCol)).as("dims"),
      round(sqrt(full), 4).as("norm_full"),
      round(sqrt(head), 4).as("norm_m"),
      // zero vector: 0/0 would be NaN — report 0 energy, like the
      // degenerate-vector handling in embedStats's is_unit
      when(full > 0, round(head / full, 6)).otherwise(lit(0.0))
        .as("energy_ratio"))
  }

  /** Brute-force top-k under m-dim Matryoshka truncation — the quality
    * side of the truncation trade: overlap against the full-dim top-k
    * measures retrieval degradation at the cheaper scan. Same plan as
    * [[bruteForceTopK]] over the sliced column.
    */
  def matryoshkaTopK(embs: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int, m: Int): DataFrame = {
    require(m > 0, s"prefix dims must be positive, got $m")
    bruteForceTopK(
      embs.select(col(idCol), slice(col(vecCol), 1, m).as(vecCol)),
      idCol, vecCol, queryId, k)
  }

  /** Per-vector statistics (corpus hygiene for an embedding column): L2
    * norm, component min/max, and a unit-norm flag — the checks a pipeline
    * runs before cosine math (a zero or wildly-scaled vector poisons
    * similarity scores silently). Pure codegen'd projection, zero shuffle.
    *
    * Determinism: the squared-norm accumulates float components cast to
    * double, left-to-right — the same order DuckDB's `list_sum` uses — so
    * the rounded values are bit-identical cross-engine.
    */
  def embedStats(embs: DataFrame, idCol: String, vecCol: String,
                 unitTol: Double = 0.01): DataFrame = {
    val v = col(vecCol)
    val sumSq = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val norm = sqrt(sumSq)
    embs.select(col(idCol), size(v).as("dims"),
      round(norm, 4).as("l2_norm"),
      round(array_min(v).cast("double"), 4).as("min_v"),
      round(array_max(v).cast("double"), 4).as("max_v"),
      (abs(norm - 1.0) <= unitTol).as("is_unit"))
  }

  /** Top-k probe against a materialized index: the multi-probe bucket list
    * is a LITERAL `isin`, so Catalyst partition-prunes at planning time —
    * only the matching `bucket=K/` dirs' files are opened (asserted via the
    * scan's numFiles metric in SimilaritySpec). The query's bucket comes
    * from the same JVM kernel the index was built with, so probe and layout
    * always agree.
    */
  def indexTopK(spark: SparkSession, indexDir: String, queryVec: Array[Float],
                k: Int, numPlanes: Int = 8, maxHamming: Int = 2): DataFrame = {
    val qb = HyperplaneKernels.bandKeys(
      new GenericArrayData(queryVec), numPlanes, 1).getLong(0)
    val probes = probeBuckets(qb, numPlanes, maxHamming)
    spark.read.parquet(indexDir)
      .filter(col("bucket").isin(probes: _*))
      .withColumn("cos",
        round(cosine_similarity(col("vec"), typedlit(queryVec.toSeq)), 3))
      .select(col("id"), col("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
