package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  test("minhash-LSH verified pairs == exact jaccard pairs (sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // DEFAULT path: analytic signature-agreement prefilter ON
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty, "test corpus should contain near-duplicates")

    // single-stage exact opt-out (margin >= threshold skips the signature
    // join) must not change the emitted pair set
    val noPre = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8,
        sigPrefilterMargin = Double.PositiveInfinity)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noPre == exact)

    // a TIGHTER explicit margin than the analytic default still verifies
    // exactly on this corpus (planted pairs agree far above threshold - m)
    val tight = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8,
        sigPrefilterMargin = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == exact)

    // the analytic margin itself: Hoeffding at the default miss bound
    assert(math.abs(Dedup.sigMarginForMissBound(32) -
      math.sqrt(math.log(1e8) / 64.0)) < 1e-12)
  }

  test("exact dedup groups: every doc appears exactly once across groups") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.agg(sum("n_docs")).collect()(0).getLong(0) == total)
  }

  test("simhash pairs: near-dup docs have small hamming distance") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    // sanity: all reported pairs respect the bound, ids ordered
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(2) <= 3 && r.getLong(0) < r.getLong(1)))
  }

  test("simhash128: lo half equals the 64-bit sketch; banded pairs == brute force") {
    val docs = Tables.documents(spark, sfDir)
    val sk128 = Dedup.simhash128Sketches(docs, "doc_id", "text").cache()
    try {
      // the lower half is bit-identical to the 64-bit operator (same md5
      // lower-half token hashes, same majority rule)
      val lo = sk128.select(col("id"), col("simhash_lo").as("simhash"))
      val sk64 = Dedup.simhashSketches(docs, "doc_id", "text")
      assert(lo.exceptAll(sk64).isEmpty && sk64.exceptAll(lo).isEmpty)

      // banded candidate generation loses nothing vs the all-pairs
      // definition at hamming <= 3 (pigeonhole over 4x32-bit bands)
      val ham = (bit_count(col("a.simhash_hi").bitwiseXOR(col("b.simhash_hi"))) +
        bit_count(col("a.simhash_lo").bitwiseXOR(col("b.simhash_lo")))).cast("long")
      val brute = sk128.as("a").join(sk128.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), ham.as("hamming"))
        .filter(col("hamming") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val banded = Dedup.simhash128Pairs(docs, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(banded == brute)
    } finally sk128.unpersist()
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val pairs = Dedup.embeddingDupPairs(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0.4).collect()
    assert(rowsOk(pairs))
    def rowsOk(rs: Array[org.apache.spark.sql.Row]) =
      rs.forall(r => r.getLong(0) < r.getLong(1) && r.getDouble(2) >= 0.4)
  }

  test("hot-shingle DF cap bounds candidates on a degenerate corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val uniq = (0 until 60).map(i =>
      (i.toLong, s"$boiler unique stream alpha$i beta$i gamma$i delta$i epsilon$i"))
    val twin = "distinct twin content repeated across exactly two documents here"
    val docs = (uniq ++ Seq((100L, s"$boiler $twin"), (101L, s"$boiler $twin")))
      .toDF("doc_id", "text")

    def candidates(cap: Long) = {
      val ex = Dedup.shingleIndex(docs, "doc_id", "text", 3, cap)
      ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
    }
    // every pair collides on boilerplate shingles: quadratic candidates
    assert(candidates(Long.MaxValue) == 62L * 61 / 2)
    // cap drops the boilerplate; only genuinely-shared shingles survive
    assert(candidates(5) == 1L)
    // and the surviving true near-dup pair is still reported
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.3, maxShingleDF = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((100L, 101L)))
  }

  test("banded embedding dedup == all-pairs exact, with no nested-loop join") {
    val embs = Tables.embeddings(spark, sfDir)
    val banded = Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4)
    val exact = Dedup.embeddingDupPairsExact(embs, "vec_id", "embedding", 0.4)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = toSet(exact)
    assert(toSet(banded) == e)
    assert(e.nonEmpty, "test corpus should contain near-dup embeddings")
    // candidate generation must be a shuffled equi-join, not O(N^2) BNLJ
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))

    // int8-prefiltered verify emits the identical pair set with the
    // identical exact-float cos values — even at this boundary threshold
    // (0.4, margin 0.1: drift would have to exceed the measured 0.06 bound
    // by 2/3 more to kill a true pair). At 0.4 the AUTO policy runs exact,
    // so the two-stage shape is forced with an explicit margin here.
    val prefiltered = Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4,
      prefilterMargin = 0.1)
    assert(toSet(prefiltered) == e)
  }

  test("planesForCorpus keeps bucket occupancy bounded, floored at the tuned default") {
    assert(Dedup.planesForCorpus(100) === 8)      // tiny corpus: tuned floor
    assert(Dedup.planesForCorpus(500) === 8)
    assert(Dedup.planesForCorpus(20000) === 14)   // measured sweet spot
    assert(Dedup.planesForCorpus(5000000) === 22)
    // occupancy invariant: n / 2^r <= target (above the floor region)
    for (n <- Seq(10000L, 100000L, 1000000L, 50000000L)) {
      val r = Dedup.planesForCorpus(n)
      assert(n.toDouble / (1L << r) <= 2.0, s"occupancy at n=$n, r=$r")
    }
  }

  test("resolveLshParams: corpus-sized narrow probing at near-dup thresholds, tuned 8/16/2/6 at boundary") {
    // boundary threshold: the measured-exact small-band/wide-probe regime,
    // REGARDLESS of corpus size (wider bands lose boundary recall) — this
    // is what keeps the 0.4-threshold sf oracles byte-identical
    assert(Dedup.resolveLshParams(0.4, 2000L, 0, 0, -1, -1) === ((8, 16, 2, 6)))
    assert(Dedup.resolveLshParams(0.4, 10000000L, 0, 0, -1, -1) === ((8, 16, 2, 6)))
    // near-dup threshold: corpus-sized bands + 1-bit/4-plane probing; the
    // auto band count holds the AutoBandRecallGap contract (floor 16 while
    // the per-band catch probability at the guarantee point stays high)
    assert(Dedup.resolveLshParams(0.9, 20000L, 0, 0, -1, -1) === ((14, 16, 1, 4)))
    assert(Dedup.resolveLshParams(0.9, 500L, 0, 0, -1, -1) === ((8, 16, 1, 4)))
    // explicit values pin; explicit probePlanes clamps to the band width
    assert(Dedup.resolveLshParams(0.9, 20000L, 8, 16, 2, 6) === ((8, 16, 2, 6)))
    assert(Dedup.resolveLshParams(0.9, 500L, 3, 16, 1, 6) === ((3, 16, 1, 3)))
    // the corpus count must not be forced when the width is explicit —
    // including for the auto band count, which depends only on the width
    assert(Dedup.resolveLshParams(0.9, sys.error("must stay lazy"), 8, 16, 2, 6)
      === ((8, 16, 2, 6)))
    assert(Dedup.resolveLshParams(0.9, sys.error("must stay lazy"), 8, 0, 2, 6)
      === ((8, 16, 2, 6)))
  }

  test("bandsForRecall grows the band count with the band width to hold the recall contract") {
    // the ADVICE scenario: threshold 0.8 at n = 1 M -> r = 19. 16 bands
    // would miss a guarantee-point (cos 0.9) pair ~6% of the time; the
    // auto count (42, sized with the measured-conservative 0.6 probe
    // coverage) brings that under the 1e-3 target — ScaleSmoke's 1 M
    // recall stage measured miss 7e-4 at this exact configuration.
    assert(Dedup.planesForCorpus(1000000L) === 19)
    assert(Dedup.resolveLshParams(0.8, 1000000L, 0, 0, -1, -1) === ((19, 42, 1, 4)))
    // monotone in width: wider bands need more of them
    assert(Dedup.bandsForRecall(0.8, 14, 1, 4) === 22)
    assert(Dedup.bandsForRecall(0.8, 22, 1, 4) === 62)
    // capped: the guarantee relaxes gracefully instead of key-volume blowup
    assert(Dedup.bandsForRecall(0.8, 24, 1, 4) === Dedup.MaxAutoBands)
    // at high thresholds the per-band catch probability is high enough
    // that the tuned floor of 16 already satisfies the contract
    assert(Dedup.bandsForRecall(0.9, 14, 1, 4) === 16)
    assert(Dedup.bandsForRecall(0.9, 22, 1, 4) === 16)
    // the analytic model: exact band match plus the conservative
    // single-flip probe term, monotone decreasing in r, increasing in c
    val q1 = Dedup.bandCatchProb(0.9, 14, 1, 4)
    val q2 = Dedup.bandCatchProb(0.9, 19, 1, 4)
    val q3 = Dedup.bandCatchProb(0.95, 19, 1, 4)
    assert(q1 > q2 && q3 > q2)
    assert(Dedup.bandCatchProb(0.9, 14, 0, 0) < q1) // probing adds recall
  }

  test("dupClusters: chains collapse to min-id components, singletons self-label") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (5L, 6L, 0.9), (6L, 7L, 0.9),
      (7L, 8L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val ids = (1L to 9L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 9L))
  }

  test("dupClusters: pointer doubling converges a 64-link chain in O(log) rounds") {
    import spark.implicits._
    // path graph 1-2-…-65: plain min-label propagation needs 64 rounds;
    // path halving must land it within ~log2(64)+2 — run with maxIters=10
    // so a regression to linear convergence fails loud
    val pairs = (1L until 65L).map(i => (i, i + 1, 0.9)).toDF("id_a", "id_b", "jaccard")
    val ids = (1L to 65L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, ids, "doc_id", maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(1L) && got.size == 65)
  }

  test("containmentPairs catches subset duplication Jaccard misses") {
    import spark.implicits._
    // doc 2 = doc 1 quoted whole inside 4x unrelated padding: containment
    // of 1 in 2 is 1.0 but Jaccard ~ |1|/|2| ~ 0.2
    val small = (1 to 10).map(i => s"w$i").mkString(" ")
    val pad = (1 to 40).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$pad $small"),
      (3L, "z1 z2 z3 z4 z5")                  // unrelated: no pair
    ).toDF("doc_id", "text")

    val cont = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(cont.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
    assert(cont.head._3 == 1.0, "all of doc 1's shingles appear in doc 2")
    assert(cont.head._4 < 0.9, "doc 2 is mostly not doc 1")

    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.8)
    assert(jac.isEmpty, "Jaccard at 0.8 must NOT flag the subset pair")
  }

  test("dupClusters fails loud (not wrong) when maxIters is too small") {
    import spark.implicits._
    // a 3-chain needs 2 min-label rounds; maxIters = 1 must throw, never
    // return silently-unconverged labels
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val ids = (1L to 3L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(pairs, ids, "doc_id", maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("mergeClusters(resident, delta) equals the from-scratch labeling") {
    import spark.implicits._
    // deterministic pair graph with chains that CROSS the resident/delta
    // boundary (delta pairs bridge two resident components: 48-49-50 and
    // 52 joining the 10-11-12 chain)
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 48L),
      (48L, 49L), (49L, 50L), (12L, 52L), (52L, 60L), (70L, 71L))
      .map { case (a, b) => (a, b, 0.9) }.toDF("id_a", "id_b", "jaccard")
    val ids = (0L to 80L).toDF("doc_id")
    val half = 45L
    val resident = Dedup.dupClusters(
      pairs.filter(col("id_a") <= half && col("id_b") <= half),
      ids.filter(col("doc_id") <= half), "doc_id")
    val delta = pairs.filter(col("id_a") > half || col("id_b") > half)
    val merged = Dedup.mergeClusters(resident, delta, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Dedup.dupClusters(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === scratch)
    assert(merged(60L) === 10L) // the bridged chain folded to the min id
  }
}
