package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, KnnGraph, Layout, Similarity}

/** Scale-validation harness (manual; not part of `sbt test` or the driver
  * gates): drives the dedup/curation chain over a DETERMINISTIC synthetic
  * corpus 1–2 orders of magnitude larger than sf0.1, to back the "would
  * this plan survive 100×" claims with measurements instead of argument.
  * The driver's testdata stays the only input of the declared queries —
  * this harness exists because sf0.1 (5 k docs / 5 k vectors) cannot
  * surface super-linear candidate blow-ups; a planted-duplicate corpus at
  * 40× can.
  *
  * Corpus: `n` docs of 60 tokens drawn per-doc-deterministically (xxhash
  * of (id, position) over a 50 k vocabulary — no RNG, so reruns are
  * byte-identical). Every 10th doc is a near-variant of its predecessor
  * (ONE token of 60 changed: 3 of 58 trigram shingles differ, jaccard
  * 55/61 ≈ 0.90 ≥ the 0.8 threshold), so true-pair counts are known:
  * n/10 lexical pairs. Embeddings: 64-dim vectors, every 10th a small
  * perturbation of its predecessor (cos ≈ 0.99) — n/10 semantic pairs.
  *
  * `runMain graft.ScaleSmoke [nDocs] [stages]` (default `200000 all`).
  * `stages` selects `lexical` (exact/minhash/CC/simhash), `semantic`
  * (embedding dedup + decontamination at the near-identity cos ≈ 0.99
  * plant), `recall` (near-THRESHOLD planted pairs at exact cos 0.82 and
  * 0.90 under threshold 0.8 — validates the [[Dedup.bandsForRecall]]
  * contract where the ADVICE flagged it, not just near-identity recall),
  * `pipeline` (round-9 ops: sequence packing conservation at context
  * length 2048, BPE distributed-vs-serial merge equality over a 50 k
  * vocab, encode conservation, full-corpus hard-negative mining),
  * or `all`. `streaming` (round-10): the STREAMING packers (text + id
  * forms) over the same corpus in `maxEventsPerBatch`-sized micro-batches
  * through their versioned-state carry — per-batch cost and end-to-end
  * tokens/s, with exact conservation against the batch packer's
  * invariants. Prints per-stage seconds + result sanity (planted-pair
  * recall must be 100% for lexical/semantic; the recall stage asserts
  * the guarantee-point contract and REPORTS the best-effort in-gap
  * number against the analytic model's prediction).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val stages = if (args.length > 1) args(1) else "all"
    require(Set("all", "lexical", "semantic", "recall", "pipeline",
      "streaming", "classifier", "curation", "streamlearn", "semdedup",
      "semroute", "ivfencode", "embed", "bm25", "minhashindex", "layout",
      "propagate", "fuzzy", "slayout", "drift", "graphstruct", "graphupdate",
      "overlap", "core", "coreskew", "corepressure", "slidestate")(stages),
      s"unknown stage set '$stages'")
    def on(s: String) = stages == "all" || stages == s
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000") // TypedImperativeAggregate (top_n_by) groups per task
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val planted = n / 10L

    if (on("lexical")) {
    // ---- synthetic docs: deterministic tokens; every 10th a near-variant
    // of its predecessor (1 of 60 tokens swapped) ----
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("base",
        when(col("doc_id") % 10 === 9, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(
            // variants re-derive position 30 from their own id
            when(col("doc_id") =!= col("base") && (i === 30), col("doc_id"))
              .otherwise(col("base")), i), lit(50000L))))))
      .drop("base")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("docs_materialize")(docs.count())

    val exact = t("exact_groups")(
      Dedup.exactGroups(docs, "doc_id", "text").filter(col("n_docs") > 1).count())
    // DEFAULT path = analytic signature-agreement prefilter ON
    // (Dedup.sigMarginForMissBound): the verify join ships 128 B signatures
    // instead of ~KB shingle arrays (the spill-bound stage at 1 M rows).
    // Each contrast path runs in its OWN CacheScope, closed before the
    // other is timed: the two invocations share identical shingle/
    // signature/band logical plans, so with session-lifetime caches the
    // second path would read the first's materialized intermediates and
    // the "contrast" would measure cold-vs-warm, not plan-vs-plan (this
    // exact confound produced the phantom 5.7x prefilter slowdown in the
    // first 5 M run — and round 6's mirror-image prefilter win).
    val scopeDefault = graft.CacheScope()
    val pairs = t("minhash_lsh_pairs") {
      val p = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)(scopeDefault)
        .cache()
      p.count(); p
    }
    println(s"SCALE   pairs=${pairs.count()} planted=$planted " +
      s"(recall ${if (pairs.count() >= planted) "OK" else "MISS"})")
    scopeDefault.close()
    // opt-out contrast: single-stage exact verify; output must be equal
    val scopeExact = graft.CacheScope()
    val pairsX = t("minhash_pairs_exact")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8,
        sigPrefilterMargin = Double.PositiveInfinity)(scopeExact).count())
    println(s"SCALE   exact-path pairs=$pairsX " +
      s"(${if (pairsX == pairs.count()) "EQUAL to default path" else "MISMATCH"})")
    scopeExact.close()
    val clusters = t("dup_clusters")(
      Dedup.dupClusters(pairs, docs, "doc_id")
        .filter(col("id") =!= col("cluster")).count())
    println(s"SCALE   non-singleton members=$clusters")

    // containment at 0.9: each planted variant shares 55 of its 58
    // trigram shingles with its base (overlap coefficient 55/58 ≈ 0.948,
    // symmetric sizes), so the exact inverted-index containment join must
    // find the planted pairs and nothing else (random 50 k-vocab docs
    // share no trigram run of consequence).
    val contain = t("containment_pairs")(
      Dedup.containmentPairs(docs, "doc_id", "text", 0.9).count())
    println(s"SCALE   containment pairs=$contain planted=$planted " +
      s"(${if (contain == planted) "OK" else "MISS"})")

    // span-strip: a base/variant pair duplicates every 5-gram not touching
    // the swapped position 30, so EXACTLY the 2·planted docs in pairs lose
    // tokens and the other 8/10 of the corpus is untouched.
    val stripped = t("strip_dup_spans")(
      graft.operators.TextAnalysis
        .stripDuplicatedSpans(docs, "doc_id", "text", k = 5)
        .filter(col("kept_tokens") < col("n_tokens")).count())
    println(s"SCALE   span-stripped docs=$stripped expected=${2 * planted} " +
      s"(${if (stripped == 2 * planted) "OK" else "MISS"})")

    // 64- vs 128-bit SimHash banding: the 64-bit bands' 2^16 keys go
    // linear-occupancy past n ~ millions; the 128-bit bands (2^32 keys)
    // must stay near-linear here. (No planted recall check: a 1-of-60
    // token swap lands at hamming ≈ 13, far outside the ≤3 near-identity
    // regime SimHash targets — this stage measures candidate-join shape.)
    val sh64 = t("simhash_pairs_64")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())
    val sh128 = t("simhash_pairs_128")(
      Dedup.simhash128Pairs(docs, "doc_id", "text").count())
    println(s"SCALE   simhash pairs 64-bit=$sh64 128-bit=$sh128")

    // ---- decontamination at the bloom path's target regime: eval = the
    // variant BASES (id % 10 == 8), so every planted variant (id % 10 == 9)
    // shares 55 of its 58 shingles with an eval doc -> expected flags =
    // n/10. The eval shingle relation is ~n/10·58 distinct trigrams (5.8 M
    // at 1 M docs — far beyond broadcast comfort); the bloom filter
    // condenses it to a few MB. The broadcast variant runs as the contrast
    // — at this eval size it must ship the full distinct-shingle hash
    // relation to every task. Both must flag exactly the planted set.
    val evalPred = col("doc_id") % 10 === 8
    val deconBloom = t("decon_bloom")(
      Curation.contaminationReportScalable(docs, "doc_id", "text",
        evalPred, n = 3, minOverlap = 5)
        .filter(col("contaminated")).count())
    println(s"SCALE   bloom-decon flagged=$deconBloom expected=$planted " +
      s"(${if (deconBloom == planted) "OK" else "MISS"})")
    val deconBcast = t("decon_broadcast")(
      Curation.contaminationReport(docs, "doc_id", "text",
        evalPred, n = 3, minOverlap = 5)
        .filter(col("contaminated")).count())
    println(s"SCALE   broadcast-decon flagged=$deconBcast " +
      s"(${if (deconBcast == deconBloom) "EQUAL to bloom path" else "MISMATCH"})")
    docs.unpersist()
    }

    if (on("semantic")) {
    // ---- synthetic embeddings: every 10th vector a perturbation of its
    // predecessor (cos ≈ 0.99); the rest hash-random (pairwise cos ≈ 0) ----
    val embs = spark.range(n.toLong).toDF("vec_id")
      .withColumn("base",
        when(col("vec_id") % 10 === 9, col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("base"), i), lit(1000L)).cast("float") / 500.0f - 1.0f
            + when(col("vec_id") =!= col("base"),
                pmod(xxhash64(col("vec_id"), i), lit(100L)).cast("float") / 2500.0f)
              .otherwise(lit(0.0f))).cast("float")))
      .drop("base")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("embs_materialize")(embs.count())

    // DEFAULT parameters: at this near-dup threshold the operators derive
    // the corpus-sized band width and the threshold-aware narrow probe
    // themselves (Dedup.resolveLshParams) — this harness measures exactly
    // what a first-time caller gets, no tuning on the call site
    println(s"SCALE   auto planesPerBand=${Dedup.planesForCorpus(n.toLong)} for n=$n")
    // DEFAULT path = int8 prefilter ON at this near-dup threshold
    // (auto policy; verify reads precomputed norms either way). Own
    // CacheScope per path, closed between timings — same cold-vs-warm
    // confound as the minhash contrast above: both paths share the sketch
    // relation's logical plan.
    val scopeSemDefault = graft.CacheScope()
    val semPairs = t("embedding_dup_pairs")(
      Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.9)(scopeSemDefault)
        .count())
    println(s"SCALE   semantic pairs=$semPairs planted=$planted " +
      s"(recall ${if (semPairs >= planted) "OK" else "MISS"})")
    scopeSemDefault.close()
    val scopeSemExact = graft.CacheScope()
    val semPairsX = t("embedding_pairs_exact")(
      Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.9,
        prefilterMargin = Double.PositiveInfinity)(scopeSemExact).count())
    println(s"SCALE   exact-path pairs=$semPairsX " +
      s"(${if (semPairsX == semPairs) "EQUAL to default path" else "MISMATCH"})")
    scopeSemExact.close()
    // eval ids ≡ 8 (mod 1000) are bases of a planted variant (ids ≡ 9 mod
    // 10), so each eval vector contaminates exactly its +1 neighbor:
    // expected flags = n/1000
    val scopeDecon = graft.CacheScope()
    val decon = t("semantic_decon")(
      Curation.semanticContaminationReport(embs, "vec_id", "embedding",
        col("vec_id") % 1000 === 8, threshold = 0.9)(scopeDecon)
        .filter(col("contaminated")).count())
    scopeDecon.close()
    println(s"SCALE   contaminated=$decon expected=${n / 1000} " +
      s"(${if (decon == n / 1000) "OK" else "MISS"})")
    embs.unpersist()
    }

    if (on("recall")) {
    // ---- near-THRESHOLD recall: pairs planted at EXACT cosine via a
    // deterministic rotation (v = c·û + √(1−c²)·p̂, p = w − (w·û)û, u/w
    // hash-random), run at threshold 0.8 with fully-default parameters.
    // Two cohorts: cos 0.90 = the AutoBandRecallGap guarantee point
    // (miss ≤ 1e-3 is the bandsForRecall CONTRACT — asserted), and cos
    // 0.82 = inside the best-effort gap (reported vs the analytic
    // model's prediction; the ADVICE regime corpus-sizing alone would
    // silently degrade).
    import graft.functions.{dot_product, l2_norm}
    val threshold = 0.8
    val cCol = when(col("vec_id") % 20 === 9, lit(0.82)).otherwise(lit(0.90))
    val dims = sequence(lit(0), lit(63))
    val rembs = spark.range(n.toLong).toDF("vec_id")
      .withColumn("base",
        when(col("vec_id") % 10 === 9, col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("u", transform(dims, i =>
        (pmod(xxhash64(col("base"), i), lit(1000L)).cast("float") / 500.0f - 1.0f)
          .cast("float")))
      .withColumn("w", transform(dims, i =>
        (pmod(xxhash64(col("vec_id"), i + 1000), lit(1000L)).cast("float") / 500.0f - 1.0f)
          .cast("float")))
      .withColumn("nu", l2_norm(col("u")))
      // coefficient of u in w's parallel component: (w·u)/|u|²
      .withColumn("cu", dot_product(col("w"), col("u")) / (col("nu") * col("nu")))
      .withColumn("p", zip_with(col("w"), col("u"), (wi, ui) =>
        (wi - col("cu") * ui).cast("float")))
      .withColumn("np", l2_norm(col("p")))
      .withColumn("embedding",
        when(col("vec_id") === col("base"), col("u"))
          .otherwise(zip_with(col("u"), col("p"), (ui, pi) =>
            (cCol * ui / col("nu")
              + sqrt(lit(1.0) - cCol * cCol) * pi / col("np")).cast("float"))))
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("recall_embs_materialize")(rembs.count())

    val r = Dedup.planesForCorpus(n.toLong)
    val b = Dedup.bandsForRecall(threshold, r, 1, 4)
    def predicted(c: Double) =
      1.0 - math.pow(1.0 - Dedup.bandCatchProb(c, r, 1, 4), b)
    println(s"SCALE   auto r=$r bands=$b at threshold=$threshold n=$n")

    val scopeRecall = graft.CacheScope()
    val found = t("recall_dup_pairs")(
      Dedup.embeddingDupPairs(rembs, "vec_id", "embedding", threshold)(scopeRecall)
        .filter(col("id_b") - col("id_a") === 1 && col("id_b") % 10 === 9)
        .select(col("id_b"), (col("id_b") % 20 === 9).as("gap"))
        .groupBy("gap").count()
        .collect().map(row => row.getBoolean(0) -> row.getLong(1)).toMap)
    scopeRecall.close()
    val cohort = n / 20L
    val recGuar = found.getOrElse(false, 0L).toDouble / cohort
    val recGap = found.getOrElse(true, 0L).toDouble / cohort
    println(f"SCALE   recall@0.90 (guarantee point)=$recGuar%.4f " +
      f"model>=${predicted(0.90)}%.4f over $cohort pairs " +
      s"(${if (recGuar >= 0.995) "OK" else "MISS"})")
    // the in-gap model is mildly optimistic: the 0.6 probe-coverage
    // constant is calibrated (conservatively) at the guarantee point;
    // deeper in the gap flips happen at larger margins, where
    // query-directed probing covers them less often (measured effective
    // coverage ~0.5 at cos 0.82) — hence the 0.07 slack here, vs the
    // hard assert above
    println(f"SCALE   recall@0.82 (best-effort gap)=$recGap%.4f " +
      f"model=${predicted(0.82)}%.4f over $cohort pairs " +
      s"(${if (recGap >= predicted(0.82) - 0.07) "OK" else "BELOW MODEL"})")
    rembs.unpersist()
    }

    if (on("pipeline")) {
    // ---- round-9 training-pipeline operators at scale: sequence packing
    // (token-stream conservation at a realistic context length), BPE
    // distributed-vs-local merge equality over a 50 k-word vocab, encode
    // conservation against the dictionary, and hard-negative mining over
    // the full corpus. Corpus = the lexical generator without variants
    // (every doc exactly 60 tokens, so invariants are exact). ----
    import graft.operators.{Bpe, TextOps}
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(50000L))))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("pipe_docs_materialize")(docs.count())
    val totalToks = 60L * n

    val seqLen = 2048
    val packed = t("pack_sequences") {
      val p = Curation.packSequences(
        docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks")),
        "doc_id", "toks", seqLen).cache()
      p.count(); p
    }
    val nEx = packed.count()
    val expEx = (totalToks + seqLen - 1) / seqLen
    val Row2 = packed.agg(sum("n_tokens"), max("n_tokens"), sum("n_docs_started"))
      .collect().head
    val (sumT, maxT, starts) =
      (Row2.getLong(0), Row2.getInt(1), Row2.getLong(2))
    println(s"SCALE   examples=$nEx expected=$expEx sum_tokens=$sumT " +
      s"(${if (nEx == expEx && sumT == totalToks && maxT == seqLen &&
               starts == n) "OK" else "MISS"})")
    packed.unpersist()

    // BPE: distributed merge loop over the ~50 k-word vocab table must
    // equal the serial loop on the collected counts, merge for merge.
    val words = t("bpe_word_counts") {
      val w = Bpe.wordCounts(docs, "text").cache(); w.count(); w
    }
    val cfg = Bpe.BpeConfig(numMerges = 10)
    val serial = Bpe.learnLocal(
      words.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, cfg)._1
    val (dist, vocabDf) = t("bpe_learn_distributed")(
      Bpe.learnDistributed(words, cfg))
    println(s"SCALE   bpe merges=${dist.length} " +
      s"(${if (dist == serial) "EQUAL to serial reference" else "MISMATCH"})")

    // encode conservation: corpus-side token total == dictionary-side
    // sum(cnt · |syms|) — two independent computations of the same number
    val encoded = t("bpe_encode") {
      val e = Bpe.encode(docs, "doc_id", "text", vocabDf).cache()
      e.count(); e
    }
    val corpusSide = encoded.agg(sum("n_bpe_tokens")).collect().head.getLong(0)
    val dictSide = vocabDf.select(sum(col("cnt") * size(col("syms"))))
      .collect().head.getLong(0)
    println(s"SCALE   bpe tokens corpus-side=$corpusSide dict-side=$dictSide " +
      s"(${if (corpusSide == dictSide) "OK" else "MISS"})")
    // contrast: the posexplode + join + reassemble formulation (the
    // uncollectable-vocab path) over the same corpus — must agree on the
    // token total; the delta is what the zero-shuffle dict pass saves
    val joinSide = t("bpe_encode_join_contrast")(
      Bpe.encode(docs, "doc_id", "text", vocabDf, broadcastMaxVocab = 0L)
        .agg(sum("n_bpe_tokens")).collect().head.getLong(0))
    println(s"SCALE   join-path tokens=$joinSide " +
      s"(${if (joinSide == corpusSide) "EQUAL to dict path" else "MISMATCH"})")
    encoded.unpersist()

    // the full corpus -> tensor chain: id-encode with the learned
    // dictionary, pack the id stream at context length 2048; every
    // subword id must land in exactly one example
    val encIds = t("bpe_encode_ids") {
      val e = Bpe.encodeIds(docs, "doc_id", "text", vocabDf).cache()
      e.count(); e
    }
    val packedIds = t("pack_sequence_ids") {
      val p = Curation.packSequencesIds(encIds, "doc_id", "ids", 2048).cache()
      p.count(); p
    }
    val rowI = packedIds.agg(count(lit(1)), sum("n_tokens"), sum("n_docs_started"))
      .collect().head
    val (nExI, sumI, startsI) = (rowI.getLong(0), rowI.getLong(1), rowI.getLong(2))
    val expExI = (corpusSide + 2048 - 1) / 2048
    println(s"SCALE   id-examples=$nExI expected=$expExI sum_ids=$sumI " +
      s"of $corpusSide doc_starts=$startsI " +
      s"(${if (nExI == expExI && sumI == corpusSide && startsI == n) "OK" else "MISS"})")
    packedIds.unpersist(); encIds.unpersist(); words.unpersist()

    // Unigram-LM: train on the corpus (driver-local EM over the ~50 k
    // distinct-word table), then zero-shuffle Viterbi encode of all 1 M
    // docs. Invariants: no UNK (chars always survive pruning), piece
    // CHARACTER conservation (Viterbi covers each word exactly, so total
    // piece chars == total token chars), and the id stream is
    // length-identical to the string stream.
    {
      import graft.operators.Unigram
      val uModel = t("unigram_train") {
        val m = Unigram.train(docs, "text").cache(); m.count(); m
      }
      val enc = t("unigram_encode") {
        val e = Unigram.encode(docs, "doc_id", "text", uModel).cache()
        e.count(); e
      }
      val unk = enc.select(explode(col("pieces")).as("p"))
        .filter(col("p") === "[UNK]").count()
      val pieceChars = enc
        .select(aggregate(col("pieces"), lit(0L),
          (acc, x) => acc + length(x).cast("long")).as("c"))
        .agg(sum("c")).head().getLong(0)
      val tokChars = docs
        .select(aggregate(TextOps.tokens(col("text")), lit(0L),
          (acc, x) => acc + length(x).cast("long")).as("c"))
        .agg(sum("c")).head().getLong(0)
      val idTotal = t("unigram_encode_ids")(
        Unigram.encodeIds(docs, "doc_id", "text", uModel)
          .agg(sum("n_pieces")).head().getLong(0))
      val strTotal = enc.agg(sum("n_pieces")).head().getLong(0)
      println(s"SCALE   unigram unk=$unk pieceChars=$pieceChars " +
        s"tokChars=$tokChars ids=$idTotal strs=$strTotal " +
        s"(${if (unk == 0 && pieceChars == tokChars && idTotal == strTotal)
             "OK" else "MISS"})")
      // the closed-form oracle regime at 1M (the WordPiece lesson:
      // sf0.01 can pass closed forms by luck): uniform chars +
      // substring-free top words => total pieces == sum over tokens of
      // (1 if vocab word else token length)
      val um = Unigram.uniformVocab(docs, "text", topWords = 50)
      val topWords = um.filter(length(col("piece")) > 1)
        .select("piece").collect().map(_.getString(0)).toSeq
      val cfPieces = Unigram.encode(docs, "doc_id", "text", um)
        .agg(sum("n_pieces")).head().getLong(0)
      val cfExpected = docs
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .select(when(col("w").isin(topWords: _*), lit(1L))
          .otherwise(length(col("w")).cast("long")).as("np"))
        .agg(sum("np")).head().getLong(0)
      println(s"SCALE   unigram-closed-form pieces=$cfPieces " +
        s"expected=$cfExpected " +
        s"(${if (cfPieces == cfExpected) "EXACT" else "MISS"})")

      // subword-regularized (sampled) encode: same char conservation,
      // strictly more pieces than Viterbi in aggregate (the sampler
      // explores sub-optimal = finer segmentations)
      val sampChars = t("unigram_sample_encode")(
        Unigram.sampleEncode(docs, "doc_id", "text", uModel, alpha = 0.5,
            seed = 1L)
          .select(aggregate(col("pieces"), lit(0L),
            (acc, x) => acc + length(x).cast("long")).as("c"),
            col("n_pieces").cast("long").as("np"))
          .agg(sum("c"), sum("np")).head())
      println(s"SCALE   unigram-sample pieceChars=${sampChars.getLong(0)} " +
        s"pieces=${sampChars.getLong(1)} viterbiPieces=$strTotal " +
        s"(${if (sampChars.getLong(0) == tokChars &&
                 sampChars.getLong(1) >= strTotal) "OK" else "MISS"})")
      enc.unpersist(); uModel.unpersist()
    }

    // interleaved multimodal packing: image-patch tokens + text ids in
    // ONE stream per doc (2 markers + 4 patch tokens + 60 text ids = 66),
    // packed at context length 2048 — conservation must be exact
    import graft.operators.Multimodal
    def hex2(c: org.apache.spark.sql.Column) = lpad(hex(c % 256), 2, "0")
    val payload = unhex(concat(hex2(col("doc_id")),
      hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
    val mmPacked = t("mm_pack_interleaved") {
      val pk = Multimodal.packInterleaved(
        docs.select(col("doc_id"), payload.as("content"), col("text")),
        "doc_id", "content", "text", w = 8, h = 6, outW = 4, outH = 4,
        p = 2, textVocab = 512, seqLen = 2048).cache()
      pk.count(); pk
    }
    val mmRow = mmPacked
      .agg(count(lit(1)), sum("n_tokens"), sum("n_docs_started"))
      .collect().head
    val (mmEx, mmSum, mmStarts) =
      (mmRow.getLong(0), mmRow.getLong(1), mmRow.getLong(2))
    val mmTotal = 66L * n
    val mmExpEx = (mmTotal + 2048 - 1) / 2048
    println(s"SCALE   mm-examples=$mmEx expected=$mmExpEx sum_ids=$mmSum " +
      s"of $mmTotal doc_starts=$mmStarts " +
      s"(${if (mmEx == mmExpEx && mmSum == mmTotal && mmStarts == n) "OK"
          else "MISS"})")
    mmPacked.unpersist()
    docs.unpersist()

    // hard negatives: 64-anchor batch against the full corpus (labels =
    // id % 4); every anchor must mine k rows, none sharing its label
    val embs = spark.range(n.toLong).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float") / 500.0f
            - 1.0f).cast("float")))
      .withColumn("label", (col("vec_id") % 4).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("hn_embs_materialize")(embs.count())
    val k = 8
    val hn = t("hard_negatives") {
      val h = graft.operators.Similarity.hardNegatives(
        embs, "vec_id", "embedding", "label",
        embs.filter(col("vec_id") < 64), "vec_id", "embedding", "label", k)
        .cache()
      h.count(); h
    }
    val bad = hn.filter(col("neg_label") === col("qid") % 4).count()
    println(s"SCALE   hard-neg rows=${hn.count()} expected=${64 * k} " +
      s"same-label=$bad (${if (hn.count() == 64L * k && bad == 0) "OK" else "MISS"})")
    hn.unpersist(); embs.unpersist()
    }

    if (on("curation")) {
    // ---- round-10 curation/profiling operators at scale: DSIR
    // importance weights (two 8192-bucket feature models over the full
    // token stream), trigram stupid-backoff LM (fit 80% / score 20%),
    // theta vocabulary overlap (two sketch passes, estimates vs known
    // truth), corpus data card (exact invariants), and SemDeDup over
    // planted duplicate vectors.
    import graft.operators.{Curation, SemDedup, TextAnalysis, TextOps, WordPiece}
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("lang", concat(lit("l"), col("doc_id") % 5))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(30)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(30000L))))))
      .withColumn("n_chars", length(col("text")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("cur_docs_materialize")(docs.count())

    val target = docs.filter(col("doc_id") % 7 === 0)
    val dsirN = t("dsir_logratios") {
      Curation.dsirLogRatios(docs, "doc_id", "text", target, "text")
        .filter(col("n_features") =!= 0).count()
    }
    println(s"SCALE   dsir scored=$dsirN (${if (dsirN == n) "OK" else "MISS"})")
    val dsirM = t("dsir_sample_top10k")(
      Curation.dsirSample(docs, "doc_id", "text", target, "text",
        m = 10000).count())
    println(s"SCALE   dsir sample=$dsirM (${if (dsirM == 10000) "OK" else "MISS"})")

    val split = pmod(graft.functions.md5_lower64(col("doc_id").cast("string")),
      lit(100L))
    val triBad = t("trigram_backoff") {
      TextAnalysis.trigramBackoff(docs.filter(split < 80),
          docs.filter(split >= 80), "doc_id", "text")
        .filter(col("n_trigrams") =!= 29).count()
    }
    println(s"SCALE   trigram bad-accounting=$triBad " +
      s"(${if (triBad == 0) "OK" else "MISS"})")

    // overlap truth: A = ids 0..29999's token space w0..w29999; B shifts
    // by 10000 -> |A|=30k, |B|=30k, common 20k (captured at lgK=14)
    val two = spark.range(n.toLong).toDF("doc_id")
      .withColumn("g", when(col("doc_id") % 2 === 0, "a").otherwise("b"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(30)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(30000L)) +
            when(col("doc_id") % 2 === 0, 0L).otherwise(10000L)))))
    val ov = t("theta_overlap_lgk14")(
      Curation.vocabularyOverlap(two, "text", "g", "a", "b", lgK = 14)
        .collect().head)
    def close(got: Long, want: Long) =
      math.abs(got - want).toDouble / want < 0.05
    val ovOk = close(ov.getLong(0), 30000) && close(ov.getLong(1), 30000) &&
      close(ov.getLong(2), 20000) && close(ov.getLong(3), 10000)
    println(s"SCALE   overlap a=${ov.getLong(0)} b=${ov.getLong(1)} " +
      s"common=${ov.getLong(2)} onlyA=${ov.getLong(3)} " +
      s"(${if (ovOk) "OK <5%" else "MISS"})")

    // WordPiece encode at corpus scale (zero-shuffle broadcast-vocab map):
    // closed-form conservation under the PREFIX-FREE char+top-word vocab —
    // every vocab word is 1 piece, every other word |chars| pieces. (The
    // first cut of this stage ran WITHOUT the prefix filter and caught
    // the closed form breaking on top-word prefixes of longer tokens.)
    val wpVocab = WordPiece.charWordVocab(docs, "text", topWords = 1000,
      prefixFree = true).cache()
    val vocabWords = wpVocab
      .filter(length(col("piece")) > 1 && !col("piece").startsWith("##"))
    val wpGot = t("wordpiece_encode")(
      WordPiece.encode(docs, "doc_id", "text", wpVocab)
        .agg(sum("n_pieces")).head().getLong(0))
    val wpWant = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .join(vocabWords.select(col("piece").as("w"), lit(1).as("hit")),
        Seq("w"), "left")
      .select(when(col("hit").isNotNull, 1).otherwise(length(col("w")))
        .cast("long").as("np"))
      .agg(sum("np")).head().getLong(0)
    wpVocab.unpersist()
    println(s"SCALE   wordpiece pieces=$wpGot expected=$wpWant " +
      s"(${if (wpGot == wpWant) "EXACT" else "MISS"})")

    // augmentations: exact token conservation at scale — FIM emits
    // n + 3 tokens per doc (3 sentinels, empties collapse), span
    // corruption emits n + 2·2 across inputs+targets (both windows
    // host a span at 31 tokens/doc)
    import graft.operators.Augment
    val fimToks = t("augment_fim")(
      Augment.fim(docs, "doc_id", "text")
        .select(size(org.apache.spark.sql.functions.split(col("fim_text"), " "))
          .cast("long").as("k"))
        .agg(sum("k")).head().getLong(0))
    val fimOk = fimToks == (31L + 3L) * n
    println(s"SCALE   fim tokens=$fimToks expected=${(31L + 3L) * n} " +
      s"(${if (fimOk) "EXACT" else "MISS"})")
    val scToks = t("augment_span_corrupt")(
      Augment.spanCorrupt(docs, "doc_id", "text")
        .select((size(org.apache.spark.sql.functions.split(col("inputs_text"), " ")) +
          size(org.apache.spark.sql.functions.split(col("targets_text"), " ")))
          .cast("long").as("k"))
        .agg(sum("k")).head().getLong(0))
    val scOk = scToks == (31L + 4L) * n
    println(s"SCALE   span-corrupt tokens=$scToks expected=${(31L + 4L) * n} " +
      s"(${if (scOk) "EXACT" else "MISS"})")

    val card = t("corpus_report")(
      Curation.corpusReport(docs, "doc_id", "text", "lang", "lang",
        "n_chars").collect().head)
    val cardOk = card.getLong(0) == n.toLong &&
      card.getLong(1) == 31L * n && card.getLong(4) == 5L &&
      card.getLong(8) == 0L
    println(s"SCALE   card docs=${card.getLong(0)} toks=${card.getLong(1)} " +
      s"langs=${card.getLong(4)} dup=${card.getLong(8)} " +
      s"(${if (cardOk) "OK" else "MISS"})")
    docs.unpersist()

    // SemDeDup at n/5 vectors: every 10th vector copies its predecessor;
    // identical vectors share a centroid, so exactly the planted copies
    // must lose keep (threshold 0.99 - random dim-64 cosines stay far
    // below it)
    val nv = n / 5
    val base = spark.range(nv.toLong).toDF("vec_id")
      .withColumn("src",
        when(col("vec_id") % 10 === 9, col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("src"), i), lit(1000L)).cast("float") / 500.0f
            - 1.0f).cast("float")))
      .drop("src")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("sem_vecs_materialize")(base.count())
    val centroids = spark.range(64).toDF("cid")
      .select(col("cid").cast("int").as("cid"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("cid"), i, lit(77L)), lit(1000L)).cast("float")
            / 500.0f - 1.0f).cast("float")).as("cvec"))
    val dropped = t("semdedup_report")(
      SemDedup.report(base, "vec_id", "embedding", centroids, eps = 0.99)
        .filter(!col("keep")).count())
    val planted9 = (9L until nv.toLong by 10L).size
    println(s"SCALE   semdedup dropped=$dropped planted=$planted9 " +
      s"(${if (dropped == planted9) "EXACT" else "MISS"})")
    base.unpersist()
    }

    if (on("embed")) {
    // ---- embedding post-processing at FULL corpus size: ZCA whitening
    // over n 64-dim vectors — one VectorMoments pass (the shuffle is a
    // 1+d+d² buffer per partition), driver Jacobi, one zero-shuffle
    // transform. Asserts the whitening CONTRACT at scale: whitened mean
    // 0, whitened-covariance spectrum = lambda/(lambda+eps).
    import graft.operators.Similarity
    import graft.functions.{vector_moments, Jacobi}
    val embs = spark.range(n.toLong).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float") / 500.0f
            - 1.0f).cast("float")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("embed_vecs_materialize")(embs.count())
    val eps = 1e-5
    val wdf = t("embed_whiten") {
      val w = Similarity.whiten(embs, "vec_id", "embedding", eps).cache()
      w.count(); w
    }
    def mom(df: org.apache.spark.sql.DataFrame, c: String) = {
      val r = df.agg(vector_moments(col(c)).as("m"))
        .select("m.mean", "m.m2").head()
      (r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
    }
    def covEig(mean: Array[Double], m2: Array[Double]) = {
      val dd = mean.length
      Jacobi.eigen(Array.tabulate(dd * dd)(i =>
        m2(i) - mean(i / dd) * mean(i % dd)), dd)._1.sorted
    }
    val (m0, s0) = t("embed_moments_raw")(mom(embs, "embedding"))
    val (m1, s1) = t("embed_moments_whitened")(mom(wdf, "w"))
    val expectedEig = covEig(m0, s0)
      .map(l => math.max(l, 0.0) / (math.max(l, 0.0) + eps)).sorted
    val gotEig = covEig(m1, s1)
    val meanOk = m1.forall(x => math.abs(x) < 1e-6)
    val eigOk = gotEig.zip(expectedEig)
      .forall { case (a, b) => math.abs(a - b) < 1e-5 }
    println(s"SCALE   whiten meanZero=$meanOk spectrumMatch=$eigOk " +
      s"(${if (meanOk && eigOk) "OK" else "MISS"})")
    wdf.unpersist(); embs.unpersist()
    }

    if (on("semdedup")) {
    // ---- SemDeDup at FULL corpus size with DEFAULT parameters: the
    // production entry point (reportKMeans over a materialized parquet
    // corpus — auto-k via kForCorpus, learned Lloyd centroids, memoized
    // through IndexCatalog). Every 10th vector is an EXACT copy of its
    // predecessor; identical vectors always co-assign, so the planted
    // drop count is exact at any k. Also measures the auto-k occupancy
    // and the within-cluster pair budget Σ|c|² the default produces.
    import graft.operators.SemDedup
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semdedup_smoke").toString
    val src = s"$dir/embeddings.parquet"
    spark.range(n.toLong).toDF("vec_id")
      .withColumn("src0", when(col("vec_id") % 10 === 9,
        col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(col("src0"), i), lit(1000L)).cast("float") / 500.0f
          - 1.0f).cast("float")))
      .drop("src0")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .write.mode("overwrite").parquet(src)
    val embs = spark.read.parquet(src).cache()
    t("semdedup_vecs_materialize")(embs.count())
    val k = SemDedup.kForCorpus(n.toLong)
    val (rep, droppedK) = t("semdedup_kmeans_e2e") {
      val r = SemDedup.reportKMeans(embs, "vec_id", "embedding", Seq(src),
        eps = 0.99).cache()
      (r, r.filter(!col("keep")).count())
    }
    val plantedK = (9L until n.toLong by 10L).size
    println(s"SCALE   semdedup-auto dropped=$droppedK planted=$plantedK " +
      s"(${if (droppedK == plantedK) "EXACT" else "MISS"})")
    val occ = rep.groupBy("cid").count()
      .agg(max("count").as("mx"), avg("count").as("av"),
        sum(col("count") * col("count")).as("pairs")).head()
    println(f"SCALE   semdedup-auto k=$k maxCluster=${occ.getLong(0)} " +
      f"avgCluster=${occ.getDouble(1)}%.1f pairBudget=${occ.getLong(2)}")
    rep.unpersist(); embs.unpersist()
    }

    if (on("semroute")) {
    // ---- SemDeDup ASSIGNMENT hierarchy at full corpus size: the flat
    // scan is N·k cosines and k = N/2048 grows with N, so flat assignment
    // is quadratic in N — the routed two-level path (g = ⌈√k⌉ supers,
    // nprobe-pruned member scan) must hold per-vector cost to
    // O((1+nprobe)·√k). Plant: k deterministic pseudo-random dim-64
    // centroids, every vector = its (id mod k) centroid + 2% noise, so
    // the true assignment is known and unambiguous (own-centroid cos
    // ≈ 0.999 vs ≲ 0.7 cross talk). Asserts (1) routed assignment
    // recovers the plant node-exactly at N, (2) routed == flat on a
    // sampled flat run (the exact-agreement audit), and reports the
    // per-vector cost of both paths — the sub-linearity evidence.
    import graft.operators.SemDedup
    val k = SemDedup.kForCorpus(n.toLong)
    val centroids = spark.range(k.toLong).toDF("cid")
      .select(col("cid").cast("int").as("cid"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("cid"), i, lit(13L)), lit(1000L)).cast("float")
            / 500.0f - 1.0f).cast("float")).as("cvec"))
      .cache()
    centroids.count()
    val vecs = spark.range(n.toLong).toDF("vec_id")
      .withColumn("own", pmod(col("vec_id"), lit(k.toLong)).cast("int"))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("own"), i, lit(13L)), lit(1000L)).cast("float")
          / 500.0f - 1.0f) +
          (pmod(xxhash64(col("vec_id"), i, lit(29L)), lit(1000L)).cast("float")
            / 25000.0f - 0.02f)).cast("float")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("semroute_vecs_materialize")(vecs.count())
    // materialize through parquet, NOT .cache(): building an InMemoryRelation
    // from this multi-stage plan under AQE measured ~10x slower than the
    // computation itself (92 s vs 9.7 s AQE-off vs 4 s uncached at 1 M) —
    // see the assignRouted scaladoc; the write cost is part of the timing
    val routedPath = java.nio.file.Files
      .createTempDirectory("graft_semroute_smoke").toString + "/assigned"
    val routed = t(s"semroute_routed_n=$n,k=$k") {
      SemDedup.assignRouted(vecs, "vec_id", "embedding", centroids)
        .write.mode("overwrite").parquet(routedPath)
      spark.read.parquet(routedPath)
    }
    val wrong = routed.join(vecs.select(col("vec_id").as("id"), col("own")), "id")
      .filter(col("cid") =!= col("own")).count()
    println(s"SCALE   semroute planted-miss=$wrong of $n " +
      s"(${if (wrong == 0) "EXACT" else "MISS"})")
    // flat agreement audit on a 1/20 sample (flat at full N·k is the
    // quadratic cost this stage exists to retire — sample it)
    val ns = n / 20
    val sample = vecs.filter(col("vec_id") < ns.toLong)
    val flatS = t(s"semroute_flat_n=$ns,k=$k") {
      val f = SemDedup.assignScored(sample, "vec_id", "embedding",
        centroids, routedThreshold = Int.MaxValue).cache()
      f.count(); f
    }
    val disagree = flatS.select(col("id"), col("cid").as("fcid"))
      .join(routed.select(col("id"), col("cid")), "id")
      .filter(col("cid") =!= col("fcid")).count()
    println(s"SCALE   semroute flat-vs-routed disagree=$disagree of $ns " +
      s"(${if (disagree == 0) "EXACT" else "MISS"})")
    println(f"SCALE   semroute per-vector candidate work: flat=k=$k " +
      f"routed=g+nprobe*k/g=${k / math.ceil(math.sqrt(k.toDouble)).toInt * 8 +
        math.ceil(math.sqrt(k.toDouble)).toInt}")
    flatS.unpersist(); vecs.unpersist()
    centroids.unpersist()
    }

    if (on("ivfencode")) {
    // ---- IVF list-encode A/B (round 15): the final full-corpus
    // assignment pass of IvfIndex.build. A = the retired shape, a
    // `max_by(cid, struct(cos, cid))` whose struct buffer silently falls
    // back to SortAggregate and sorts all N·k candidate rows; B = the
    // packed-long argmax HashAggregate IvfIndex.assign now uses (routed
    // through the √k hierarchy past 4096 centroids — at auto-sized k
    // that dispatch needs N > ~8.4 M, so at 1 M this A/B isolates the
    // sort-fallback retirement; the routed path's exactness is the
    // semroute stage's assertion). Plant: same separated corpus as
    // semroute, so B must recover the plant node-exactly.
    import graft.operators.{IvfIndex, SemDedup}
    val k = SemDedup.kForCorpus(n.toLong)
    val centroids = spark.range(k.toLong).toDF("cid")
      .select(col("cid").cast("int").as("cid"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("cid"), i, lit(13L)), lit(1000L)).cast("float")
            / 500.0f - 1.0f).cast("float")).as("cvec"))
      .cache()
    centroids.count()
    val vecs = spark.range(n.toLong).toDF("id")
      .withColumn("own", pmod(col("id"), lit(k.toLong)).cast("int"))
      .withColumn("vec", transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("own"), i, lit(13L)), lit(1000L)).cast("float")
          / 500.0f - 1.0f) +
          (pmod(xxhash64(col("id"), i, lit(29L)), lit(1000L)).cast("float")
            / 25000.0f - 0.02f)).cast("float")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("ivfencode_vecs_materialize")(vecs.count())
    // the OLD side is the deliberately-quadratic sort-fallback shape;
    // past ~2e9 candidate rows it stops being an A/B and starts being a
    // stall, so it caps out (printed, never silent) and the stage's value
    // at big n is exercising the NEW routed path (k > 4096) planted-exact
    val oldN =
      if (n.toLong * k > 2000000000L) {
        println(s"SCALE   ivfencode OLD side SKIPPED: n*k = ${n.toLong * k} " +
          "candidate rows through a SortAggregate fallback (the retired " +
          "wall); A/B evidence lives at n=1M")
        n.toLong
      } else t(s"ivfencode_OLD_maxby_struct_n=$n,k=$k") {
        vecs.select("id", "vec").crossJoin(broadcast(centroids))
          .withColumn("cos",
            graft.functions.cosine_similarity(col("vec"), col("cvec")))
          .groupBy("id")
          .agg(max_by(col("cid"), struct(col("cos"), col("cid"))).as("cid"),
            first(col("vec")).as("vec"))
          .count()
      }
    // leg 1 — the A/B against OLD (both sides: full assignment, count
    // action): isolates the aggregate shape, the thing being retired
    val newN = t(s"ivfencode_NEW_packed_n=$n,k=$k") {
      IvfIndex.assign(vecs.select("id", "vec"), centroids, k).count()
    }
    // leg 2 — materialize through parquet for the miss audit, not a
    // recompute (the semroute lesson); timed separately so the write
    // cost never muddies the A/B
    val encPath = java.nio.file.Files
      .createTempDirectory("graft_ivfencode_smoke").toString + "/assigned"
    val packed = t(s"ivfencode_NEW_materialize_n=$n") {
      IvfIndex.assign(vecs.select("id", "vec"), centroids, k)
        .write.mode("overwrite").parquet(encPath)
      spark.read.parquet(encPath)
    }
    val miss = packed.select(col("id"), col("cid"))
      .join(vecs.select(col("id"), col("own")), "id")
      .filter(col("cid") =!= col("own")).count()
    require(oldN == n && newN == n, s"row drop: old=$oldN new=$newN")
    // The flat path (k <= RoutedThreshold) scans every centroid, so on
    // this separated plant a single miss IS an assignment regression —
    // fail the stage, don't just print it (ADVICE r15). The routed path
    // is approximate by contract; there the count stays a report (its
    // exactness anchor is the semroute stage's nprobe>=g equivalence).
    if (k <= graft.operators.SemDedup.RoutedThreshold)
      require(miss == 0,
        s"flat-path assignment regression: planted-miss=$miss of $n")
    println(s"SCALE   ivfencode planted-miss=$miss of $n " +
      s"(${if (miss == 0) "EXACT" else "MISS"})")
    vecs.unpersist(); centroids.unpersist()
    }

    if (on("classifier")) {
    // ---- supervised classifiers + heavy hitters at scale. Corpus: every
    // doc carries its class token (`cls<label>`, label = id % 5) THREE
    // times plus 29 noise tokens from a 20 k vocabulary. Hash buckets
    // (4096) collide under a 20 k vocabulary by design, so per-doc
    // misclassification is possible when colliding noise outweighs the
    // planted signal — the assertion is an error-rate ceiling (0.5%),
    // not exactness.
    import graft.operators.Classifier
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("label", (col("doc_id") % 5).cast("int"))
      .withColumn("lang", concat(lit("cls"), col("label")))
      .withColumn("text", concat_ws(" ",
        concat_ws(" ", array_repeat(concat(lit("cls"), col("label")), 3)),
        concat_ws(" ", transform(sequence(lit(0), lit(28)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(20000L)))))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("cls_docs_materialize")(docs.count())
    val split = pmod(graft.functions.md5_lower64(col("doc_id").cast("string")),
      lit(100L))
    val trainD = docs.filter(split < 80).cache()
    val scoreD = docs.filter(split >= 80).cache()
    val (nTrain, nScore) = (trainD.count(), scoreD.count())

    val (nbModel, nbPriors) = t("nb_train") {
      val (m, p) = Classifier.nbTrain(trainD, "doc_id", "text", "lang",
        buckets = 4096)
      val mc = m.localCheckpoint(); val pc = p.localCheckpoint()
      (mc, pc)
    }
    val nbWrong = t("nb_score") {
      Classifier.nbScore(scoreD, "doc_id", "text", nbModel, nbPriors, 4096)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .filter(col("predicted") =!= col("lang")).count()
    }
    println(s"SCALE   nb train=$nTrain score=$nScore wrong=$nbWrong " +
      s"(${if (nbWrong <= nScore / 200) "OK <=0.5%" else "MISS"})")

    val lrModel = t("lr_train_5it")(
      Classifier.lrTrain(trainD, "doc_id", "text", col("label") === 0,
        buckets = 1024, iters = 5, learnRate = 1.0))
    val lrWrong = t("lr_score") {
      Classifier.lrScore(scoreD, "doc_id", "text", lrModel, 1024)
        .join(docs.select(col("doc_id"), col("label")), "doc_id")
        .filter(col("predicted") =!= (col("label") === 0).cast("int")).count()
    }
    println(s"SCALE   lr wrong=$lrWrong " +
      s"(${if (lrWrong <= nScore / 100) "OK <=1%" else "MISS"})")

    // heavy hitters: the 5 class tokens (3·n/5 occurrences each) are the
    // only tokens above N/(cap+1) at cap=512 (noise sits ~29n/20000)
    val hh = t("heavy_hitters_cap512")(
      graft.operators.TextAnalysis.heavyHitters(docs, "text", capacity = 512)
        .collect().toSeq)
    val expHh = (0 until 5).map(c => (s"cls$c",
      3L * (n.toLong / 5 + (if (c < n % 5) 1 else 0)))).sortBy(x => (-x._2, x._1))
    val gotHh = hh.map(r => (r.getString(0), r.getLong(1)))
    println(s"SCALE   heavy-hitters=${gotHh.size} " +
      s"(${if (gotHh == expHh) "EXACT" else s"MISS got=$gotHh"})")
    trainD.unpersist(); scoreD.unpersist(); docs.unpersist()
    }

    if (on("streamlearn")) {
    // ---- streaming learners at production admission: the 1M planted
    // classifier corpus arriving as 10 micro-batches of 100k docs. The
    // NB check is the strong one: the streamed count partials must
    // derive a model BIT-IDENTICAL to batch nbTrain over the full
    // corpus. LR trains online (one step per batch = 10 steps) and must
    // separate the planted signal on held-out docs; the profile's
    // merged sketches must report the 5 class tokens exactly.
    import graft.operators.Classifier
    import graft.streaming.{StreamingLr, StreamingNb, StreamingProfile}
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("label", (col("doc_id") % 5).cast("int"))
      .withColumn("lang", concat(lit("cls"), col("label")))
      .withColumn("text", concat_ws(" ",
        concat_ws(" ", array_repeat(concat(lit("cls"), col("label")), 3)),
        concat_ws(" ", transform(sequence(lit(0), lit(28)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(20000L)))))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("sl_docs_materialize")(docs.count())
    val nb = 10
    val batches = (0 until nb).map(i =>
      docs.filter(col("doc_id") % nb === i))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sl").toString

    t("sl_lr_10_steps") {
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingLr.stepBatch(spark, b, i, s"$tmp/lr", "doc_id", "text",
          col("label") === 0, buckets = 1024, learnRate = 1.0)
      }
    }
    val lrModel = StreamingLr.currentModel(spark, s"$tmp/lr", 1024)
    val holdout = spark.range(n.toLong, n + 50000L).toDF("doc_id")
      .withColumn("label", (col("doc_id") % 5).cast("int"))
      .withColumn("text", concat_ws(" ",
        concat_ws(" ", array_repeat(concat(lit("cls"), col("label")), 3)),
        concat_ws(" ", transform(sequence(lit(0), lit(28)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(20000L)))))))
    val lrWrong = t("sl_lr_score_holdout") {
      Classifier.lrScore(holdout, "doc_id", "text", lrModel, 1024)
        .join(holdout.select(col("doc_id"), col("label")), "doc_id")
        .filter(col("predicted") =!= (col("label") === 0).cast("int")).count()
    }
    println(s"SCALE   online-lr holdout wrong=$lrWrong/50000 " +
      s"(${if (lrWrong <= 500) "OK <=1%" else "MISS"})")

    t("sl_nb_10_batches") {
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingNb.upsertBatch(spark, b, i, s"$tmp/nb", "doc_id", "text",
          "lang", buckets = 4096)
      }
    }
    val (sm, sp) = t("sl_nb_derive_model")(
      StreamingNb.currentModel(spark, s"$tmp/nb", 4096))
    val (bm, bp) = Classifier.nbTrain(docs, "doc_id", "text", "lang", 4096)
    val nbEq = sm.collect().map(_.toSeq).toSet == bm.collect().map(_.toSeq).toSet &&
      sp.collect().map(_.toSeq).toSet == bp.collect().map(_.toSeq).toSet
    println(s"SCALE   streamed-nb model ${if (nbEq) "BIT-EQUAL to batch" else "MISMATCH"}")

    t("sl_profile_10_batches") {
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingProfile.upsertBatch(spark, b, i, s"$tmp/prof", "text",
          capacity = 512)
      }
    }
    val prof = StreamingProfile.read(spark, s"$tmp/prof", capacity = 512).head()
    val hitters = prof.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getString(0), r.getLong(1))).filter(_._1.startsWith("cls"))
    val profOk = prof.getLong(0) == n.toLong && prof.getLong(1) == 32L * n &&
      hitters.size == 5
    println(s"SCALE   profile docs=${prof.getLong(0)} toks=${prof.getLong(1)} " +
      s"cls-hitters=${hitters.size} (${if (profOk) "OK" else "MISS"})")
    docs.unpersist()
    }

    if (on("bm25")) {
    // ---- materialized BM25 inverted index at full corpus size: build
    // once (the tokenize + (term, doc) count shuffle), then probe — the
    // probe must (a) reproduce the full-scan bm25TopK BIT-FOR-BIT and
    // (b) read only the buckets its terms hash into, so its wall-time is
    // index-lookup-shaped, not corpus-scan-shaped. Corpus = the lexical
    // generator without variants (uniform 50 k vocabulary, so a term's
    // postings are ~n·60/50k docs — realistically selective).
    import graft.operators.{Bm25Index, TextAnalysis}
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(50000L))))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("bm25_docs_materialize")(docs.count())
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    t("bm25_index_build")(
      Bm25Index.build(docs, "doc_id", "text", dir, numBuckets = 64))
    val terms = Seq("w17", "w4242", "w31337")
    val scan = t("bm25_full_scan")(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
    val probe = t("bm25_index_probe")(
      Bm25Index.topK(spark, dir, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
    println(s"SCALE   bm25 probe ${if (probe == scan) "BIT-EQUAL to scan"
      else s"MISMATCH probe=$probe scan=$scan"}")
    // warm second probe with different terms: the per-query marginal cost
    // (the build and doclen/stats footprint already in page cache)
    val probe2 = t("bm25_index_probe_warm")(
      Bm25Index.topK(spark, dir, Seq("w999", "w1000"), k = 10).count())
    println(s"SCALE   bm25 warm-probe rows=$probe2 " +
      s"(${if (probe2 == 10) "OK" else "MISS"})")
    // incremental maintenance at scale: merge a 10%-of-corpus delta of
    // NEW doc ids, then the probe must equal a fresh scan over the
    // grown corpus — the CDC-append path, costed against the full build
    val delta = spark.range(n.toLong, n + n / 10L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(50000L))))))
    t("bm25_merge_delta")(
      Bm25Index.merge(delta, "doc_id", "text", dir, numBuckets = 64))
    val scanM = t("bm25_scan_post_merge")(
      TextAnalysis.bm25TopK(docs.unionByName(delta), "doc_id", "text",
          terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
    val probeM = t("bm25_probe_post_merge")(
      Bm25Index.topK(spark, dir, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
    println(s"SCALE   bm25 post-merge probe ${if (probeM == scanM)
      "BIT-EQUAL to grown-corpus scan" else
      s"MISMATCH probe=$probeM scan=$scanM"}")
    // batch retrieval: 64 two-term queries in ONE plan (the hard-negative
    // mining shape) — per-query serial probing would pay ~2 s × 64; the
    // batch amortizes the postings scan and candidate shuffle. Sampled
    // queries must match their per-query probes row-for-row.
    val batchQs = (0 until 64).map(i =>
      s"q$i" -> Seq(s"w${i * 7 + 3}", s"w${i * 13 + 11}"))
    val batchOut = t("bm25_batch_64_queries") {
      val o = Bm25Index.batchTopK(spark, dir, batchQs, k = 10).cache()
      o.count(); o
    }
    val sampleOk = Seq(0, 17, 63).forall { i =>
      val got = batchOut.filter(col("qid") === s"q$i")
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      val want = Bm25Index.topK(spark, dir, batchQs(i)._2, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      got == want
    }
    println(s"SCALE   bm25 batch rows=${batchOut.count()} expected=640 " +
      s"sampled-queries ${if (sampleOk) "EQUAL to per-query probes"
      else "MISMATCH"}")
    batchOut.unpersist()
    docs.unpersist()
    }

    if (on("minhashindex")) {
    // ---- materialized MinHash-LSH dedup index at full corpus size: the
    // rolling-ingest dedup shape. Corpus = the lexical generator (every
    // 10th doc a 1-token variant of its predecessor), indexed side =
    // doc_id % 10 != 9, incoming delta = the variants (% 10 == 9) — so
    // every delta doc has EXACTLY one planted near-dup in the index and
    // probe recall is checkable. Contrast: the full-corpus
    // minhashLshPairs scan (the non-indexed path) re-shingles everything
    // per run; the probe only shingles the delta and opens pruned
    // buckets. merge() then appends the delta and a fresh shard of
    // verbatim copies must surface via the post-merge probe.
    import graft.operators.MinHashIndex
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("base",
        when(col("doc_id") % 10 === 9, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(
            when(col("doc_id") =!= col("base") && (i === 30), col("doc_id"))
              .otherwise(col("base")), i), lit(50000L))))))
      .drop("base")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("mhidx_docs_materialize")(docs.count())
    val indexed = docs.filter(col("doc_id") % 10 =!= 9)
    val delta = docs.filter(col("doc_id") % 10 === 9)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    t("mhidx_build")(
      MinHashIndex.build(indexed, "doc_id", "text", dir))
    val probeScope = graft.CacheScope()
    val hits = t("mhidx_probe_delta") {
      MinHashIndex.probe(spark, dir, delta, "doc_id", "text", 0.8)(probeScope)
        .count()
    }
    probeScope.close()
    println(s"SCALE   mhidx probe pairs=$hits planted=$planted " +
      s"(recall ${if (hits >= planted) "OK" else "MISS"})")
    // the CDC steady-state shape: a SMALL delta (0.5% of corpus — every
    // 200th doc, all of them planted variants) where bucket pruning and
    // the candidate-id semi-join actually bite; the 10% probe above is
    // the bulk-backfill end of the delta-fraction law
    val smallDelta = docs.filter(col("doc_id") % 200 === 9)
    val smallExpect = smallDelta.count()
    val smallScope = graft.CacheScope()
    val smallHits = t("mhidx_probe_small_delta") {
      MinHashIndex.probe(spark, dir, smallDelta, "doc_id", "text", 0.8)(
        smallScope).count()
    }
    smallScope.close()
    println(s"SCALE   mhidx small-delta pairs=$smallHits " +
      s"planted=$smallExpect " +
      s"(recall ${if (smallHits >= smallExpect) "OK" else "MISS"})")
    // non-indexed contrast: the full-corpus pair scan (re-shingles all n
    // docs; the probe shingled only the n/10 delta + pruned bucket reads)
    val scanScope = graft.CacheScope()
    val scanPairs = t("mhidx_fullscan_contrast")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)(scanScope).count())
    scanScope.close()
    println(s"SCALE   fullscan pairs=$scanPairs (probe found the same " +
      s"cross pairs without rescanning the corpus)")
    t("mhidx_merge_delta")(
      MinHashIndex.merge(delta, "doc_id", "text", dir))
    // fresh shard of verbatim copies under new ids: every copy of a
    // NON-variant origin must surface an exact (jaccard 1.0) match
    // post-merge (variant origins' texts differ at position 30 from this
    // pure-seed rendering, so they are excluded from the expectation)
    val fresh = spark.range(n.toLong, n.toLong + 1000).toDF("doc_id")
      .filter((col("doc_id") - n.toLong) % 10 =!= 9)
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id") - n.toLong, i),
            lit(50000L))))))
    val freshExpect = fresh.count()
    val freshScope = graft.CacheScope()
    val freshHits = t("mhidx_probe_post_merge") {
      MinHashIndex.probe(spark, dir, fresh, "doc_id", "text", 0.8)(freshScope)
        .filter(col("jaccard") === 1.0)
        .select("id_new").distinct().count()
    }
    freshScope.close()
    println(s"SCALE   post-merge fresh-shard exact matches=" +
      s"$freshHits/$freshExpect " +
      s"(${if (freshHits == freshExpect) "OK" else "MISS"})")
    docs.unpersist()
    }

    if (on("streaming")) {
    // ---- streaming packers at production admission: the batch packer's
    // corpus->tensor invariants are pinned above; here the STREAMING twins
    // (text + id) pack the same deterministic corpus in micro-batches of
    // `maxEventsPerBatch = 100 k` docs — the driver loop below is exactly
    // what foreachBatch drives in production, minus the stream plumbing —
    // through the versioned-state carry, including its auto-compaction.
    // Measures: per-batch seconds (the within-batch single-partition
    // prefix window is the knowingly serial piece; this is its number at
    // production admission) and end-to-end tokens/s; asserts exact token
    // conservation and example-count/boundary identity with the batch
    // packer's math. ----
    import graft.streaming.StreamingPack
    val batchSize = 100000
    val nBatches = (n + batchSize - 1) / batchSize
    val seqLen = 2048
    val totalToks = 60L * n
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("toks",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(50000L)))))
      .withColumn("ids",
        transform(sequence(lit(0), lit(59)), i =>
          pmod(xxhash64(col("doc_id"), i), lit(30000L)).cast("int")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("stream_docs_materialize")(docs.count())
    val base = java.nio.file.Files.createTempDirectory("scale_stream").toString

    def drive(tag: String, run: (org.apache.spark.sql.DataFrame, Long) => Unit): Double = {
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        val batch = docs.filter(col("doc_id") >= b.toLong * batchSize &&
          col("doc_id") < (b + 1).toLong * batchSize)
        val tb = System.nanoTime()
        run(batch, b.toLong)
        println(f"SCALE   ${tag}_batch$b%-14s ${(System.nanoTime() - tb) / 1e9}%8.2f s")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val textSec = drive("stream_text", (b, id) =>
      StreamingPack.packBatch(spark, b, "doc_id", "toks", seqLen,
        s"$base/st", s"$base/ot", id))
    StreamingPack.flush(spark, s"$base/st", s"$base/ot", seqLen)
    val rT = spark.read.parquet(s"$base/ot")
      .agg(count(lit(1)), sum("n_tokens"), sum("n_docs_started")).collect().head
    val expEx = (totalToks + seqLen - 1) / seqLen
    println(f"SCALE   stream_text_total       $textSec%8.2f s  " +
      f"${totalToks / textSec / 1e6}%.1f M tokens/s")
    println(s"SCALE   text examples=${rT.getLong(0)} expected=$expEx " +
      s"sum_tokens=${rT.getLong(1)} doc_starts=${rT.getLong(2)} " +
      s"(${if (rT.getLong(0) == expEx && rT.getLong(1) == totalToks &&
               rT.getLong(2) == n) "OK" else "MISS"})")

    val idSec = drive("stream_ids", (b, id) =>
      StreamingPack.packIdsBatch(spark, b, "doc_id", "ids", seqLen,
        s"$base/si", s"$base/oi", id))
    StreamingPack.flushIds(spark, s"$base/si", s"$base/oi", seqLen)
    val rI = spark.read.parquet(s"$base/oi")
      .agg(count(lit(1)), sum("n_tokens"), sum("n_docs_started")).collect().head
    println(f"SCALE   stream_ids_total        $idSec%8.2f s  " +
      f"${totalToks / idSec / 1e6}%.1f M tokens/s")
    println(s"SCALE   id examples=${rI.getLong(0)} expected=$expEx " +
      s"sum_tokens=${rI.getLong(1)} doc_starts=${rI.getLong(2)} " +
      s"(${if (rI.getLong(0) == expEx && rI.getLong(1) == totalToks &&
               rI.getLong(2) == n) "OK" else "MISS"})")
    docs.unpersist()
    }

    if (on("layout")) {
    // ---- z-order layout at corpus scale: cluster n rows on two
    // independent long dims, write the partitioned layout + stats, read
    // a 1/16-wide band on EACH dim through prunedRead; assert exact
    // results and report the file-skip fraction — the number that decides
    // scan cost on a selective 100 TB query. ----
    val rows = spark.range(n.toLong).toDF("id")
      .withColumn("u", pmod(xxhash64(col("id")), lit(1000000L)))
      .withColumn("e", col("id"))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("layout_materialize")(rows.count())
    val path = java.nio.file.Files.createTempDirectory("scale_zlayout").toString
    t("layout_write_clustered")(
      Layout.writeClustered(rows, Seq("u", "e"), bits = 12, log2Bins = 8, path))
    val total = spark.read.parquet(s"$path/data").inputFiles.length
    // unwrap AQE stages — a plain executedPlan traversal sees no scans
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    for ((dim, lo, hi) <- Seq(("u", 250000L, 312500L),
        ("e", n / 4L, n / 4L + n / 16L))) {
      val bounds = Seq((dim, lo, hi))
      var readFiles = 0L
      val cnt = t(s"layout_pruned_read_$dim") {
        val pr = Layout.prunedRead(spark, path, bounds)
        // collect THIS DataFrame: count() would execute a different
        // QueryExecution and leave pr's scan metrics unset
        val c = pr.collect().length.toLong
        readFiles = fileScans(pr.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
        c
      }
      val want = rows.filter(col(dim) >= lo && col(dim) <= hi).count()
      println(s"SCALE   layout_${dim}_band rows=$cnt want=$want " +
        s"files=$readFiles/$total " +
        s"(${if (cnt == want && readFiles < total / 2) "OK" else "MISS"})")
    }
    rows.unpersist()
    }

    if (on("slayout")) {
    // ---- streaming z-layout at production admission: 10 batches of
    // n/10 rows (one redelivered), per-batch apply measured; reads stay
    // exact and pruned mid-stream. ----
    val base = java.nio.file.Files.createTempDirectory("scale_slayout").toString
    val lcols = Seq("u", "e")
    def lbatch(b: Int) = spark.range(b.toLong * (n / 10), (b + 1).toLong * (n / 10))
      .toDF("id")
      .withColumn("u", pmod(xxhash64(col("id")), lit(1000000L)))
      .withColumn("e", col("id"))
    for (b <- 0 until 10) {
      val df = lbatch(b)
      t(f"slayout_batch$b") {
        graft.streaming.StreamingLayout.applyBatch(spark, df, lcols,
          bits = 12, log2Bins = 8, base, b.toLong)
      }
    }
    t("slayout_redeliver_b4") {
      graft.streaming.StreamingLayout.applyBatch(spark, lbatch(4), lcols,
        bits = 12, log2Bins = 8, base, 4L)
    }
    val cnt = t("slayout_pruned_read") {
      graft.streaming.StreamingLayout.prunedRead(spark, base,
        Seq(("u", 250000L, 312500L))).count()
    }
    val want = spark.range(n.toLong).toDF("id")
      .withColumn("u", pmod(xxhash64(col("id")), lit(1000000L)))
      .filter(col("u").between(250000L, 312500L)).count()
    println(s"SCALE   slayout rows=$cnt want=$want " +
      s"(${if (cnt == want) "OK" else "MISS"})")
    }

    if (on("fuzzy")) {
    // ---- edit-distance self-join at corpus scale: n keys, every 10th a
    // 1-substitution typo twin of its predecessor; the prefix filter
    // must find EVERY planted pair (losslessness at scale, not just
    // under the sf0.01 oracle) at equi-join-on-rare-grams cost. ----
    val keys = spark.range(n.toLong).toDF("id")
      .withColumn("base",
        when(col("id") % 10 === 9, col("id") - 1).otherwise(col("id")))
      .withColumn("k0", concat(lit("k"),
        lpad(pmod(xxhash64(col("base")), lit(10000000000L)).cast("string"),
          10, "0"), lit("-"),
        lpad(pmod(xxhash64(col("base"), lit(1)), lit(10000000000L))
          .cast("string"), 10, "0")))
      // twins substitute one deterministic inner character
      .withColumn("key", when(col("id") % 10 === 9,
          expr("concat(substring(k0, 1, 11), 'x', substring(k0, 13, 24))"))
        .otherwise(col("k0")))
      .select("id", "key")
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("fuzzy_keys_materialize")(keys.count())
    val plantedPairs = n / 10L
    t("fuzzy_self_join_d2_q7") {
      // q=7, not the natural-text default 3: digit keys have a ~10^3
      // 3-gram alphabet, so every gram group holds ~10^4 members and the
      // prefix join goes quadratic; 7-grams (10^7 alphabet) are selective
      val pairs = graft.operators.FuzzyJoin.selfJoin(keys, "id", "key",
          maxDist = 2, q = 7, keyLen = 22)
        .cache()
      val found = pairs.count()
      val planted = pairs.filter(col("id_b") === col("id_a") + 1 &&
        col("id_b") % 10 === 9).count()
      println(s"SCALE   fuzzy pairs=$found planted_found=$planted/" +
        s"$plantedPairs (${if (planted == plantedPairs) "OK" else "MISS"})")
      pairs.unpersist()
    }
    keys.unpersist()
    }

    if (on("propagate")) {
    // ---- label spreading at corpus scale: n nodes x 8 deterministic
    // neighbors (8n edges), 3 all-integer iterations; measures the
    // per-iteration join+groupBy cost and asserts scores stay in the
    // micro-unit range with isolated nodes untouched. ----
    val k = 8
    val nodes = spark.range(n.toLong).toDF("vec_id")
      .withColumn("s0", pmod(xxhash64(col("vec_id")), lit(1000001L)))
      .cache()
    // node n-1 isolated: no out-edges, and (by construction below)
    // in-edges only from its predecessors' windows
    val graph = spark.range(n.toLong - 1).toDF("id")
      .withColumn("nbr", explode(transform(sequence(lit(1), lit(k)),
        i => pmod(col("id") + i, lit(n.toLong - 1)))))
      .withColumn("cos",
        round(pmod(xxhash64(col("id"), col("nbr")), lit(900L))
          .cast("double") / 1000 + 0.1, 3))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("propagate_edges_materialize")(graph.count())
    t("propagate_3_iters") {
      val out = KnnGraph.propagate(graph, nodes, "vec_id", "s0", iters = 3)
        .cache()
      val r = out.agg(count(lit(1)), min("s"), max("s")).collect().head
      val iso = out.filter(col("id") === n.toLong - 1)
        .select(col("s") === col("s0")).collect().head.getBoolean(0)
      println(s"SCALE   propagate n=${r.getLong(0)} " +
        s"s_range=[${r.getLong(1)}, ${r.getLong(2)}] isolated_unchanged=$iso " +
        s"(${if (r.getLong(0) == n.toLong && r.getLong(1) >= 0 &&
          r.getLong(2) <= 1000000L && iso) "OK" else "MISS"})")
      out.unpersist()
    }
    // PageRank over the same 8n-edge graph (same per-iteration join+agg
    // shape, different trajectory): every node sends and receives its
    // full mass up to HALF_UP truncation on this regular graph, so
    // scores must stay near base — and the isolated node (no in-edges)
    // must settle at exactly (1-d)·base = 150000.
    val edges = graph.select(col("id"), col("nbr"),
        (col("cos") * 1000).cast("long").as("w"))
      .filter(col("w") > 0)
    t("pagerank_2_iters") {
      val out = KnnGraph.pageRank(edges, nodes, "vec_id", iters = 2).cache()
      val r = out.agg(count(lit(1)), min("s"), max("s"), avg("s"))
        .collect().head
      val iso = out.filter(col("id") === n.toLong - 1)
        .select(col("s")).collect().head.getLong(0)
      // invariants: min >= the restart floor (1-d)·base; mean ~ base
      // (each iteration re-emits (1-d)·base·n and flows ~d·total mass,
      // so total mass is conserved up to HALF_UP truncation and dangling
      // loss — here only the one isolated node); individual maxima ARE
      // tail-heavy (inflow is a sum of w/W ratios), so the max is
      // reported, not bounded.
      println(s"SCALE   pagerank n=${r.getLong(0)} " +
        s"s_range=[${r.getLong(1)}, ${r.getLong(2)}] " +
        f"mean=${r.getDouble(3)}%.0f isolated=$iso " +
        s"(${if (r.getLong(0) == n.toLong && r.getLong(1) >= 150000L &&
          math.abs(r.getDouble(3) - 1000000.0) < 50000 &&
          iso == 150000L) "OK" else "MISS"})")
      out.unpersist()
    }
    // Mass-conserving PageRank at the same scale: make every 10th node
    // dangling (drop its out-edges) and check the conservation invariant
    // analytically — Σs stays n·base up to HALF_UP slack, where the
    // truncated contract provably leaks the dangling 10%'s mass. The
    // conserve path's extra cost is one 1-row dangling-sum aggregate per
    // iteration — this stage proves that global agg doesn't change the
    // runtime class at corpus scale.
    t("pagerank_conserve_2_iters") {
      val dangEdges = edges.filter(col("id") % 10 =!= 0)
      val total = KnnGraph.pageRank(dangEdges, nodes, "vec_id", iters = 2,
          conserveDangling = true)
        .agg(sum("s")).collect().head.getLong(0)
      val expect = n.toLong * 1000000L
      // WORST-CASE slack, not empirical concentration: per iteration a
      // node's outflow splits across its out-edges and each HALF_UP
      // division is off by ≤ 1/2 µ-unit, so a node of out-degree k can
      // mis-emit up to k/2 µ-units, plus ≤ 1 µ-unit each for its own
      // damping and restart terms and ≤ 1/2 for the redistributed
      // dangling share — Σ over nodes ≤ (|edges|/2 + 2n) per iteration.
      // (Observed drift concentrates ~0.35 µ/node because fractional
      // parts cancel, but the GATE must hold on a graph whose flow
      // fractions don't.)
      val iters = 2L
      val slack = iters * (dangEdges.count() / 2L + 2L * n.toLong)
      println(s"SCALE   pagerank_conserve total=$total expect=$expect " +
        s"drift=${total - expect} " +
        s"(${if (math.abs(total - expect) <= slack) "OK" else "MISS"})")
    }
    nodes.unpersist(); graph.unpersist()
    }

    if (on("graphstruct")) {
    // ---- graph STRUCTURE operators at corpus scale, each against an
    // ANALYTIC plant (exact closed-form invariants at any n, so scale
    // runs re-prove correctness, not just runtime):
    //  - ring-with-chords (i -> i+1 mod n, i -> i+2 mod n): every node
    //    has undirected degree exactly 4, sits in exactly 3 triangles
    //    ({v-2..v}, {v-1..v+1}, {v..v+2}), lcc = 2·3/(4·3) = 500000 µ
    //  - LPA with w(i,i+1)=900 >> w(i,i+2)=100: the label field is a
    //    pure rotation, l_t(i) = (i+t) mod n — checked node-exactly
    //  - peel(k=2) on ring+chords ∪ n/10 pendants: pendants (deg 1)
    //    are exactly layer 1, every ring node survives (layer 0)
    val ring = spark.range(n.toLong).toDF("id")
      .withColumn("nbr1", pmod(col("id") + 1, lit(n.toLong)))
      .withColumn("nbr2", pmod(col("id") + 2, lit(n.toLong)))
    val chordEdges = ring.select(col("id"), col("nbr1").as("nbr"),
        lit(900L).as("w"))
      .unionByName(ring.select(col("id"), col("nbr2").as("nbr"),
        lit(100L).as("w")))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    val ringNodes = spark.range(n.toLong).toDF("vec_id").cache()
    t("graphstruct_edges_materialize")(chordEdges.count())
    t("triangles") {
      val out = KnnGraph.triangles(chordEdges, ringNodes, "vec_id").cache()
      val ok = out.filter(col("deg") === 4 && col("tri") === 3 &&
        col("lcc_micro") === 500000L).count()
      println(s"SCALE   triangles exact_nodes=$ok/$n " +
        s"(${if (ok == n.toLong) "OK" else "MISS"})")
      out.unpersist()
    }
    t("label_propagation_3") {
      val out = KnnGraph.labelPropagation(chordEdges, ringNodes,
        "vec_id", iters = 3).cache()
      val ok = out.filter(col("lbl") === pmod(col("id") + 3,
        lit(n.toLong))).count()
      println(s"SCALE   lpa rotation_exact=$ok/$n " +
        s"(${if (ok == n.toLong) "OK" else "MISS"})")
      // modularity of that label field: all labels distinct (a pure
      // rotation), so intra = 0 and the closed form is
      // q_micro = −HALF_UP(1e6 / n) — per-community dout = din = 1000
      out.unpersist()
      val q = KnnGraph.modularity(chordEdges, out).head()
      val expect = -((2L * 1000000L + n.toLong) / (2L * n.toLong))
      println(s"SCALE   modularity communities=${q.getLong(0)} " +
        s"q=${q.getLong(3)} expect=$expect " +
        s"(${if (q.getLong(0) == n.toLong && q.getLong(3) == expect) "OK"
        else "MISS"})")
    }
    t("shared_neighbors") {
      // analytic: N(i) = {i+1, i+2}, so shared(i→i+1) = |{i+2}| = 1 and
      // shared(i→i+2) = 0, at every node of the ring
      val snn = KnnGraph.sharedNeighbors(chordEdges).cache()
      val ok1 = snn.filter(col("b") === pmod(col("a") + 1, lit(n.toLong))
        && col("shared") === 1).count()
      val ok2 = snn.filter(col("b") === pmod(col("a") + 2, lit(n.toLong))
        && col("shared") === 0).count()
      println(s"SCALE   snn chord1_shared1=$ok1/$n chord2_shared0=$ok2/$n " +
        s"(${if (ok1 == n.toLong && ok2 == n.toLong) "OK" else "MISS"})")
      snn.unpersist()
    }
    // pendants n..n+n/10-1, each hanging off ring node 10·j
    val pend = spark.range(n / 10L).toDF("j")
      .select((col("j") + n.toLong).as("id"), (col("j") * 10).as("nbr"),
        lit(500L).as("w"))
    val peelEdges = chordEdges.unionByName(pend)
    val peelNodes = spark.range(n.toLong + n / 10L).toDF("vec_id")
    t("peel_layers_2") {
      val out = KnnGraph.peelLayers(peelEdges, peelNodes, "vec_id",
        k = 2, rounds = 2).cache()
      val pendOk = out.filter(col("id") >= n.toLong &&
        col("layer") === 1).count()
      val ringOk = out.filter(col("id") < n.toLong &&
        col("layer") === 0).count()
      println(s"SCALE   peel pendants_layer1=$pendOk/${n / 10} " +
        s"ring_survives=$ringOk/$n " +
        s"(${if (pendOk == n / 10L && ringOk == n.toLong) "OK"
        else "MISS"})")
      out.unpersist()
    }
    chordEdges.unpersist(); ringNodes.unpersist()
    }

    if (on("graphupdate")) {
    // ---- exact incremental KNN maintenance at corpus scale: resident
    // n vectors (deterministic 16-dim), insert a 0.5% delta, delete
    // 0.1% — and verify EXACTNESS on a 100-id sample against a direct
    // top-k over the final corpus (the operator's rebuild-equivalence
    // contract, spot-checked where the full N² rebuild is unaffordable;
    // the full-equality proof lives in KnnGraphSpec + ns_ann_knn_update).
    val dim = 16
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        i => ((pmod(xxhash64(col("vec_id"), i), lit(2000L)) - 1000L) /
          lit(1000.0)).cast("float")))
    val nRes = n.toLong
    val nDelta = math.max(1000L, n / 200L)
    val nRm = math.max(200L, n / 1000L)
    val resident = vecs(spark.range(nRes).toDF("vec_id")).cache()
    val delta = vecs(spark.range(nRes, nRes + nDelta).toDF("vec_id"))
      .cache()
    // the state must cover every resident, so the stage pays the honest
    // cost of ONE full exact build at n (quadratic — the IVF path is
    // the production builder; this stage measures the MAINTENANCE
    // deltas the build then amortizes into)
    val edges0 = t("graphupdate_build_knn") {
      Similarity.intDotTopKBatch(resident, "vec_id", "embedding",
          resident, "vec_id", "embedding", 5)
        .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
        .localCheckpoint()
    }
    val afterIns = t("graphupdate_insert") {
      KnnGraph.insertExact(edges0, resident, delta,
        "vec_id", "embedding", 5).localCheckpoint()
    }
    val rmIds = spark.range(0, nRm * 97, 97).toDF("vec_id")
      .filter(col("vec_id") < nRes)
    val afterDel = t("graphupdate_delete") {
      KnnGraph.deleteExact(afterIns,
        resident.unionByName(delta), rmIds,
        "vec_id", "embedding", 5).localCheckpoint()
    }
    t("graphupdate_sample_verify") {
      val finalCorpus = resident.unionByName(delta)
        .join(rmIds, Seq("vec_id"), "left_anti").localCheckpoint()
      val sample = finalCorpus.filter(col("vec_id") % 1999 === 3)
        .limit(100).localCheckpoint()
      val wantSet = Similarity.intDotTopKBatch(finalCorpus, "vec_id",
          "embedding", sample, "vec_id", "embedding", 5)
        .select(col("qid"), col("id"), col("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val gotSet = afterDel
        .join(sample.select(col("vec_id").as("id")), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      println(s"SCALE   graphupdate sample_exact=" +
        s"${(wantSet & gotSet).size}/${wantSet.size} " +
        s"(${if (wantSet == gotSet) "OK" else "MISS"})")
    }
    resident.unpersist(); delta.unpersist()
    }

    if (on("drift")) {
    // ---- corpus drift at scale with an ANALYTIC planted signal: the
    // two halves derive IDENTICAL token streams from a shared base id
    // (baseline TV exactly 0 — two independently-sampled halves would
    // bury any plant under ~1% sampling TV), then side B replaces token
    // position 0 with an out-of-vocabulary marker in every 10th doc.
    // Moved mass = (n/2/10)/(n/2·60) = 1/600 each way, so
    // tv_micro = HALF_UP(1e6/600) = 1667 EXACTLY at any n, and the
    // marker must be the unique top mover at delta −1667 (every other
    // token's loss rounds to 0 on the micro grid). ----
    val n2 = n.toLong / 2
    def half(drifted: Boolean) = spark.range(n2).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          when(lit(drifted) && col("doc_id") % 10 === 0 && (i === 0),
            lit("driftmark"))
            .otherwise(concat(lit("w"),
              pmod(xxhash64(col("doc_id"), i), lit(50000L)))))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    val a = half(drifted = false)
    val b = half(drifted = true)
    t("drift_materialize") { a.count(); b.count() }
    t("drift_tv") {
      val r = Curation.corpusDrift(a, b, "text").collect().head
      println(s"SCALE   drift tv_micro=${r.getLong(5)} expect=1667 " +
        s"n_a=${r.getLong(0)} shared_vocab=${r.getLong(4)} " +
        s"(${if (r.getLong(5) == 1667L && r.getLong(0) == n2 * 60) "OK"
        else "MISS"})")
    }
    t("drift_tokens") {
      val top = Curation.driftTokens(a, b, "text", topK = 5).collect()
      val ok = top.head.getString(0) == "driftmark" &&
        top.head.getLong(5) == -1667L
      println(s"SCALE   drift top_mover=${top.head.getString(0)} " +
        s"delta_micro=${top.head.getLong(5)} (${if (ok) "OK" else "MISS"})")
    }
    a.unpersist(); b.unpersist()
    }

    if (on("overlap")) {
    // ---- source-overlap matrix at scale with ANALYTIC plants: tokens
    // are consecutive integers ("w{60·d+i}"), so each doc's 58 shingles
    // are globally unique — cross-source overlap is exactly 0 — except
    // the plant: every s1 doc with d % 20 == 1 copies the text of the
    // s0 doc d−1 verbatim (sources = d % 4). With 4 | n and 20 | n:
    //   common(s0,s1) = 58·(n/20) in both directions, all other pairs 0;
    //   |each source| = 58·(n/4), so containment = HALF_UP(1e6/5)
    //   = 200000 and jaccard = HALF_UP(1e6/9) = 111111 EXACTLY at any
    //   such n — scale runs re-prove correctness, not just runtime. ----
    require(n % 20 == 0, s"overlap stage needs 20 | n, got $n")
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("source",
        concat(lit("s"), pmod(col("doc_id"), lit(4L))))
      .withColumn("__base",
        when(col("doc_id") % 20 === 1, col("doc_id") - 1)
          .otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), (col("__base") * 60 + i)))))
      .repartition(spark.sparkContext.defaultParallelism.toInt)
      .cache()
    t("overlap_materialize")(docs.count())
    t("overlap_matrix") {
      val m = Curation.sourceOverlapMatrix(docs, "source", "text", 3)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      val c = 58L * (n / 20)
      val ok = m.size == 12 &&
        m(("s0", "s1")) == ((c, 200000L, 111111L)) &&
        m(("s1", "s0")) == ((c, 200000L, 111111L)) &&
        m.forall { case (k, v) =>
          k == ("s0", "s1") || k == ("s1", "s0") || v == ((0L, 0L, 0L)) }
      println(s"SCALE   overlap pairs=${m.size} common_s0s1=" +
        s"${m(("s0", "s1"))._1} expect=$c " +
        s"containment=${m(("s0", "s1"))._2} jaccard=${m(("s0", "s1"))._3} " +
        s"(${if (ok) "OK" else "MISS"})")
    }
    docs.unpersist()
    }

    if (stages == "core") {
    // ---- core-relational queries at a multiple of sf0.1 (round 16,
    // verdict item 5): q01–q31 had only ever run at sf0.1 (~600 k
    // lineitem) — their 100 TB story was proven by plan-reading, not
    // measurement. This stage REPLICATES the real sf0.1 tables `n`×
    // (here, and only here, `n` is the MULTIPLIER: `runMain
    // graft.ScaleSmoke 20 core` = 20× sf0.1 = 12 M lineitem /  2 M
    // events), key-shifting each replica so join fan-outs and window
    // partitions stay realistic instead of degenerate:
    //   - lineitem.l_orderkey / orders.o_orderkey shift TOGETHER by
    //     rep·(max+1) — the orders↔lineitem equi/range joins see `n`×
    //     the keys at the same per-key fan-out;
    //   - events.event_id and user_id shift per replica — `n`× the
    //     session/window partitions at the same per-user event count
    //     (merging replicas into one user would instead grow window
    //     state without growing parallelism — the wrong shape);
    //   - dims (part/supplier/customer/nation/region) stay as-is: at
    //     100 TB the dims are still broadcast-sized — that is the plan
    //     being audited.
    // For each of the 10 costliest core queries (bench ranking): assert
    // the STATIC plan clean under PlanAudit.violations (AQE off, the
    // bench's own audit posture), then time the noop-sink run (AQE on,
    // the bench action). Sanity: q08's replication invariant —
    // per-group count and sum_qty at `n`× must equal n × the sf0.1
    // values exactly.
    // NOT part of `all`: under `all`, `n` means corpus rows, not a
    // multiplier.
    val mult = math.max(1, n)
    require(mult <= 64, s"core multiplier $mult looks like a row count — " +
      "usage: runMain graft.ScaleSmoke <mult<=64> core")
    CoreScale.withReplicated(spark, mult) { dir =>
    // the 10 costliest core queries per the r15 bench ranking
    val coreTen = Seq("q05_star_join", "q08_tpch_q1", "q31_incremental_agg",
      "q17_rollup", "q19_session_window", "q20_window_frames",
      "q16_scalar_json", "q21_range_join", "q12b_set_ops", "q11_lag_delta")
    // static-plan invariants + timed noop per query, via the one shared
    // protocol (CoreScale.auditAndTime — also used by skew/pressure stages)
    coreTen.foreach { name =>
      CoreScale.auditAndTime(spark, name, s"core_${name}_x$mult", dir)
    }

    // replication invariant: q08 per-group (count, sum_qty) at mult×
    // must be exactly mult × the sf0.1 values
    val q08 = SparkEntry.queries("q08_tpch_q1")
    def groups(d: String) = q08(spark, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("count_order"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    val gb = groups(CoreScale.Base)
    val gs = groups(dir)
    require(gs.keySet == gb.keySet, "q08 group drift under replication")
    gb.foreach { case (k, (sq, n0)) =>
      val (sqS, nS) = gs(k)
      require(nS == mult * n0, s"q08 $k count: $nS != $mult*$n0")
      require(math.abs(sqS - mult * sq) <= 1e-9 * math.abs(sqS),
        s"q08 $k sum_qty: $sqS != $mult*$sq")
    }
    println(s"SCALE   core replication invariant OK " +
      s"(q08 groups=${gb.size}, count and sum_qty exact at ${mult}x)")
    }
    }

    if (stages == "coreskew") CoreScale.skewStage(spark, math.max(1, n))
    if (stages == "corepressure") CoreScale.pressureStage(spark, math.max(1, n))
    if (stages == "slidestate") CoreScale.slideStage(spark, math.max(1, n))

    spark.stop()
  }
}
