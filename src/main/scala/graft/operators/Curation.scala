package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.md5_lower64

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, deterministic train/val/test splits, and stratified
  * sampling. These complement the dedup suite ([[Dedup]]) — dedup removes
  * redundancy, curation controls *composition*.
  *
  * All three are deterministic (md5-derived ordering, no RNG), so re-running
  * a split or sample on the same corpus yields byte-identical output — a
  * hard requirement for reproducible dataset releases.
  */
object Curation {

  /** Curation funnel: the canonical filter chain of a training-data
    * pipeline (language → quality → repetition → exact dedup), reported as
    * cumulative survivor counts in ONE aggregate row. Composes the
    * [[TextAnalysis]] signal operators by doc-id equi-join — in a real
    * pipeline each signal table is materialized once and reused, so the
    * joins are between computed signal tables, not repeated text scans.
    * All signals are rounded identically on both engines, so the threshold
    * comparisons are bit-deterministic.
    */
  def funnelReport(docs: DataFrame, idCol: String, textCol: String,
                   minEnRatio: Double = 0.10, minQuality: Double = 0.5,
                   maxDupWordFrac: Double = 0.6): DataFrame = {
    // r18 (guide §2.4): en_ratio IS quality's stopword_ratio — langId and
    // quality compute round(n_stopword_tokens/n_tokens, 4) from the same
    // stopword list — and the fingerprint is a per-row map over the same
    // text, so lang+quality+fp come off ONE text scan as carried columns.
    // Three id-keyed self-join shuffles drop to the single rep join.
    val sig = TextAnalysis.quality(docs, idCol, textCol,
        extra = Seq("fp" -> md5(TextOps.normalized(col(textCol)))))
      .select(col(idCol), col("stopword_ratio").as("en_ratio"),
        col("quality_score"), col("fp"))
    val rep = TextAnalysis.repetition(docs, idCol, textCol)
      .select(col(idCol), col("dup_word_frac"))

    val passLang = col("en_ratio") >= minEnRatio
    val passQual = passLang && col("quality_score") >= minQuality
    val passRep = passQual && col("dup_word_frac") <= maxDupWordFrac

    sig.join(rep, idCol)
      .agg(count(lit(1)).as("n_total"),
        count(when(passLang, 1)).as("n_lang"),
        count(when(passQual, 1)).as("n_quality"),
        count(when(passRep, 1)).as("n_repetition"),
        countDistinct(when(passRep, col("fp"))).as("n_unique"))
  }

  /** Benchmark decontamination: for every training document, count the
    * distinct word n-gram shingles it shares with the evaluation subset
    * (`evalPred` marks eval membership), and flag it contaminated at
    * `minOverlap` shared shingles.
    *
    * Scale shape: the eval side of the join is `distinct` shingles of the
    * eval set only — benchmarks are small by nature (thousands of docs),
    * so it is broadcast and the train side never shuffles: one explode →
    * broadcast-hash-join → per-doc count with map-side partial agg. The
    * train corpus can be arbitrarily large.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          evalPred: Column, n: Int = 3,
                          minOverlap: Int = 5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), evalPred.as("is_eval"),
      explode(graft.functions.word_shingles(col(textCol), n)).as("s"))
    val evalShingles = sh.filter(col("is_eval")).select("s").distinct()
    val overlap = sh.filter(!col("is_eval"))
      .join(broadcast(evalShingles), "s")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
    docs.filter(!evalPred).select(col(idCol).as("id"))
      .join(overlap, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** [[contaminationReport]] for an eval side TOO BIG TO BROADCAST: same
    * output, different candidate plan. The broadcast variant ships the
    * distinct eval shingles as a hash relation — fine for benchmark-sized
    * eval sets, a non-starter when "eval" is another corpus slice (cross-
    * split leakage checks at 100 TB, where the shingle relation is tens of
    * GB). Here the eval side is condensed to a Bloom filter over shingle
    * hashes (~1.2 bytes/item at the default 1% fpp — map-side-combinable
    * [[graft.functions.BloomAgg]], one bit-array per partition crosses the
    * shuffle). The aggregated filter — ONE bounded row, the same planning-
    * state regime as the PQ codebooks — is pulled to the driver and
    * TORRENT-BROADCAST, and the train side is prefiltered by the codegen'd
    * [[graft.functions.BloomBroadcastProbe]] BEFORE its explode output ever
    * shuffles; only the surviving ~(overlap + fpp) fraction reaches the
    * exact shuffled join the overlap counts come from. (An earlier shape
    * shipped the filter as a broadcast one-row COLUMN and cross-joined it
    * in; `UnsafeRow.getBinary` copies the whole bit array on every probe
    * row, which turned a 350 KB filter × 2.6 M probes into ~905 GB of
    * memcpy — measured 125 s where the broadcast-handle probe is
    * sub-second. Filter bytes never belong in a per-row column.)
    * False positives cost shuffle bytes, never correctness: the emitted
    * report is bit-identical to [[contaminationReport]] (same oracle).
    *
    * `expectedEvalShingles` sizes the filter; the default 0 derives a
    * conservative estimate from the RAW (pre-distinct) eval shingle count —
    * one cheap count job, no extra shuffle, overestimate only (raw ≥
    * distinct), which can only LOWER the realized fpp.
    */
  def contaminationReportScalable(docs: DataFrame, idCol: String,
                                  textCol: String, evalPred: Column,
                                  n: Int = 3, minOverlap: Int = 5,
                                  fpp: Double = 0.01,
                                  expectedEvalShingles: Long = 0L): DataFrame = {
    import graft.functions.{bloom_agg, bloom_broadcast_probe, word_shingles}
    val sh = docs.select(col(idCol).as("id"), evalPred.as("is_eval"),
      explode(word_shingles(col(textCol), n)).as("s"))
    val evalShingles = sh.filter(col("is_eval")).select("s")
    val expected =
      if (expectedEvalShingles > 0) expectedEvalShingles
      else evalShingles.count()
    // distributed build; ONE bounded row (the bit array) pulled to the
    // driver and torrent-broadcast — never a per-row filter column
    val filterBytes = evalShingles
      .agg(bloom_agg(xxhash64(col("s")), expected, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val bcast = docs.sparkSession.sparkContext.broadcast(filterBytes)
    val survivors = sh.filter(!col("is_eval"))
      .filter(bloom_broadcast_probe(bcast, xxhash64(col("s"))))
      .select(col("id"), col("s"))
    // exact verify: SHUFFLED join (no broadcast hint — the eval relation is
    // assumed too big for one), fed only by bloom survivors
    val overlap = survivors.join(evalShingles.distinct(), "s")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
    docs.filter(!evalPred).select(col(idCol).as("id"))
      .join(overlap, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Adaptive per-domain quality floor: keep a document iff its quality
    * score clears its OWN domain's `floorQuantile` percentile — the
    * curation policy that a single global threshold gets wrong (a fixed
    * floor guts low-scoring-but-valuable domains like code or forums and
    * keeps the worst of high-scoring ones). Exact interpolated percentile
    * per domain (one shuffle to rank, one skinny threshold relation joined
    * back); scores and thresholds are rounded identically on both engines,
    * so keep/drop decisions are bit-deterministic against the oracle.
    *
    * Returns one row per doc: `(id, domain, quality_score,
    * domain_threshold, keep)`. For corpora where even per-domain exact
    * ranking is too heavy (millions of domains × billions of docs), see
    * [[adaptiveQualityFloorSketch]].
    */
  def adaptiveQualityFloor(docs: DataFrame, idCol: String, textCol: String,
                           domainCol: String,
                           floorQuantile: Double = 0.2): DataFrame = {
    // r18: domain carried on the quality scan (no id self-join — see
    // [[scoredByDomain]]); the thresholds relation is domain-cardinality
    // by construction, so it broadcasts (the estimate through the
    // percentile aggregate is otherwise unknown and planned sort-merge)
    val scored = scoredByDomain(docs, idCol, textCol, domainCol)
    val thresholds = scored.groupBy("domain")
      .agg(round(percentile(col("quality_score"), lit(floorQuantile)), 6)
        .as("domain_threshold"))
    scored.join(broadcast(thresholds), "domain")
      .select(col("id"), col("domain"), col("quality_score"),
        col("domain_threshold"),
        (col("quality_score") >= col("domain_threshold")).as("keep"))
  }

  /** Per-domain TOKEN-budget sampling: mixtures are specified in tokens,
    * not documents (a domain of long documents exhausts its share in far
    * fewer docs), so each domain admits its deterministic md5-order
    * prefix of documents until the cumulative token count reaches
    * `budgetTokens` — the content-addressed selection convention of
    * [[domainCap]] with the running sum in tokens. Returns every doc
    * with `(n_tokens, cum_tokens, keep)`; `keep` = the doc fits inside
    * the budget (the first doc crossing the line is dropped, so a
    * domain never exceeds its budget). One window per domain — the same
    * shuffle [[domainCap]] pays.
    */
  def tokenBudgetSample(docs: DataFrame, idCol: String, textCol: String,
                        domainCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val w = Window.partitionBy("domain").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(domainCol).as("domain"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        graft.functions.md5_lower64(col(idCol).cast("string")).as("__h"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .select(col(idCol), col("domain"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budgetTokens).as("keep"))
  }

  /** LM-based quality floor — the perplexity filter every web-scale
    * pipeline runs (CCNet/Wenzek et al. 2020 shape: score text under a
    * reference LM, drop the worst tail per domain): held-out docs are
    * scored by the trigram stupid-backoff model
    * ([[TextAnalysis.trigramBackoff]]) fit on `train`, and each domain
    * keeps docs at or above its `floorQuantile` of `avg_logscore`
    * (higher = more fluent under the reference corpus). Composes two
    * independently-oracled stages, so the WHOLE filter hash-matches a
    * cross-engine oracle. Degenerate docs (< 3 tokens, no trigram
    * evidence) carry score 0 — unpenalized, matching the scorer's
    * convention. Thresholds are |domains| rows — broadcast.
    */
  def perplexityFloor(train: DataFrame, docs: DataFrame, idCol: String,
                      textCol: String, domainCol: String,
                      floorQuantile: Double = 0.2): DataFrame = {
    val scored = TextAnalysis.trigramBackoff(train, docs, idCol, textCol)
      .join(docs.select(col(idCol), col(domainCol).as("domain")), Seq(idCol))
    val thresholds = scored.groupBy("domain")
      .agg(round(percentile(col("avg_logscore"), lit(floorQuantile)), 6)
        .as("domain_threshold"))
    scored.join(broadcast(thresholds), Seq("domain"))
      .select(col(idCol), col("domain"), col("n_trigrams"),
        col("avg_logscore"), col("domain_threshold"),
        (col("avg_logscore") >= col("domain_threshold")).as("keep"))
  }

  /** [[adaptiveQualityFloor]] at profile scale: per-domain thresholds come
    * from a mergeable KLL sketch ([[graft.functions.KllAgg]], one
    * streaming pass, a few KB per domain) instead of an exact rank — and
    * because the sketch is a binary column, shard profiles can be stored
    * and re-merged later ([[graft.functions.KllMergeAgg]]) without
    * re-reading the corpus. KLL bounds RANK error (≲1.65% at k=200), so
    * the realized keep-fraction per domain lands within that of the target
    * quantile — asserted against the exact operator in CurationSpec.
    */
  def adaptiveQualityFloorSketch(docs: DataFrame, idCol: String,
                                 textCol: String, domainCol: String,
                                 floorQuantile: Double = 0.2,
                                 k: Int = 200): DataFrame =
    applyDomainFloor(docs, idCol, textCol, domainCol,
      domainQualityFloorsSketch(docs, idCol, textCol, domainCol,
        floorQuantile, k))

  /** The sketch-derived per-domain floors alone: `(domain,
    * domain_threshold)` — the storable/re-mergeable profile product.
    * Split out so callers can materialize or publish the learned floors
    * (the OracleFeed path) and re-apply them with [[applyDomainFloor]].
    */
  def domainQualityFloorsSketch(docs: DataFrame, idCol: String,
                                textCol: String, domainCol: String,
                                floorQuantile: Double = 0.2,
                                k: Int = 200): DataFrame = {
    import graft.functions.{kll_agg, kll_quantiles}
    scoredByDomain(docs, idCol, textCol, domainCol).groupBy("domain")
      .agg(kll_agg(col("quality_score"), k).as("sk"))
      .select(col("domain"),
        element_at(kll_quantiles(col("sk"), Seq(floorQuantile)), 1)
          .as("domain_threshold"))
  }

  /** Apply per-domain floors `(domain, domain_threshold)` to the corpus:
    * `(id, domain, quality_score, domain_threshold, keep)`. The floors
    * relation is domain-cardinality — broadcast by the planner. */
  def applyDomainFloor(docs: DataFrame, idCol: String, textCol: String,
                       domainCol: String, thresholds: DataFrame): DataFrame =
    scoredByDomain(docs, idCol, textCol, domainCol)
      .join(broadcast(thresholds), "domain")
      .select(col("id"), col("domain"), col("quality_score"),
        col("domain_threshold"),
        (col("quality_score") >= col("domain_threshold")).as("keep"))

  private def scoredByDomain(docs: DataFrame, idCol: String, textCol: String,
                             domainCol: String): DataFrame =
    // r18: the domain rides the quality scan as a carried column — the
    // previous docs-self-join on id re-scanned the corpus and paid a
    // full id-keyed shuffle join for a value already on the row
    TextAnalysis.quality(docs, idCol, textCol,
        extra = Seq("domain" -> col(domainCol)))
      .select(col(idCol).as("id"), col("domain"), col("quality_score"))

  /** SEMANTIC benchmark decontamination: flag every corpus embedding whose
    * cosine similarity to ANY evaluation-set embedding reaches `threshold`
    * — the embedding-space complement of [[contaminationReport]]'s lexical
    * shingle overlap (catches paraphrased or reformatted eval leakage that
    * shares no n-grams).
    *
    * Scale shape: candidate generation is hyperplane-LSH banded, like
    * [[Dedup.embeddingDupPairs]], but CROSS-SET — and the eval side is
    * small by nature (a benchmark suite), so its banded keys and its
    * vectors are both broadcast. Candidates are therefore generated
    * map-side over the corpus (zero shuffle), and the only shuffle in the
    * whole operator is the per-corpus-id aggregation of verified matches,
    * which is bounded by the candidate count, not the corpus. BOTH sides
    * emit multi-probe keys (a pair is caught if any probe of one side hits
    * a probe of the other — a superset of the either-direction probe test
    * the self-join dedup gets for free), with exact cosine verification
    * behind the candidates, inheriting the measured-exact recall of the
    * dedup operator's tuned defaults. For an eval set too large to
    * broadcast, drop the hints and the same plan degrades gracefully to a
    * shuffled band equi-join.
    *
    * Returns one row per NON-eval corpus id: `(id, n_matches, max_cos,
    * contaminated)` — max_cos is over verified matches only (0.0 when
    * clean), so the output depends solely on above-threshold structure
    * that the LSH candidates cover, never on sub-threshold cosines LSH is
    * free to skip.
    */
  def semanticContaminationReport(embs: DataFrame, idCol: String,
                                  vecCol: String, evalPred: Column,
                                  threshold: Double,
                                  planesPerBand: Int = 0, bands: Int = 0,
                                  probeBits: Int = -1, probePlanes: Int = -1,
                                  prefilterMargin: Double = -1.0)
                                 (implicit scope: graft.CacheScope =
                                    graft.CacheScope.unmanaged): DataFrame = {
    import graft.functions.{cosine_i8, dot_product, hyperplane_probes, i8_quantize, l2_norm}
    // auto defaults, same policy as Dedup.embeddingDupPairs: corpus-sized
    // band width, recall-holding band count, and narrow probing at
    // near-dup thresholds; the tuned measured-exact 8/16/2/6 at boundary
    // thresholds (Dedup.resolveLshParams)
    val (r, nBands, pBits, pPlanes) = Dedup.resolveLshParams(
      threshold, embs.count(), planesPerBand, bands, probeBits, probePlanes)
    // nrm: per-vector norm computed once — verify is then dot + divide
    // (bit-identical to the fused cosine kernel, see functions.L2Norm)
    val sk = scope.own(embs
      .select(col(idCol).as("id"), col(vecCol).as("v"), evalPred.as("is_eval"))
      .repartition(embs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("pk",
        hyperplane_probes(col("v"), r, nBands, pBits, pPlanes))
      .withColumn("nrm", l2_norm(col("v"))))

    def probeKeys(side: DataFrame, asId: String) = side
      .select(col("id").as(asId), posexplode(col("pk")).as(Seq("band", "keys")))
      .select(col(asId), col("band"), explode(col("keys")).as("key"))

    val corpus = sk.filter(!col("is_eval"))
    val eval = sk.filter(col("is_eval"))
    val candidates = probeKeys(corpus, "id")
      .join(broadcast(probeKeys(eval, "eid")), Seq("band", "key"))
      .select(col("id"), col("eid")).distinct()

    // int8 prefilter, same AUTO contract as Dedup.embeddingDupPairs
    // (sentinel -1: ON with the 0.1 margin at near-dup thresholds, exact
    // below them): random collisions die on broadcast-joined 1-byte/dim
    // payloads; the reported matches and max_cos still come from the
    // exact float kernel
    val margin =
      if (prefilterMargin < 0)
        (if (threshold >= Dedup.NearDupThreshold) Dedup.DefaultI8PrefilterMargin
         else threshold)
      else prefilterMargin
    val toVerify =
      if (threshold - margin <= 0) candidates
      else candidates
        .join(corpus.select(col("id"), i8_quantize(col("v")).as("qv")), "id")
        .join(broadcast(eval.select(col("id").as("eid"),
          i8_quantize(col("v")).as("qe"))), "eid")
        .filter(cosine_i8(col("qv"), col("qe")) >= threshold - margin)
        .select(col("id"), col("eid"))

    val denom = col("nrm") * col("enrm")
    val verified = toVerify
      .join(corpus.select(col("id"), col("v"), col("nrm")), "id")
      .join(broadcast(eval.select(col("id").as("eid"), col("v").as("ev"),
        col("nrm").as("enrm"))), "eid")
      .withColumn("cos", round(
        when(denom === 0.0, 0.0)
          .otherwise(dot_product(col("v"), col("ev")) / denom), 3))
      .filter(col("cos") >= threshold)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"), max(col("cos")).as("max_cos"))

    corpus.select(col("id"))
      .join(verified, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("max_cos"), lit(0.0)).as("max_cos"),
        col("n_matches").isNotNull.as("contaminated"))
  }

  /** Deterministic hash bucket in [0, buckets) for a key column: the
    * md5-derived 64-bit hash ([[md5_lower64]]) taken positively modulo
    * `buckets`. Content-addressed, so the assignment is stable across
    * runs, partitions, and engines (DuckDB `md5_number_lower` replicates
    * it) — unlike `rand(seed)`, which is partition-order-dependent.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(md5_lower64(key.cast("string")), lit(buckets.toLong))

  /** Train/val/test split assignment: pure codegen'd projection, zero
    * shuffle, streams at scan speed at any corpus size. `trainPct`/`valPct`
    * are integer percent thresholds (the remainder is test).
    */
  def hashSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    docs.select(col(idCol),
      b.cast("int").as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Per-domain Tukey-fence outlier report over a numeric column — the
    * data-quality screen run before a corpus release (truncated scrapes,
    * concatenation blowups, unit bugs all surface as fence violations):
    * fences `[q1 - k·iqr, q3 + k·iqr]`, one row per domain with the
    * fence values and the count outside each side.
    *
    * Determinism: interpolated quartiles of INTEGER values are exact
    * binary rationals (quarters), so `k = 1.5` fences land on eighths and
    * the strict comparisons cannot tie-break differently cross-engine.
    * Plan: one percentile aggregate per domain (small), broadcast back
    * over one counting scan — two scans, no corpus-sized shuffle beyond
    * the per-domain groupBys.
    */
  def outlierReport(docs: DataFrame, domainCol: String, valueCol: String,
                    k: Double = 1.5): DataFrame = {
    val fences = docs.groupBy(col(domainCol).as("domain")).agg(
      count(lit(1)).as("n"),
      expr(s"percentile($valueCol, 0.25)").as("q1"),
      expr(s"percentile($valueCol, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    docs.select(col(domainCol).as("domain"), col(valueCol).as("v"))
      .join(broadcast(fences), "domain")
      .groupBy("domain")
      .agg(first(col("n")).as("n"),
        round(first(col("q1")), 4).as("q1"),
        round(first(col("q3")), 4).as("q3"),
        round(first(col("lo")), 4).as("lo"),
        round(first(col("hi")), 4).as("hi"),
        count(when(col("v") < col("lo"), 1)).as("n_low"),
        count(when(col("v") > col("hi"), 1)).as("n_high"))
  }

  /** LEAKAGE-FREE split: every member of a near-dup cluster lands in the
    * SAME split. Per-document hash splits leak — a train doc's near-twin
    * in the eval split inflates every metric it touches — so the split
    * key is the CLUSTER representative's hash, not the doc's own
    * (the grouped-splits practice; same failure class as benchmark
    * contamination, handled upstream of training instead of post hoc).
    *
    * `clusters` is an `(id, cluster)` labeling ([[Dedup.dupClusters]] —
    * singletons labeled with their own id); docs without a row fall back
    * to their own id, so the operator degrades to [[hashSplit]] when no
    * clustering exists. Broadcast-free: the join shuffles on the id key
    * once, then the split is the same zero-shuffle projection as
    * `hashSplit`.
    */
  def groupSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                 trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val lab = clusters.select(col("id").as(idCol), col("cluster"))
    val keyed = docs.select(col(idCol)).join(lab, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster"), col(idCol)).as("grp"))
    val b = hashBucket(col("grp"), 100)
    keyed.select(col(idCol), col("grp"),
      b.cast("int").as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Token-budget shard packing: assign documents to training shards of
    * ~`tokensPerShard` tokens each, in deterministic md5-hash order (a
    * content-addressed global shuffle of the corpus, so shards are i.i.d.
    * slices). shard = floor(exclusive-prefix-sum(tokens) / tokensPerShard).
    *
    * The global prefix sum never uses a single-partition window — the
    * standard two-phase distributed scan, expressed declaratively:
    *  1. a deterministic, ORDER-ALIGNED slice id from the uniform hash
    *     (`slice = floor(scale(h))`, monotone in h — no range-partitioner
    *     sampling, so recomputation is stable and nothing needs caching);
    *  2. per-slice token subtotals → driver scanLeft → slice base offsets
    *     (P longs, broadcast-joined back);
    *  3. within-slice exclusive running sum via a window PARTITIONED by
    *     slice (each slice ≈ corpus/P rows — bounded, shuffled once).
    * Output is independent of `partitions`: the hash order is total, so
    * slicing only changes parallelism, never shard assignment.
    */
  def packTokenShards(docs: DataFrame, idCol: String, tokenCol: String,
                      tokensPerShard: Long, partitions: Int = 0): DataFrame =
    withHashOrderPrefix(docs.select(col(idCol), col(tokenCol)), idCol,
      col(tokenCol), partitions)
      .select(col(idCol), col("__n").as("n_tokens"),
        (col("__pre") / tokensPerShard).cast("long").cast("int").as("shard"))

  /** Delivery manifest for [[packTokenShards]]'s assignment — the
    * integrity record a training job verifies before consuming a shard:
    * per shard its document count, token total, and a CONTENT
    * fingerprint (md5 over per-doc md5s concatenated in the shard's
    * internal `(hash, id)` order — the packer's own order, so the
    * fingerprint is a pure function of corpus content and the shard
    * knob, independent of partitioning or task scheduling). One
    * corpus-sized shuffle (the shard groupBy); per-group state is the
    * shard's own doc digests, bounded by `tokensPerShard`.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    tokenCol: String, tokensPerShard: Long): DataFrame = {
    val assigned = packTokenShards(docs, idCol, tokenCol, tokensPerShard)
    assigned.join(
        docs.select(col(idCol), md5(col(textCol)).as("doc_md5")), idCol)
      .withColumn("__h", md5_lower64(col(idCol).cast("string")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        md5(array_join(transform(array_sort(collect_list(
            struct(col("__h"), col(idCol), col("doc_md5")))),
          x => x.getField("doc_md5")), "")).as("fingerprint"))
      .orderBy("shard")
  }

  /** The two-phase distributed exclusive prefix sum over `weight` in
    * md5-hash total order (see [[packTokenShards]]'s scaladoc for the
    * phase-by-phase shape). Adds to `df`: `__h` (the hash), `__n`
    * (`weight` as long), `__pre` (GLOBAL exclusive running sum of `__n`
    * in `(__h, idCol)` order). Output is independent of `partitions`.
    */
  private[operators] def withHashOrderPrefix(df: DataFrame, idCol: String,
      weight: Column, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    // order-aligned slice: h ∈ [Long.Min, Long.Max] uniform → [0, p)
    val h = md5_lower64(col(idCol).cast("string"))
    val slice = floor((h.cast("double") / lit(2.0 * Long.MaxValue) + lit(0.5)) *
      lit(p.toDouble)).cast("int")

    // localCheckpoint (r18): `sliced` feeds BOTH the slice-total collect
    // below and the window pass — separate actions, so without
    // truncation the caller's whole upstream (tokenize, vocab join,
    // per-doc id assembly for the packers) re-executes per consumer.
    // One materialization, read twice — the knn_update pattern.
    val sliced = df
      .withColumn("__n", weight.cast("long"))
      .withColumn("__h", h)
      .withColumn("__slice", least(slice, lit(p - 1)))
      .localCheckpoint()

    val bases = sliced.groupBy("__slice").agg(sum("__n").as("t"))
      .collect().sortBy(_.getInt(0))
    val offsets = bases.scanLeft((-1, 0L)) {
      case ((_, acc), r) => (r.getInt(0), acc + r.getLong(1))
    }
    // base offset of slice s = total weight of all slices BEFORE s
    val baseOf = bases.map(_.getInt(0)).zip(offsets.dropRight(1).map(_._2)).toMap
    val baseDf = spark.createDataFrame(
      baseOf.toSeq.map { case (s, b) => (s, b) }.sortBy(_._1))
      .toDF("__slice", "__base")

    val w = Window.partitionBy("__slice").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sliced
      .join(broadcast(baseDf), Seq("__slice"))
      .withColumn("__pre",
        col("__base") + coalesce(sum(col("__n")).over(w), lit(0L)))
      .drop("__slice", "__base")
  }

  /** Fixed-length training-example packing: carve the corpus token stream
    * — documents concatenated in deterministic md5-hash order — into
    * examples of exactly `seqLen` tokens (the pretraining batch
    * transform; the final example may be short). Emits per example the
    * token stream, the in-example positions where a document BEGINS
    * (`doc_starts`, the attention-reset boundaries; a document merely
    * continuing into an example is not a reset), and the count of such
    * starts.
    *
    * Scale shape: the naive formulation explodes one row per TOKEN and
    * shuffles the whole corpus token-granular. Instead each document is
    * cut into at most ⌈n/seqLen⌉+1 contiguous SLICES (one per example
    * boundary it crosses) with a codegen'd `sequence`/`transform` over
    * its [[withHashOrderPrefix]] offset — so the example_id shuffle moves
    * O(docs + tokens/seqLen) array-payload rows, not O(tokens) rows, and
    * reassembly is a per-example sort of a handful of slices. example_id
    * is monotone in the hash order, so a range-partitioned write of the
    * output preserves shard locality.
    */
  def packSequences(docs: DataFrame, idCol: String, toksCol: String,
                    seqLen: Int, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val pre = withHashOrderPrefix(
      docs.select(col(idCol), col(toksCol))
        .filter(size(col(toksCol)) > 0),
      idCol, size(col(toksCol)), partitions)
      .withColumn("__starts", array(lit(0)))
    packFromPrefix(pre, toksCol, seqLen).drop("__toks_arr", "__starts_arr")
  }

  /** Cut each prefix-positioned row into its per-example slices — the
    * type-agnostic core shared by the text ([[packFromPrefix]]) and id
    * ([[packSequencesIds]]) packers. Output per slice: `example_id`,
    * `start_epos` (in-example position of the slice's first token),
    * `toks` (the slice of the row's token array, element type preserved),
    * `starts` (in-example doc-start positions that fall in this slice).
    */
  private def sliceByExamples(pre: DataFrame, toksCol: String,
                              seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    // tokens in the first slice = up to the next example boundary
    val firstCut = least(L - col("__pre") % L, col("__n"))
    // slice count: 1 + ceil((n - firstCut) / L); doubles are exact here
    // (token counts are far below 2^52)
    val m = lit(1L) +
      floor((col("__n") - firstCut + L - 1).cast("double") / L.cast("double"))
        .cast("long")
    pre
      .withColumn("__first", firstCut)
      .withColumn("__m", m)
      .select(col("__pre"), col(toksCol).as("__toks"), col("__first"),
        col("__starts"), explode(sequence(lit(0L), col("__m") - 1)).as("__j"))
      .withColumn("__cut0", // 0-based first token of this slice in the row
        when(col("__j") === 0, lit(0L))
          .otherwise(col("__first") + (col("__j") - 1) * L))
      .withColumn("__len",
        when(col("__j") === 0, col("__first")).otherwise(L))
      .withColumn("__epos0", // in-example position of the slice's first token
        when(col("__j") === 0, col("__pre") % L).otherwise(lit(0L)))
      .select(
        ((col("__pre") / L).cast("long") + col("__j")).as("example_id"),
        col("__epos0").cast("int").as("start_epos"),
        slice(col("__toks"), (col("__cut0") + 1).cast("int"),
          col("__len").cast("int")).as("toks"),
        transform(
          filter(col("__starts"), s =>
            s >= col("__cut0") && s < col("__cut0") + col("__len")),
          s => (s - col("__cut0") + col("__epos0")).cast("int"))
          .as("starts"))
  }

  /** The carve stage of [[packSequences]], reusable over ANY prefix
    * assignment (the streaming packer feeds arrival-order offsets and a
    * carry row through it). `pre` rows need: `toksCol` (non-empty token
    * array), `__pre` (the row's global token offset), `__n`
    * (`size(toksCol)` as long), and `__starts` — the 0-based positions
    * WITHIN the row's token array where a document begins (`[0]` for a
    * whole doc; a carry row lists the starts it accumulated). Each row is
    * cut into ≤⌈n/L⌉+1 contiguous slices, each landing in one example;
    * starts travel with their slice and surface as in-example positions.
    */
  private[graft] def packFromPrefix(pre: DataFrame, toksCol: String,
                                    seqLen: Int): DataFrame =
    sliceByExamples(pre, toksCol, seqLen)
      .groupBy("example_id")
      .agg(array_sort(collect_list(
        struct(col("start_epos"), col("toks"), col("starts")))).as("a"))
      .select(col("example_id"),
        size(flatten(col("a.toks"))).as("n_tokens"),
        concat_ws(" ", flatten(col("a.toks"))).as("example_text"),
        concat_ws(",", transform(flatten(col("a.starts")),
          s => s.cast("string"))).as("doc_starts"),
        size(flatten(col("a.starts"))).as("n_docs_started"),
        // array forms, for callers that must round-trip tokens losslessly
        // (the streaming packer's carry: tokens may contain spaces, so
        // re-splitting example_text is NOT an inverse of concat_ws)
        flatten(col("a.toks")).as("__toks_arr"),
        flatten(col("a.starts")).as("__starts_arr"))

  /** [[packSequences]] over an ID-ENCODED corpus: pack `idsCol`
    * (`array<int>`, e.g. [[Bpe.encodeIds]] output) into exact-`seqLen`
    * examples of token IDS — the literal pretraining tensor input. Same
    * hash order, carve stage, and boundary semantics as the text packer
    * (the spec asserts example boundaries are IDENTICAL for a corpus and
    * its id-encoding); `doc_starts` stays an `array<int>` here (the
    * attention-reset index vector, ML-ready) rather than a display string.
    */
  def packSequencesIds(docs: DataFrame, idCol: String, idsCol: String,
                       seqLen: Int, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val pre = withHashOrderPrefix(
      docs.select(col(idCol), col(idsCol))
        .filter(size(col(idsCol)) > 0),
      idCol, size(col(idsCol)), partitions)
      .withColumn("__starts", array(lit(0)))
    packIdsFromPrefix(pre, idsCol, seqLen)
  }

  /** Id-form carve + reassembly over ANY prefix assignment — the ids twin
    * of [[packFromPrefix]] (the streaming ids packer feeds arrival-order
    * offsets and a carry row through it; `ids` and `doc_starts` are
    * arrays, so the carry round-trips losslessly without hidden columns).
    */
  private[graft] def packIdsFromPrefix(pre: DataFrame, idsCol: String,
                                       seqLen: Int): DataFrame =
    sliceByExamples(pre, idsCol, seqLen)
      .groupBy("example_id")
      .agg(array_sort(collect_list(
        struct(col("start_epos"), col("toks"), col("starts")))).as("a"))
      .select(col("example_id"),
        size(flatten(col("a.toks"))).as("n_tokens"),
        flatten(col("a.toks")).as("ids"),
        flatten(col("a.starts")).as("doc_starts"),
        size(flatten(col("a.starts"))).as("n_docs_started"))

  /** Stratified deterministic sample: at most `perStratum` documents per
    * stratum, chosen by md5-hash order (a content-addressed uniform draw).
    * One shuffle on the stratum key; the rank window sorts only within each
    * stratum's partition. At 100 TB with a skewed stratum, the sort is
    * bounded by the largest stratum — pre-aggregate a per-stratum hash
    * threshold first if a stratum exceeds a partition's memory.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       perStratum: Int): DataFrame = {
    val h = md5_lower64(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    docs.select(col(idCol), col(stratumCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
  }

  /** WEIGHTED stratified sample — Efraimidis–Spirakis (2006) reservoir
    * sampling without replacement, probability ∝ `weightCol`: each doc
    * draws key `ln(u)/w` with `u` a content-addressed uniform
    * (md5 of seed|id, the [[dsirSample]] grid), and the `perStratum`
    * LARGEST keys win — exactly the A-ES scheme, so inclusion odds are
    * proportional to weight, yet the draw is reproducible,
    * shard-order-free, and cross-engine exact (keys round to 6; ties
    * break to the smaller id). Rows with non-positive weight never
    * qualify. Same plan shape as [[stratifiedSample]]: one stratum-keyed
    * shuffle, rank window bounded by the largest stratum.
    */
  def weightedSample(docs: DataFrame, idCol: String, stratumCol: String,
                     weightCol: String, perStratum: Int,
                     seed: String = "ws"): DataFrame = {
    require(perStratum > 0, s"need perStratum > 0, got $perStratum")
    val u = (pmod(md5_lower64(concat(lit(seed + "|"), col(idCol).cast("string"))),
      lit(1000000L)) + 0.5) / 1000000.0
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(desc("es_key"), col(idCol))
    docs.select(col(idCol), col(stratumCol), col(weightCol))
      .filter(col(weightCol) > 0)
      // + 0.0 normalizes the -0.0 a huge weight's rounded key produces
      // (Spark's double sort splits -0.0 from 0.0; IEEE addition folds
      // them — the charEntropy 0-x convention)
      .withColumn("es_key",
        round(log(u) / col(weightCol).cast("double"), 6) + lit(0.0))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= perStratum)
      .drop("rn")
  }

  /** Deterministic per-epoch corpus shuffle: a content-addressed global
    * permutation that differs every epoch but is reproducible and
    * shard-order-free — the "reshuffle the corpus each epoch without a
    * seed server" op. The permutation key is `md5(epoch | id)`, so
    * epoch e's order is uncorrelated with epoch e+1's (md5 avalanche);
    * each example gets its serving shard `pmod(key, nShards)` and its
    * within-shard position.
    *
    * Scale shape: one shard-keyed shuffle; the position window sorts only
    * within a shard (corpus/nShards rows). No global sort, no global
    * window — writers range-write shard files independently. Rerunning
    * any subset of shards reproduces identical files (the key is pure
    * content arithmetic).
    */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    val key = md5_lower64(
      concat(lit(s"epoch$epoch|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col(idCol))
    docs.select(col(idCol), key.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Length-bucketed batch assembly (the padding-minimizing batcher for
    * variable-length SFT/eval serving): documents are binned by token
    * count (`bin = ceil(n/binWidth)·binWidth`, capped at `maxLen`), then
    * packed into fixed-size batches of `batchSize` within each bin in
    * content-hash order. Each row reports its batch, the batch's pad
    * target (the bin ceiling) and its own padding waste — so
    * `sum(pad_tokens)` against a naive single-bin batcher quantifies the
    * win, and a serving loader can consume (bin, batch_id) groups
    * directly.
    *
    * Scale shape: one shuffle keyed on the bin (bounded by
    * `maxLen/binWidth` + 1 distinct bins); rank windows sort only within
    * a bin. Documents longer than `maxLen` clamp into the top bin (they
    * would be truncated at serving time anyway).
    */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    binWidth: Int = 64, maxLen: Int = 2048,
                    batchSize: Int = 8): DataFrame = {
    val n = size(TextOps.tokens(col(textCol)))
    val bin = least(
      ceil(n.cast("double") / binWidth).cast("int") * binWidth, lit(maxLen))
    val h = md5_lower64(col(idCol).cast("string"))
    val w = Window.partitionBy(col("bin")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol), n.as("n_tokens"), bin.as("bin"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", ((col("rn") - 1) / batchSize).cast("int"))
      .select(col(idCol), col("n_tokens"), col("bin"), col("batch_id"),
        (col("bin") - least(col("n_tokens"), col("bin"))).cast("long")
          .as("pad_tokens"))
  }

  /** One-row corpus data card — the release-governance summary a dataset
    * ships with (docs, token/char volume, language and source diversity,
    * exact-duplication rate). Everything is exact and closed-form, so the
    * whole report hash-matches a SQL oracle; the top-language tie breaks
    * to the lexically smaller code.
    *
    * Scale shape: one pass of tiny global aggregates (all 1-row), one
    * bounded group-by for the language histogram, and one content-hash
    * group-by for the duplicate census (keyed on `md5_lower64(text)`, so
    * the shuffle moves 8-byte keys, not document bodies).
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, sourceCol: String,
                   charsCol: String): DataFrame = {
    val nToks = size(TextOps.tokens(col(textCol)))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(nToks.cast("long")).as("total_tokens"),
      sum(col(charsCol).cast("long")).as("total_chars"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"))
    val top = docs.groupBy(col(langCol).as("top_lang"))
      .agg(count(lit(1)).as("top_n"))
      .orderBy(col("top_n").desc, col("top_lang"))
      .limit(1)
    val dup = docs
      .groupBy(md5_lower64(col(textCol)).as("h"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("dup_docs"))
    base.crossJoin(top).crossJoin(dup)
      .select(col("n_docs"), col("total_tokens"),
        round(col("total_tokens") / col("n_docs"), 4).as("avg_tokens"),
        col("total_chars"), col("n_langs"), col("top_lang"),
        round(col("top_n") / col("n_docs"), 6).as("top_lang_share"),
        col("n_sources"), col("dup_docs"),
        round(col("dup_docs") / col("n_docs"), 6).as("dup_frac"))
  }

  /** Cross-corpus vocabulary overlap from theta sketches — "how much of
    * corpus A's distinct vocabulary appears in corpus B?", the
    * contamination/coverage triage between releases or domains. Each
    * side condenses to ONE mergeable theta sketch (a map-side-combinable
    * aggregate over the token stream); intersection/a-not-b run on the
    * two serialized sketches, never on the corpora. Below 2^lgK distinct
    * tokens the sketches are exact, so the whole report hash-matches a
    * DuckDB INTERSECT/EXCEPT oracle at test scale; above it, estimates
    * degrade per the DataSketches error contract while the corpus-side
    * cost stays one streaming pass.
    */
  def vocabularyOverlap(docs: DataFrame, textCol: String, groupCol: String,
                        a: String, b: String, lgK: Int = 12): DataFrame = {
    import graft.functions.{theta_agg, theta_a_not_b, theta_estimate, theta_intersect}
    val toks = docs.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("g"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
    val sk = toks.groupBy("g").agg(theta_agg(col("tok"), lgK).as("sk"))
    sk.filter(col("g") === a).select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("g") === b).select(col("sk").as("skb")))
      .select(
        round(theta_estimate(col("ska"))).cast("long").as("n_a"),
        round(theta_estimate(col("skb"))).cast("long").as("n_b"),
        round(theta_estimate(theta_intersect(col("ska"), col("skb"))))
          .cast("long").as("n_common"),
        round(theta_estimate(theta_a_not_b(col("ska"), col("skb"))))
          .cast("long").as("n_only_a"))
      .withColumn("jaccard",
        round(col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")), 6))
  }

  /** Per-domain document cap (the C4/RefinedWeb "no domain dominates the
    * corpus" rule): keep at most `cap` documents per domain, chosen in
    * md5-hash order — a content-addressed uniform draw within each domain,
    * stable across runs and engines. Every document is returned with its
    * within-domain rank and a `kept` flag, so callers can either filter or
    * audit what the cap removed.
    *
    * Same scale shape as [[stratifiedSample]]: one shuffle keyed on the
    * domain; the rank window sorts only within a domain's partition (with
    * AQE skew handling for a mega-domain).
    */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
                cap: Int): DataFrame = {
    val h = md5_lower64(col(idCol).cast("string"))
    val w = Window.partitionBy(col(domainCol)).orderBy(h, col(idCol))
    docs.select(col(idCol), col(domainCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("kept", col("rn") <= cap)
  }

  /** Domain-mixture reweighting: given target shares per domain (e.g. the
    * mixture a training run wants), compute each domain's actual share and
    * the sampling weight `target_share / actual_share` that resamples the
    * corpus to the target mixture. Domains absent from `targets` get
    * target 0 (weight 0 — dropped by the sampler).
    *
    * One count aggregate (map-side combinable) over the corpus + a
    * broadcast of the tiny target table; shares divide through exact
    * decimal so the report is bit-deterministic cross-engine.
    */
  /** Temperature-based mixture reweighting — the multilingual-corpus
    * "temperature sampling" rule (XLM-R style): sample domain d with
    * probability q_d ∝ p_d^(1/τ), where p_d is the domain's natural
    * corpus share. τ = 1 keeps the natural mix, τ → ∞ approaches
    * uniform, τ < 1 sharpens toward the head. Returns per-domain
    * `(domain, n_docs, actual_share, sampled_share, weight)` with
    * `weight = q_d / p_d`, the per-document resampling factor — the
    * parametric complement of [[mixWeights]]' explicit target table.
    *
    * Same scale shape as [[mixWeights]]: one map-side-combinable count
    * aggregate over the corpus, then broadcast scalar totals. Cross-engine
    * determinism: shares divide through exact decimal rounded to 12, the
    * double `pow` lands back in a 12-decimal DECIMAL before the
    * normalizing sum (decimal addition is exact and order-free, so the
    * partial-aggregation order can't wiggle a float sum), and the final
    * divisions run on doubles derived from those exact decimals — an
    * engine pair would have to disagree on `pow` by ~1e-13 to flip a
    * rounded output digit.
    *
    * Tail-domain correctness: `pa` and the weight denominator use the
    * share at FULL 12-decimal precision; only the REPORTED `actual_share`
    * column is rounded to 6. Rounding the share to 6 before `pow` would
    * zero any domain below 5e-7 of the corpus (hit from ~2M docs up), and
    * [[applyMixture]] would then silently DELETE it — the opposite of
    * temperature sampling's upweighting of tail domains. At 12 decimals
    * the cliff moves to a 2×10^12-doc corpus, beyond the 100 TB target.
    */
  def temperatureWeights(docs: DataFrame, domainCol: String,
                         temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val alpha = 1.0 / temperature
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val total = docs.agg(count(lit(1)).as("n_total"))
    val shares = docs.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .withColumn("__share12",
        round(col("n_docs").cast(dec) / col("n_total"), 12).cast(dec))
      .withColumn("actual_share", round(col("__share12"), 6).cast("double"))
      .withColumn("pa",
        round(pow(col("__share12").cast("double"), alpha), 12).cast(dec))
    val z = shares.agg(sum("pa").as("z"))
    shares.crossJoin(broadcast(z))
      .select(col(domainCol), col("n_docs"), col("actual_share"),
        round(col("pa").cast("double") / col("z").cast("double"), 6)
          .as("sampled_share"),
        when(col("__share12") > 0,
          round(col("pa").cast("double") / col("z").cast("double")
            / col("__share12").cast("double"), 6)).otherwise(0.0).as("weight"))
  }

  /** Materialize a resampled corpus from per-domain sampling weights —
    * the "apply" step completing [[mixWeights]]/[[temperatureWeights]]
    * (which only COMPUTE weights): each document is emitted
    * `floor(weight)` times plus one more with probability
    * `frac(weight)`, so domain expectations hit the target mixture
    * exactly (weight < 1 thins, weight > 1 upsamples by repetition, the
    * standard epoch-repeat treatment of upweighted domains). Output is
    * one row per emitted COPY: `(id, domain, copy)` with `copy` in
    * [0, copies) so downstream shuffles can keep repeats apart.
    *
    * Deterministic and cross-engine exact: the Bernoulli draw is
    * `pmod(md5_lower64(id), 10^6) < round(frac(weight)·10^6)` — pure
    * integer arithmetic on the content-addressed hash (same family as
    * [[hashBucket]]), no RNG, no float compare, so re-running the
    * resample (or running it on another engine) yields byte-identical
    * output. One broadcast join of the tiny weight table + one explode;
    * zero shuffle over the corpus.
    */
  def applyMixture(docs: DataFrame, idCol: String, domainCol: String,
                   weights: DataFrame, weightCol: String = "weight"): DataFrame = {
    // integer micro-weight: w = 3.25 -> 3,250,000 -> 3 whole copies + a
    // 25%-threshold draw; weights are 6-decimal by contract upstream
    val wMicro = round(col(weightCol) * 1000000).cast("long")
    val w = broadcast(weights.select(col(domainCol), wMicro.as("__w")))
    val draw = pmod(md5_lower64(col(idCol).cast("string")), lit(1000000L))
    docs.select(col(idCol), col(domainCol))
      .join(w, Seq(domainCol))
      .withColumn("__copies",
        (col("__w") / 1000000L).cast("long") +
          when(draw < pmod(col("__w"), lit(1000000L)), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .select(col(idCol), col(domainCol),
        explode(sequence(lit(0L), col("__copies") - 1)).as("copy"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every raw document by how much more likely its hashed n-gram features
    * are under a small TARGET corpus than under the raw corpus itself —
    * `Σ_f ln(p̂_target(f) / p̂_raw(f))` over the document's unigram and
    * bigram features, hashed into `buckets` counts (the paper's
    * hashed-n-gram bag-of-words model, add-k smoothed). High scores mean
    * "looks like the target domain"; resampling by these weights is the
    * data-selection step that beats heuristic quality filters in the
    * paper.
    *
    * Scale shape: the two feature-distribution models are ONE hash
    * aggregate each over the exploded feature stream (map-side
    * combinable); the per-bucket log-ratio table is ≤ `buckets` rows and
    * BROADCASTS back onto the feature stream (no shuffle to score a
    * feature); the only corpus-sized shuffle is the per-document sum.
    * Raw-corpus bucket counts double as the model denominators, so the
    * corpus is tokenized exactly once per side.
    *
    * Cross-engine determinism (the DuckDB-oracle conventions): features
    * hash with `md5_lower64` (== DuckDB `md5_number_lower`); each bucket's
    * ln ratio is rounded to 6 decimals; the per-document sum folds in
    * feature-position order (unigrams in token order, then bigrams in
    * token order — one concatenated array, so the position IS the order)
    * and rounds to 6 — the SAME grid as the terms. Rounding a sum of
    * 1e-6-grid terms on a coarser grid (e.g. 4) manufactures exact .5
    * ties where double rounding and decimal rounding diverge; rounding
    * on the term grid itself can never tie (multiples of 1e-6 are never
    * half-grid).
    */
  def dsirLogRatios(raw: DataFrame, idCol: String, textCol: String,
                    target: DataFrame, targetTextCol: String,
                    buckets: Int = 8192,
                    smoothK: Double = 0.5): DataFrame = {
    // unigrams ++ bigrams as ONE ordered array; fpos indexes the
    // concatenation, pinning the cross-engine summation order
    def features(df: DataFrame, id: Column, text: Column): DataFrame = {
      // staged token array — one split per row instead of three (the
      // same r18 rationale as Classifier.features; rows are
      // expression-identical, so fpos order and hashes are unchanged)
      val t = col("__ftoks")
      val bi = zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))
      df.select(id.as("id"), TextOps.tokens(text).as("__ftoks"))
        .select(col("id"), posexplode(concat(t, bi)).as(Seq("fpos", "feat")))
        .withColumn("b", pmod(md5_lower64(col("feat")), lit(buckets.toLong)))
    }
    val rawF = features(raw, col(idCol), col(textCol))
    val tgtF = features(target, lit(0L), col(targetTextCol))

    // r18: the bucket-count tables are ≤ `buckets` rows — checkpoint them
    // and derive the totals as Σ counts (identical by definition: every
    // feature occurrence lands in exactly one bucket). The previous form
    // embedded the tokenize+explode of BOTH corpora once per consumer in
    // the final plan (counts + totals + the scoring join's broadcast):
    // three raw-corpus passes and two target passes per run, now one each
    // for the count side.
    val rawCounts = rawF.groupBy("b").agg(count(lit(1)).as("cr"))
      .localCheckpoint()
    val tgtCounts = tgtF.groupBy("b").agg(count(lit(1)).as("ct"))
      .localCheckpoint()
    val rawTot = rawCounts.agg(sum("cr").cast("double").as("tr"))
    val tgtTot = tgtCounts.agg(sum("ct").cast("double").as("tt"))

    // ≤ `buckets` rows: only raw-occupied buckets matter (a document's
    // features all exist in the raw corpus by definition)
    val lnr = rawCounts.join(tgtCounts, Seq("b"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("b"), round(log(
        ((coalesce(col("ct"), lit(0L)) + smoothK)
          / (col("tt") + lit(smoothK) * buckets))
          / ((col("cr") + smoothK) / (col("tr") + lit(smoothK) * buckets))),
        6).as("lnr"))

    val scored = rawF.join(broadcast(lnr), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_features"),
        round(aggregate(
          transform(array_sort(collect_list(struct(col("fpos"), col("lnr")))),
            s => s.getField("lnr")),
          lit(0.0), (acc, x) => acc + x), 6).as("dsir_logratio"))

    raw.select(col(idCol).as("doc_id"))
      .join(scored.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("dsir_logratio"), lit(0.0)).as("dsir_logratio"))
  }

  /** DSIR selection: the paper's Gumbel-top-m resample over the importance
    * weights. Sampling without replacement with probability ∝ exp(w) is
    * exactly "take the m largest w + g where g is standard Gumbel noise"
    * (the Gumbel-max trick); the noise here is DETERMINISTIC —
    * `g = -ln(-ln(u))` with `u` a content-addressed uniform from the
    * document id's md5 — so the draw is reproducible, shard-order-free,
    * and cross-engine exact after the rounding conventions. Top-m runs as
    * orderBy+limit (TakeOrdered — parallel partial top-m, no global
    * sort).
    */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String, m: Int,
                 buckets: Int = 8192,
                 smoothK: Double = 0.5): DataFrame = {
    val w = dsirLogRatios(raw, idCol, textCol, target, targetTextCol,
      buckets, smoothK)
    // u in (0,1) strictly: (h + 0.5) / 1e6 with h in [0, 1e6)
    val u = (pmod(md5_lower64(concat(lit("dsir|"), col("doc_id").cast("string"))),
      lit(1000000L)) + 0.5) / 1000000.0
    w.withColumn("gumbel_score",
        round(col("dsir_logratio") + round(-log(-log(u)), 6), 6))
      .orderBy(col("gumbel_score").desc, col("doc_id"))
      .limit(m)
  }

  def mixWeights(docs: DataFrame, domainCol: String,
                 targets: Map[String, Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = targets.toSeq.sortBy(_._1).toDF(domainCol, "target_share")
    // scalar corpus total as a broadcast cross join — never a global
    // single-partition window (WindowExec would warn, and at scale a
    // Window.partitionBy() is a serialization point even post-aggregation)
    val total = docs.agg(count(lit(1)).as("n_total"))
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
    // weight divides the FULL 12-decimal share (rounding the share to 6
    // first would zero any domain below 5e-7 of the corpus — a targeted
    // tail domain would then be silently DELETED by applyMixture instead
    // of upweighted, see temperatureWeights for the same rule); only the
    // REPORTED actual_share column is rounded to 6
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    counts.join(broadcast(t), Seq(domainCol), "left")
      .withColumn("__share12",
        round(col("n_docs").cast(dec) / col("n_total"), 12).cast(dec))
      .select(col(domainCol), col("n_docs"),
        round(col("__share12"), 6).cast("double").as("actual_share"),
        coalesce(col("target_share"), lit(0.0)).as("target_share"),
        when(col("__share12") > 0,
          round(coalesce(col("target_share"), lit(0.0))
            / col("__share12").cast("double"), 6))
          .otherwise(0.0).as("weight"))
  }

  /** Canary scan — benchmark-canary / contamination-string detection:
    * every `(doc, needle)` pair where the document CONTAINS the needle
    * verbatim (eval-set canary GUIDs, license markers, PII tripwires).
    * One zero-shuffle scan testing every needle per row inside a single
    * codegen'd higher-order filter — needle-count-many `contains` per
    * document, no join, no explode-before-filter blowup; docs with no
    * match emit nothing. Scales as scan bandwidth at any corpus size;
    * for needle sets too large for a per-row loop, the shingle-bloom
    * decontamination path ([[contaminationReportScalable]]) is the
    * intended escalation.
    */
  def canaryScan(docs: DataFrame, idCol: String, textCol: String,
                 needles: Seq[String]): DataFrame = {
    require(needles.nonEmpty, "need at least one needle")
    docs.select(col(idCol), explode(
        filter(array(needles.map(lit): _*),
          n => col(textCol).contains(n))).as("needle"))
  }

  /** Snapshot diff — the dataset-versioning primitive: classify every
    * doc id across two corpus snapshots as `added` / `removed` /
    * `changed` / `unchanged` by content hash. One full-outer join on the
    * id with 32-byte md5 payloads — audit-scale regardless of document
    * size, the same "compare manifests, not bytes" shape as
    * [[shardManifest]] (whose per-shard rollup consumes exactly this
    * classification when deciding which shards to rewrite).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val a = oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_old"))
    val b = newSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_new"))
    a.join(b, Seq("id"), "full")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed"))
      .select("id", "status")
  }

  /** Token-distribution drift between two corpora (train vs new crawl —
    * the pre-ingest drift monitor): one row with corpus sizes, vocab
    * overlap, and the total-variation distance
    * `TV = Σ_tok |c_a/N_a − c_b/N_b| / 2` in micro-units, INTEGER-EXACT:
    * the per-token cross products `c_a·N_b` are decimal(38,0) (exact to
    * 10^38 — int64 would overflow past ~2·10^9 tokens/side), their
    * absolute-difference sum S is a decimal sum of integers (order-free),
    * and the single final division `HALF_UP(10^6·S / (2·N_a·N_b))` runs
    * in driver BigInt off the 1-row aggregate (bounded planning state,
    * the whitening convention) — so any engine with exact integers
    * (DuckDB: HUGEINT) reproduces the value bit-for-bit.
    *
    * Plan shape: one groupBy(token) per side, one full-outer join on the
    * token, one global aggregate — vocab-sized shuffles, corpus-sized
    * scans, nothing quadratic.
    */
  def corpusDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def counts(df: DataFrame, c: String) =
      df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(c))
    // consumed by two aggregates (totals first — the cross products need
    // them — then the diff sum): cache the vocab-sized join between them
    val j = counts(a, "ca").join(counts(b, "cb"), Seq("tok"), "full")
      .na.fill(0L, Seq("ca", "cb"))
      .cache()
    val agg = j.agg(
        sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("vocab_b"),
        sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
          .as("vocab_shared"))
      .collect().head
    val (na, nb) = (agg.getLong(0), agg.getLong(1))
    require(na > 0 && nb > 0,
      s"corpusDrift needs non-empty corpora, got n_a=$na n_b=$nb")
    val s = j.agg(sum(abs(col("ca").cast(dec) * lit(nb).cast(dec) -
        col("cb").cast(dec) * lit(na).cast(dec))).as("s"))
      .collect().head.getDecimal(0).toBigInteger
    j.unpersist()
    val tv = (BigInt(s) * 2000000 + BigInt(na) * nb * 2) /
      (BigInt(na) * nb * 4)
    val spark = a.sparkSession
    import spark.implicits._
    Seq((na, nb, agg.getLong(2), agg.getLong(3), agg.getLong(4),
      tv.toLong))
      .toDF("n_a", "n_b", "vocab_a", "vocab_b", "vocab_shared", "tv_micro")
  }

  /** Source×source shingle-contamination matrix — the copy-flow report
    * between corpus sources (a crawl slice re-hosting another source's
    * pages, a dataset vendored into two providers): for every ordered
    * source pair, the count of shared distinct word-shingles and two
    * integer HALF_UP micro-unit ratios — containment
    * `|A∩B| / |A|` (directional: "how much of A also appears in B") and
    * Jaccard `|A∩B| / |A∪B|`. Complements [[corpusDrift]] (distribution
    * distance answers "are they alike?"; this answers "did one COPY the
    * other?" — near-identical distributions score 0 here unless literal
    * 3-grams are shared).
    *
    * Scale shape — ONE corpus pass through PRIMITIVE-ONLY aggregation:
    * each source maps to a bit (one tiny distinct-sources job; at most
    * [[MaxOverlapSources]] sources by contract — this is a
    * provider/crawl tag, not a document key), and the corpus-sized
    * shuffle is `groupBy(shingle).agg(bit_or(mask))` — a LONG buffer
    * per group that stays entirely inside Tungsten hash aggregation.
    * (The first cut used `collect_set(source)` per shingle: at 5 M docs
    * / 290 M distinct shingles the per-group set objects stalled the
    * executor heartbeat outright — object buffers at shingle
    * cardinality are not a 100 TB shape.) A second map-side-collapsing
    * `groupBy(mask).count()` reduces to ≤ 2^|sources| rows, which
    * collect, and the matrix assembles driver-side in exact long
    * arithmetic (bounded planning state, the [[corpusDrift]]
    * convention): `|A| = Σ cnt over masks containing a`,
    * `|A∩B| = Σ cnt over masks containing both`. All-integer output,
    * fully hashed.
    *
    * Null-source documents drop (no bit to carry — the prCurve
    * convention: an untagged doc belongs to no source); a source whose
    * documents all have fewer than `shingleK` tokens contributes no
    * shingles and is absent from the matrix rather than reported with
    * n = 0.
    */
  def sourceOverlapMatrix(docs: DataFrame, srcCol: String, textCol: String,
                          shingleK: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val srcs = docs.select(col(srcCol).cast("string").as("src"))
      .filter(col("src").isNotNull).distinct()
      .collect().map(_.getString(0)).sorted
    require(srcs.length <= MaxOverlapSources,
      s"sourceOverlapMatrix: ${srcs.length} distinct sources exceeds " +
        s"$MaxOverlapSources — srcCol must be a provider/crawl tag, and " +
        "the mask-count relation is 2^|sources|-bounded")
    if (srcs.isEmpty)
      return Seq.empty[(String, String, Long, Long, Long, Long, Long)]
        .toDF("src_a", "src_b", "n_a", "n_b", "common",
          "containment_micro", "jaccard_micro")
    val maskOf = typedlit(srcs.zipWithIndex
      .map { case (s, i) => s -> (1L << i) }.toMap)
    val k = srcs.length
    val maskCounts = docs
      .select(element_at(maskOf, col(srcCol).cast("string")).as("m"),
        explode(graft.functions.word_shingles(col(textCol), shingleK))
          .as("s"))
      .filter(col("m").isNotNull)
      .groupBy("s").agg(bit_or(col("m")).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
    // expand each mask to its member-bit and ordered-pair events
    // DISTRIBUTED (the mask relation is min(2^k, #shingles)-sized —
    // usually tiny, but adversarial co-occurrence could make a
    // driver-side collect of it large), then collect only the ≤ k and
    // ≤ k² aggregated counts — bounded planning state by construction.
    val pow = typedlit((0 until k).map(i => 1L << i).toArray)
    val bits = filter(sequence(lit(0), lit(k - 1)),
      i => col("mask").bitwiseAND(element_at(pow, i + 1)) =!= lit(0L))
    // the mask relation is tiny but its LINEAGE is the full corpus
    // aggregation — cache it so the two collects below run that chain
    // once, and unpersist before returning (both consumers are eager)
    maskCounts.cache()
    val withBits = maskCounts.select(col("cnt"), bits.as("bs"))
    val sizeRows = withBits
      .select(explode(col("bs")).as("i"), col("cnt"))
      .groupBy("i").agg(sum("cnt").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pairRows = withBits
      .select(explode(flatten(transform(col("bs"), a =>
        transform(col("bs"), b => struct(a.as("i"), b.as("j"))))))
        .as("p"), col("cnt"))
      .filter(col("p.i") =!= col("p.j"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(sum("cnt").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    maskCounts.unpersist()
    val out = for {
      i <- 0 until k if sizeRows.contains(i)
      j <- 0 until k if j != i && sizeRows.contains(j)
    } yield {
      val (na, nb) = (sizeRows(i), sizeRows(j))
      val c = pairRows.getOrElse((i, j), 0L)
      val union = na + nb - c
      // n_a > 0 (present in sizeRows) and |A∪B| >= n_a, so both
      // HALF_UP denominators are safe
      (srcs(i), srcs(j), na, nb, c,
        (2000000L * c + na) / (2L * na),
        (2000000L * c + union) / (2L * union))
    }
    out.toDF("src_a", "src_b", "n_a", "n_b", "common",
      "containment_micro", "jaccard_micro")
  }

  /** [[sourceOverlapMatrix]] source-cardinality cap: one bit per source
    * in a long mask. The mask relation itself never collects (bit/pair
    * expansion is distributed), so the full 64 bits are usable.
    */
  val MaxOverlapSources: Int = 64

  /** Per-token drift report behind [[corpusDrift]]'s scalar: each side's
    * share quantized to micro-units on its own int64-exact grid
    * (`HALF_UP(10^6·c/N)`, exact while `N ≤ ~4.6·10^12`), delta =
    * `share_a − share_b` — the top movers list a drift alarm pages on.
    * Ties break on the token for a total order.
    */
  def driftTokens(a: DataFrame, b: DataFrame, textCol: String,
                  topK: Int = 20): DataFrame = {
    def counts(df: DataFrame, c: String) =
      df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(c))
    val j = counts(a, "ca").join(counts(b, "cb"), Seq("tok"), "full")
      .na.fill(0L, Seq("ca", "cb"))
    val tot = j.agg(sum("ca").as("na"), sum("cb").as("nb"))
    j.crossJoin(broadcast(tot))
      .withColumn("share_a_micro",
        expr("(2 * 1000000 * ca + na) div (2 * na)"))
      .withColumn("share_b_micro",
        expr("(2 * 1000000 * cb + nb) div (2 * nb)"))
      .withColumn("delta_micro", col("share_a_micro") - col("share_b_micro"))
      .orderBy(abs(col("delta_micro")).desc, col("tok"))
      .limit(topK)
      .select("tok", "ca", "cb", "share_a_micro", "share_b_micro",
        "delta_micro")
  }

  /** Population Stability Index bins over a bounded integer feature —
    * the CONTINUOUS-feature drift monitor next to [[corpusDrift]]'s
    * token TV: equal-width bins on `[lo, hi]` (out-of-range clamps to
    * the edge bins, the Layout convention), per-bin
    * `term = (p̂ − q̂)·ln(p̂/q̂)` with add-0.5-smoothed proportions
    * `p̂ = (c + 0.5)/(N + 0.5·bins)` so empty bins stay finite
    * (the NB smoothing convention). PSI reads: < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 shifted.
    *
    * Determinism follows the repo's ln-grid rule (NB/DSIR/BM25): the
    * smoothed proportions and their log-ratio are single correctly-
    * rounded IEEE divisions over exact integer counts, the ln is
    * rounded to 6 BEFORE the product, and the term rounds to 6 — the
    * [[psi]] scalar then folds the ≤`bins` terms in bin order. Binning
    * itself is pure integer arithmetic: `(x − lo)·bins div (hi − lo + 1)`
    * clamped to `[0, bins)`.
    *
    * Plan shape: one groupBy(bin) scan per side, a `bins`-row full-outer
    * join, a broadcast 1-row totals attach — corpus-sized scans,
    * constant-sized everything else.
    */
  def psiBins(a: DataFrame, b: DataFrame, feature: Column, lo: Long,
              hi: Long, bins: Int = 10): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    def binned(df: DataFrame, c: String) =
      df.select(feature.cast("long").as("x"))
        .filter(col("x").isNotNull)
        .select(least(lit(bins - 1L), greatest(lit(0L),
          expr(s"(x - ${lo}L) * ${bins}L div ${hi - lo + 1}L")))
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(c))
    val grid = a.sparkSession.range(bins).select(col("id").as("bin"))
    val j = grid
      .join(binned(a, "ca"), Seq("bin"), "left")
      .join(binned(b, "cb"), Seq("bin"), "left")
      .na.fill(0L, Seq("ca", "cb"))
    val tot = j.agg(sum("ca").as("na"), sum("cb").as("nb"))
    j.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + 0.5) / (col("na") + 0.5 * bins))
      .withColumn("q", (col("cb") + 0.5) / (col("nb") + 0.5 * bins))
      .withColumn("term",
        round((col("p") - col("q")) * round(log(col("p") / col("q")), 6),
          6))
      .select("bin", "ca", "cb", "term")
  }

  /** The PSI scalar: [[psiBins]] folded in bin order (≤ `bins` rounded-6
    * terms — the fold runs driver-side off the tiny bin relation, the
    * whitening/corpusDrift bounded-planning-state convention).
    */
  def psi(a: DataFrame, b: DataFrame, feature: Column, lo: Long,
          hi: Long, bins: Int = 10): DataFrame = {
    val terms = psiBins(a, b, feature, lo, hi, bins)
      .orderBy("bin").select("term")
      .collect().map(_.getDouble(0))
    val spark = a.sparkSession
    import spark.implicits._
    Seq(BigDecimal(terms.sum).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toDF("psi")
  }
}
