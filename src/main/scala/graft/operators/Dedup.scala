package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CacheScope
import graft.functions.{md5_lower64, simhash64}

/** Document deduplication operators for the training-data pipeline
  * (SURVEY §2.9 north-star). All variants are pure DataFrame compositions:
  * shuffles are keyed on content hashes / shingles (the minimum possible for
  * the semantic), no driver-side collection, so every path scales linearly
  * with executors at 100 TB.
  */
object Dedup {

  /** Exact dedup: group documents by fingerprint of normalized text; each
    * group keeps its min-id representative. One hash-shuffle, map-side
    * partial aggregation applies.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(TextOps.normalized(col(textCol))).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Documents with distinct word n-gram shingle sets attached.
    * Repartitioned to full parallelism first: shingling/hashing is
    * CPU-bound per row, and a small input file count must not serialize it
    * onto a few cores (at 100 TB the file count provides parallelism; a
    * round-robin repartition of ids is cheap insurance either way).
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("id"), graft.functions.word_shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Inverted shingle index `(id, n_sh, s)` with hot-shingle pruning: a
    * shingle whose document frequency exceeds `maxShingleDF` contributes
    * O(df²) candidate pairs to the self-join while carrying no near-dup
    * signal (it is corpus boilerplate), so it is dropped before the join —
    * standard inverted-index DF-capping. The hot list is a tiny aggregate
    * of the skinny (s) relation, broadcast to an anti-join.
    */
  private[operators] def shingleIndex(docs: DataFrame, idCol: String,
                                      textCol: String, n: Int,
                                      maxShingleDF: Long)
                                     (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, n)
    // carry each doc's set size through the explode: after the pair
    // aggregation both sizes ride along as grouping keys, so no extra
    // joins (and no shingle recompute) are needed to finish the jaccard.
    // cached: the exploded relation feeds BOTH the DF aggregate and the
    // anti-join input — without it the shingle kernel runs twice
    val ex = scope.own(sh.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s")))
    val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDF).select("s")
    ex.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold).
    *
    * Plan: explode shingles → self-equi-join on shingle (shuffle keyed on
    * shingle) → count shared shingles per pair → join per-doc set sizes →
    * jaccard filter. The shingle join is the standard inverted-index
    * pattern; shingles with document frequency above `maxShingleDF` are
    * dropped before the join ([[shingleIndex]]) so a degenerate boilerplate
    * n-gram cannot make the join quadratic. Capped shingles don't count
    * toward the intersection (set sizes stay exact), so a pair whose only
    * overlap is boilerplate scores 0 — the cap is a semantic floor on
    * informativeness, not an approximation of the uncapped result.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, n: Int = 3,
                        maxShingleDF: Long = 100000L)
                       (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val ex = scope.own(shingleIndex(docs, idCol, textCol, n, maxShingleDF))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Asymmetric n-gram containment pairs: C(a→b) = |sh(a) ∩ sh(b)| / |sh(a)|.
    * Jaccard misses subset duplication — a short document quoted whole
    * inside a long one scores |a|/|b| ≈ 0 Jaccard but containment 1.0 —
    * so quote/boilerplate-inclusion dedup filters on the overlap
    * coefficient `inter / min(|a|,|b|)` (= the larger containment
    * direction) instead. Emits both directions for pairs whose overlap
    * coefficient meets `threshold`.
    *
    * Identical plan shape (and scale posture) to [[ngramJaccardPairs]]:
    * same inverted shingle index, same DF cap on degenerate shingles, one
    * keyed self-join, per-pair aggregation with both set sizes riding the
    * grouping keys.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, n: Int = 3,
                       maxShingleDF: Long = 100000L)
                      (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val ex = scope.own(shingleIndex(docs, idCol, textCol, n, maxShingleDF))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("c_a_in_b", col("inter").cast("double") / col("n_a"))
      .withColumn("c_b_in_a", col("inter").cast("double") / col("n_b"))
      .filter(greatest(col("c_a_in_b"), col("c_b_in_a")) >= threshold)
      .select(col("id_a"), col("id_b"), col("c_a_in_b"), col("c_b_in_a"))
  }

  /** MinHash + LSH near-dup pairs, exact-verified.
    *
    * shingle → per-doc MinHash signature (k hashes, computed in ONE pass per
    * row via higher-order functions — no explode/shuffle for signatures) →
    * band keys (b bands of r rows) → bucket self-join on (band, key) →
    * candidate pairs → exact Jaccard verification on the shingle sets.
    *
    * With r=2, b=16 a pair at true Jaccard 0.8 is missed with probability
    * (1-0.8^2)^16 ≈ 8e-8, so the verified output equals the exact operator's
    * w.h.p. while the join only touches LSH-colliding pairs — the 100 TB
    * scale path (candidate generation is O(docs·b), not O(docs²)).
    */
  /** Band keys over an already-materialized MinHash signature column:
    * band j's key = salted hash of its `numHashes/bands` signature slots.
    * Takes the signature as a COLUMN (not an expression to inline) so the
    * one-pass signature kernel isn't duplicated per band in the tree.
    */
  private[graft] def bandKeysOfSig(sigCol: org.apache.spark.sql.Column,
                                   numHashes: Int, bands: Int): org.apache.spark.sql.Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(concat_ws(",",
        transform(slice(sigCol, j * lit(r) + 1, lit(r)), v => v.cast("string"))), j))
  }

  /** Per-pair miss bound the DEFAULT signature prefilter margin is derived
    * from: at 1e-8, even 10^7 surviving candidate pairs expect ~0.1 missed
    * true pairs — and the sf-oracle corpora (≤ thousands of pairs) are
    * deterministic-safe by ~5 orders of magnitude.
    */
  val SigPrefilterMissBound = 1e-8

  /** Analytic signature-prefilter margin. The fraction of agreeing MinHash
    * slots is `Binomial(numHashes, J) / numHashes` — each slot of a pair at
    * true Jaccard J matches independently with probability J — so Hoeffding
    * gives `P(estimate ≤ J − m) ≤ exp(−2·m²·numHashes)`. Solving at a
    * per-pair miss bound δ: `m = sqrt(ln(1/δ) / (2·numHashes))` — ≈ 0.537
    * at the default 32 hashes and δ = 1e-8. Unlike the int8 embedding
    * prefilter (whose quantization-drift bound is empirical, hence opt-in),
    * this bound is analytic, which is why the prefilter is ON by default.
    */
  def sigMarginForMissBound(numHashes: Int,
                            missBound: Double = SigPrefilterMissBound): Double = {
    require(numHashes > 0 && missBound > 0 && missBound < 1)
    math.sqrt(math.log(1.0 / missBound) / (2.0 * numHashes))
  }

  /** `sigPrefilterMargin`: verify candidates in two stages — a
    * signature-agreement prefilter at `threshold - m`, then exact Jaccard
    * on the survivors. The candidate relation first ships `numHashes`-int
    * payloads (~128 B vs the ~KB shingle arrays — the verify shuffle the
    * 1 M-row harness measured spill-bound) and only survivors ship
    * shingles; emitted pairs and their `jaccard` values still come from
    * the exact set kernel, so the OUTPUT is unchanged as long as no true
    * pair's agree-fraction falls below `threshold - m` — and the margin is
    * chosen so that event has probability ≤ [[SigPrefilterMissBound]] per
    * pair ([[sigMarginForMissBound]], Hoeffding; measured at 1 M rows:
    * 34.6 s exact → 24.8 s prefiltered, byte-equal output).
    *
    * DEFAULT ON (sentinel `-1` resolves to the analytic margin). Pass an
    * explicit margin to tighten/loosen the cut, or any value ≥ `threshold`
    * (e.g. `Double.PositiveInfinity`) to opt OUT — the cut is then ≤ 0,
    * the prefilter join is skipped entirely, and the single-stage exact
    * path runs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3,
                      numHashes: Int = 32, bands: Int = 16,
                      sigPrefilterMargin: Double = -1.0)
                     (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Cache the shingle sets: they are read three times (signature pass +
    // both sides of the verification join).
    val sh = scope.own(withShingles(docs, idCol, textCol, n))

    // codegen'd one-pass MinHash signature (see MinHashKernel); the per-id
    // signature relation is cached when the prefilter needs to join it
    val sigs = scope.own(sh.select(col("id"),
      graft.functions.minhash_signature(col("sh"), numHashes).as("sig")))

    // Skinny (id, band, bkey) relation for the bucket self-join — no array
    // payloads cross the shuffle; cached so the signature pass runs once.
    val banded = scope.own(sigs.select(col("id"),
      posexplode(bandKeysOfSig(col("sig"), numHashes, bands))
        .as(Seq("band", "bkey"))))

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val margin =
      if (sigPrefilterMargin < 0) sigMarginForMissBound(numHashes)
      else sigPrefilterMargin
    val cut = threshold - margin
    // cut ≤ 0 passes every candidate — skip the signature join entirely
    val toVerify =
      if (cut <= 0) candidates
      else {
        val agree = aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)
        candidates
          .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
          .filter(agree.cast("double") / numHashes >= cut)
          .select(col("id_a"), col("id_b"))
      }

    toVerify
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-document 64-bit SimHash sketch (md5-based, oracle-checkable).
    * Near-dup candidates are docs with small hamming distance between
    * sketches; pair generation can bucket on sketch prefixes at scale.
    * (64 bits, not 32: on corpora with a shared vocabulary a 32-bit sketch
    * saturates — most doc pairs land within small hamming distance — and
    * the pair stage explodes quadratically.)
    */
  def simhashSketches(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("id"), simhash64(TextOps.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs: bucket by 16-bit sketch slices (4 bands — by
    * pigeonhole, any pair within hamming distance 3 shares ≥1 band), verify
    * with exact hamming ≤ maxHamming. 16-bit bands, not 8: on corpora with
    * correlated sketches, 8-bit buckets go quadratic (measured 9.6M
    * candidates vs 0.4M at sf0.1 for the same 1.7k verified pairs).
    *
    * Scale ceiling (same occupancy law as [[planesForCorpus]] documents
    * for hyperplane LSH): the band key space is fixed at 2^16 per band, so
    * expected occupancy n/65536 — and with it the candidate join's
    * per-bucket quadratic work — grows linearly with the corpus. Unlike
    * hyperplane bands, these bands CANNOT be widened without voiding the
    * pigeonhole guarantee (hamming ≤ 3 over 64 bits needs ≥ 4 bands); past
    * n ~ millions the guarantee-preserving upgrade is a LONGER sketch —
    * [[simhash128Pairs]]: 4×32-bit bands, 2^32 buckets, same ≤3 bound —
    * i.e. more sketch bits, not fewer bands.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3)
                  (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxHamming <= 3, "4 x 16-bit bands guarantee recall only for hamming <= 3")
    // cached: read by both sides of the band self-join
    val sk = scope.own(simhashSketches(docs, idCol, textCol))
    val banded = sk.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band", "bkey")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-document 128-bit SimHash sketch as `(id, simhash_hi, simhash_lo)`
    * — the scale upgrade the 64-bit scaladoc above names: same md5 token
    * hashes (both halves, one digest per token; `simhash_lo` EQUALS the
    * 64-bit sketch), oracle-checkable via DuckDB `md5_number_upper` /
    * `md5_number_lower`.
    */
  def simhash128Sketches(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("id"), graft.functions.simhash128(TextOps.tokens(col(textCol))).as("sk"))
      .select(col("id"), element_at(col("sk"), 1).as("simhash_hi"),
        element_at(col("sk"), 2).as("simhash_lo"))

  /** 128-bit SimHash near-dup pairs: bucket by 32-bit sketch slices
    * (4 bands — by pigeonhole, any pair within hamming distance 3 over the
    * full 128 bits shares ≥1 band), verify with exact hamming ≤
    * `maxHamming` (sum of both halves' XOR popcounts).
    *
    * This removes [[simhashPairs]]' occupancy ceiling: each band's key
    * space is 2^32, so expected bucket occupancy `n / 2^32` stays ≪ 1 far
    * past the corpus sizes where the 64-bit operator's 2^16 buckets go
    * linear — with the SAME pigeonhole guarantee, because the bound needs
    * only `bands > maxHamming`, not any particular band width. The cost is
    * a sketch twice as long (one md5 digest per token either way) and a
    * stricter similarity semantic: hamming ≤ 3 over 128 bits tolerates
    * half the relative sketch divergence of ≤ 3 over 64.
    */
  def simhash128Pairs(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3)
                     (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxHamming <= 3, "4 x 32-bit bands guarantee recall only for hamming <= 3")
    // cached: read by both sides of the band self-join
    val sk = scope.own(simhash128Sketches(docs, idCol, textCol))
    val slices = Seq(
      col("simhash_lo").bitwiseAND(lit(4294967295L)),
      shiftrightunsigned(col("simhash_lo"), 32),
      col("simhash_hi").bitwiseAND(lit(4294967295L)),
      shiftrightunsigned(col("simhash_hi"), 32))
    val banded = sk.select(col("id"), col("simhash_hi"), col("simhash_lo"),
      posexplode(array(slices: _*)).as(Seq("band", "bkey")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (bit_count(col("a.simhash_hi").bitwiseXOR(col("b.simhash_hi"))) +
          bit_count(col("a.simhash_lo").bitwiseXOR(col("b.simhash_lo"))))
          .cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs via hyperplane-LSH banded candidate
    * generation + exact cosine verification — same output as the all-pairs
    * definition, O(docs·bands) candidate keys instead of a broadcast
    * nested-loop over docs².
    *
    * Plan: one codegen'd pass computes `bands` sign-bit keys per vector
    * ([[graft.functions.HyperplaneBands]]); one side additionally probes all
    * keys within `probeBits` sign flips (multi-probe — recall without more
    * bands); the band self-join (a plain shuffled equi-join on
    * `(band, key)`) yields candidates, which exact cosine then verifies.
    *
    * Recall is deterministic for a given dataset (the hyperplanes derive
    * from fixed hashes): a pair at angle θ disagrees on a plane with
    * p = θ/π, so a band of r planes catches it with P(Binom(r,p) ≤ probe);
    * missing all `bands` bands at the defaults (r=8, b=16, probe=2) has
    * probability (1-0.38)¹⁶ ≈ 4e-4 at cos 0.4 — and the equality against
    * the exact operator is asserted in DedupSpec and against the all-pairs
    * DuckDB oracle at every SF.
    *
    * Honest scale note: sign-LSH selectivity is weak at LOW thresholds —
    * at cos 0.4 over near-isotropic noise (ρ = ln p1/ln p2 ≈ 0.66) most
    * pairs still collide in some band, so the win over all-pairs is the
    * *shape* (shuffled equi-join that partitions by key, no driver/broadcast
    * bottleneck), not the candidate count. At realistic near-dup thresholds
    * (≥ 0.8) the same plan prunes candidates by orders of magnitude.
    *
    * Multi-probe is QUERY-DIRECTED (Lv et al., VLDB 2007): instead of all
    * `Σ C(r,k)` = 37 XOR masks per (id, band) — the round-4 bench
    * regression, a 37× probe-relation blow-up — each row probes only
    * subsets of its `probePlanes` lowest-|margin| planes (22 keys at the
    * defaults). A sign bit differs between two near vectors only where a
    * projection crosses 0, so flips concentrate on low-|margin| planes.
    * Measured on the testdata at cos 0.4 — whose matching pairs sit right
    * AT the decision boundary (cos ∈ [0.40, 0.60]), the adversarial case
    * for any LSH — the recall ladder vs blind 37-key probing at sf0.1
    * (932 true pairs) is: probePlanes 4 → 24 missed, 5 → 6, 6/7/8 → 0,
    * with 6 also exact at sf0.001 and sf0.01. The default 6 takes the
    * 1.7× join-input cut that costs nothing measured; only
    * probePlanes = planesPerBand (blind) carries the analytic
    * 1-(1-P(Binom(r,θ/π) ≤ probeBits))^b guarantee, so callers wanting
    * worst-case boundary recall should raise it back to r. probeBits=0
    * degenerates to the plain banded self-join (no probing; misses ~60%
    * of boundary pairs on the same data — do not lower it for speed,
    * lower probePlanes instead).
    *
    * PARAMETER DEFAULTS ARE AUTO-RESOLVED ([[resolveLshParams]]): at
    * near-dup thresholds (≥ [[NearDupThreshold]]) the band width is sized
    * to the corpus count ([[planesForCorpus]] — the non-quadratic path a
    * first-time user at 10 M vectors must land on) and probing narrows to
    * 1 bit / ≤4 planes; at boundary thresholds the tuned measured-exact
    * 8 planes / 2 bits / 6 probe-planes apply unchanged. Pass explicit
    * values to pin any of the three.
    */
  /** Band width (planes per band) sized to the corpus: sign-LSH buckets
    * number `2^r` per band, so expected occupancy is `n / 2^r` — and the
    * banded self-join does occupancy² work per bucket. Holding r fixed
    * while n grows is therefore QUADRATIC: measured on planted-pair
    * corpora (cos ≈ 0.99 dups, isotropic rest), r=8 takes 36 s at n=10k
    * and 73 s at n=20k, while r=14 (expected occupancy ≈ 1) takes under
    * 2 s at n=20k with identical 100% planted recall. This rule keeps
    * expected occupancy ≤ `targetPerBucket`
    * (r = ⌈log2(n / targetPerBucket)⌉, floored at the tuned small-corpus
    * default of 8).
    *
    * Safe for true NEAR-DUP thresholds (≥ ~0.8), where per-plane flip
    * probability θ/π is small enough that wider bands keep their recall
    * (verify empirically via planted pairs — `graft.ScaleSmoke` does).
    * Boundary-threshold mining (cos ~0.4) at large n is the one regime
    * wider bands cannot serve: there you hold r and raise `bands`, paying
    * candidates for recall — see the scaladoc above.
    */
  def planesForCorpus(n: Long, targetPerBucket: Int = 2): Int = {
    require(n > 0 && targetPerBucket > 0)
    val buckets = math.max(1L, n / targetPerBucket)
    math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1))
  }

  /** Similarity at/above which a pair is a true NEAR-DUPLICATE for sign-LSH
    * purposes: per-plane flip probability θ/π ≤ arccos(0.8)/π ≈ 0.205, low
    * enough that corpus-sized band widening ([[planesForCorpus]]) and
    * narrow probing hold their recall (verified on planted pairs by
    * `graft.ScaleSmoke`). Below it — similarity MINING near the decision
    * boundary — the auto policy keeps the tuned small-band/wide-probe
    * defaults whose exactness the sf oracles assert.
    */
  val NearDupThreshold = 0.8

  /** Per-band catch probability for a pair at cosine `c` under `r` planes:
    * exact band match `(1-θ/π)^r`, plus — when 1-bit probing is on — the
    * single-flip term `r·p·(1-p)^(r-1)` at probe coverage 0.6 (a sign
    * flip happens where a projection crosses 0, so query-directed probing
    * of the lowest-|margin| planes catches most single flips). The 0.6
    * is CONSERVATIVE at the guarantee point (`threshold +
    * [[AutoBandRecallGap]]`, the only place [[bandsForRecall]] evaluates
    * this): ScaleSmoke's recall stage measured effective coverage
    * 0.68 at r = 17 (cos 0.90, n = 200 k) and 0.63 at r = 19 (cos 0.90,
    * n = 1 M) — coverage decays as r grows because ≤4 probed planes cover
    * a shrinking fraction of flip mass — so 0.6 keeps the sized band
    * count honest through the corpus range the auto policy targets.
    * Deeper in the gap flips happen at larger margins and effective
    * coverage decays further (~0.5 measured at cos 0.82), so IN-GAP
    * predictions still run mildly optimistic; that only affects the
    * best-effort reporting, never the sizing.
    */
  private[graft] def bandCatchProb(c: Double, r: Int, probeBits: Int,
                                   probePlanes: Int): Double = {
    val p = math.acos(math.max(-1.0, math.min(1.0, c))) / math.Pi
    val exact = math.pow(1 - p, r)
    if (probeBits < 1 || probePlanes < 1) exact
    else exact + 0.6 * r * p * math.pow(1 - p, r - 1)
  }

  /** The auto band-count recall contract: a pair at
    * `cos ≥ threshold + AutoBandRecallGap` is missed with probability
    * ≤ [[AutoBandMissTarget]] under [[bandCatchProb]]'s conservative
    * model. Pairs INSIDE the gap `[threshold, threshold+0.1)` get
    * best-effort recall that decays toward the threshold — the honest
    * price of corpus-sized bands; covering the gap exactly at large n
    * costs n^ρ bands (ρ ≈ 0.33 at 0.8), which no default should impose.
    * Callers needing exact near-threshold coverage pin `planesPerBand=8,
    * probeBits=2, probePlanes=6` (the measured-exact boundary config) and
    * pay its quadratic candidate growth, or raise `bands` explicitly.
    */
  val AutoBandRecallGap = 0.1
  val AutoBandMissTarget = 1e-3
  /** Cap on auto bands: past it (very large n at threshold 0.8) the
    * guarantee point's miss bound relaxes gracefully rather than the key
    * volume exploding; near-identity pairs (cos ≥ 0.95) stay safe far
    * beyond the cap.
    */
  val MaxAutoBands = 64

  /** Bands needed so a pair at the guarantee point (`threshold +
    * AutoBandRecallGap`) is missed with probability ≤ AutoBandMissTarget:
    * `b = ln(1/miss) / -ln(1 - q)` with q from [[bandCatchProb]].
    * Floored at the tuned 16, capped at [[MaxAutoBands]].
    */
  private[graft] def bandsForRecall(threshold: Double, r: Int, probeBits: Int,
                                    probePlanes: Int): Int = {
    val q = bandCatchProb(math.min(threshold + AutoBandRecallGap, 0.999),
      r, probeBits, probePlanes)
    val b = math.ceil(math.log(1.0 / AutoBandMissTarget) / -math.log1p(-q)).toInt
    math.min(MaxAutoBands, math.max(16, b))
  }

  /** Resolve the auto LSH parameters (sentinels: `planesPerBand = 0`,
    * `bands = 0`, `probeBits = -1`, `probePlanes = -1`) into concrete
    * values:
    *
    *  - band width: caller's, else [[planesForCorpus]] of the (lazily
    *    counted) corpus at near-dup thresholds — the occupancy law that is
    *    the difference between <2 s and 73 s at a mere 20 k vectors — and
    *    the tuned floor of 8 at boundary thresholds, where wider bands
    *    would trade recall for speed (see [[planesForCorpus]]).
    *  - band count: caller's, else [[bandsForRecall]] at near-dup
    *    thresholds — wider bands lower each band's catch probability for
    *    pairs NEAR the threshold (corpus sizing alone would silently
    *    trade near-threshold recall for speed as n grows: at n = 1 M,
    *    r = 19, a cos-0.82 pair would be missed ~24% of the time by 16
    *    bands), so the count grows with the width to hold the
    *    [[AutoBandRecallGap]] contract; the tuned 16 at boundary
    *    thresholds, whose recall the probing config carries.
    *  - probe width: threshold-aware. At near-dup thresholds flips are
    *    rare (θ/π ≤ 0.205) and concentrated on low-|margin| planes, so
    *    1 bit over ≤4 planes (5 keys/band) suffices; at boundary
    *    thresholds keep the measured-exact 2 bits over ≤6 planes
    *    (22 keys/band). Explicit probePlanes is clamped to the band width
    *    so a narrow-band caller never trips the invariant opaquely.
    */
  private[graft] def resolveLshParams(threshold: Double, n: => Long,
                                      planesPerBand: Int, bands: Int,
                                      probeBits: Int,
                                      probePlanes: Int): (Int, Int, Int, Int) = {
    val nearDup = threshold >= NearDupThreshold
    val r = if (planesPerBand > 0) planesPerBand
            else if (nearDup) planesForCorpus(n)
            else 8
    val pb = if (probeBits >= 0) probeBits else if (nearDup) 1 else 2
    val pp = if (probePlanes > 0) math.min(probePlanes, r)
             else math.min(if (nearDup) 4 else 6, r)
    val b = if (bands > 0) bands
            else if (nearDup) bandsForRecall(threshold, r, pb, pp)
            else 16
    require(pb <= pp && pp <= r,
      s"probeBits ($pb) <= probePlanes ($pp) <= planesPerBand ($r)")
    (r, b, pb, pp)
  }

  /** Default int8-prefilter margin at near-dup thresholds: the measured
    * quantization drift over random 64-dim vectors is ≤ 0.06
    * (KernelPropertySpec), so 0.1 holds real guard band — but the bound is
    * empirical, which is why the auto policy engages it only where the
    * margin fits under the threshold comfortably (≥ [[NearDupThreshold]]).
    */
  val DefaultI8PrefilterMargin = 0.1

  /** `prefilterMargin`: verify candidates in two stages — an int8-quantized
    * cosine prefilter at `threshold - m`, then exact float cosine on the
    * survivors. The candidate relation then ships 1-byte-per-dim payloads
    * (4× less verify shuffle) and most random band collisions die on the
    * integer path; the emitted pairs and their `cos` values still come
    * from the exact float kernel, so the OUTPUT is unchanged as long as
    * quantization error stays below `m`.
    *
    * AUTO by default (sentinel `-1`): at near-dup thresholds
    * (≥ [[NearDupThreshold]]) the prefilter engages with
    * [[DefaultI8PrefilterMargin]] — measured drift ≤ 0.06 sits well under
    * the 0.1 margin, and at 1 M rows the prefilter is the difference
    * between 529 s and 250 s with equal output; below the near-dup
    * threshold the margin would eat most of the threshold itself (the
    * drift bound is empirical, unlike the MinHash prefilter's Hoeffding
    * bound), so the single-stage exact path runs — which keeps every
    * boundary-threshold (0.4) oracle on the exact path. Pass an explicit
    * margin to force the two-stage shape, or any value ≥ `threshold` to
    * force exact.
    *
    * The verify stage reads PRECOMPUTED per-vector norms from the cached
    * sketch relation: cosine over a candidate pair is then one dot product
    * and a scalar divide (`dot / (nrm_a · nrm_b)`) — bit-identical to the
    * fused cosine kernel (independent accumulators; see
    * [[graft.functions.L2Norm]]) at a third of the per-candidate flops.
    */
  def embeddingDupPairs(embs: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planesPerBand: Int = 0,
                        bands: Int = 0, probeBits: Int = -1,
                        probePlanes: Int = -1,
                        prefilterMargin: Double = -1.0)
                       (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    import graft.functions.{cosine_i8, dot_product, hyperplane_probes, i8_quantize, l2_norm}
    // auto defaults (see resolveLshParams): corpus-sized band width,
    // recall-holding band count, and threshold-aware probe width at
    // near-dup thresholds; the tuned measured-exact 8/16/2/6 at boundary
    // thresholds. The count is one cheap metadata-level agg, evaluated
    // only when the band width needs it.
    val (r, nBands, pBits, pPlanes) =
      resolveLshParams(threshold, embs.count(), planesPerBand, bands,
        probeBits, probePlanes)

    // cached: read by the probe explode, the exact side, and the verify join.
    // pk holds per-band [key, probe keys…] from ONE codegen'd kernel pass;
    // nrm is the vector's norm, computed once here instead of twice per
    // verified candidate.
    val sk = scope.own(embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(embs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("pk",
        hyperplane_probes(col("v"), r, nBands, pBits, pPlanes))
      .withColumn("nrm", l2_norm(col("v"))))

    // skinny (id, band, key) relations — no vector payloads cross the shuffle
    val exploded = sk.select(col("id"), posexplode(col("pk")).as(Seq("band", "keys")))
    val banded = exploded.select(col("id"), col("band"),
      element_at(col("keys"), 1).as("key"))
    val probes =
      if (pBits == 0) banded
      else exploded.select(col("id"), col("band"), explode(col("keys")).as("key"))

    val candidates = probes.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val margin =
      if (prefilterMargin < 0)
        (if (threshold >= NearDupThreshold) DefaultI8PrefilterMargin
         else threshold) // sentinel below near-dup: cut ≤ 0 → exact path
      else prefilterMargin
    val toVerify =
      if (threshold - margin <= 0) candidates
      else {
        val qv = scope.own(sk.select(col("id"), i8_quantize(col("v")).as("qv")))
        candidates
          .join(qv.select(col("id").as("id_a"), col("qv").as("q_a")), "id_a")
          .join(qv.select(col("id").as("id_b"), col("qv").as("q_b")), "id_b")
          .filter(cosine_i8(col("q_a"), col("q_b")) >= threshold - margin)
          .select(col("id_a"), col("id_b"))
      }

    val denom = col("nrm_a") * col("nrm_b")
    toVerify
      .join(sk.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(sk.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("nrm_b")), "id_b")
      .withColumn("cos", round(
        when(denom === 0.0, 0.0)
          .otherwise(dot_product(col("v_a"), col("v_b")) / denom), 3))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Near-dup CLUSTERS from a pair list: connected components over the
    * similarity graph, labeled by each component's minimum doc id — the end
    * product of a dedup pipeline ("which docs are the same, which one do we
    * keep"). Returns `(id, cluster)` for every id in `allIds`; singletons
    * label themselves.
    *
    * Algorithm: min-label propagation with pointer doubling — each round
    * takes the min of (own label, neighbors' labels, label-of-own-label).
    * The last term is the path-halving shortcut: label chains collapse
    * geometrically, so rounds are O(log longest-chain) instead of
    * O(longest-chain) — a 100-link chain (pathological boilerplate corpus)
    * converges in ~8 rounds, not ~100 (asserted in DedupSpec). The
    * shortcut is sound because every label IS a node id of the same
    * component (labels start as ids and only min-combine), so `lbl(lbl)`
    * is always defined and component-internal.
    *
    * The shortcut runs as a DEDICATED `labels ⋈ labels` join, engaged only
    * from round 3. Both alternatives were measured at sf0.1 (same verified
    * pair list, alternating samples in one JVM): folding the shortcut into
    * the neighbor-min join as `lbl → id` pseudo-edges is ~1.7× SLOWER —
    * the per-round `edges ∪ labelEdges` union rebuilds and reshuffles the
    * plan around the big static edge relation, which dwarfs what it saves,
    * while the dedicated join only shuffles the labels relation (edge-
    * touched ids — orders of magnitude smaller than edges). Gating it on
    * round ≥ 3 removes it where it provably cannot help: rounds 1–2 of
    * plain propagation already deliver labels from distance ≤ 2, which is
    * all a shortcut could offer that early, so shallow similarity graphs
    * (the common corpus) never pay the extra join at all and deep chains
    * keep O(log) convergence (64-link chain in ≤ 10 rounds, asserted).
    * `localCheckpoint` every round truncates the iterative lineage (else
    * round N replans N joins deep).
    */
  def dupClusters(pairs: DataFrame, allIds: DataFrame, idCol: String,
                  maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    try {
      // only edge-touched ids can ever change label — iterate over THOSE
      // (O(edges) per round), and attach untouched singletons at the end
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
        .localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        val neighborMin = edges
          .join(labels.select(col("id").as("src"), col("lbl").as("nlbl")), "src")
          .groupBy(col("dst").as("id")).agg(min("nlbl").as("nmin"))
        // pointer-doubling shortcut (see scaladoc): a tiny labels⋈labels
        // join, and only once plain propagation has exhausted distance ≤ 2
        val withShortcut =
          if (iter < 2)
            labels.withColumnRenamed("lbl", "old")
              .join(neighborMin, Seq("id"), "left")
              .select(col("id"),
                least(col("old"), coalesce(col("nmin"), col("old"))).as("lbl"),
                col("old"))
          else {
            val shortcut = labels
              .join(labels.select(col("id").as("lbl"), col("lbl").as("slbl")), "lbl")
              .select(col("id"), col("slbl"))
            labels.withColumnRenamed("lbl", "old")
              .join(neighborMin, Seq("id"), "left")
              .join(shortcut, Seq("id"), "left")
              .select(col("id"),
                least(col("old"), coalesce(col("nmin"), col("old")),
                  coalesce(col("slbl"), col("old"))).as("lbl"),
                col("old"))
          }
        // carry the previous label through the checkpoint: the fixpoint
        // check is then a filter over materialized rows, not a second join
        val next = withShortcut.localCheckpoint(true)
        converged = next.filter(col("lbl") =!= col("old")).isEmpty
        labels = next.drop("old")
        iter += 1
      }
      // silently returning un-converged labels would hand the caller WRONG
      // clusters (and diverge from the oracle's exact closure) — fail loud
      if (!converged)
        throw new IllegalStateException(
          s"dupClusters: min-label propagation did not converge within " +
            s"$maxIters rounds (a component's min-label chain is longer); " +
            s"raise maxIters")
      allIds.select(col(idCol).as("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster"))
    } finally edges.unpersist()
  }

  /** Incrementally fold a DELTA's near-dup pairs into an existing cluster
    * labeling — the rolling-ingest shape ([[MinHashIndex]]'s probe emits
    * exactly these delta pairs): an `(id, cluster)` labeling is a
    * spanning forest of the resident pair graph (every id one edge to its
    * root), so connected components over `labeling-as-edges ∪ deltaPairs`
    * EQUAL components over the full re-derived pair graph — O(resident
    * ids + delta pairs) edges, never a corpus re-scan — and min-id
    * representatives are preserved (the min of a merged component is the
    * min over its parts). Equality with the from-scratch labeling is
    * spec-pinned and driver-proven (`ns_dedup_clusters_merge` shares the
    * full-recompute oracle).
    */
  def mergeClusters(labels: DataFrame, deltaPairs: DataFrame,
                    allIds: DataFrame, idCol: String): DataFrame = {
    val labelEdges = labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("id_a"), col("cluster").as("id_b"))
    dupClusters(labelEdges.unionByName(
      deltaPairs.select(col("id_a"), col("id_b"))), allIds, idCol)
  }

  /** Reference all-pairs definition of [[embeddingDupPairs]] — O(N²); used
    * by specs to assert the banded operator's output is identical.
    */
  def embeddingDupPairsExact(embs: DataFrame, idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    import graft.functions.cosine_similarity
    val a = embs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = embs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine_similarity(col("v_a"), col("v_b")), 3))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
