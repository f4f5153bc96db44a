package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{md5_lower64, rolling_hash}

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. Pure built-in
  * compositions (codegen'd, scan-pipelined — no shuffle at all), so they
  * stream at parquet-scan speed regardless of corpus size.
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, single non-space
    * symbols — Java-regex and RE2 compatible for oracle parity.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Language-ID heuristic: ratio of tokens in a small English marker set.
    * (n-gram/stopword heuristic — the classifier is the plumbing being
    * exercised; swap the marker table for real per-language profiles.)
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // staged token array — same one-split-per-row rationale as [[quality]]
    val stops = array(TextOps.EnStopwords.map(lit): _*)
    val enRatio = col("__ns").cast("double") / col("__nt").cast("double")
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__ltoks"))
      .select(col(idCol),
        size(filter(col("__ltoks"), t => array_contains(stops, t))).as("__ns"),
        size(col("__ltoks")).as("__nt"))
      .select(col(idCol), round(enRatio, 4).as("en_ratio"),
        when(enRatio >= 0.10, "en").otherwise("other").as("lang_pred"))
  }

  /** Quality metrics + a composite score per document.
    *
    * The composite `0.5·min(1, nt/100) + 0.3·(1−punct) + 0.2·stop` is
    * computed in EXACT int64 arithmetic, not doubles: as one rational
    * N/D (D = 200·nc·nt, N = min(100,nt)·nc·nt + 60·(nc−np)·nt +
    * 40·ns·nc) whose 4-decimal HALF_UP rounding is the integer
    * expression `(2·10⁴·N + D) div 2D`. The double formulation lands on
    * exact .5 ties (the weights and the /100 length term make 5-decimal
    * values structurally common — e.g. score 0.49125 at nt=32, sr=5/32)
    * where Spark's shortest-decimal-repr rounding and a decimal engine's
    * rounding diverge. Exact while 4·10⁶·nc·nt stays inside int64, i.e.
    * any document under ~1.5 M chars — chunk longer docs first
    * ([[chunks]]).
    */
  /** `extra`: additional output columns evaluated against the INPUT row
    * (e.g. a domain column, or a fingerprint over the text) and carried
    * through the staged projections — so consumers that need
    * (signal, other-column) pairs get them from the ONE text scan
    * instead of re-scanning the corpus and equi-joining on id (the r17
    * shape paid a full self-join shuffle per signal table; guide §2.4).
    */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              extra: Seq[(String, Column)] = Nil): DataFrame = {
    // r18 optimization (guide §4: per-task work): LAYERED projections.
    // The single-select form inlined `split(lower(trim(text)))` into
    // every consumer — six re-splits per row — and the higher-order
    // functions (aggregate/filter) are CodegenFallback, so the whole
    // Project ran interpreted with zero common-subexpression
    // elimination. Staging the token array in its own projection makes
    // it a per-row attribute; CollapseProject will not re-inline a
    // non-cheap expression referenced more than once, so the split runs
    // exactly once per row (measured 1.93 s → 0.83 s at sf0.1,
    // bit-equal output). The arithmetic below is UNCHANGED — same
    // expressions over the staged stats, same exact-int64 rounding.
    val stops = array(TextOps.EnStopwords.map(lit): _*)
    val carry = extra.map { case (n, _) => col(n) }
    val staged = docs
      .select(Seq(col(idCol), col(textCol).as("__qtext"),
        TextOps.tokens(col(textCol)).as("__qtoks")) ++
        extra.map { case (n, c) => c.as(n) }: _*)
      .select(Seq(col(idCol),
        length(col("__qtext")).as("__nc"),
        size(col("__qtoks")).as("__nt"),
        aggregate(col("__qtoks"), lit(0L), (acc, t) => acc + length(t))
          .as("__tls"),
        size(filter(col("__qtoks"), t => array_contains(stops, t)))
          .as("__ns"),
        (length(col("__qtext")) -
          length(regexp_replace(col("__qtext"), "[^a-z0-9 ]", "")))
          .as("__np")) ++ carry: _*)
    // Length-normalized composite: long docs with real words and few
    // symbols score high. Exact int64 rounding (see scaladoc).
    val ncL = col("__nc").cast("long")
    val ntL = col("__nt").cast("long")
    val num = least(lit(100L), ntL) * ncL * ntL +
      lit(60L) * (ncL - col("__np").cast("long")) * ntL +
      lit(40L) * col("__ns").cast("long") * ncL
    val den = lit(200L) * ncL * ntL
    val a = lit(20000L) * num + den
    val b = lit(2L) * den
    // exact integer division: pmod is exact on longs, and the quotient
    // (≤ 10⁴) divides to a bit-exact double
    val score4 = when(ntL > 0 && ncL > 0, (a - pmod(a, b)) / b)
      .otherwise(lit(0.0))
    staged.select(Seq(col(idCol), col("__nc").as("n_chars"),
      col("__nt").as("n_tokens"),
      round(col("__tls").cast("double") / col("__nt").cast("double"), 4)
        .as("avg_token_len"),
      round(col("__ns").cast("double") / col("__nt").cast("double"), 4)
        .as("stopword_ratio"),
      round(col("__np").cast("double") / col("__nc").cast("double"), 4)
        .as("punct_ratio"),
      (score4 / 10000.0).as("quality_score")) ++ carry: _*)
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit(BpePattern), lit(0)))
        .as("bpe_tokens"))

  /** Document fingerprints: md5 hex of normalized text (exact-dup key),
    * the DuckDB-checkable md5-lower-64 numeric form, and the engine's
    * rolling hash (not oracle-checkable; covered by unit tests).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = TextOps.normalized(col(textCol))
    docs.select(col(idCol), md5(norm).as("fp_md5"),
      md5_lower64(norm).as("fp_md5_64"), rolling_hash(norm).as("fp_rolling"))
  }

  /** PII span patterns — written without shorthand classes so the Java and
    * RE2 dialects agree byte-for-byte (oracle parity).
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  /** PII scrubbing before training: replace email/phone-shaped spans with
    * typed placeholder tokens, and count the spans found. Pure codegen'd
    * projection — no shuffle, streams at scan speed.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))
        .as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("redacted"))

  /** Repetition signals (Gopher-style quality filters): fraction of
    * duplicate words, and the share of the most frequent bigram in all
    * bigram occurrences. Pure per-row HOF compute — zero shuffle; the
    * per-doc bigram mode is O(distinct·total) within one row, bounded by
    * document length, never by corpus size.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // Materialize the token array FIRST (its own projection — split is
    // non-cheap, so CollapseProject leaves the boundary), THEN build the
    // bigram list from the bound column: `element_at(<split expr>, i)`
    // inside the transform lambda would re-run the whole split per
    // element (no CSE through higher-order functions — O(B·n) per doc,
    // still 11.6 s at sf0.1 after the first rewrite). Max bigram
    // multiplicity = longest equal-run of the SORTED array, O(B log B).
    // The original nested count
    // (`transform(array_distinct(bg), b => size(filter(bg, _ === b)))`)
    // additionally re-built the array per distinct bigram: 13.5 min at
    // sf0.1 in a full-column dump, phantom-fast under `count()` (Catalyst
    // prunes unevaluated projections).
    val bigrams = transform(sequence(lit(1), size(col("__t")) - 1),
      i => concat_ws(" ", element_at(col("__t"), i),
        element_at(col("__t"), i + 1)))
    docs.select(col(idCol), toks.as("__t"))
      .select(col(idCol), col("__t"), bigrams.as("__bg"))
      .select(col(idCol),
        round(lit(1.0) - size(array_distinct(col("__t"))).cast("double") /
          size(col("__t")).cast("double"), 4).as("dup_word_frac"),
        round(aggregate(array_sort(col("__bg")),
            struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
            (acc, x) => {
              val run = when(x === acc.getField("prev"),
                acc.getField("run") + 1).otherwise(lit(1))
              struct(x.as("prev"), run.as("run"),
                greatest(acc.getField("best"), run).as("best"))
            },
            acc => acc.getField("best")).cast("double") /
          size(col("__bg")).cast("double"), 4).as("top_bigram_share"))
  }

  /** Corpus-level top-k n-gram document-frequency table (boilerplate /
    * contamination detection): per-doc DISTINCT shingles (one codegen'd
    * pass) → one count shuffle with map-side partial aggregation → top-k
    * via TakeOrdered (no global sort). Total ordering (df desc, ngram asc)
    * makes the output deterministic.
    */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 2, k: Int = 20): DataFrame =
    docs.select(explode(graft.functions.word_shingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(k)

  /** EXACT corpus heavy hitters at a BOUNDED shuffle: every token with
    * count > N/(capacity+1), with its exact count — computed without ever
    * shuffling the distinct-token relation (which, under Zipf, is
    * corpus-sized for [[topNgrams]]'s exact group-by).
    *
    * Two passes, both capacity-bounded:
    *  1. one Misra–Gries sketch over the token stream
    *     ([[graft.functions.MgAgg]]) — per-task state and shuffle bytes
    *     capped at `capacity` counters; survivors are a GUARANTEED
    *     superset of the > N/(capacity+1) hitters (lossless prune), and
    *     the same pass counts N exactly;
    *  2. exact counts of the ≤ `capacity` candidates only — the corpus
    *     semi-joins the broadcast candidate set before the count shuffle,
    *     so the group-by moves candidate occurrences, not the tail.
    *
    * The output is therefore exact and data-deterministic (no sketch
    * estimate survives into it) — SQL-oracle-able even though the prune
    * is approximate.
    */
  def heavyHitters(docs: DataFrame, textCol: String,
                   capacity: Int = 256): DataFrame = {
    import graft.functions.{mg_agg, mg_items}
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val sketch = toks.agg(
      mg_agg(col("tok"), capacity).as("sk"),
      count(lit(1)).as("n"))
    val cands = sketch.select(col("n"),
        explode(mg_items(col("sk"))).as("it"))
      .select(col("it.item").as("tok"), col("n"))
    toks.join(broadcast(cands), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"), first(col("n")).as("n"))
      .filter(col("cnt") > col("n") / (capacity + 1.0))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Character-level Shannon entropy per document (low entropy = repetitive
    * / machine-generated text, high = random noise — both filter targets).
    * Zero-shuffle per-row HOF compute like [[repetition]]; the per-char
    * frequency scan is O(distinct·len) within one row.
    *
    * Cross-engine determinism: probabilities are exact integer ratios, and
    * the sum runs over the SORTED distinct characters on both engines
    * (binary collation both sides), so term order — the only source of
    * floating-point divergence in a sum — is pinned. log is natural log on
    * both engines (log2 in Spark is ln/ln2 with a different rounding than
    * DuckDB's native log2; dividing by ln 2 once, after the sum, keeps the
    * arithmetic identical).
    */
  /** Duplicated-span detection — the SPAN-level dedup pass of an LLM data
    * pipeline (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022), rendered at token-k-gram granularity:
    * suffix arrays don't distribute, positional k-gram fingerprints do.
    * A span is k consecutive tokens; it is DUPLICATED when its fingerprint
    * occurs at least twice corpus-wide (cross-document boilerplate AND
    * within-document self-repetition both count, as in the paper's
    * masking rule). Returns per-doc coverage: how many token positions sit
    * under ≥1 duplicated span — the "fraction of my text is boilerplate"
    * signal curation thresholds on.
    *
    * Plan shape at 100 TB: posexplode to (id, pos, token) — L rows per doc
    * but SKINNY; ONE id-partitioned window builds positional k-grams via
    * `lead` (no per-position array slicing); one hash-shuffle groupBy on
    * the fingerprint finds multiply-occurring spans (map-side combinable
    * count, no distinct); an equi-join brings them back; the per-doc
    * interval union is one more id-window (running max of span ends), not
    * a UDF. Join fan-out on a hot fingerprint is proportional to its real
    * occurrence count — output-sized, never quadratic.
    */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 5): DataFrame = {
    require(k >= 2, "a 1-token span is just a token count")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
      .select(col("id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
    val wn = Window.partitionBy("id").orderBy("pos")
    val gram = concat_ws(" ",
      col("w") +: (1 until k).map(j => lead(col("w"), j).over(wn)): _*)
    val spans = toks
      .select(col("id"), col("n_tokens"), posexplode(col("t")).as(Seq("pos", "w")))
      .withColumn("fp", md5(gram))
      .filter(col("pos") <= col("n_tokens") - k) // complete k-grams only (pos 0-based)
      .select(col("id"), col("pos"), col("fp"))
    val dupFp = spans.groupBy("fp").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("fp")
    // interval union: clip each span's start to the running max end of the
    // doc's preceding spans, so overlaps aren't double-counted
    val prevEnd = max(col("pos") + k)
      .over(Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1))
    val covered = spans.join(dupFp, "fp")
      .withColumn("clip", greatest(col("pos"), coalesce(prevEnd, col("pos"))))
      .groupBy("id").agg(count(lit(1)).as("n_dup_spans"),
        sum(greatest(lit(0L), col("pos") + k - col("clip"))).as("covered"))
    toks.select(col("id"), col("n_tokens"),
        greatest(lit(0L), col("n_tokens") - (k - 1)).as("n_spans"))
      .join(covered, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(coalesce(col("covered"), lit(0L)).cast("double") /
            col("n_tokens"), 4)).as("dup_token_frac"))
  }

  /** Duplicated-span REMOVAL — the transform counterpart of
    * [[duplicatedSpanStats]]: emit each document with every token that sits
    * under a ≥2-occurrence k-gram span stripped (the masking rule of Lee et
    * al. 2022 applied as a curation rewrite; the stats operator only
    * measures the coverage this one removes). Returns
    * `(doc_id, n_tokens, kept_tokens, clean_text)` for every input doc —
    * fully-duplicated docs survive as empty strings so downstream length
    * filters, not silent row loss, decide their fate.
    *
    * Plan shape at 100 TB, on top of the stats operator's: duplicated span
    * STARTS explode into their k covered positions (fan-out k× on dup spans
    * only, output-sized), distinct, then one anti-join removes covered
    * tokens and a per-doc sort-rebuild (`array_sort` on (pos, token)
    * structs — deterministic, no collect_list ordering hazard) re-joins the
    * survivors. All shuffles keyed on doc id or fingerprint; nothing
    * quadratic, nothing driver-side.
    */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 5): DataFrame = {
    require(k >= 2, "a 1-token span is just a token count")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
      .select(col("id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
    val wn = Window.partitionBy("id").orderBy("pos")
    val gram = concat_ws(" ",
      col("w") +: (1 until k).map(j => lead(col("w"), j).over(wn)): _*)
    val tok = toks
      .select(col("id"), col("n_tokens"), posexplode(col("t")).as(Seq("pos", "w")))
    val spans = tok
      .withColumn("fp", md5(gram))
      .filter(col("pos") <= col("n_tokens") - k)
      .select(col("id"), col("pos"), col("fp"))
    val dupFp = spans.groupBy("fp").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("fp")
    val covered = spans.join(dupFp, "fp")
      .select(col("id"), explode(sequence(col("pos"), col("pos") + k - 1)).as("pos"))
      .distinct()
    val kept = tok.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("clean_text"))
    toks.select(col("id"), col("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-fitted bigram language-model score per document — the
    * perplexity-style quality filter of web-corpus pipelines (CCNet /
    * Gopher): fit add-k-smoothed bigram statistics on the corpus itself,
    * then score each document by its mean bigram log-probability.
    * Documents whose word transitions are improbable under the corpus's
    * own statistics (noise, wrong-domain contamination) score low;
    * degenerate boilerplate scores anomalously high — both tails are
    * filter targets.
    *
    * Determinism (the oracle hash-matches DuckDB): each bigram's `ln p`
    * is rounded to 6 decimals first, the per-document sum runs in token-
    * position order (array_sort of position-tagged values, then a
    * sequential fold), and the mean is rounded to 4 — float addition
    * order is pinned on both engines.
    *
    * Scale shape: the model is two hash aggregates over the exploded
    * bigram relation plus a 1-row vocabulary count; scoring is an
    * equi-join keyed on the bigram; the only per-document state is the
    * collected (pos, lnp) list, bounded by document length.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                    smoothK: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wn = Window.partitionBy("id").orderBy("pos")
    val toks = docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
    val pos = toks.select(col("id"), posexplode(col("t")).as(Seq("pos", "w")))
    val big = pos
      .withColumn("w2", lead(col("w"), 1).over(wn))
      .filter(col("w2").isNotNull)
    val c12 = big.groupBy("w", "w2").agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = pos.agg(countDistinct(col("w")).cast("double").as("v"))

    val lnp = round(log((col("c12") + smoothK) / (col("c1") + lit(smoothK) * col("v"))), 6)
    val scored = big
      .join(c12, Seq("w", "w2")).join(c1, Seq("w"))
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("pos"), lnp.as("lnp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lnp")))),
              s => s.getField("lnp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)), 4).as("avg_logprob"))

    docs.select(col(idCol).as("doc_id"))
      .join(scored.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Trigram language-model score with STUPID BACKOFF (Brants et al.
    * 2007, "Large Language Models in Machine Translation") — the
    * cross-domain rendering of [[bigramLogProb]]: fit n-gram counts on a
    * TRAIN corpus, score a (possibly disjoint) document set, so unseen
    * trigrams actually exercise the backoff chain (a self-fitted model
    * never backs off — every scored trigram exists in its own counts).
    *
    *   S(w₃|w₁w₂) = c₃/c₂                       if c(w₁w₂w₃) > 0
    *              = 0.4 · c(w₂w₃)/c(w₂)          else if c(w₂w₃) > 0
    *              = 0.4² · (c(w₃)+k)/(N+k·V)     otherwise (add-k floor,
    *                                             so OOV words never hit
    *                                             ln 0)
    *
    * Scores are relative frequencies, not normalized probabilities — the
    * standard large-corpus trade (no discount estimation pass).
    *
    * Determinism: every branch is exact integer ratios; `ln S` rounds to
    * 6 with the α factors INSIDE the ln (one mirrored expression per
    * branch), the per-document sum folds in token-position order, the
    * mean rounds to 4 — the [[bigramLogProb]] oracle conventions.
    *
    * Scale shape: the model is three hash aggregates over the train
    * corpus (trigram / bigram / unigram counts) plus a 1-row (N, V);
    * scoring left-joins the scored corpus's trigram stream against each
    * table keyed on its own n-gram — no broadcast assumption on the
    * model (trigram types grow with the corpus), every join keyed.
    */
  def trigramBackoff(train: DataFrame, docs: DataFrame, idCol: String,
                     textCol: String, alpha: Double = 0.4,
                     smoothK: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def stream(df: DataFrame): DataFrame = {
      val wn = Window.partitionBy("id").orderBy("pos")
      df.select(col(idCol).as("id"), posexplode(TextOps.tokens(col(textCol)))
          .as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(wn))
        .withColumn("w3", lead(col("w1"), 2).over(wn))
    }
    val tr = stream(train)
    val c3 = tr.filter(col("w3").isNotNull)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val c2 = tr.filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = tr.groupBy(col("w1").as("wu")).agg(count(lit(1)).as("c1"))
    val nv = tr.agg(count(lit(1)).cast("double").as("nn"),
      countDistinct(col("w1")).cast("double").as("v"))

    val sc = stream(docs).filter(col("w3").isNotNull)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2, Seq("w1", "w2"), "left")
      .join(c2.toDF("b1", "b2", "c2b"),
        col("w2") === col("b1") && col("w3") === col("b2"), "left")
      .join(c1.toDF("wu", "c1u"), col("w2") === col("wu"), "left")
      .join(c1.toDF("wv", "c1w3"), col("w3") === col("wv"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("lns", round(
        when(col("c3").isNotNull, log(col("c3") / col("c2")))
          .when(col("c2b").isNotNull,
            log(lit(alpha) * col("c2b") / col("c1u")))
          .otherwise(log(lit(alpha) * alpha *
            (coalesce(col("c1w3"), lit(0L)) + smoothK)
            / (col("nn") + lit(smoothK) * col("v")))), 6))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lns")))),
              s => s.getField("lns")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)), 4)
          .as("avg_logscore"))

    docs.select(col(idCol).as("doc_id"))
      .join(sc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logscore"), lit(0.0)).as("avg_logscore"))
  }

  /** BM25 ranked retrieval for a literal query-term list (Robertson &
    * Zaragoza 2009; Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)))
    * — the retrieval scoring a data pipeline uses for decontamination
    * triage and topic mining.
    *
    * Plan shape: per-term tf via codegen'd filters over the token array
    * (terms are a literal list — no explode, no per-term shuffle);
    * N/avgdl/df come from ONE tiny aggregate row broadcast back with a
    * crossJoin; top-k is orderBy+limit (TakeOrdered — parallel partial
    * top-k, no global sort); the rank window runs over the k survivors
    * only. Terms are summed in fixed list order and the score is rounded
    * before ranking, so ordering is deterministic cross-engine.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // staged token array — one split per row instead of 1 + |terms|
    // (same r18 rationale as [[quality]]; expressions unchanged)
    val toks = col("__btoks")
    val base = docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__btoks"))
      .select(Seq(col("doc_id"),
        size(toks).cast("long").as("dl")) ++
        terms.indices.map(i =>
          size(filter(toks, x => x === lit(terms(i)))).cast("double").as(s"tf$i")): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl") +:
        terms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).cast("double").as(s"df$i")): _*)
    bm25RankTail(
      base.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round(bm25ScoreCol(terms.length, k1, b), 4).as("score")),
      k)
  }

  /** The BM25 scoring expression over columns `n, avgdl, dl` and per-term
    * `tf$i`/`df$i` — ONE expression tree shared by the full-scan
    * [[bm25TopK]] and the partition-pruned [[Bm25Index]] probe, so their
    * pre-round doubles are bit-equal by construction (identical ops on
    * identical values, whether a column or an inlined literal supplies
    * them).
    */
  private[operators] def bm25ScoreCol(nTerms: Int, k1: Double,
                                      b: Double): Column =
    (0 until nTerms).map(i =>
      bm25TermContrib(col(s"tf$i"), col(s"df$i"), col("dl"),
        col("n"), col("avgdl"), k1, b)
    ).reduce(_ + _)

  /** ONE term's additive BM25 contribution — the same expression tree
    * whether the inputs arrive as pivoted per-term columns
    * ([[bm25ScoreCol]]) or as exploded posting rows
    * ([[Bm25Index.batchTopK]]); identical ops on identical doubles keep
    * every consumer bit-equal.
    */
  private[operators] def bm25TermContrib(tf: Column, df: Column, dl: Column,
                                         n: Column, avgdl: Column,
                                         k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
    (idf * (tf * lit(k1 + 1))) /
      (tf + lit(k1) * (lit(1 - b) + lit(b) * dl.cast("double") / avgdl))
  }

  /** Deterministic top-k + rank tail over `(doc_id, score)` — shared by
    * the scan and index paths (TakeOrdered, then the rank window over
    * only the k survivors).
    */
  private[operators] def bm25RankTail(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .orderBy("rank")
  }

  /** Fixed-size overlapping token chunks — the context-windowing step of
    * an embedding/RAG pipeline (a document too long for the encoder is
    * split into `chunkSize`-token windows at stride
    * `chunkSize - overlap`, the overlap preserving cross-boundary
    * context). Output one row per chunk: `(id, chunk_idx, n_tokens,
    * chunk_text)`; a document shorter than `chunkSize` yields exactly one
    * (short) chunk, and the final chunk may be short.
    *
    * Pure projection + explode over the token array — zero shuffle,
    * streams at scan speed at any corpus size; downstream embedding jobs
    * key on `(id, chunk_idx)`.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int = 128, overlap: Int = 32): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      // chunk count: 1 + ceil(max(0, n - chunkSize) / stride) — the first
      // window always exists; each further stride adds one
      .withColumn("__k", (lit(1) +
        ceil(greatest(col("__n") - chunkSize, lit(0)).cast("double") / stride))
        .cast("int"))
      .select(col(idCol),
        explode(sequence(lit(0), col("__k") - 1)).as("chunk_idx"),
        col("__t"), col("__n"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkSize), col("__n") - col("chunk_idx") * stride)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("__t"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Topic labels for document clusters — "what is in my corpus": per
    * cluster (≥ 2 members), the `topK` most DISTINCTIVE tokens by the
    * cluster-vs-corpus document-frequency ratio. Distinctiveness is
    * ranked in exact integers (`dfc·10⁶ div dfg`, ties to the smaller
    * token), so the report is bit-replicable in SQL. One distinct-token
    * explode (the corpus-sized pass), two bounded groupBys, a per-cluster
    * top-k window over cluster-token rows.
    *
    * `clusters` is an `(id, cluster)` labeling ([[Dedup.dupClusters]] /
    * the semantic cluster table); `dfc >= 2` filters singleton noise.
    */
  def clusterLabels(docs: DataFrame, idCol: String, textCol: String,
                    clusters: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val dfg = toks.groupBy("token").agg(count(lit(1)).as("dfg"))
    val sizes = clusters.groupBy("cluster").agg(count(lit(1)).as("members"))
      .filter(col("members") >= 2)
    val dfc = toks.join(clusters, Seq("id"))
      .join(broadcast(sizes), Seq("cluster"))
      .groupBy("cluster", "token").agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") >= 2)
    val scored = dfc.join(dfg, "token")
      .withColumn("score", expr("(dfc * 1000000) div dfg"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("cluster"), col("rank"), col("token"),
        col("dfc"), col("dfg"), col("score"))
  }

  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.char_entropy_stats
    // One JVM code-point pass per row (CharEntropyStats): counts into
    // ascending code-point order — the same sorted-unique sequence the
    // previous split→array_sort→struct-fold Catalyst shape visited, with
    // the same IEEE fold `acc + p·ln p`, so the result (and the oracle
    // hash) is bit-identical (equality spec-pinned against the old fold;
    // history: the original per-distinct-char re-split was 15.3 s at
    // sf0.1, the Catalyst fold ~3 s, this kernel sub-second).
    // 0 - x, not -x: a one-symbol doc sums to ±0.0 and unary minus would
    // emit -0.0, which is NOT value-equal to 0.0 once boxed/hashed.
    docs.select(col(idCol),
        char_entropy_stats(lower(col(textCol))).as("__st"))
      .select(col(idCol), col("__st.n").as("n_chars"),
        col("__st.n_distinct").as("n_distinct_chars"),
        round((lit(0.0) - col("__st.sum_plnp")) / log(lit(2.0)), 4)
          .as("char_entropy_bits"))
  }

  /** The pre-kernel Catalyst formulation of [[charEntropy]] — kept as the
    * equality REFERENCE the spec pins [[graft.functions.CharEntropyStats]]
    * against (split → array_sort → equal-run struct fold).
    */
  private[graft] def charEntropyFoldReference(docs: DataFrame, idCol: String,
                                              textCol: String): DataFrame = {
    val s = lower(col(textCol))
    // split on "" emits a trailing "" (regex split, limit -1) — drop it
    val chars = filter(split(s, ""), c => c =!= lit(""))
    val pre = docs.select(col(idCol), length(s).as("__n"),
      array_sort(chars).as("__sc"))
    def term(run: Column, acc: Column) = {
      val p = run.cast("double") / col("__n").cast("double")
      acc + p * log(p)
    }
    val sumPLnP = aggregate(col("__sc"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("s")),
      (acc, ch) => {
        val same = ch === acc.getField("prev")
        val closed = when(same || acc.getField("run") === 0L,
            acc.getField("s"))
          .otherwise(term(acc.getField("run"), acc.getField("s")))
        struct(ch.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          closed.as("s"))
      },
      acc => when(acc.getField("run") === 0L, acc.getField("s"))
        .otherwise(term(acc.getField("run"), acc.getField("s"))))
    pre.select(col(idCol), col("__n").as("n_chars"),
      size(array_distinct(col("__sc"))).as("n_distinct_chars"),
      round((lit(0.0) - sumPLnP) / log(lit(2.0)), 4).as("char_entropy_bits"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan '05) over the token
    * stream: a `depth × width` counter grid where token occurrences
    * increment cell `(i, h_i(tok) mod width)` for each of the `depth`
    * hash rows; a point estimate is the MIN over the term's `depth`
    * cells — never an underestimate, over by at most `ε·N` (ε = e/width)
    * with probability `1 − e^−depth`.
    *
    * Complements the Misra–Gries sketch behind [[heavyHitters]]: MG
    * answers "which items are frequent" (survivor set, bounded
    * candidates); the CMS answers "how frequent is THIS item" for any
    * item, including ones MG evicted — the shape retrieval mixing and
    * per-domain token-budget accounting need when the probe set isn't
    * known at build time.
    *
    * Scale posture: the grid is the WHOLE state — `depth·width` rows
    * regardless of corpus size, reached through one hash-agg whose
    * map-side partials are bounded by the same `depth·width` (the
    * standard sum-combinable sketch property). Grids over shards add
    * pointwise ([[countMinMerge]]), so shard profiles re-merge freely
    * like the KLL/MG/theta sketches. Hashes are `md5_lower64(tok#i)`
    * (DuckDB `md5_number_lower` compatible), so the grid AND every
    * estimate are integer-exact cross-engine.
    */
  def countMinGrid(docs: DataFrame, textCol: String, depth: Int = 4,
                   width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth outside [1,16], got $depth")
    require(width >= 2, s"need width >= 2, got $width")
    docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("tok"),
        explode(sequence(lit(0), lit(depth - 1))).as("row_i"))
      .select(col("row_i"),
        pmod(md5_lower64(concat(col("tok"), lit("#"),
            col("row_i").cast("string"))),
          lit(width.toLong)).cast("int").as("col_j"))
      .groupBy("row_i", "col_j").agg(count(lit(1)).as("cnt"))
  }

  /** Pointwise sum of two grids built with the same `(depth, width)` —
    * the shard-merge path. Cells absent from a grid are zero.
    */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row_i", "col_j").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `terms` against a grid: min over the
    * term's `depth` cells, absent cells = 0. The probe is a
    * `terms·depth`-row broadcast join against the grid — estimate cost
    * is probe-set-shaped, corpus-size-independent.
    */
  def countMinEstimate(grid: DataFrame, terms: Seq[String], depth: Int,
                       width: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one probe term")
    val spark = grid.sparkSession
    import spark.implicits._
    val probe = terms.toDF("term")
      .select(col("term"),
        explode(sequence(lit(0), lit(depth - 1))).as("row_i"))
      .select(col("term"), col("row_i"),
        pmod(md5_lower64(concat(col("term"), lit("#"),
            col("row_i").cast("string"))),
          lit(width.toLong)).cast("int").as("col_j"))
    // the GRID is the broadcast side: depth·width rows by construction,
    // while the probe set is the caller's (a right-outer with a broadcast
    // right side isn't plannable anyway — the hint would be dropped)
    probe.join(broadcast(grid), Seq("row_i", "col_j"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
