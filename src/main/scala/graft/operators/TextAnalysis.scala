package graft.operators

import org.apache.spark.sql.DataFrame
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
    val toks = TextOps.tokens(col(textCol))
    val stops = array(TextOps.EnStopwords.map(lit): _*)
    val enRatio = size(filter(toks, t => array_contains(stops, t))).cast("double") /
      size(toks).cast("double")
    docs.select(col(idCol), round(enRatio, 4).as("en_ratio"),
      when(enRatio >= 0.10, "en").otherwise("other").as("lang_pred"))
  }

  /** Quality metrics + a composite score per document. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val nChars = length(col(textCol))
    val nTokens = size(toks)
    val avgTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nTokens.cast("double")
    val stops = array(TextOps.EnStopwords.map(lit): _*)
    val stopRatio = size(filter(toks, t => array_contains(stops, t))).cast("double") /
      nTokens.cast("double")
    val punctRatio =
      (nChars - length(regexp_replace(col(textCol), "[^a-z0-9 ]", ""))).cast("double") /
        nChars.cast("double")
    // Length-normalized composite: long docs with real words and few
    // symbols score high.
    val score = least(lit(1.0), nTokens.cast("double") / lit(100.0)) * lit(0.5) +
      (lit(1.0) - punctRatio) * lit(0.3) + stopRatio * lit(0.2)
    docs.select(col(idCol), nChars.as("n_chars"), nTokens.as("n_tokens"),
      round(avgTokLen, 4).as("avg_token_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(score, 4).as("quality_score"))
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
    val nToks = size(toks)
    // bigram list WITH duplicates (word_shingles is distinct by design)
    val bigrams = transform(sequence(lit(1), nToks - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val counts = transform(array_distinct(bigrams),
      b => size(filter(bigrams, x => x === b)))
    val dupWordFrac = lit(1.0) -
      size(array_distinct(toks)).cast("double") / nToks.cast("double")
    val topShare = array_max(counts).cast("double") / size(bigrams).cast("double")
    docs.select(col(idCol),
      round(dupWordFrac, 4).as("dup_word_frac"),
      round(topShare, 4).as("top_bigram_share"))
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
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = lower(col(textCol))
    val n = length(s)
    // split on "" emits a trailing "" (regex split, limit -1) — drop it
    val chars = filter(split(s, ""), c => c =!= lit(""))
    val sortedDistinct = array_sort(array_distinct(chars))
    val sumPLnP = aggregate(sortedDistinct, lit(0.0),
      (acc, ch) => {
        val p = size(filter(chars, x => x === ch)).cast("double") / n.cast("double")
        acc + p * log(p)
      })
    // 0 - x, not -x: a one-symbol doc sums to ±0.0 and unary minus would
    // emit -0.0, which is NOT value-equal to 0.0 once boxed/hashed
    docs.select(col(idCol), n.as("n_chars"),
      size(sortedDistinct).as("n_distinct_chars"),
      round((lit(0.0) - sumPLnP) / log(lit(2.0)), 4).as("char_entropy_bits"))
  }
}
