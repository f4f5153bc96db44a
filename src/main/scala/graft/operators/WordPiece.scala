package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016; the BERT-family inference
  * algorithm) — the greedy longest-match-first complement to the
  * merge-rank [[Bpe]] encoder, completing the two dominant subword
  * conventions. Training is out of scope (WordPiece training is BPE with
  * a likelihood objective; [[Bpe.learn]] covers the induction story);
  * this operator ENCODES against a given piece vocabulary, the common
  * production case of tokenizing with a published model's vocab.
  *
  * Scale shape: the vocabulary rides one torrent broadcast probed by the
  * codegen'd [[graft.functions.WordPieceEncode]] kernel — zero-shuffle,
  * per-row, scan-speed (the [[Bpe.encode]] dict-path contract).
  *
  * Verification: the greedy mechanics (longest-match preference,
  * continuation `##` pieces, whole-word UNK) are pinned by golden
  * HuggingFace-convention vectors and a serial-reference property in
  * WordPieceSpec; the `ns_text_wordpiece` query runs the char+whole-word
  * vocab regime, where greedy segmentation has a closed form (a word in
  * the vocab is 1 piece, otherwise 1 piece per character) that the
  * DuckDB oracle replicates exactly.
  */
object WordPiece {

  /** Encode tokenized text against `pieces` (a DataFrame with a `piece`
    * string column; continuations carry the `##` prefix). Returns
    * `(id, n_pieces, pieces)`; token-less docs are dropped (the
    * [[Bpe.encode]] parity convention).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             pieces: DataFrame, unk: String = "[UNK]"): DataFrame = {
    val entries = pieces.select(col("piece")).collect()
      .map(_.getString(0))
    val bc = docs.sparkSession.sparkContext.broadcast(entries)
    docs.select(col(idCol),
        graft.functions.wordpiece_encode(bc, unk,
          filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
          .as("pieces"))
      .filter(size(col("pieces")) > 0)
      .select(col(idCol), size(col("pieces")).as("n_pieces"), col("pieces"))
  }

  /** A char + whole-word vocabulary from the corpus itself: every single
    * character (as both a word-start piece and a `##` continuation) plus
    * the `topWords` most frequent tokens as whole pieces — the regime
    * where greedy segmentation has a closed form (vocab word → 1 piece,
    * else 1 piece per character), which the cross-engine oracle exploits.
    *
    * `prefixFree = true` additionally drops any top word that is a
    * PROPER PREFIX of some other corpus token. Without it the closed
    * form is wrong: a non-vocab word whose prefix IS a vocab word greedy-
    * matches that prefix first (e.g. top word `w12` inside `w1234` →
    * `[w12, ##3, ##4]`, 3 pieces, not 4) — the 1 M ScaleSmoke caught
    * exactly this, where sf0.01 had no prefix collisions by luck. The
    * filter is a broadcast non-equi anti-join of the small top-word set
    * against the distinct-token relation (verification-regime helper; a
    * general vocab keeps prefixes and drops the closed form).
    */
  def charWordVocab(docs: DataFrame, textCol: String, topWords: Int,
                    prefixFree: Boolean = false): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val words0 = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(topWords)
      .select("w")
    val words =
      if (!prefixFree) words0
      else {
        val others = toks.select(col("w").as("o")).distinct()
        words0.join(others,
          col("o") =!= col("w") && col("o").startsWith(col("w")),
          "left_anti")
      }
    val chars = toks
      .select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct()
    chars.select(col("c").as("piece"))
      .unionByName(chars.select(concat(lit("##"), col("c")).as("piece")))
      .unionByName(words.select(col("w").as("piece")))
      .distinct()
  }
}
