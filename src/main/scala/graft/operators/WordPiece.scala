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
    * collision test is phrased as an EQUI-join: corpus tokens emit their
    * proper prefixes at exactly the lengths present in the top-word set
    * (≤ topWords distinct lengths), and those prefixes semi-join the
    * broadcast top-word relation — the corpus-sized side streams. (A
    * naive `startsWith` anti-join would be a BroadcastNestedLoopJoin
    * forced to build the corpus-wide distinct-token relation.) This is a
    * verification-regime helper; a general vocab keeps prefixes and drops
    * the closed form.
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
        // lengths present in the top-word set: ≤ topWords values, a
        // bounded planning collect
        val lens = words0.select(length(col("w")).as("l")).distinct()
          .collect().map(_.getInt(0))
        if (lens.isEmpty) words0
        else {
          val colliding = toks.select(col("w").as("o")).distinct()
            .select(col("o"),
              explode(array(lens.toSeq.map(l => lit(l)): _*)).as("l"))
            .filter(length(col("o")) > col("l")) // PROPER prefix ⇒ o ≠ w
            .select(col("o").substr(lit(1), col("l")).as("p")).distinct()
            .join(broadcast(words0), col("p") === col("w"), "left_semi")
          words0.join(broadcast(colliding), col("w") === col("p"),
            "left_anti")
        }
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
