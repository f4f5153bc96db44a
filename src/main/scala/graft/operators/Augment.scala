package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.md5_lower64

/** Objective-shaping augmentations — the deterministic text transforms a
  * pretraining pipeline applies AFTER curation to build training
  * examples for infilling objectives:
  *
  *  - '''FIM''' (fill-in-the-middle, Bavarian et al. 2022,
  *    arXiv:2207.14255): split each document at two points and re-emit
  *    in PSM order `⟨PRE⟩ prefix ⟨SUF⟩ suffix ⟨MID⟩ middle`, teaching a
  *    causal model to infill.
  *  - '''Span corruption''' (T5, Raffel et al. 2020): mask `nSpans`
  *    spans with numbered sentinels; inputs keep the context, targets
  *    carry `sentinel + span` pairs.
  *
  * Both are pure per-row projections (zero shuffle, scan-speed), and —
  * the property that makes them verifiable — their "randomness" is
  * CONTENT-ADDRESSED: every split point derives from
  * `md5(tag | doc_id)`, so the draw is reproducible, shard-order-free,
  * and replicable in SQL (both declared queries hash-match DuckDB
  * end-to-end, split arithmetic included).
  *
  * Token-level (not byte-level) splitting keeps the ops
  * tokenizer-agnostic; compose with [[Bpe.encode]]/[[WordPiece.encode]]
  * downstream.
  */
object Augment {

  private def hmod(tag: String, id: Column, m: Column): Column =
    pmod(md5_lower64(concat(lit(tag + "|"), id.cast("string"))), m)

  /** FIM/PSM transform: `(doc_id, n_tokens, s1, s2, fim_text)` with
    * `0 ≤ s1 ≤ s2 ≤ n` from the document's own hash — prefix = tokens
    * [0, s1), middle = [s1, s2), suffix = [s2, n).
    */
  def fim(docs: DataFrame, idCol: String, textCol: String,
          pre: String = "<PRE>", suf: String = "<SUF>",
          mid: String = "<MID>"): DataFrame = {
    val t = TextOps.tokens(col(textCol))
    val n = size(t)
    docs.select(col(idCol).as("doc_id"), t.as("t"), n.as("n_tokens"))
      .withColumn("s1", hmod("fim1", col("doc_id"), col("n_tokens") + 1).cast("int"))
      .withColumn("s2", (col("s1") +
        hmod("fim2", col("doc_id"), col("n_tokens") - col("s1") + 1)).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("s1"), col("s2"),
        // whitespace-normalized so empty segments collapse identically
        // on both engines (empty-slice stringification differs)
        regexp_replace(trim(concat_ws(" ",
          lit(pre), concat_ws(" ", slice(col("t"), lit(1), col("s1"))),
          lit(suf), concat_ws(" ",
            slice(col("t"), col("s2") + 1, col("n_tokens") - col("s2"))),
          lit(mid), concat_ws(" ",
            slice(col("t"), col("s1") + 1, col("s2") - col("s1"))))),
          " +", " ")
          .as("fim_text"))
  }

  /** T5 span corruption with `nSpans` content-addressed spans of up to
    * `spanLen` tokens. The token range splits into `nSpans` equal windows
    * and each span lives wholly inside its own window — spans can touch
    * but never overlap BY CONSTRUCTION (no rejection sampling, so the
    * draw stays closed-form for the oracle). Returns
    * `(doc_id, n_tokens, inputs_text, targets_text)`; sentinel `i` is
    * `<X_i>`. Windows too small to host a span contribute nothing.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  nSpans: Int = 2, spanLen: Int = 3): DataFrame = {
    require(nSpans > 0 && spanLen > 0)
    val t = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), t.as("t"),
      size(t).as("n"))
    // per-span start/len columns (all integer arithmetic on n)
    val withSpans = (0 until nSpans).foldLeft(base) { (df, i) =>
      val lo = (col("n") * i / nSpans).cast("int")
      val hi = (col("n") * (i + 1) / nSpans).cast("int")
      val wlen = hi - lo
      val len = least(lit(spanLen), wlen)
      val start = (lo + hmod(s"sc$i", col("doc_id"),
        greatest(wlen - len + 1, lit(1)))).cast("int")
      // an empty window (n < nSpans) hosts a zero-length span at its own
      // boundary, so the slice chain below stays well-defined
      df.withColumn(s"st$i", when(wlen >= 1, start).otherwise(lo))
        .withColumn(s"ln$i", when(wlen >= 1, len).otherwise(lit(0)))
    }
    // inputs: context slices interleaved with sentinels; targets:
    // sentinel + span pairs. Slice [a, b) of t is slice(t, a+1, b-a).
    val inputParts = (0 until nSpans).flatMap { i =>
      val prevEnd: Column =
        if (i == 0) lit(0) else col(s"st${i - 1}") + col(s"ln${i - 1}")
      Seq(
        concat_ws(" ", slice(col("t"), prevEnd + 1, col(s"st$i") - prevEnd)),
        when(col(s"ln$i") > 0, lit(s"<X_$i>")).otherwise(lit("")))
    } :+ {
      val lastEnd = col(s"st${nSpans - 1}") + col(s"ln${nSpans - 1}")
      concat_ws(" ", slice(col("t"), lastEnd + 1, col("n") - lastEnd))
    }
    val targetParts = (0 until nSpans).flatMap { i =>
      Seq(when(col(s"ln$i") > 0, lit(s"<X_$i>")).otherwise(lit("")),
        concat_ws(" ", slice(col("t"), col(s"st$i") + 1, col(s"ln$i"))))
    }
    def joined(parts: Seq[Column]): Column =
      // concat_ws drops nulls but keeps empties — normalize by splitting
      // out repeated spaces after the join
      regexp_replace(trim(concat_ws(" ", parts: _*)), " +", " ")
    withSpans.select(col("doc_id"), col("n").as("n_tokens"),
      joined(inputParts).as("inputs_text"),
      joined(targetParts).as("targets_text"))
  }
}
