package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data pipeline operators.
  * Everything here composes Spark built-ins (codegen'd, no UDFs) so the
  * scan → project pipeline stays inside whole-stage codegen.
  */
object TextOps {
  /** Whitespace-collapsed, lowercased, trimmed normalization. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles (space-joined). Empty when the document
    * has fewer than `n` tokens. Delegates to the one-pass codegen'd
    * [[graft.functions.WordShingles]] kernel — the HOF formulation
    * re-evaluates the token split per lambda iteration (see that kernel's
    * scaladoc).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.word_shingles(text, n)

  /** English stopword marker set for the language-ID heuristic. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")
}
