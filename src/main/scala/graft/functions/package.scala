package graft

import org.apache.spark.sql.{Column, GraftShim}

/** Column-level DSL over the engine's custom Catalyst expressions.
  * Mirrors `org.apache.spark.sql.functions`' style.
  */
package object functions {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftShim.expression(c)

  /** Big-endian uint64 decode of a replay-ID buffer (eventParser.js:160-162). */
  def decode_replay_id(c: Column): Column = col(DecodeReplayId(ex(c)))

  /** Big-endian 8-byte encode of a replay ID (eventParser.js:170-174). */
  def encode_replay_id(c: Column): Column = col(EncodeReplayId(ex(c)))

  /** CDC field-bitmap expansion (eventParser.js:79-152). */
  def expand_bitmap(bitmaps: Column, fields: Column, childFields: Column): Column =
    col(ExpandBitmap(ex(bitmaps), ex(fields), ex(childFields)))

  /** Cosine similarity of two float32 vectors (double result). */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))

  /** Dot product of two float32 vectors (double result). */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))

  /** Lower 64 bits of md5 (little-endian) — DuckDB `md5_number_lower` compatible. */
  def md5_lower64(c: Column): Column = col(Md5Lower64(ex(c)))

  /** 32-bit SimHash over a token array. */
  def simhash32(tokens: Column): Column = col(SimHash32(ex(tokens)))

  /** 64-bit polynomial rolling hash of a string. */
  def rolling_hash(c: Column): Column = col(RollingHash(ex(c)))
}
