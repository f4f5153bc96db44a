package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** Session extension registering the engine's functions at session build
  * time — `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes every custom expression
  * available to pure-SQL users on any cluster, without driver-side calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def lit(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string, got $other")
  }
  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }
  private def litLong(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal bigint, got $other")
  }
  private def litDouble(e: Expression, fn: String): Double = e match {
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal double, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def add(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    add("decode_replay_id")(es => DecodeReplayId(es.head))
    add("encode_replay_id")(es => EncodeReplayId(es.head))
    add("expand_bitmap")(es => ExpandBitmap(es(0), es(1), es(2)))
    add("cosine_similarity")(es => CosineSimilarity(es(0), es(1)))
    add("vector_avg")(es => VectorAvg(es(0)))
    add("dot_product")(es => DotProduct(es(0), es(1)))
    add("md5_lower64")(es => Md5Lower64(es.head))
    add("simhash32")(es => SimHash(es.head, 32))
    add("simhash64")(es => SimHash(es.head, 64))
    add("rolling_hash")(es => RollingHash(es.head))
    add("word_shingles")(es => WordShingles(es(0), litInt(es(1), "word_shingles")))
    add("minhash_signature")(es =>
      MinHashSignature(es(0), litInt(es(1), "minhash_signature")))
    add("avro_decode")(es => AvroDecode(es(0), lit(es(1), "avro_decode")))
    add("avro_encode")(es => AvroEncode(es(0), lit(es(1), "avro_encode")))
    add("i8_quantize")(es => Int8Quantize(es.head))
    add("i8_scale")(es => Int8Scale(es.head))
    add("cosine_i8")(es => Int8Cosine(es(0), es(1)))
    add("simhash128")(es => SimHash128(es.head))
    add("l2_norm")(es => L2Norm(es.head))
    add("media_header")(es => MediaHeader(es.head))
    // bloom_agg(hash [, expectedItems [, fpp]])
    add("bloom_agg")(es => BloomAgg(es.head,
      if (es.length > 1) litLong(es(1), "bloom_agg") else 1000000L,
      if (es.length > 2) litDouble(es(2), "bloom_agg") else 0.01))
    add("bloom_might_contain")(es => BloomMightContain(es(0), es(1)))
    // kll_agg(value [, k])
    add("kll_agg")(es => KllAgg(es.head,
      if (es.length > 1) litInt(es(1), "kll_agg") else 200))
    add("kll_merge_agg")(es => KllMergeAgg(es.head,
      if (es.length > 1) litInt(es(1), "kll_merge_agg") else 200))
    // kll_quantiles(sketch, rank [, rank ...])
    add("kll_quantiles")(es => KllQuantiles(es.head,
      es.tail.map(litDouble(_, "kll_quantiles"))))
    add("pq_adc_score")(es => PqAdcScore(es(0), es(1)))
    // pq_encode(vec, flat_books, m, ksub)
    add("pq_encode")(es => PqEncode(es(0), es(1),
      litInt(es(2), "pq_encode"), litInt(es(3), "pq_encode")))
  }
}
