package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT decode_replay_id(replay) ...")` works alongside the
  * Column DSL in [[graft.functions]].
  */
object GraftFunctions {

  private def str(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string argument, got $other")
  }
  private def int(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }
  private def long(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal bigint argument, got $other")
  }
  private def dbl(e: Expression, fn: String): Double = e match {
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal double argument, got $other")
  }

  /** Register every engine function in the session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    add("decode_replay_id")(es => DecodeReplayId(es.head))
    add("encode_replay_id")(es => EncodeReplayId(es.head))
    add("expand_bitmap")(es => ExpandBitmap(es(0), es(1), es(2)))
    add("cosine_similarity")(es => CosineSimilarity(es(0), es(1)))
    add("vector_avg")(es => VectorAvg(es(0)))
    add("dot_product")(es => DotProduct(es(0), es(1)))
    add("md5_lower64")(es => Md5Lower64(es.head))
    add("simhash32")(es => SimHash(es.head, 32))
    add("simhash64")(es => SimHash(es.head, 64))
    add("simhash128")(es => SimHash128(es.head))
    add("rolling_hash")(es => RollingHash(es.head))
    add("word_shingles")(es => WordShingles(es(0), int(es(1), "word_shingles")))
    add("minhash_signature")(es =>
      MinHashSignature(es(0), int(es(1), "minhash_signature")))
    add("avro_decode")(es => AvroDecode(es(0), str(es(1), "avro_decode")))
    add("avro_encode")(es => AvroEncode(es(0), str(es(1), "avro_encode")))
    add("i8_quantize")(es => Int8Quantize(es.head))
    add("i8_scale")(es => Int8Scale(es.head))
    add("cosine_i8")(es => Int8Cosine(es(0), es(1)))
    add("l2_norm")(es => L2Norm(es.head))
    add("media_header")(es => MediaHeader(es.head))
    // bloom_agg(hash [, expectedItems [, fpp]])
    add("bloom_agg")(es => BloomAgg(es.head,
      if (es.length > 1) long(es(1), "bloom_agg") else 1000000L,
      if (es.length > 2) dbl(es(2), "bloom_agg") else 0.01))
    add("bloom_might_contain")(es => BloomMightContain(es(0), es(1)))
    // kll_agg(value [, k])
    add("kll_agg")(es => KllAgg(es.head,
      if (es.length > 1) int(es(1), "kll_agg") else 200))
    add("kll_merge_agg")(es => KllMergeAgg(es.head,
      if (es.length > 1) int(es(1), "kll_merge_agg") else 200))
    // mg_agg(item [, capacity]) / mg_merge_agg(sketch [, capacity])
    add("mg_agg")(es => MgAgg(es.head,
      if (es.length > 1) int(es(1), "mg_agg") else 256))
    add("mg_merge_agg")(es => MgMergeAgg(es.head,
      if (es.length > 1) int(es(1), "mg_merge_agg") else 256))
    add("mg_items")(es => MgItems(es.head))
    // theta_agg(item [, lgK]) / theta_union_agg(sketch [, lgK]) + set ops
    add("theta_agg")(es => ThetaAgg(es.head,
      if (es.length > 1) int(es(1), "theta_agg") else 12))
    add("theta_union_agg")(es => ThetaUnionAgg(es.head,
      if (es.length > 1) int(es(1), "theta_union_agg") else 12))
    add("theta_estimate")(es => ThetaEstimate(es.head))
    add("theta_intersect")(es => ThetaIntersect(es.head, es(1)))
    add("theta_a_not_b")(es => ThetaANotB(es.head, es(1)))
    // kll_quantiles(sketch, rank [, rank ...])
    add("kll_quantiles")(es => KllQuantiles(es.head,
      es.tail.map(dbl(_, "kll_quantiles"))))
    add("pq_adc_score")(es => PqAdcScore(es(0), es(1)))
    // pq_encode(vec, flat_books, m, ksub)
    add("pq_encode")(es => PqEncode(es(0), es(1),
      int(es(2), "pq_encode"), int(es(3), "pq_encode")))
  }
}
