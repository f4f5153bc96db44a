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
  }
}
