package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReplayIdSpec extends SparkSpec {

  test("golden vector: 18098167 <-> 00 00 00 00 01 14 27 F7 (FIXTURES A.3)") {
    assert(ReplayIdCodec.decode(Array[Byte](0, 0, 0, 0, 1, 0x14, 0x27, 0xF7.toByte)) == 18098167L)
    assert(ReplayIdCodec.encode(18098167L).toSeq ==
      Seq[Byte](0, 0, 0, 0, 1, 0x14, 0x27, 0xF7.toByte))
  }

  test("values beyond the JS 2^53 cliff decode exactly (avroHelper.js:8-34)") {
    val big = (1L << 53) + 1
    assert(ReplayIdCodec.decode(ReplayIdCodec.encode(big)) == big)
    assert(ReplayIdCodec.decode(Array.fill[Byte](8)(0xFF.toByte)) == -1L) // uint64 max
  }

  test("short buffers decode as left-zero-padded") {
    assert(ReplayIdCodec.decode(Array[Byte](0x01, 0x00)) == 256L)
  }

  test("property: encode . decode == id over the full long range (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val v = rnd.nextLong()
      assert(ReplayIdCodec.decode(ReplayIdCodec.encode(v)) == v)
    }
  }

  test("column functions round-trip through codegen") {
    import spark.implicits._
    val df = Seq(1L, 256L, 18098167L, (1L << 53) + 1, -1L).toDF("v")
      .withColumn("rt", decode_replay_id(encode_replay_id(col("v"))))
    assert(df.filter(col("rt") =!= col("v")).count() == 0)
  }
}
