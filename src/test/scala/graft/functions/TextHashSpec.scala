package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class TextHashSpec extends SparkSpec {

  test("md5Lower64 matches DuckDB md5_number_lower semantics ('abc')") {
    // duckdb: SELECT md5_number_lower('abc') -> 8250560606382298838
    assert(TextHashKernels.md5Lower64(UTF8String.fromString("abc")) == 8250560606382298838L)
  }

  test("simhash32 is deterministic and within 32 bits") {
    import spark.implicits._
    val df = Seq("spark merge table join", "spark merge table join",
      "completely different words here").toDF("t")
      .select(simhash32(split(col("t"), " ")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("near-identical token lists give close hamming distance") {
    def h(s: String) = {
      import spark.implicits._
      Seq(s).toDF("t").select(simhash32(split(col("t"), " ")).as("h"))
        .collect()(0).getLong(0)
    }
    val a = h("the quick brown fox jumps over the lazy dog again and again")
    val b = h("the quick brown fox jumps over the lazy cat again and again")
    val c = h("zx qv wq ee rr tt yy uu ii oo pp aa")
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("rolling hash: deterministic, differs on different strings") {
    val x = TextHashKernels.rollingHash(UTF8String.fromString("hello world"))
    val y = TextHashKernels.rollingHash(UTF8String.fromString("hello world"))
    val z = TextHashKernels.rollingHash(UTF8String.fromString("hello worlb"))
    assert(x == y && x != z)
  }
}
