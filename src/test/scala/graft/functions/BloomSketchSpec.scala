package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_agg + bloom_might_contain: no false negatives, bounded fpr") {
    val inserted = spark.range(1000).toDF("v")
    val bf = inserted.agg(bloom_agg(xxhash64(col("v")), 1000, 0.01).as("bf"))

    val hits = inserted.crossJoin(bf)
      .filter(bloom_might_contain(col("bf"), xxhash64(col("v"))))
      .count()
    assert(hits === 1000, "a Bloom filter must never report false negatives")

    // 10k values never inserted: fpr must sit near the configured 1%
    val fp = spark.range(100000, 110000).toDF("v").crossJoin(bf)
      .filter(bloom_might_contain(col("bf"), xxhash64(col("v"))))
      .count()
    assert(fp < 500, s"false-positive rate out of range: $fp/10000 at fpp=0.01")
  }

  test("bloom_agg partials merge across partitions (distributed build)") {
    // 32 input partitions force map-side partials + a merge; membership
    // must still be exact over the union
    val inserted = spark.range(0, 5000, 1, 32).toDF("v")
    val bf = inserted.agg(bloom_agg(xxhash64(col("v")), 5000, 0.01).as("bf"))
    val hits = inserted.crossJoin(bf)
      .filter(bloom_might_contain(col("bf"), xxhash64(col("v"))))
      .count()
    assert(hits === 5000)
  }
}
