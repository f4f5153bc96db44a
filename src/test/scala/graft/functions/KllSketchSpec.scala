package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kll_agg quantiles track exact order statistics within rank error") {
    // uniform 0..99999 over 32 partitions: quantile q should read ~q*100000
    val df = spark.range(0, 100000, 1, 32)
      .select(col("id").cast("double").as("v"))
    val qs = df.agg(kll_agg(col("v")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.1, 0.5, 0.9)).as("q"))
      .head().getSeq[Double](0)
    // k=200 rank error ~1.65%; allow 2.5% of the value range (values are
    // uniform, so rank error maps 1:1 onto value error here)
    Seq(0.1, 0.5, 0.9).zip(qs).foreach { case (r, v) =>
      assert(math.abs(v - r * 100000) < 2500,
        s"quantile $r read $v, expected ~${r * 100000}")
    }
  }

  test("kll_merge_agg over stored shard sketches equals one global sketch's error contract") {
    // profile 8 shards independently, store the sketches, re-merge WITHOUT
    // the data — the incremental-release shape
    val df = spark.range(0, 80000)
      .select((col("id") % 8).as("shard"), col("id").cast("double").as("v"))
    val shardProfiles = df.groupBy("shard").agg(kll_agg(col("v")).as("sk"))
    val merged = shardProfiles.agg(kll_merge_agg(col("sk")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).as("q"))
      .head().getSeq[Double](0)
    assert(math.abs(merged.head - 40000) < 2000,
      s"merged median read ${merged.head}, expected ~40000")
  }

  test("kll_quantiles of an empty sketch is null, not a throw") {
    val empty = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(kll_agg(col("v")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).as("q"))
    assert(empty.head().isNullAt(0))
  }
}
