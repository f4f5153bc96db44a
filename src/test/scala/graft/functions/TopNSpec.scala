package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopNSpec extends SparkSpec {
  import spark.implicits._

  // deterministic (group, value, score) candidates with planted ties
  private def candidates = (0 until 2000).map { i =>
    val g = i % 7
    val v = i.toLong
    val s = ((i * 131) % 17).toDouble / 4.0 // repeated scores → ties
    (g, v, s)
  }

  test("top_n_by equals the window-ranking definition (ties to smaller value)") {
    val df = candidates.toDF("g", "v", "s")
    val got = df.groupBy("g")
      .agg(top_n_by(col("v"), col("s"), 5).as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("v"))
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).orderBy("g", "rk")
      .collect().groupBy(_.getInt(0))
      .map { case (g, rows) => g -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(got === want)
  }

  test("top_n_by is partitioning-invariant (bounded partials merge exactly)") {
    val df = candidates.toDF("g", "v", "s")
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(top_n_by(col("v"), col("s"), 4).as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(run(1) === run(16))
  }

  test("n larger than the group returns the whole group, best-first") {
    val df = Seq((1, 10L, 2.0), (1, 11L, 3.0), (1, 12L, 1.0)).toDF("g", "v", "s")
    val got = df.groupBy("g").agg(top_n_by(col("v"), col("s"), 10))
      .head().getSeq[Long](1)
    assert(got === Seq(11L, 10L, 12L))
  }

  test("int values are accepted and nulls are skipped") {
    val df = Seq[(Int, Option[Int], Option[Double])](
      (1, Some(5), Some(1.0)), (1, None, Some(9.0)), (1, Some(6), None),
      (1, Some(7), Some(2.0)))
      .toDF("g", "v", "s")
    val got = df.groupBy("g").agg(top_n_by(col("v"), col("s"), 2))
      .head().getSeq[Long](1)
    assert(got === Seq(7L, 5L))
  }

  test("serialization round-trips the buffer") {
    val b = new TopNKernels.TopNBuffer(3)
    b.insert(1.0, 10L); b.insert(5.0, 3L); b.insert(5.0, 2L); b.insert(2.0, 7L)
    val back = TopNKernels.deserialize(TopNKernels.serialize(b))
    assert(back.sortedValues().toSeq === Seq(2L, 3L, 7L))
    assert(back.capacity === 3)
  }
}
