package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish deterministic stream: item i appears ~N/(i+1) times. */
  private def zipf(n: Int): Seq[String] =
    (0 until n).map(i => s"w${java.lang.Integer.numberOfTrailingZeros(i | 1024)}") ++
      (0 until n).map(i => s"t${i % 97}")

  private def decode(bytes: Array[Byte]): Map[String, Long] =
    MgKernels.deserialize(bytes).counts.toMap

  test("exact when distinct items fit the capacity") {
    val data = Seq("a", "a", "b", "c", "c", "c").toDF("x")
    val sk = data.agg(mg_agg(col("x"), 16)).head().getAs[Array[Byte]](0)
    assert(decode(sk) === Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("guarantee holds under any partitioning: hitters present, est within N/(k+1)") {
    val items = zipf(3000)
    val n = items.size.toLong
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 24
    for (parts <- Seq(1, 8, 32)) {
      val sk = items.toDF("x").repartition(parts)
        .agg(mg_agg(col("x"), cap)).head().getAs[Array[Byte]](0)
      val est = decode(sk)
      assert(est.size <= cap)
      val bound = n.toDouble / (cap + 1)
      est.foreach { case (k, e) =>
        assert(e <= truth(k), s"$k overestimated: $e > ${truth(k)}")
        assert(e >= truth(k) - bound, s"$k under bound: $e < ${truth(k)} - $bound")
      }
      truth.filter(_._2 > bound).keys.foreach(k =>
        assert(est.contains(k), s"guaranteed hitter $k missing at parts=$parts"))
    }
  }

  test("stored shard sketches re-merge with the same guarantee") {
    val items = zipf(2000)
    val n = items.size.toLong
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 24
    // 5 shards, one stored sketch each, then mg_merge_agg
    val shards = items.zipWithIndex.map { case (x, i) => (i % 5, x) }
      .toDF("shard", "x")
    val profiles = shards.groupBy("shard").agg(mg_agg(col("x"), cap).as("sk"))
    val merged = profiles.agg(mg_merge_agg(col("sk"), cap))
      .head().getAs[Array[Byte]](0)
    val est = decode(merged)
    val bound = n.toDouble / (cap + 1)
    est.foreach { case (k, e) => assert(e <= truth(k) && e >= truth(k) - bound) }
    truth.filter(_._2 > bound).keys.foreach(k => assert(est.contains(k)))
  }

  test("mg_items orders by (est desc, item) and round-trips the sketch") {
    val data = Seq("b", "b", "b", "a", "a", "c").toDF("x")
    val arr = data.agg(mg_items(mg_agg(col("x"), 16)).as("items"))
      .select(explode(col("items")).as("s"))
      .select("s.item", "s.est").as[(String, Long)].collect().toSeq
    assert(arr === Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("SQL surface: mg_agg / mg_merge_agg / mg_items registered") {
    GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("mg_in")
    val got = spark.sql(
      "SELECT mg_items(mg_agg(v, 8)) FROM mg_in")
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("x", 2L), ("y", 1L)))
  }

  test("heavyHitters equals the exact computation, any partitioning") {
    val items = zipf(4000)
    val docs = items.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val cap = 16
    val n = items.size.toLong
    val want = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter { case (_, c) => c > n / (cap + 1.0) }
      .toSeq.sortBy { case (k, c) => (-c, k) }
    for (parts <- Seq(1, 8)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(parts), "text", cap)
        .as[(String, Long)].collect().toSeq
      assert(got === want, s"parts=$parts")
    }
  }
}
