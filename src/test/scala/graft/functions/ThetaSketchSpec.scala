package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Curation

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def est(bytes: Array[Byte]): Double =
    ThetaKernels.wrap(bytes).getEstimate

  test("exact mode: estimate equals the true distinct count, any partitioning") {
    val items = (0 until 5000).map(i => s"v${i % 700}")
    for (parts <- Seq(1, 8)) {
      val sk = items.toDF("x").repartition(parts)
        .agg(theta_agg(col("x"))).head().getAs[Array[Byte]](0)
      assert(est(sk) === 700.0, s"parts=$parts")
    }
  }

  test("stored shard sketches union to the corpus distinct set") {
    val shards = (0 until 3000).map(i => (i % 4, s"v${i % 900}"))
      .toDF("shard", "x")
    val profiles = shards.groupBy("shard").agg(theta_agg(col("x")).as("sk"))
    val merged = profiles.agg(theta_union_agg(col("sk")))
      .head().getAs[Array[Byte]](0)
    assert(est(merged) === 900.0)
  }

  test("intersect and a-not-b are exact on small disjoint/overlapping sets") {
    // A = v0..v599, B = v400..v999 -> |A∩B| = 200, |A\B| = 400
    val a = (0 until 600).map(i => s"v$i").toDF("x")
      .agg(theta_agg(col("x"))).head().getAs[Array[Byte]](0)
    val b = (400 until 1000).map(i => s"v$i").toDF("x")
      .agg(theta_agg(col("x"))).head().getAs[Array[Byte]](0)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        theta_estimate(theta_intersect(col("a"), col("b"))).as("inter"),
        theta_estimate(theta_a_not_b(col("a"), col("b"))).as("anotb"))
      .head()
    assert(row.getDouble(0) === 200.0 && row.getDouble(1) === 400.0)
  }

  test("estimate stays within 5% at 100k distinct (beyond exact mode)") {
    val sk = spark.range(0, 300000)
      .select(concat(lit("u"), (col("id") % 100000).cast("string")).as("x"))
      .agg(theta_agg(col("x"))).head().getAs[Array[Byte]](0)
    val e = est(sk)
    assert(math.abs(e - 100000.0) / 100000.0 < 0.05, s"estimate $e")
  }

  test("SQL surface: theta functions registered") {
    GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("th_in")
    val e = spark.sql("SELECT theta_estimate(theta_agg(v)) FROM th_in")
      .head().getDouble(0)
    assert(e === 2.0)
  }

  test("vocabularyOverlap: exact counts and jaccard on a planted split") {
    // en docs use tokens a b c d; de docs use c d e -> common {c,d}
    val docs = Seq(
      (1L, "a b c d", "en"), (2L, "a b", "en"),
      (3L, "c d e", "de"), (4L, "e e", "de"),
      (5L, "zz", "fr") // excluded group
    ).toDF("doc_id", "text", "lang")
    val row = Curation.vocabularyOverlap(docs, "text", "lang", "en", "de")
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((4L, 3L, 2L, 2L)))
    assert(row.getDouble(4) ===
      BigDecimal(2.0 / 5.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
