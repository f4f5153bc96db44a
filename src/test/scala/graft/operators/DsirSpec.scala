package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.TextHashKernels

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8192
  private def bucket(feat: String): Long = {
    val h = TextHashKernels.md5Lower64(UTF8String.fromString(feat))
    ((h % B) + B) % B
  }

  test("target-like documents outscore off-target documents") {
    val raw = Seq(
      (1L, "apple banana apple banana"),
      (2L, "dog cat dog cat"),
      (3L, "apple banana dog cat")).toDF("doc_id", "text")
    val target = Seq((0L, "apple banana apple")).toDF("doc_id", "text")
    val w = Curation.dsirLogRatios(raw, "doc_id", "text", target, "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val byId = w.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L),
      s"expected target-like > mixed > off-target, got $byId")
  }

  test("two-doc model matches the hand-computed smoothed log-ratio sum") {
    val raw = Seq((1L, "x x"), (2L, "y")).toDF("doc_id", "text")
    val target = Seq((0L, "x")).toDF("doc_id", "text")
    // features: doc1 = [x, x, "x x"], doc2 = [y]; target = [x]
    val (bx, bxx, by) = (bucket("x"), bucket("x x"), bucket("y"))
    assert(Set(bx, bxx, by).size === 3, "hand computation assumes no collisions")
    val (tr, tt, k) = (4.0, 1.0, 0.5)
    def lnr(cr: Long, ct: Long): Double =
      BigDecimal(math.log(((ct + k) / (tt + k * B)) / ((cr + k) / (tr + k * B))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sum6(xs: Double*): Double =
      BigDecimal(xs.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      1L -> (3L, sum6(lnr(2, 1), lnr(2, 1), lnr(1, 0))),
      2L -> (1L, sum6(lnr(1, 0))))
    val got = Curation.dsirLogRatios(raw, "doc_id", "text", target, "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
  }

  test("feature count is 2n-1 hashed unigrams+bigrams per document (sf0.001)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val bad = Curation.dsirLogRatios(docs, "doc_id", "text",
        docs.filter(col("source") === "src0"), "text")
      .join(docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n")), "doc_id")
      .filter(col("n_features") =!= lit(2) * col("n") - 1)
    assert(bad.isEmpty)
  }

  test("dsirSample: m rows, rerun-identical, selected floor >= unselected ceiling") {
    val docs = graft.Tables.documents(spark, sfDir)
    val target = docs.filter(col("source").isin("src0", "src1"))
    def run() = Curation.dsirSample(docs, "doc_id", "text", target, "text", m = 20)
    val r1 = run().orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r1.length === 20)
    assert(r1 === run().orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq)
    // every selected gumbel_score >= every unselected one (ties broken by
    // doc_id, so compare on the score alone with >=)
    val selectedIds = r1.map(_._1).toSet
    val all = Curation.dsirLogRatios(docs, "doc_id", "text", target, "text")
    val u = (pmod(graft.functions.md5_lower64(
      concat(lit("dsir|"), col("doc_id").cast("string"))), lit(1000000L)) + 0.5) / 1000000.0
    val scoredAll = all.withColumn("gumbel_score",
        round(col("dsir_logratio") + round(-log(-log(u)), 6), 6))
      .select("doc_id", "gumbel_score")
      .as[(Long, Double)].collect().toSeq
    val selMin = scoredAll.filter(r => selectedIds(r._1)).map(_._2).min
    val unselMax = scoredAll.filterNot(r => selectedIds(r._1)).map(_._2).max
    assert(selMin >= unselMax)
  }
}
