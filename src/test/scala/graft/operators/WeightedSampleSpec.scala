package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("per-stratum cap, rerun-identical, non-positive weights excluded") {
    val docs = graft.Tables.documents(spark, sfDir)
    def run() = Curation.weightedSample(docs, "doc_id", "source", "n_chars",
      perStratum = 3)
    val r1 = run().orderBy("doc_id")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(r1 === run().orderBy("doc_id")
      .as[(Long, String, Long, Double)].collect().toSeq)
    val perStratum = r1.groupBy(_._2).view.mapValues(_.size)
    assert(perStratum.values.forall(_ <= 3))
    assert(r1.nonEmpty)

    val withZero = docs.withColumn("w0",
      when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("n_chars")))
    val z = Curation.weightedSample(withZero, "doc_id", "source", "w0", 3)
      .select("doc_id").as[Long].collect()
    assert(z.forall(_ % 2 != 0))
  }

  test("heavier weights win in expectation (extreme-weight determinism)") {
    // one stratum, one doc with overwhelming weight: ln(u)/w -> ~0 beats
    // any unit-weight key (ln(u) <= ln(0.9999995) < 0 bounded away by the
    // content-addressed grid), so it MUST be selected
    val docs = (1L to 100L).map(i => (i, "s", if (i == 42L) 1e9 else 1.0))
      .toDF("doc_id", "stratum", "w")
    val got = Curation.weightedSample(docs, "doc_id", "stratum", "w", 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(42L))
  }

  test("A-ES inclusion tracks weight share on a planted 2-doc race") {
    // doc A weight 9, doc B weight 1, pick 1: over the 200 strata the
    // content-addressed draws act as an empirical sample — A should win
    // the large majority (P[A] = 0.9 exactly under A-ES)
    val docs = (0L until 200L).flatMap { s =>
      Seq((s * 2, s"s$s", 9.0), (s * 2 + 1, s"s$s", 1.0))
    }.toDF("doc_id", "stratum", "w")
    val winners = Curation.weightedSample(docs, "doc_id", "stratum", "w", 1)
      .select("doc_id").as[Long].collect()
    val aWins = winners.count(_ % 2 == 0)
    assert(aWins >= 150, s"heavy side won only $aWins/200")
  }
}
