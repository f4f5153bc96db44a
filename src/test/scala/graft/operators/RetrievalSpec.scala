package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: hand-computed fusion of two overlapping lists") {
    val lex = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("qid", "id", "rank")
    val dense = Seq(("q", 2L, 1), ("q", 3L, 2), ("q", 4L, 3))
      .toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, topK = 10)
      .as[(String, Long, Double, Int)].collect().toSeq
    // doc 2 tops (rank 2 lexically + rank 1 densely); singles trail
    assert(got === Seq(
      ("q", 2L, r6(1.0 / 62 + 1.0 / 61), 1),
      ("q", 3L, r6(1.0 / 63 + 1.0 / 62), 2),
      ("q", 1L, r6(1.0 / 61), 3),
      ("q", 4L, r6(1.0 / 63), 4)))
  }

  test("rrfFuse: qids fuse independently and topK cuts per qid") {
    val a = Seq(("p", 7L, 1), ("q", 1L, 1), ("q", 2L, 2))
      .toDF("qid", "id", "rank")
    val b = Seq(("q", 2L, 1)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 1)
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(got === Seq(
      ("p", 7L, r6(1.0 / 61), 1),
      ("q", 2L, r6(1.0 / 62 + 1.0 / 61), 1)))
  }

  test("evalMetrics: hand-computed recall/MRR/nDCG, including a zero query") {
    val qrels = Seq(("q", 10L, 3), ("q", 11L, 2), ("q", 12L, 1),
      ("z", 50L, 1)).toDF("qid", "id", "grade")
    // q's top-3: relevant 10 at rank 1, miss at 2, relevant 12 at rank 3;
    // relevant 11 ranked OUTSIDE the cutoff. z retrieves nothing relevant.
    val results = Seq(("q", 10L, 1), ("q", 99L, 2), ("q", 12L, 3),
      ("q", 11L, 4), ("z", 60L, 1), ("z", 61L, 2)).toDF("qid", "id", "rank")
    val got = Retrieval.evalMetrics(results, qrels, k = 3)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val log2_3 = math.log(3.0) / math.log(2.0)
    val dcg = r6(7.0 / 1.0) + r6(1.0 / 2.0)           // grades 3@1, 1@3
    val idcg = r6(7.0) + r6(3.0 / log2_3) + r6(1.0 / 2.0) // 3,2,1 at 1,2,3
    assert(got === Seq(
      ("q", 3L, r4(2.0 / 3.0), 1.0, r4(dcg / idcg)),
      ("z", 1L, 0.0, 0.0, 0.0)))
  }

  test("evalMetrics: ideal-order retrieval scores exactly 1.0 everywhere") {
    val qrels = Seq(("q", 1L, 3), ("q", 2L, 2), ("q", 3L, 1))
      .toDF("qid", "id", "grade")
    val results = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("qid", "id", "rank")
    val got = Retrieval.evalMetrics(results, qrels, k = 3)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("q", 3L, 1.0, 1.0, 1.0)))
  }

  test("evalMetrics: a qid absent from results scores zeros, not a dropped row") {
    val qrels = Seq(("q", 1L, 2), ("w", 2L, 1)).toDF("qid", "id", "grade")
    val results = Seq(("q", 1L, 1)).toDF("qid", "id", "rank")
    val got = Retrieval.evalMetrics(results, qrels, k = 5)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("q", 1L, 1.0, 1.0, 1.0), ("w", 1L, 0.0, 0.0, 0.0)))
  }

  test("evalMetrics: IDCG truncates at k when there are more relevants than k") {
    val qrels = Seq(("q", 1L, 2), ("q", 2L, 2), ("q", 3L, 2))
      .toDF("qid", "id", "grade")
    val results = Seq(("q", 1L, 1), ("q", 9L, 2)).toDF("qid", "id", "rank")
    val got = Retrieval.evalMetrics(results, qrels, k = 2)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val idcg = r6(3.0 / 1.0) + r6(3.0 / (math.log(3.0) / math.log(2.0)))
    assert(got === Seq(("q", 3L, r4(1.0 / 3.0), 1.0, r4(r6(3.0) / idcg))))
  }

  test("weightedFuse: min-max normalization, weights, and degenerate lists") {
    // list 0: scores 10/5/0 -> norms 1.0/0.5/0.0, weight 0.8
    // list 1: all-equal scores -> every norm 1.0, weight 0.2
    val l0 = Seq(("q", 1L, 10.0), ("q", 2L, 5.0), ("q", 3L, 0.0))
      .toDF("qid", "id", "score")
    val l1 = Seq(("q", 2L, 7.0), ("q", 4L, 7.0)).toDF("qid", "id", "score")
    val got = Retrieval.weightedFuse(Seq(l0, l1), Seq(0.8, 0.2), topK = 10)
      .select("id", "fused", "rank")
      .as[(Long, Double, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 0.8, 1),       // 1.0*0.8
      (2L, 0.6, 2),       // 0.5*0.8 + 1.0*0.2
      (4L, 0.2, 3),       // 1.0*0.2
      (3L, 0.0, 4)))      // 0.0*0.8
  }

  test("weightedFuse: normalization is per qid, not global") {
    val l0 = Seq(("a", 1L, 100.0), ("a", 2L, 0.0), ("b", 3L, 1.0),
      ("b", 4L, 0.0)).toDF("qid", "id", "score")
    val got = Retrieval.weightedFuse(Seq(l0), Seq(1.0), topK = 1)
      .select("qid", "id", "fused").as[(String, Long, Double)].collect().toSet
    // each qid's max normalizes to 1.0 regardless of raw scale
    assert(got === Set(("a", 1L, 1.0), ("b", 3L, 1.0)))
  }
}
