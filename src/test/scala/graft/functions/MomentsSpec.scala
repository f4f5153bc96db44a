package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("vector_moments: count, mean, second moment match hand computation") {
    val df = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 0f))
      .toDF("v")
    val r = df.agg(vector_moments(col("v")).as("m"))
      .select("m.n", "m.mean", "m.m2").head()
    assert(r.getLong(0) === 3L)
    assert(r.getSeq[Double](1) === Seq(3.0, 2.0))
    // E[v vT]: [ (1+9+25)/3, (2+12+0)/3 ; ., (4+16+0)/3 ]
    val m2 = r.getSeq[Double](2)
    assert(m2 === Seq(35.0 / 3, 14.0 / 3, 14.0 / 3, 20.0 / 3))
  }

  test("vector_moments is partitioning-invariant (exact map-side merge)") {
    val data = (0 until 500).map(i =>
      Array.tabulate(6)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    val a = data.toDF("v").repartition(1)
      .agg(vector_moments(col("v"))).head().getStruct(0)
    val b = data.toDF("v").repartition(16)
      .agg(vector_moments(col("v"))).head().getStruct(0)
    assert(a.getLong(0) === b.getLong(0))
    val (ma, mb) = (a.getSeq[Double](1), b.getSeq[Double](1))
    ma.zip(mb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    val (sa, sb) = (a.getSeq[Double](2), b.getSeq[Double](2))
    sa.zip(sb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-7) }
  }

  test("Jacobi: known 2x2 eigensystem and reconstruction") {
    val (lambda, v) = Jacobi.eigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    assert(lambda.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // A = V diag(l) VT
    for (i <- 0 until 2; j <- 0 until 2) {
      val aij = (0 until 2).map(k => v(i * 2 + k) * lambda(k) * v(j * 2 + k)).sum
      val want = if (i == j) 2.0 else 1.0
      assert(math.abs(aij - want) < 1e-12, s"($i,$j)")
    }
  }

  test("whiten: zero mean, identity covariance, deterministic") {
    // deterministic anisotropic vectors: correlated dims, distinct scales
    val data = (0L until 400L).map { i =>
      val a = math.sin(i * 0.37) * 3.0
      val b = math.cos(i * 0.11) * 0.5 + a * 0.8
      val c = math.sin(i * 0.23 + 1.0) * 1.5 - a * 0.3
      // dim 4 has its own source term: the covariance must be full-rank
      // (an exactly-dependent dim has lambda ~ float noise, and
      // eps-regularized whitening correctly shrinks it instead of
      // producing unit variance)
      val e = math.cos(i * 0.53) * 0.8 + b * 0.2
      (i, Array(a.toFloat, b.toFloat, c.toFloat, e.toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val w = Similarity.whiten(df, "vec_id", "embedding", eps = 1e-9)
    val m = w.agg(vector_moments(col("w")).as("m"))
      .select("m.mean", "m.m2").head()
    m.getSeq[Double](0).foreach(x => assert(math.abs(x) < 1e-6, "mean"))
    val m2 = m.getSeq[Double](1)
    for (i <- 0 until 4; j <- 0 until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(m2(i * 4 + j) - want) < 1e-3, s"cov($i,$j)=${m2(i * 4 + j)}")
    }
    // rerun-identical (fixed Jacobi order, pure-function transform)
    val a1 = w.orderBy("vec_id").select("w").as[Seq[Double]].collect().toSeq
    val a2 = Similarity.whiten(df, "vec_id", "embedding", eps = 1e-9)
      .orderBy("vec_id").select("w").as[Seq[Double]].collect().toSeq
    assert(a1 === a2)
  }
}
