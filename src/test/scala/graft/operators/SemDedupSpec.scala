package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "v")

  private def cents(rows: (Int, Seq[Float])*) =
    rows.toDF("cid", "cvec")

  test("assign picks the max-cosine centroid, ties to the smaller cid") {
    val e = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0f, 1f),
      2L -> Seq(0.6f, 0.8f)) // cos vs (1,0)=0.6, vs (0,1)=0.8 -> cid 1
    // cid 2 duplicates cid 0's centroid: an exact tie for vector 0, which
    // must resolve to the SMALLER cid
    val c = cents(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f), 2 -> Seq(1f, 0f))
    val got = SemDedup.assign(e, "id", "v", c)
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(got === Seq((0L, 0), (1L, 1), (2L, 1)))
  }

  test("pairs compare only within clusters — a cross-cluster near-dup is not a pair") {
    // v10/v11 have cos ≈ 0.992 (a near-dup by any eps) but straddle the
    // centroid decision boundary; v20/v21 are near-dups inside cluster 1
    val e = emb(
      10L -> Seq(0.74f, 0.67f), // -> cid 0
      11L -> Seq(0.67f, 0.74f), // -> cid 1
      20L -> Seq(0.02f, 0.99f), // -> cid 1
      21L -> Seq(0.03f, 0.99f)) // -> cid 1
    val c = cents(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f))
    val asg = SemDedup.assign(e, "id", "v", c)
    val p = SemDedup.pairs(e, "id", "v", asg, eps = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!p.contains((10L, 11L)),
      "cross-cluster pair must be excluded by construction")
    assert(p.contains((20L, 21L)) || p.contains((11L, 20L)) ||
      p.contains((11L, 21L)), "within-cluster near-dups must surface")
  }

  test("report keeps exactly the min id per near-dup group, singletons keep themselves") {
    // cluster 0: ids 3,5,9 mutually near-identical (one group, keep 3);
    // id 7 in cluster 0 but orthogonal-ish (singleton, keeps itself);
    // cluster 1: ids 2,4 near-identical (keep 2)
    val e = emb(
      3L -> Seq(1f, 0.01f, 0f),
      5L -> Seq(1f, 0.02f, 0f),
      9L -> Seq(1f, 0.00f, 0f),
      7L -> Seq(0.8f, 0.6f, 0f), // cid 0 (cos 0.8 vs 0.6) but far from the dups
      2L -> Seq(0f, 1f, 0.01f),
      4L -> Seq(0f, 1f, 0.02f))
    val c = cents(0 -> Seq(1f, 0f, 0f), 1 -> Seq(0f, 1f, 0f))
    val got = SemDedup.report(e, "id", "v", c, eps = 0.95)
      .orderBy("id").as[(Long, Int, Boolean)].collect().toSeq
    assert(got === Seq(
      (2L, 1, true), (3L, 0, true), (4L, 1, false), (5L, 0, false),
      (7L, 0, true), (9L, 0, false)))
  }

  test("pairs == the exact all-pairs operator restricted to same-cluster pairs (sf0.001)") {
    val embs = graft.Tables.embeddings(spark, sfDir)
    val c = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
    val asg = SemDedup.assign(embs, "vec_id", "embedding", c)
    val got = SemDedup.pairs(embs, "vec_id", "embedding", asg, eps = 0.4)
      .select("id_a", "id_b", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val sameCluster = asg.select(col("id").as("id_a"), col("cid").as("ca"))
      .join(asg.select(col("id").as("id_b"), col("cid").as("cb")),
        col("ca") === col("cb"))
    val want = Dedup.embeddingDupPairsExact(embs, "vec_id", "embedding", 0.4)
      .join(sameCluster, Seq("id_a", "id_b"))
      .select("id_a", "id_b", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "sf0.001 embeddings must contain within-cluster near-dups")
  }

  test("reportKMeans: learned centroids run the same policy, memoized and consistent") {
    val root = java.nio.file.Files.createTempDirectory("semdedup_cat").toString
    spark.conf.set("spark.graft.index.root", root)
    IndexCatalog.invalidateMemo()
    try {
      val embs = graft.Tables.embeddings(spark, sfDir)
      def run() = SemDedup.reportKMeans(embs, "vec_id", "embedding",
        Seq(s"$sfDir/embeddings.parquet"), k = 8, iterations = 2, eps = 0.4)
      val r1 = run().orderBy("id").as[(Long, Int, Boolean)].collect().toSeq
      assert(r1.length === embs.count())
      assert(r1.exists(!_._3), "the corpus's near-dups must drop someone")
      // keep flags re-derive from the pair graph: keep iff the id IS its
      // group's min-id CC label (the policy, recomputed independently)
      val rep = run()
      val asgPairs = SemDedup.pairs(embs, "vec_id", "embedding",
        rep.select("id", "cid"), eps = 0.4)
      val labels = Dedup.dupClusters(asgPairs.select("id_a", "id_b"),
        embs.select(col("vec_id").as("id")), "id")
      val mismatch = rep.join(labels, "id")
        .filter(col("keep") =!= (col("cluster") === col("id")))
      assert(mismatch.isEmpty,
        "keep must equal (id == min-id label of its near-dup group)")
      // second run resolves from the catalog: byte-identical output
      val r2 = run().orderBy("id").as[(Long, Int, Boolean)].collect().toSeq
      assert(r1 === r2)
    } finally {
      spark.conf.unset("spark.graft.index.root")
      IndexCatalog.invalidateMemo()
    }
  }

  test("prototypePrune drops the per-cluster most-prototypical quarter") {
    // cluster 0: four vectors at decreasing cosine to (1,0); cluster 1:
    // two vectors — floor(0.25*4)=1 drop in cluster 0, floor(0.25*2)=0
    // drops in cluster 1
    val e = emb(
      1L -> Seq(1f, 0f),       // proto 1.0 -> the one dropped in cid 0
      2L -> Seq(0.99f, 0.14f), // proto ~0.990
      3L -> Seq(0.95f, 0.31f),
      4L -> Seq(0.90f, 0.44f),
      5L -> Seq(0f, 1f),       // cid 1, proto 1.0 — kept (csize 2)
      6L -> Seq(0.31f, 0.95f))
    val c = cents(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f))
    val got = SemDedup.prototypePrune(e, "id", "v", c, pruneFrac = 0.25)
      .orderBy("id").as[(Long, Int, Double, Boolean)].collect().toSeq
    assert(got.map(r => r._1 -> r._4).toMap ===
      Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
        5L -> true, 6L -> true))
    assert(got.map(r => r._1 -> r._2).toMap ===
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 1, 6L -> 1))
    // proto IS the assignment cosine (max over centroids, rounded 3)
    assert(got.find(_._1 == 1L).get._3 === 1.0)
    assert(got.find(_._1 == 5L).get._3 === 1.0)
  }

  test("assignRouted with nprobe >= g equals the flat path exactly (ties included)") {
    val embs = graft.Tables.embeddings(spark, sfDir)
    // 16 learned-ish centroids plus a DUPLICATE of cid 0 at cid 16: the
    // routed argmax must resolve the exact tie to the smaller cid, like flat
    val c = embs.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
      .union(embs.filter(col("vec_id") === 0)
        .select(lit(16).as("cid"), col("embedding").as("cvec")))
    // g = ceil(sqrt(17)) = 5; nprobe 5 covers every super -> every centroid
    // is a candidate and the result must be IDENTICAL to the flat scan
    val routed = SemDedup.assignRouted(embs, "vec_id", "embedding", c, nprobe = 5)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    val flat = SemDedup.assignScored(embs, "vec_id", "embedding", c,
      routedThreshold = Int.MaxValue)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    assert(routed === flat)
    assert(flat.forall(_._2 < 16), "duplicate centroid ties must go to cid 0")
  }

  test("routed dispatch past routedThreshold prunes supers yet assigns separated clusters exactly") {
    // 100 one-hot centroids in dim 100; every vector IS its centroid, so
    // the true assignment is known. g = 10 supers, nprobe 2 < g: routing
    // really prunes (each probe scans ~20 of 100 centroids), and a
    // vector's own super always outranks the orthogonal rest, so the
    // routed result must still be exact.
    val dim = 100
    val c = spark.range(100).toDF("cid")
      .select(col("cid").cast("int").as("cid"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => when(i === col("cid"), 1.0f).otherwise(0.0f)).as("cvec"))
    val e = spark.range(300).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(dim - 1)),
        i => when(i === pmod(col("id"), lit(100)).cast("int"), 1.0f)
          .otherwise(0.0f)))
    val got = SemDedup.assign(e, "id", "v", c,
      routedThreshold = 4, nprobe = 2)
      .as[(Long, Int)].collect().toSeq
    assert(got.size === 300)
    assert(got.forall { case (id, cid) => cid === (id % 100).toInt },
      "routed assignment must recover the planted cluster for every vector")
  }

  test("assignScored evaluates the centroid lineage exactly once (flat and routed)") {
    // r15 ADVICE: the dispatch count() plus the routed path's
    // 2·superIterations+3 centroid references used to re-run the
    // caller's centroid lineage each time. localizeCentroids snapshots
    // it — an accumulator-instrumented lineage must tick exactly k rows
    // per assignment, regardless of path.
    val dim = 16
    def instrumented() = {
      val acc = spark.sparkContext.longAccumulator("centroid-evals")
      val tick = udf { (cid: Int) => acc.add(1); cid }
      val c = spark.range(9).toDF("cid")
        .select(tick(col("cid").cast("int")).as("cid"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => when(pmod(i, lit(9)) === col("cid"), 1.0f)
              .otherwise(0.0f)).as("cvec"))
      (c, acc)
    }
    val e = spark.range(30).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(dim - 1)),
        i => when(i === pmod(col("id"), lit(9)).cast("int"), 1.0f)
          .otherwise(0.0f)))
    val (cFlat, accFlat) = instrumented()
    SemDedup.assignScored(e, "id", "v", cFlat).collect()
    assert(accFlat.value === 9L,
      s"flat path evaluated the centroid lineage ${accFlat.value}/9 times")
    val (cRouted, accRouted) = instrumented()
    SemDedup.assignScored(e, "id", "v", cRouted,
      routedThreshold = 4, nprobe = 2).collect()
    assert(accRouted.value === 9L,
      s"routed path evaluated the centroid lineage ${accRouted.value}/9 times")
  }

  test("prototypePrune: pruneFrac 0 keeps everything; ranking ties break to the smaller id") {
    val e = emb(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(1f, 0f),
      4L -> Seq(1f, 0f))
    val c = cents(0 -> Seq(1f, 0f))
    val all = SemDedup.prototypePrune(e, "id", "v", c, pruneFrac = 0.0)
      .as[(Long, Int, Double, Boolean)].collect()
    assert(all.forall(_._4), "pruneFrac 0 must keep every example")
    // all protos tie at 1.0: the drop must hit the SMALLEST ids first
    val half = SemDedup.prototypePrune(e, "id", "v", c, pruneFrac = 0.5)
      .as[(Long, Int, Double, Boolean)].collect()
    assert(half.filter(!_._4).map(_._1).sorted.toSeq === Seq(1L, 2L))
  }
}
