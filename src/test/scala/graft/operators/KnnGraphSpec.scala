package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private def graphRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq

  test("one cluster degenerates to exact brute-force top-k for every vector") {
    val embs = Tables.embeddings(spark, sfDir)
    val one = embs.limit(1)
      .select(lit(0).as("cid"), col("embedding").as("cvec"))
    val graph = graphRows(
      KnnGraph.build(embs, "vec_id", "embedding", one, k = 5))
    val exact = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
        embs, "vec_id", "embedding", k = 5)
      .select(col("qid").cast("long"), col("id"), col("cos"), col("rank"))
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(graph === exact)
  }

  test("planted near-identical vectors are mutual top-1 across two clusters") {
    val d = 8
    def v(axis: Int, eps: Double): Seq[Float] =
      Seq.tabulate(d)(i => (if (i == axis) 1.0 else if (i == axis + 1) eps
        else 0.0).toFloat)
    // cluster around axis 0: ids 1,2 near-identical; around axis 4: 3,4
    val embs = Seq(
      (1L, v(0, 0.01)), (2L, v(0, 0.02)),
      (3L, v(4, 0.01)), (4L, v(4, 0.02))).toDF("vec_id", "embedding")
    val cents = Seq((0, v(0, 0.0)), (1, v(4, 0.0))).toDF("cid", "cvec")
    val top1 = KnnGraph.build(embs, "vec_id", "embedding", cents,
        k = 1, nprobe = 1)
      .select("id", "nbr").as[(Long, Long)].collect().toMap
    assert(top1 === Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L))
  }

  test("clustered graph recalls most exact neighbors on real embeddings") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("knn_ivf").toString
    IvfIndex.build(embs, "vec_id", "embedding", dir, k = 4, iterations = 2)
    val cents = spark.read.parquet(s"$dir/centroids")
    val graph = KnnGraph.build(embs, "vec_id", "embedding", cents, k = 5)
    val sample = Seq(0L, 11L, 42L, 77L, 123L)
    val exact = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
        embs.filter(col("vec_id").isin(sample.map(Long.box): _*)),
        "vec_id", "embedding", k = 5)
      .select(col("qid").cast("long").as("id"), col("id").as("nbr"))
      .as[(Long, Long)].collect().toSet
    val got = graph.filter(col("id").isin(sample.map(Long.box): _*))
      .select("id", "nbr").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 over sample = $recall")
  }

  test("propagate: hand-computed integer trajectory, isolated node unchanged") {
    // edges: 1->2 (w 500), 1->3 (w 250), 2->1 (w 500); 3 has no out-edges
    val graph = Seq((1L, 2L, 0.5), (1L, 3L, 0.25), (2L, 1L, 0.5))
      .toDF("id", "nbr", "cos")
    val seeds = Seq((1L, 1000000L), (2L, 0L), (3L, 600000L))
      .toDF("vec_id", "s0")
    val out = KnnGraph.propagate(graph, seeds, "vec_id", "s0",
        alphaNum = 4, alphaDen = 5, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // iter1: s=(360000, 800000, 600000); iter2 from those
    assert(out(1L) === ((1000000L, 786666L)))
    assert(out(2L) === ((0L, 288000L)))
    assert(out(3L) === ((600000L, 600000L)))
  }

  test("propagateWeighted on pre-derived weights equals the cosine wrapper") {
    val graph = Seq((1L, 2L, 0.5), (1L, 3L, 0.25), (2L, 1L, 0.5),
        (4L, 1L, 0.0004)) // rounds to w=0: wrapper must drop it
      .toDF("id", "nbr", "cos")
    val seeds = Seq((1L, 1000000L), (2L, 0L), (3L, 600000L), (4L, 77L))
      .toDF("vec_id", "s0")
    val viaCos = KnnGraph.propagate(graph, seeds, "vec_id", "s0", 4, 5, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = Seq((1L, 2L, 500L), (1L, 3L, 250L), (2L, 1L, 500L))
      .toDF("id", "nbr", "w")
    val viaW = KnnGraph.propagateWeighted(edges, seeds, "vec_id", "s0", 4, 5, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaCos === viaW)
    assert(viaW(4L) === 77L, "w=0 edge dropped: node 4 is isolated")
  }

  test("propagate is partitioning-invariant (integer arithmetic end-to-end)") {
    val n = 300
    val graph = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong, 0.8),
        (i.toLong, ((i + 7) % n).toLong, 0.3))
    }.toDF("id", "nbr", "cos")
    val seeds = (0 until n).map(i => (i.toLong, (i * 3331L) % 1000001L))
      .toDF("vec_id", "s0")
    def run(parts: Int) =
      KnnGraph.propagate(graph.repartition(parts), seeds.repartition(parts),
          "vec_id", "s0", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run(1) === run(16))
  }

  // shared hand graph for the centrality tests: 4 = isolated (no edges)
  private def handEdges =
    Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 3L))
      .toDF("id", "nbr", "w")
  private def handNodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")

  test("pageRank matches the hand-computed integer trajectory") {
    // wt: 1->3, 2->1, 3->3; flows (HALF_UP s·w/wt at s=base):
    //   1->2: 666667, 1->3: 333333, 2->1: 1000000, 3->1: 1000000
    // s1 = HALF_UP((15e6 + 85·infl)/100):
    //   1: infl 2e6 -> 1850000;  2: 666667 -> 716667
    //   3: 333333 -> 433333;     4: 0 -> 150000
    val out = KnnGraph.pageRank(handEdges, handNodes, "vec_id", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1850000L, 2L -> 716667L, 3L -> 433333L,
      4L -> 150000L))
  }

  test("pageRank is partitioning-invariant and conserves the score range") {
    val n = 200
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong, 700L),
        (i.toLong, ((i * 13 + 5) % n).toLong, 300L))
    }.toDF("id", "nbr", "w")
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    def run(parts: Int) =
      KnnGraph.pageRank(edges.repartition(parts), nodes.repartition(parts),
          "vec_id", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(1)
    assert(a === run(16))
    // every node both sends and receives its full mass each iteration up
    // to HALF_UP truncation, so scores stay near base
    assert(a.values.forall(s => s > 900000L && s < 1100000L))
  }

  test("pageRankFrom concentrates restart mass on the seed") {
    // restarts: node 1 = 1e6, rest 0. s0 = r; flows only from node 1:
    //   1->2: 666667, 1->3: 333333. s1 = HALF_UP((15·r + 85·infl)/100):
    //   1: 150000 (restart only), 2: HALF_UP(85·666667/100) = 566667,
    //   3: HALF_UP(85·333333/100) = 283333, 4: 0
    val restarts = Seq((1L, 1000000L), (2L, 0L), (3L, 0L), (4L, 0L))
      .toDF("vec_id", "r")
    val out = KnnGraph.pageRankFrom(handEdges, restarts, "vec_id", "r",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 150000L, 2L -> 566667L, 3L -> 283333L,
      4L -> 0L))
  }

  test("uniform pageRankFrom equals pageRank") {
    val restarts = handNodes.withColumn("r", lit(1000000L))
    val a = KnnGraph.pageRankFrom(handEdges, restarts, "vec_id", "r",
        iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = KnnGraph.pageRank(handEdges, handNodes, "vec_id", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("conserveDangling pageRank: hand trajectory, dangling mass shared") {
    // node 4 is dangling with s0 = base = 1e6; N = 4 so the uniform
    // share is HALF_UP(1e6/4) = 250000, added INSIDE the damped term:
    //   s1(i) = HALF_UP((15e6 + 85·(infl_i + 250000)) / 100)
    //   1: infl 2e6   -> 2062500;  2: 666667 -> 929167
    //   3: 333333     -> 645833;   4: 0      -> 362500
    val out = KnnGraph.pageRank(handEdges, handNodes, "vec_id", iters = 1,
        conserveDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2062500L, 2L -> 929167L, 3L -> 645833L,
      4L -> 362500L))
  }

  test("conserveDangling equals truncated pageRank when nothing dangles") {
    // every node has out-edges -> dangling sum 0 -> share 0 -> identical
    val n = 50
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong, 700L),
        (i.toLong, ((i * 13 + 5) % n).toLong, 300L))
    }.toDF("id", "nbr", "w")
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    val a = KnnGraph.pageRank(edges, nodes, "vec_id", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = KnnGraph.pageRank(edges, nodes, "vec_id", iters = 2,
        conserveDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("conserveDangling keeps total mass near N·base; truncated leaks it") {
    // a chain 0->1->...->k where the tail is dangling: the truncated
    // variant drains the tail's mass every iteration, the conserving
    // variant redistributes it (exact up to HALF_UP rounding, ±1 per
    // node per iteration)
    val n = 40
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong, 1000L))
      .toDF("id", "nbr", "w")
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    val iters = 3
    def total(conserve: Boolean) =
      KnnGraph.pageRank(edges, nodes, "vec_id", iters = iters,
          conserveDangling = conserve)
        .agg(sum("s")).head().getLong(0)
    val base = 1000000L
    val conserved = total(conserve = true)
    // HALF_UP slack: ±0.5 per flow, per node update, and per share slice
    // -> well under 2 micro-units per node per iteration
    assert(math.abs(conserved - n * base) <= 2L * n * iters,
      s"conserving variant leaked mass: $conserved vs ${n * base}")
    assert(total(conserve = false) < conserved,
      "truncated variant should strictly leak the dangling tail's mass")
  }

  test("hits matches the hand-computed integer trajectory") {
    // a_raw = (4e6, 2e6, 1e6, 0), max 4e6 -> a = (1e6, 5e5, 25e4, 0)
    // h_raw = (1.25e6, 1e6, 3e6, 0), max 3e6 -> h = (416667, 333333, 1e6, 0)
    val out = KnnGraph.hits(handEdges, handNodes, "vec_id", iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      1L -> ((416667L, 1000000L)),
      2L -> ((333333L, 500000L)),
      3L -> ((1000000L, 250000L)),
      4L -> ((0L, 0L))))
  }

  test("hits is partitioning-invariant with max pinned to base") {
    val n = 200
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 3) % n).toLong, 500L),
        (i.toLong, ((i * 7 + 1) % n).toLong, 200L))
    }.toDF("id", "nbr", "w")
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    def run(parts: Int) =
      KnnGraph.hits(edges.repartition(parts), nodes.repartition(parts),
          "vec_id", iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(1)
    assert(a === run(16))
    assert(a.values.map(_._1).max === 1000000L)
    assert(a.values.map(_._2).max === 1000000L)
  }

  // undirected triangle 1-2-3 (as directed edges, one mutual pair to
  // exercise the two-directions collapse) + pendant 4->1 + isolated 5
  private def triEdges = Seq(
    (1L, 2L, 10L), (2L, 1L, 10L), (2L, 3L, 10L), (3L, 1L, 10L),
    (4L, 1L, 10L)).toDF("id", "nbr", "w")
  private def triNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")

  test("triangles: hand-computed counts, HALF_UP lcc, isolated node zeroed") {
    val out = KnnGraph.triangles(triEdges, triNodes, "vec_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // node 1: deg 3 (2,3,4), tri 1, lcc = HALF_UP(2e6/6) = 333333
    assert(out === Map(
      1L -> ((3L, 1L, 333333L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L)),
      4L -> ((1L, 0L, 0L)),
      5L -> ((0L, 0L, 0L))))
  }

  test("triangles counts each ordered triple once regardless of partitioning") {
    // K4 on {1,2,3,4}: every node deg 3, tri C(3,2)=3, lcc = 1e6
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b, 5L)).toDF("id", "nbr", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    for (parts <- Seq(1, 8)) {
      val out = KnnGraph.triangles(k4.repartition(parts), nodes, "vec_id")
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(out === Set((3L, 3L, 1000000L)))
    }
  }

  test("labelPropagation: weighted-majority trajectory with smaller-label ties") {
    // 1<->2 heavy; 3 votes {2:w3, 4:w2}; 4 -> 3
    val edges = Seq((1L, 2L, 5L), (2L, 1L, 5L), (3L, 2L, 3L),
      (3L, 4L, 2L), (4L, 3L, 9L)).toDF("id", "nbr", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("vec_id")
    def labels(iters: Int) =
      KnnGraph.labelPropagation(edges, nodes, "vec_id", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: each node adopts its (only/heaviest) neighbor's id
    assert(labels(1) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      9L -> 9L))
    // round 2 re-votes over round-1 labels; neighbor-less 9 never moves
    assert(labels(2) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L,
      9L -> 9L))
    // equal-weight tie goes to the smaller label: 5 sees {6:w7, 7:w7}
    val tie = Seq((5L, 6L, 7L), (5L, 7L, 7L)).toDF("id", "nbr", "w")
    val t = KnnGraph.labelPropagation(tie,
        Seq(5L, 6L, 7L).toDF("vec_id"), "vec_id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t(5L) === 6L)
  }

  test("kcorePeel: pendant peeled, core kept, over-k empties the graph") {
    val out = KnnGraph.kcorePeel(triEdges, triNodes, "vec_id",
        k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: only node 1 has deg 3 in round 1, then its neighbors are
    // gone, so round 2 peels it too
    assert(KnnGraph.kcorePeel(triEdges, triNodes, "vec_id",
      k = 3, rounds = 2).count() === 0L)
  }

  test("peelLayers: layers partition the nodes and match manual peeling") {
    // triangle 1-2-3 + pendant 4 + isolated 5, k=2: round 1 peels 4 and
    // 5 (deg 1, 0), the triangle survives every later round
    val out = KnnGraph.peelLayers(triEdges, triNodes, "vec_id",
        k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1))
    // k=3 cascades: 2,3,4,5 fall in round 1 (deg < 3), stranding 1 for
    // round 2 — the onion signal the real graph's query relies on
    val casc = KnnGraph.peelLayers(triEdges, triNodes, "vec_id",
        k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(casc === Map(1L -> 2, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("peel layers and label propagation converge on the real intdot graph") {
    // the query-parameter convergence assertion the scaladocs promise:
    // at sf0.001 rounds=3 equals rounds=4 for peelLayers(k=6), so the
    // bounded-round contract has reached its fixpoint at the query's
    // parameters (labelPropagation intentionally has no such claim —
    // synchronous LPA may oscillate; the query pins iters=3)
    val embs = Tables.embeddings(spark, sfDir)
    val edges = Similarity.intDotTopKBatch(embs, "vec_id", "embedding",
        embs, "vec_id", "embedding", k = 5)
      .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
      .filter(col("dot") > 0)
      .withColumn("w",
        expr("(2000 * dot + 1099511627776) div 2199023255552"))
      .filter(col("w") > 0)
      .select("id", "nbr", "w")
      .localCheckpoint()
    def layers(r: Int) =
      KnnGraph.peelLayers(edges, embs, "vec_id", k = 6, rounds = r)
        .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    val l3 = layers(3)
    assert(l3 === layers(4))
    assert(l3.values.toSet.size > 1,
      "every node in one layer — parameters vacuous")
    val lp = KnnGraph.labelPropagation(edges, embs, "vec_id", 3)
      .select("lbl").distinct().count()
    assert(lp > 1 && lp < 500,
      s"label propagation degenerated to $lp communities")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "nbr", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def rebuild(corpus: org.apache.spark.sql.DataFrame, k: Int) =
    Similarity.intDotTopKBatch(corpus, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k)
      .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))

  test("insertExact on real embeddings is bit-equal to a full rebuild") {
    val all = Tables.embeddings(spark, sfDir)
    val resident = all.filter(col("vec_id") % 10 =!= 0)
    val delta = all.filter(col("vec_id") % 10 === 0)
    val merged = KnnGraph.insertExact(rebuild(resident, 5), resident,
      delta, "vec_id", "embedding", k = 5)
    assert(edgeSet(merged) === edgeSet(rebuild(all, 5)))
  }

  test("deleteExact repairs exactly the affected ids, bit-equal to rebuild") {
    val all = Tables.embeddings(spark, sfDir)
    val rm = all.filter(col("vec_id") % 5 === 0).select("vec_id")
    val after = KnnGraph.deleteExact(rebuild(all, 5), all, rm,
      "vec_id", "embedding", k = 5)
    val remaining = all.filter(col("vec_id") % 5 =!= 0)
    assert(edgeSet(after) === edgeSet(rebuild(remaining, 5)))
    // and the removed ids are really gone from both roles
    val ids = after.select("id")
      .unionByName(after.select(col("nbr").as("id")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 5 != 0))
  }

  test("modularity: hand-computed partition score, sign conventions") {
    // two clean communities {1,2} and {3,4} plus one cross edge:
    // m=42, intra=40, dout_c=(22,20), din_c=(20,22), cross=880,
    // Q = (42·40 − 880)/42² = 800/1764 → HALF_UP micro 453515
    val g = Seq((1L, 2L, 10L), (2L, 1L, 10L), (3L, 4L, 10L),
      (4L, 3L, 10L), (1L, 3L, 2L)).toDF("id", "nbr", "w")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "lbl")
    val r = KnnGraph.modularity(g, lab).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 42L, 40L, 453515L)))
    // everything in ONE community: intra=m and cross=m², so Q = 0
    val one = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("id", "lbl")
    assert(KnnGraph.modularity(g, one).head().getLong(3) === 0L)
    // anti-community labels (cut both heavy pairs): Q goes NEGATIVE,
    // rounded half-away-from-zero
    val anti = Seq((1L, 1L), (2L, 3L), (3L, 1L), (4L, 3L)).toDF("id", "lbl")
    assert(KnnGraph.modularity(g, anti).head().getLong(3) < 0L)
  }

  test("sharedNeighbors counts out-neighborhood overlap per edge") {
    // N(1)={2,3}, N(2)={1,3}, N(3)={4}, N(4)={3}
    val g = Seq((1L, 2L, 9L), (1L, 3L, 8L), (2L, 1L, 9L), (2L, 3L, 7L),
      (3L, 4L, 6L), (4L, 3L, 6L)).toDF("id", "nbr", "w")
    val got = KnnGraph.sharedNeighbors(g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(got === Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 0L, // N(1)∩N(2)={3}; N(1)∩N(3)=∅
      (2L, 1L) -> 1L, (2L, 3L) -> 0L,
      (3L, 4L) -> 0L, (4L, 3L) -> 0L))
  }

  test("deleteExact hand case: survivor's lost rank-1 is repaired from rank-2") {
    // vectors on axes: 1 ~ 2 (near-identical), 3 further from 1, 4 far
    def v(a: Double, b: Double): Seq[Float] =
      Seq(a.toFloat, b.toFloat, 0f, 0f)
    val embs = Seq(
      (1L, v(1.0, 0.0)), (2L, v(0.99, 0.1)),
      (3L, v(0.7, 0.7)), (4L, v(0.0, 1.0))).toDF("vec_id", "embedding")
    val st = rebuild(embs, 1)
    // node 1's top-1 is 2; removing 2 must promote 3, not leave a hole
    val after = KnnGraph.deleteExact(st, embs,
      Seq(2L).toDF("vec_id"), "vec_id", "embedding", k = 1)
    val top1 = after.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(1L) === 3L)
    assert(!top1.contains(2L))
  }
}
