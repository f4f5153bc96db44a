package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorKernels

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.col

class SimilaritySpec extends SparkSpec {

  test("cosine kernel basics") {
    def arr(xs: Float*) = new GenericArrayData(xs.toArray)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(0f, 1f))) < 1e-12)
    assert(VectorKernels.cosine(arr(0f, 0f), arr(1f, 1f)) == 0.0)
    assert(math.abs(VectorKernels.dot(arr(1f, 2f), arr(3f, 4f)) - 11.0) < 1e-12)
  }

  test("driverCos ≡ cosine_similarity bit-for-bit on fixture vectors") {
    // the MMR greedy loop's pairwise penalties come from the DRIVER-side
    // cosine; this pins it to the Catalyst kernel (the rel path, which
    // ns_ann_mmr_lambda1 proves ≡ DuckDB to round-3) so the λ=0.6
    // oracle's maxSim population rides the same certified arithmetic
    val rows = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 64)
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val q = rows.find(_._1 == 0L).get._2
    val engine = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 64)
      .select(col("vec_id"), graft.functions.cosine_similarity(
        col("embedding"),
        org.apache.spark.sql.functions.typedlit(q.toSeq)).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    engine.zip(rows).foreach { case ((id1, ce), (id2, v)) =>
      assert(id1 == id2)
      assert(java.lang.Double.doubleToLongBits(ce) ==
        java.lang.Double.doubleToLongBits(Similarity.driverCos(v, q)),
        s"vec $id1: engine $ce != driver ${Similarity.driverCos(v, q)}")
    }
  }

  test("brute-force top-k returns k rows sorted by similarity desc") {
    val topk = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10).collect()
    assert(topk.length == 10)
    val sims = topk.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("hardNegatives excludes the anchor's label and ranks by cosine") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir)
    val anchors = embs.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      anchors, "vec_id", "embedding", "label", k = 4).collect()
    val anchorLabels = anchors.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty && out.length <= 5 * 4)
    for (r <- out) {
      val (qid, id, negLabel) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(id != qid, "self must be excluded")
      assert(negLabel != anchorLabels(qid), s"anchor $qid mined its own label")
    }
    // per-anchor ranks are 1..k and cosine is non-increasing in rank
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("tripletMine: planted geometry yields the known positive, negative, margin") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // anchor along x; same-label close (cos .8), same-label far (cos 0),
    // diff-label CLOSER than the positive (cos ~.98) -> negative margin
    val embs = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.8f, 0.6f), 0),  // positive, cos 0.8
      (2L, Array(0f, 1f), 0),      // same label, cos 0
      (3L, Array(0.98f, 0.199f), 1), // hard negative, cos ~0.98
      (4L, Array(-1f, 0f), 1)      // easy negative, cos -1
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMine(embs, "vec_id", "embedding", "label",
        embs.filter(col("vec_id") === 0), "vec_id", "embedding", "label")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 1L && r.getDouble(2) === 0.8)   // pos
    assert(r.getLong(3) === 3L)                              // hard neg
    assert(r.getDouble(4) > 0.9)
    assert(r.getDouble(5) < 0, "hard negative must yield a negative margin")
    assert(r.getDouble(5) === BigDecimal(r.getDouble(2) - r.getDouble(4))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hardNegatives excludes null-labeled rows instead of silently dropping anchors") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val embs = Tables.embeddings(spark, sfDir)
      .withColumn("label",
        when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("label")))
    val anchors = embs.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      anchors, "vec_id", "embedding", "label", k = 3).collect()
    // null-labeled anchors (vec_id 0) yield nothing; the rest still mine
    assert(!out.exists(_.getLong(0) % 7 == 0))
    assert(out.map(_.getLong(0)).distinct.length == 4)
    // and no null-labeled candidate is ever emitted
    assert(out.forall(r => !r.isNullAt(2) && r.getLong(1) % 7 != 0))
  }

  test("LSH top-k recall vs brute force is reasonable") {
    val brute = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    // multi-probe hamming<=2 over 8 planes: expect most of the true top-10
    assert((brute & lsh).size >= 5, s"recall too low: ${(brute & lsh).size}/10")
  }

  test("materialized index probe scans only bucket-pruned partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.col

    val embs = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("ann_index").toString
    Similarity.buildIndex(embs, "vec_id", "embedding", indexDir)

    val queryVec = embs.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val probe = Similarity.indexTopK(spark, indexDir, queryVec, 10)
    val got = probe.collect()

    // recall: same candidate generation as lshTopK (identical kernel), so
    // the same bar holds
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = got.map(_.getLong(0)).toSet - 0L
    assert((brute & idx).size >= 5, s"recall too low: ${(brute & idx).size}/10")

    // plan: the scan must open only the probed buckets' files
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    }
    val scan = scans(probe.queryExecution.executedPlan).head
    val scannedFiles = scan.metrics("numFiles").value
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBuckets = fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .count(_.getPath.getName.startsWith("bucket="))
    val totalFiles = spark.read.parquet(indexDir).inputFiles.length
    assert(scannedFiles > 0)
    assert(scannedFiles < totalFiles,
      s"scan read $scannedFiles of $totalFiles files — no partition pruning")
    assert(totalBuckets > Similarity.probeBuckets(0L, 8, 2).size,
      "index must have more buckets than the probe list for the assertion to bite")
  }

  test("IVF index: recall vs brute force, probe scans only nprobe lists") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.col

    val embs = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    IvfIndex.build(embs, "vec_id", "embedding", indexDir, k = 16, iterations = 2)

    // every vector is in exactly one inverted list
    val lists = spark.read.parquet(s"$indexDir/lists")
    assert(lists.count() == embs.count())
    assert(lists.select("id").distinct().count() == embs.count())

    val queryVec = embs.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val probe = IvfIndex.topK(spark, indexDir, queryVec, k = 11, nprobe = 4)
    val got = probe.collect()

    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = got.map(_.getLong(0)).toSet - 0L
    assert((brute & ivf).size >= 5, s"recall too low: ${(brute & ivf).size}/10")

    // the probe must scan only the nprobe lists' files (4 of 16)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    }
    val scan = scans(probe.queryExecution.executedPlan).head
    val scannedFiles = scan.metrics("numFiles").value
    val totalFiles = lists.inputFiles.length
    assert(scannedFiles > 0 && scannedFiles < totalFiles,
      s"scan read $scannedFiles of $totalFiles files — no list pruning")
  }

  test("batch brute-force equals per-query brute force; batch index recall") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 5)
    val batch = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // per-query reference
    (0L until 5L).foreach { q =>
      val single = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 5)
        .collect().map(_.getLong(0)).toSet
      assert(batch(q) === single, s"query $q: batch != single")
    }

    val dir = java.nio.file.Files.createTempDirectory("bidx").toString
    Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6)
    val idx = Similarity.indexTopKBatch(spark, dir, queries, "vec_id",
      "embedding", k = 5, numPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 5L).map(q => (batch(q) & idx.getOrElse(q, Set.empty)).size).sum
    assert(recall >= 13, s"batch index recall too low: $recall/25")
  }

  test("batch IVF probe: recall vs brute force, lists pruned to the probed cids") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

    val dir = java.nio.file.Files.createTempDirectory("ivf_batch").toString
    IvfIndex.build(embs, "vec_id", "embedding", dir, k = 16, iterations = 2)
    val probe = IvfIndex.topKBatch(spark, dir, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val got = probe
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 5L).map(q => (brute(q) & got.getOrElse(q, Set.empty)).size).sum
    assert(recall >= 13, s"batch IVF recall too low: $recall/25")

    // the lists scan must be pruned to the union of probed cids — asserted
    // on a single-query plan (its union is ≤ nprobe of 16 lists by
    // construction; five spread queries could legitimately probe them all)
    val one = IvfIndex.topKBatch(spark, dir,
      embs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5, nprobe = 4)
    one.collect()
    // AQE wraps materialized stages in leaf QueryStageExec nodes whose
    // subplan lives in .plan, not .children — descend through them too
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case other =>
        (other.collect {
          case f: FileSourceScanExec => Seq(f)
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec => scans(q.plan)
        }).flatten
    }
    val listScan = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/lists")))
    val totalFiles = spark.read.parquet(s"$dir/lists").inputFiles.length
    assert(listScan.nonEmpty)
    val scanned = listScan.map(_.metrics("numFiles").value).max
    assert(scanned > 0 && scanned < totalFiles,
      s"lists scan read $scanned of $totalFiles files — no pruning")
  }

  test("int8 quantization: 1 byte/dim payloads, high recall vs float ranking") {
    val embs = Tables.embeddings(spark, sfDir)
    val q = Similarity.quantize(embs, "vec_id", "embedding").cache()
    try {
      // payload is exactly dims bytes (4x smaller than float32)
      val (dims, bytes) = embs.select(
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("embedding")))
        .head().getInt(0) -> q.select("qvec").head().getAs[Array[Byte]](0).length
      assert(bytes == dims)

      val qv = q.filter(org.apache.spark.sql.functions.col("id") === 0)
        .select("qvec").head().getAs[Array[Byte]](0)
      val quantTop = Similarity.quantizedTopK(q, qv, queryId = 0, k = 10)
        .collect().map(_.getLong(0)).toSet
      val floatTop = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
        .collect().map(_.getLong(0)).toSet
      val recall = (quantTop & floatTop).size
      assert(recall >= 8, s"quantized recall too low: $recall/10")
    } finally q.unpersist()
  }

  test("embedStats: norms, ranges, unit flag on known vectors") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(3f, 4f)),          // norm 5
      (2L, Array(0.6f, 0.8f)),      // unit
      (3L, Array(0f, 0f))           // degenerate zero vector
    ).toDF("vec_id", "embedding")
    val got = Similarity.embedStats(embs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(1L) === ((2, 5.0, 3.0, 4.0, false)))
    assert(got(2L)._2 === 1.0 && got(2L)._5 === true)
    assert(got(3L) === ((2, 0.0, 0.0, 0.0, false)))
  }

  test("mmrTopK at lambda=1 equals brute-force top-k, rank for rank") {
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
      .as[(Long, Double)].collect().toSeq
    val mmr = Similarity.mmrTopK(embs, "vec_id", "embedding", 0, 10, lambda = 1.0)
      .orderBy("rank").as[(Int, Long, Double)].collect().toSeq
    assert(mmr.map(t => (t._2, t._3)) === brute)
    assert(mmr.map(_._1) === (1 to 10))
  }

  test("mmrTopK diversifies: near-duplicate candidates are demoted") {
    import spark.implicits._
    // query q = e0. Cluster A (ids 1-5): rel ~0.9 to q but mutually
    // near-identical (pairwise cos ~1). Cluster B (ids 6-10): rel ~0.85,
    // mutually dissimilar (pairwise ~0.72) and ~0.765 to A. Plain top-k
    // fills from A; MMR must escape to B once one A member is taken
    // (A2's penalty ~1.0 crushes its margin, B's ~0.77 does not).
    val rows = Seq((0L, { val v = Array.fill(8)(0f); v(0) = 1f; v })) ++
      (1L to 5L).map(i => (i, {
        val v = Array.fill(8)(0f)
        v(0) = 0.9f; v(1) = 0.4359f; v(2) = 0.001f * i; v
      })) ++
      (6L to 10L).map(i => (i, {
        val v = Array.fill(8)(0f)
        v(0) = 0.85f; v(i.toInt - 3) = 0.5268f; v
      }))
    val embs = rows.toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(plain === Set(1L, 2L, 3L, 4L))  // all near-dups
    val mmr = Similarity.mmrTopK(embs, "vec_id", "embedding", 0, 4,
        lambda = 0.5, candidateFactor = 3)
      .as[(Int, Long, Double)].collect().map(_._2)
    // first pick is still the most relevant; later picks escape the
    // near-dup cluster (penalty ~1.0 within it vs ~0.7 across)
    assert(mmr.head === 1L)
    assert(mmr.count(_ >= 6L) >= 2, s"expected diversified picks, got ${mmr.toSeq}")
    // deterministic rerun
    val rerun = Similarity.mmrTopK(embs, "vec_id", "embedding", 0, 4,
        lambda = 0.5, candidateFactor = 3)
      .as[(Int, Long, Double)].collect().map(_._2)
    assert(rerun.toSeq === mmr.toSeq)
  }

  test("intDotTopKBatch matches a serial BigInt reference bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 4)
    val out = Similarity.intDotTopKBatch(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // serial reference: same quantization law, arbitrary-precision dot —
    // proves the distributed int64 arithmetic never overflowed or diverged
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong).toArray
    val all = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1)))
    val qs = all.filter(_._1 < 4)
    for ((qid, qv) <- qs) {
      val ranked = all.filter(_._1 != qid).map { case (id, v) =>
        val dot = v.zip(qv).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
        (id, dot)
      }.sortBy { case (id, dot) => (-dot, id) }.take(5)
      ranked.zipWithIndex.foreach { case ((id, dot), i) =>
        assert(out((qid, i + 1)) == (id, dot.toLong),
          s"query $qid rank ${i + 1}")
      }
    }
  }

  test("intDotTopKBatch raises on an off-contract |dot| >= 2^53 pair") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // components ~2^7 quantize to ~2^27, so a dim-2 dot is ~2^55 — past
    // the point where the double-cast ranking stays integer-exact. The
    // guard must surface as a runtime error, never a silent wrong top-k.
    val bad = Seq((1L, Seq(128f, 128f)), (2L, Seq(128f, 128f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.intDotTopKBatch(bad, "vec_id", "embedding",
        bad, "vec_id", "embedding", k = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("2^53")),
      s"expected the 2^53 contract violation, got: ${messages(ex)}")
    // in-contract inputs are untouched by the guard
    val ok = Seq((1L, Seq(0.5f, -0.25f)), (2L, Seq(0.25f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.intDotTopKBatch(ok, "vec_id", "embedding",
      ok, "vec_id", "embedding", k = 1).collect()
    assert(rows.length == 2 && rows.forall(!_.isNullAt(2)))
  }

  test("binarize of an empty vector is an empty bit array, not phantom words") {
    import org.apache.spark.sql.functions.{col, size => asize, typedLit}
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Float]), (2L, Seq(1f, -1f, 2f)))
      .toDF("id", "v")
      .select(col("id"), Similarity.binarize(col("v")).as("bits"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Long](1).isEmpty, "empty in, empty out")
    assert(rows(1).getSeq[Long](1) == Seq(5L)) // bits 0 and 2 set
    // null stays null
    val n = Seq((3L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
      .select(Similarity.binarize(col("v")).as("bits")).head()
    assert(n.isNullAt(0))
  }

  test("binarize packs sign bits 32 per word; hammingDist counts flips") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 40 dims: positives at 0, 5, 31 (word 0) and 32, 39 (word 1)
    val v = Array.tabulate(40)(i =>
      if (Set(0, 5, 31, 32, 39).contains(i)) 1f else -1f)
    val packed = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(Similarity.binarize(col("v")).as("bits"))
      .as[Seq[Long]].head()
    assert(packed === Seq((1L << 0) + (1L << 5) + (1L << 31),
      (1L << 0) + (1L << 7)))
    // flipping dims 5 and 39 costs Hamming 2
    val v2 = v.clone(); v2(5) = -1f; v2(39) = -1f
    val ham = Seq((v.toSeq, v2.toSeq)).toDF("a", "b")
      .select(Similarity.hammingDist(
        Similarity.binarize(col("a")), Similarity.binarize(col("b"))))
      .as[Int].head()
    assert(ham === 2)
  }

  test("binaryRerank with corpus-covering factor equals brute force exactly") {
    val embs = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rerank = Similarity.binaryRerank(embs, "vec_id", "embedding", 0,
        k = 10, candidateFactor = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rerank === brute)
  }

  test("binary shortlist catches genuinely-near neighbors at small factor") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(d: Int): Array[Float] = {
      val a = Array.fill(d)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n)
    }
    val base = unit(64)
    def nearOf(eps: Float): Seq[Float] = {
      val a = base.zip(unit(64)).map { case (b, p) => b + eps * p }
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n).toSeq
    }
    // query 0 = base; ids 1..5 planted near (cos ~0.995); 6..105 random
    val rows = Seq((0L, base.toSeq)) ++
      (1L to 5L).map(i => (i, nearOf(0.1f))) ++
      (6L to 105L).map(i => (i, unit(64).toSeq))
    val embs = rows.toDF("vec_id", "embedding")
    val got = Similarity.binaryRerank(embs, "vec_id", "embedding", 0,
        k = 5, candidateFactor = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got === (1L to 5L).toSet,
      "planted high-cosine neighbors must survive the binary shortlist")
  }

  test("IVF assignment law: rounded-3 cosine, ties to the SMALLER cid, vec kept") {
    import spark.implicits._
    // cid 0 and cid 1 are IDENTICAL centroids — an exact rounded-cosine
    // tie for every vector, which must break to the smaller cid (the one
    // cross-engine convention shared with SemDedup.assign; the retired
    // max_by(struct(cos, cid)) shape broke ties to the LARGER cid)
    val cents = Seq(
      (0, Seq(1.0f, 0.0f)), (1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val vecs = Seq(
      (10L, Seq(1.0f, 0.0f)),   // ties 0 vs 1 -> 0
      (11L, Seq(0.6f, 0.8f)),   // cos .6 vs .8 -> cid 2
      (12L, Seq(0.7071f, 0.7071f))) // rounded .707 everywhere -> 0
      .toDF("id", "vec")
    val got = IvfIndex.assign(vecs, cents, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(10L -> 0, 11L -> 2, 12L -> 0))
    // the vector rides the aggregate (the encode pass writes it)
    val withVec = IvfIndex.assign(vecs, cents, k = 3)
      .filter(col("id") === 11L).collect()(0)
    assert(withVec.getSeq[Float](2) === Seq(0.6f, 0.8f))
  }

  test("assignment argmax plans HashAggregate, never SortAggregate (the retired wall)") {
    // The r15 wall re-imported itself once via an innocent `first(v)`
    // (array buffer demotes the whole aggregate to SortAggregate over the
    // N·k candidate relation) — this is the automated invariant the r15
    // verdict asked for: assign/assignScored must plan a HashAggregate
    // and ZERO SortAggregates, and PlanAudit.violations must catch the
    // retired shape if it ever comes back.
    import spark.implicits._
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, SortAggregateExec}
    val cents = (0 until 8).map(c => (c, Seq(c.toFloat, 1.0f))).toDF("cid", "cvec")
    val vecs = (0L until 32L).map(i => (i, Seq(i.toFloat, 1.0f))).toDF("id", "vec")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan = the contract
    try {
      def check(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val plan = df.queryExecution.executedPlan
        assert(plan.collect { case h: HashAggregateExec => h }.nonEmpty,
          s"$tag: argmax must plan as HashAggregate")
        assert(plan.collect { case a: SortAggregateExec => a }.isEmpty,
          s"$tag: SortAggregate fallback present — the retired N·k wall is back")
        assert(graft.PlanAudit.violations(plan).isEmpty, s"$tag: PlanAudit violations")
      }
      check(IvfIndex.assign(vecs, cents, k = 8), "IvfIndex.assign")
      check(SemDedup.assignScored(vecs, "id", "vec", cents), "SemDedup.assignScored")
      // negative control: the retired max_by(struct)+first(v) shape must
      // trip the new PlanAudit invariant (proves the detector sees the
      // wall, not just that today's plans happen to be clean)
      import org.apache.spark.sql.functions.{broadcast, first, max_by, struct}
      val retired = vecs.crossJoin(broadcast(cents))
        .withColumn("cos",
          graft.functions.cosine_similarity(col("vec"), col("cvec")))
        .groupBy("id")
        .agg(max_by(col("cid"), struct(col("cos"), col("cid"))).as("cid"),
          first(col("vec")).as("vec"))
      val v = graft.PlanAudit.violations(retired.queryExecution.executedPlan)
      assert(v.contains("sort-agg-over-cross-candidates"),
        s"detector missed the retired shape (got: $v)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("fused int_dot_q bit-equals the quantize-then-fold reference") {
    // the reference composition (fixedPointQuantize + intDot) and the
    // codegen'd kernel must never drift apart — every real pair of the
    // sf fixture, both orders
    val embs = graft.Tables.embeddings(spark, sfDir).limit(40)
      .select(col("vec_id"), col("embedding"))
    val pairs = embs.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(embs.select(col("vec_id").as("b"),
        col("embedding").as("vb")))
    val diff = pairs
      .withColumn("fused", graft.functions.int_dot_q(col("va"), col("vb")))
      .withColumn("ref", Similarity.intDot(
        Similarity.fixedPointQuantize(col("va")),
        Similarity.fixedPointQuantize(col("vb"))))
      .filter(col("fused") =!= col("ref"))
      .count()
    assert(diff === 0L)
  }
}
