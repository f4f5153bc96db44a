package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // doc 0 is the "eval" doc (0 % 10 == 0); doc 5 copies its text wholesale
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (5L, "the quick brown fox jumps over the lazy dog again and again"),
    (6L, "a completely different sentence with no shared phrases at all here"),
    (7L, "the quick brown fox appears briefly but then something else entirely")
  ).toDF("doc_id", "text")

  test("contaminationReport flags the verbatim copy, not the unrelated doc") {
    val rep = Curation.contaminationReport(corpus, "doc_id", "text",
      col("doc_id") % 10 === 0, n = 3, minOverlap = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep.keySet === Set(5L, 6L, 7L))        // eval doc excluded
    assert(rep(5L)._2, "verbatim copy must be contaminated")
    assert(rep(5L)._1 === 10L)                    // 12 words -> 10 trigrams
    assert(rep(6L) === ((0L, false)))             // zero overlap, still reported
    assert(!rep(7L)._2, "2 shared trigrams is below the threshold")
    assert(rep(7L)._1 === 2L)
  }

  test("contaminationReport broadcasts the eval side (train side never shuffles)") {
    val plan = Curation.contaminationReport(corpus, "doc_id", "text",
      col("doc_id") % 10 === 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"shingle-overlap join must be broadcast, got:\n$plan")
  }

  test("contaminationReportScalable equals the broadcast variant (bloom prefilter is output-invisible)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Curation.contaminationReport(docs, "doc_id", "text",
      col("doc_id") % 10 === 0, n = 3, minOverlap = 5)
      .orderBy("id").collect().toSeq
    val scalable = Curation.contaminationReportScalable(docs, "doc_id", "text",
      col("doc_id") % 10 === 0, n = 3, minOverlap = 5)
      .orderBy("id").collect().toSeq
    assert(scalable === exact)
  }

  test("contaminationReportScalable probes the bloom filter before the exact join") {
    val plan = Curation.contaminationReportScalable(corpus, "doc_id", "text",
      col("doc_id") % 10 === 0).queryExecution.executedPlan.toString
    assert(plan.contains("bloom_broadcast_probe"),
      s"train side must be bloom-prefiltered via the broadcast-handle probe " +
        s"(no per-row filter column), got:\n$plan")
    assert(!plan.contains("bloom_might_contain"),
      "the column-form probe must not appear on this path (per-row " +
        "getBinary copies the whole filter)")
  }

  test("contaminationReportScalable with an empty eval set reports all-clean") {
    val rep = Curation.contaminationReportScalable(corpus, "doc_id", "text",
      lit(false), n = 3, minOverlap = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep.keySet === Set(0L, 5L, 6L, 7L))
    assert(rep.values.forall(_ == ((0L, false))))
  }

  test("adaptiveQualityFloor keeps ~(1-q) of every domain; sketch variant tracks it within rank error") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Curation.adaptiveQualityFloor(docs, "doc_id", "text", "source",
      floorQuantile = 0.2)
    val byDomain = exact.groupBy("domain")
      .agg(count(lit(1)).as("n"), count(when(col("keep"), 1)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    byDomain.foreach { case (dom, (n, kept)) =>
      val frac = kept.toDouble / n
      // exact 20th-percentile floor keeps ~80%; ties on rounded scores can
      // push the kept side up, never below the quantile's rank
      assert(frac >= 0.78 && frac <= 0.95,
        s"domain $dom kept $kept/$n ($frac) under a 0.2 floor")
    }
    // the sketch path must agree with the exact path on per-domain keep
    // fraction within KLL rank error (~1.65% at k=200, slack to 0.04)
    val sketch = Curation.adaptiveQualityFloorSketch(docs, "doc_id", "text",
      "source", floorQuantile = 0.2)
    val sketchByDomain = sketch.groupBy("domain")
      .agg(count(lit(1)).as("n"), count(when(col("keep"), 1)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    byDomain.foreach { case (dom, (n, kept)) =>
      val (ns, ks) = sketchByDomain(dom)
      assert(ns === n)
      // rank error ~1.65% at k=200, PLUS quantile-convention granularity at
      // tiny domains: the sketch returns an order statistic where the exact
      // path interpolates between two — ±2 docs of slack at small n
      val tol = math.max(0.04, 2.5 / n)
      assert(math.abs(ks.toDouble / ns - kept.toDouble / n) <= tol,
        s"domain $dom: sketch kept $ks/$ns vs exact $kept/$n (tol $tol)")
    }
  }

  test("semanticContaminationReport equals the brute-force cross join") {
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Curation.semanticContaminationReport(embs, "vec_id", "embedding",
      col("vec_id") % 50 === 0, threshold = 0.4)

    // brute-force reference: every (corpus, eval) cosine, same rounding
    val ev = embs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("eid"), col("embedding").as("ev"))
    val c = embs.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val matches = c.crossJoin(broadcast(ev))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("v"), col("ev")), 3))
      .filter(col("cos") >= 0.4)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"), max("cos").as("max_cos"))
    val want = c.select(col("id")).join(matches, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("max_cos"), lit(0.0)).as("max_cos"),
        col("n_matches").isNotNull.as("contaminated"))

    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "LSH-candidate report must equal the exact all-pairs report")
    assert(got.filter(col("contaminated")).count() > 0,
      "fixture must actually contain contamination for the test to bite")

    // the int8-prefiltered variant reports identically (exact float kernel
    // behind a conservative quantized cut — see Dedup.embeddingDupPairs; at
    // this boundary threshold AUTO runs exact, so force the two-stage shape)
    val pre = Curation.semanticContaminationReport(embs, "vec_id", "embedding",
      col("vec_id") % 50 === 0, threshold = 0.4, prefilterMargin = 0.1)
    assert(pre.exceptAll(want).isEmpty && want.exceptAll(pre).isEmpty)
  }

  test("semanticContaminationReport broadcasts the eval side") {
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Curation.semanticContaminationReport(embs, "vec_id", "embedding",
      col("vec_id") % 50 === 0, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval band keys and vectors must broadcast, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join, never a nested loop")
  }

  test("temperatureWeights: tau=1 keeps the natural mix, tau>1 flattens toward uniform") {
    val docs = (Seq.fill(80)("big") ++ Seq.fill(20)("small")).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "source")
    def byDomain(tau: Double) =
      Curation.temperatureWeights(docs, "source", tau).collect()
        .map(r => r.getString(0) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

    // tau = 1: sampled share == natural share, all weights 1
    val t1 = byDomain(1.0)
    assert(t1("big") === ((0.8, 0.8, 1.0)) && t1("small") === ((0.2, 0.2, 1.0)))

    // tau = 2 (sqrt): the tail is upweighted, the head downweighted,
    // shares still sum to 1
    val t2 = byDomain(2.0)
    assert(t2("small")._3 > 1.0 && t2("big")._3 < 1.0)
    assert(math.abs(t2("big")._2 + t2("small")._2 - 1.0) < 1e-6)

    // tau -> infinity approaches the uniform mix
    val tFlat = byDomain(1000.0)
    assert(math.abs(tFlat("big")._2 - 0.5) < 0.01 &&
      math.abs(tFlat("small")._2 - 0.5) < 0.01)
  }

  test("temperatureWeights: a tail domain below 5e-7 share is upweighted, not zeroed") {
    // regression: rounding the share to 6 decimals BEFORE pow zeroed any
    // domain with share < 5e-7 (weight 0 -> applyMixture deletes it — the
    // opposite of temperature sampling). 1 tail doc in 2,000,001 = 5e-7.
    val docs = spark.range(0, 2000001)
      .selectExpr("id AS doc_id",
        "CASE WHEN id = 0 THEN 'tail' ELSE 'head' END AS source")
    val w = Curation.temperatureWeights(docs, "source", temperature = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w("tail") > 1.0,
      s"tail domain must be upweighted under tau=2, got ${w("tail")}")
    assert(w("head") < 1.01 && w("head") > 0.0)
  }

  test("applyMixture: floor/ceil copy counts, dense copy indexes, deterministic") {
    val docs = (0L until 100L).map(i => (i, if (i < 80) "big" else "small"))
      .toDF("doc_id", "source")
    val w = Seq(("big", 0.5), ("small", 2.25)).toDF("source", "weight")
    val out = Curation.applyMixture(docs, "doc_id", "source", w).cache()
    try {
      // per-doc copy counts land on floor(w) or ceil(w), indexes dense from 0
      val byDoc = out.groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n"), max("copy").as("maxc")).collect()
      byDoc.foreach { r =>
        val (src, n, maxc) = (r.getString(1), r.getLong(2), r.getLong(3))
        if (src == "big") assert(n == 1 && maxc == 0, r.toString)
        else assert((n == 2 || n == 3) && maxc == n - 1, r.toString)
      }
      // weight 0.5 thins: some big docs dropped, some kept (hash-decided)
      val bigKept = byDoc.count(_.getString(1) == "big")
      assert(bigKept > 0 && bigKept < 80)
      // weight 2.25 upsamples: 20 docs emit between 2x and 3x copies
      val smallCopies = out.filter(col("source") === "small").count()
      assert(smallCopies >= 40 && smallCopies <= 60)
      // content-addressed, no RNG: a rerun is byte-identical
      val again = Curation.applyMixture(docs, "doc_id", "source", w)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("hashSplit is a total, deterministic, shuffle-free assignment") {
    val docs = (0L until 1000L).toDF("doc_id")
    val split = Curation.hashSplit(docs, "doc_id").cache()
    try {
      assert(split.count() === 1000)
      val byName = split.groupBy("split").count().as[(String, Long)].collect().toMap
      // md5 is uniform: 80/10/10 within generous tolerance at n=1000
      assert(byName("train") > 700 && byName("train") < 900, byName.toString)
      assert(byName("val") > 50 && byName("val") < 160, byName.toString)
      assert(byName("test") > 50 && byName("test") < 160, byName.toString)
      assert(split.filter(col("bucket") < 0 || col("bucket") >= 100).isEmpty)
      // no exchange anywhere: pure projection
      val plan = split.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
      // bucket is a pure function of the id: re-derivation matches
      val again = Curation.hashSplit(docs, "doc_id")
      assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
    } finally split.unpersist()
  }

  test("packTokenShards: global prefix-sum semantics, independent of slicing") {
    val docs = (0L until 200L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_toks")
    val a = Curation.packTokenShards(docs, "doc_id", "n_toks", 100L, partitions = 3)
    val b = Curation.packTokenShards(docs, "doc_id", "n_toks", 100L, partitions = 7)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "shard assignment must not depend on parallelism")

    // every shard except the last packs to budget ± one max doc (a doc
    // straddling the boundary belongs to the earlier shard); ids dense from 0
    val sizes = a.groupBy("shard").agg(sum("n_tokens").as("t"))
      .orderBy("shard").as[(Int, Long)].collect()
    assert(sizes.map(_._1).toSeq === sizes.indices.toSeq)
    sizes.dropRight(1).foreach { case (_, t) =>
      assert(t > 100L - 16L && t < 100L + 16L, s"shard size $t out of band")
    }
    // global conservation
    assert(sizes.map(_._2).sum === (0L until 200L).map(i => 10L + i % 7).sum)
  }

  test("shardManifest: totals conserve; a fingerprint sees one doc's edit") {
    val docs = (0L until 200L)
      .map(i => (i, s"doc $i body ${"x" * (i % 7).toInt}", 10L + i % 7))
      .toDF("doc_id", "text", "n_toks")
    val m = Curation.shardManifest(docs, "doc_id", "text", "n_toks", 100L)
      .as[(Int, Long, Long, String)].collect()
    // shard ids dense from 0; totals conserve against the corpus
    assert(m.map(_._1).toSeq === m.indices.toSeq)
    assert(m.map(_._2).sum === 200L)
    assert(m.map(_._3).sum === (0L until 200L).map(i => 10L + i % 7).sum)
    // partitioning-independence: same manifest from a different layout
    val m2 = Curation.shardManifest(docs.repartition(7), "doc_id", "text",
      "n_toks", 100L).as[(Int, Long, Long, String)].collect()
    assert(m2.toSeq === m.toSeq)
    // integrity: editing ONE doc's text flips exactly its shard's
    // fingerprint and nothing else (same weights -> same assignment)
    val edited = docs.withColumn("text",
      when(col("doc_id") === 123L, lit("tampered")).otherwise(col("text")))
    val m3 = Curation.shardManifest(edited, "doc_id", "text", "n_toks", 100L)
      .as[(Int, Long, Long, String)].collect()
    val changed = m.zip(m3).filter { case (a, b) => a._4 != b._4 }
    assert(changed.length === 1)
    assert(m.zip(m3).forall { case (a, b) =>
      (a._1, a._2, a._3) == ((b._1, b._2, b._3)) })
  }

  test("packSequences: lossless re-chunking with correct boundaries") {
    val seqLen = 8
    val docs = (0L until 60L)
      .map(i => (i, (0L until (1L + i % 13)).map(t => s"w${i}_$t").toArray))
      .toDF("doc_id", "toks")
    val out = Curation.packSequences(docs, "doc_id", "toks", seqLen)
      .orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect()

    // serial reference: concatenate docs in md5-hash order, carve at seqLen
    val hashed = docs.select(col("doc_id"),
      graft.functions.md5_lower64(col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
    val ordered = hashed.map(_._1)
    val byId = (0L until 60L)
      .map(i => i -> (0L until (1L + i % 13)).map(t => s"w${i}_$t")).toMap
    val stream = ordered.flatMap(id => byId(id).zipWithIndex.map {
      case (tok, p) => (tok, p == 0)
    })
    val expected = stream.zipWithIndex.groupBy(_._2 / seqLen).toSeq.sortBy(_._1)
      .map { case (ex, toks) =>
        val starts = toks.collect { case ((_, true), g) => g % seqLen }
        (ex.toLong, toks.length, toks.map(_._1._1).mkString(" "),
          starts.mkString(","), starts.length)
      }
    assert(out.toSeq == expected)
    // every example full except possibly the last
    assert(out.dropRight(1).forall(_._2 == seqLen) && out.last._2 <= seqLen)
  }

  test("packSequences is partition-invariant and drops empty docs") {
    val docs = (0L until 40L)
      .map(i => (i, if (i % 5 == 0) Array.empty[String]
                    else Array.fill((i % 4).toInt + 1)(s"t$i")))
      .toDF("doc_id", "toks")
    val a = Curation.packSequences(docs, "doc_id", "toks", 16, partitions = 2)
    val b = Curation.packSequences(docs, "doc_id", "toks", 16, partitions = 9)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val totalToks = a.agg(sum("n_tokens")).as[Long].collect().head
    val expectedToks = (0L until 40L)
      .filter(_ % 5 != 0).map(i => (i % 4) + 1).sum
    assert(totalToks == expectedToks, "empty docs contribute nothing")
    val totalStarts = a.agg(sum("n_docs_started")).as[Long].collect().head
    assert(totalStarts == (0L until 40L).count(_ % 5 != 0))
  }

  test("packSequences: a doc spanning many examples yields one start") {
    val docs = Seq(
      (1L, (0 until 50).map(t => s"a$t").toArray),
      (2L, (0 until 3).map(t => s"b$t").toArray)).toDF("doc_id", "toks")
    val out = Curation.packSequences(docs, "doc_id", "toks", 8)
      .orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect()
    assert(out.map(_._5).sum == 2, "exactly two doc starts corpus-wide")
    assert(out.map(_._2).sum == 53)
    // the long doc's interior examples carry no boundary at all
    assert(out.count(_._4.isEmpty) >= 4)
  }

  test("packSequencesIds mirrors the text packer's boundaries exactly") {
    val seqLen = 8
    val toksDocs = (0L until 40L)
      .map(i => (i, (0L until (1L + i % 11)).map(t => s"w${i}_$t").toArray))
    val dict = toksDocs.flatMap(_._2).distinct.sorted.zipWithIndex.toMap
    val docs = toksDocs
      .map { case (i, ts) => (i, ts, ts.map(dict)) }
      .toDF("doc_id", "toks", "ids")
    val text = Curation.packSequences(docs, "doc_id", "toks", seqLen)
      .orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect()
    val ids = Curation.packSequencesIds(docs, "doc_id", "ids", seqLen)
      .orderBy("example_id")
      .as[(Long, Int, Seq[Int], Seq[Int], Int)].collect()
    assert(text.length == ids.length)
    val inv = dict.map(_.swap)
    text.zip(ids).foreach { case ((ex, n, t, starts, ns), (exI, nI, idSeq, startsI, nsI)) =>
      assert(ex == exI && n == nI && ns == nsI)
      assert(startsI.mkString(",") == starts, "boundaries must be identical")
      assert(idSeq.map(inv).mkString(" ") == t, "ids must decode to the text stream")
    }
  }

  test("stratifiedSample caps every stratum and is deterministic") {
    val docs = (0L until 300L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val s1 = Curation.stratifiedSample(docs, "doc_id", "lang", perStratum = 7)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ === 7L), counts.toString)
    val s2 = Curation.stratifiedSample(docs, "doc_id", "lang", perStratum = 7)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("domainCap keeps exactly cap docs per domain, flags the rest") {
    val docs = (0L until 200L).map(i => (i, s"dom${i % 4}")).toDF("doc_id", "source")
    val capped = Curation.domainCap(docs, "doc_id", "source", cap = 10)
    assert(capped.count() == 200) // audit shape: every doc returned
    val kept = capped.filter(col("kept")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(kept.values.forall(_ === 10L), kept.toString)
    // ranks within a domain are 1..n with no gaps
    val ranks = capped.filter(col("source") === "dom0")
      .select("rn").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to 50))
  }

  test("mixWeights: weight resamples actual share to target share") {
    val docs = ((0L until 60L).map(i => (i, "a")) ++
      (60L until 100L).map(i => (i, "b")) ++
      (100L until 120L).map(i => (i, "c"))).toDF("doc_id", "source")
    val w = Curation.mixWeights(docs, "source", Map("a" -> 0.25, "b" -> 0.75))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(w("a") == ((60L, 0.5, 0.25, 0.5)))   // over-represented: downsample
    // 2.25 exactly: the weight divides the 12-decimal share (1/3), not
    // the 6-decimal reported 0.333333 (which would give 2.250002)
    assert(w("b") == ((40L, 0.333333, 0.75, 2.25)))      // upsample
    assert(w("c")._4 == 0.0)                    // not in targets: dropped
  }

  test("mixWeights: a targeted tail domain below 5e-7 share is upweighted, not zeroed") {
    // same regression class as temperatureWeights: the weight must divide
    // the 12-decimal share, not the 6-decimal REPORTED one, else a domain
    // the caller explicitly targeted is silently deleted by applyMixture.
    val docs = spark.range(0, 3000001)
      .selectExpr("id AS doc_id",
        "CASE WHEN id = 0 THEN 'tail' ELSE 'head' END AS source")
    val w = Curation.mixWeights(docs, "source", Map("tail" -> 0.1, "head" -> 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(4))).toMap
    assert(w("tail")._1 == 0.0, "reported share still rounds to 6 decimals")
    assert(w("tail")._2 > 100000.0,
      s"tail weight must come from the unrounded share, got ${w("tail")._2}")
    assert(w("head")._2 > 0.0 && w("head")._2 < 1.0)
  }

  test("epochShuffle: a true permutation, epoch-distinct, partitioning-free") {
    val docs = spark.range(0, 500).selectExpr("id AS doc_id")
    val e1 = Curation.epochShuffle(docs, "doc_id", epoch = 1, nShards = 8)
      .as[(Long, Int, Int)].collect().toSeq.sorted
    // every doc exactly once; within-shard positions are 1..count
    assert(e1.map(_._1).distinct.size === 500)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toSeq)
    }
    // reproducible and independent of input partitioning
    val e1b = Curation.epochShuffle(docs.repartition(7), "doc_id", 1, 8)
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(e1b === e1)
    // a different epoch yields a different order (avalanche)
    val e2 = Curation.epochShuffle(docs, "doc_id", epoch = 2, nShards = 8)
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(e2 !== e1)
  }

  test("lengthBatches: bins clamp at maxLen, batches fill within bins, padding exact") {
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),   // 10 tokens -> bin 64
      (2L, Seq.fill(64)("w").mkString(" ")),   // exactly 64 -> bin 64
      (3L, Seq.fill(65)("w").mkString(" ")),   // 65 -> bin 128
      (4L, Seq.fill(300)("w").mkString(" "))   // 300 -> clamped to maxLen 256
    ).toDF("doc_id", "text")
    val got = Curation.lengthBatches(docs, "doc_id", "text",
        binWidth = 64, maxLen = 256, batchSize = 2)
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((10, 64, 0, 54L)))
    assert(got(2L)._2 === 64 && got(2L)._4 === 0L)
    assert(got(3L) === ((65, 128, 0, 63L)))
    assert(got(4L) === ((300, 256, 0, 0L))) // over-length: clamped, no pad
    // batch capacity: 20 same-length docs at batchSize 2 -> 10 batches
    val many = (0L until 20L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val batches = Curation.lengthBatches(many, "doc_id", "text",
        binWidth = 64, maxLen = 256, batchSize = 2)
      .groupBy("bin", "batch_id").agg(count(lit(1)).as("n"))
      .as[(Int, Int, Long)].collect().toSeq
    assert(batches.size === 10 && batches.forall(_._3 === 2L))
  }

  test("tokenBudgetSample admits the hash-order prefix up to the budget") {
    // 6 docs per domain, 10 tokens each, budget 25 -> exactly 2 kept
    val docs = (0L until 12L).map(i =>
      (i, Seq.fill(10)(s"w$i").mkString(" "), s"d${i % 2}"))
      .toDF("doc_id", "text", "dom")
    val out = Curation.tokenBudgetSample(docs, "doc_id", "text", "dom", 25L)
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(out.length === 12)
    assert(out.forall(_._3 === 10L))
    val kept = out.filter(_._5)
    assert(kept.length === 4 && kept.groupBy(_._2).forall(_._2.length == 2))
    // cumulative sums are the 10-token ladder per domain
    out.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === (1 to 6).map(_ * 10L))
    }
    // keep is exactly cum <= budget
    out.foreach(r => assert(r._5 === (r._4 <= 25L)))
  }

  test("perplexityFloor drops the unseen-gibberish tail, keeps fluent docs") {
    val train = (0L until 40L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val fluent = (100L until 109L)
      .map(i => (i, "the quick brown fox jumps over the dog", "web"))
    val junk = Seq((999L, "zz qq xx vv ww yy uu tt", "web"))
    val held = (fluent ++ junk).toDF("doc_id", "text", "dom")
    val out = Curation.perplexityFloor(train, held, "doc_id", "text", "dom",
        floorQuantile = 0.2)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out.size === 10)
    fluent.foreach { case (id, _, _) => assert(out(id), s"doc $id dropped") }
    assert(!out(999L), "gibberish survived the floor")
  }

  test("outlierReport: Tukey fences catch the planted blowup and truncation") {
    // web: 100 docs of length ~1000 (q1=1000, q3=1009 -> iqr small), plus
    // one 50-char truncation and one 100k concatenation blowup
    val web = (0 until 100).map(i => (i.toLong, "web", 1000L + (i % 10))) ++
      Seq((200L, "web", 50L), (201L, "web", 100000L))
    val clean = (0 until 50).map(i => (1000L + i, "ref", 500L + (i % 3)))
    val out = Curation.outlierReport((web ++ clean).toDF("id", "src", "len"),
        "src", "len")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(6), r.getLong(7))).toMap
    assert(out("web") === ((102L, 1L, 1L))) // one low, one high
    assert(out("ref") === ((50L, 0L, 0L)))
  }

  test("groupSplit: cluster members share a split; singletons match hashSplit") {
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {0,1,2} labeled 0, {10,11} labeled 10; rest absent
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val out = Curation.groupSplit(docs, "doc_id", clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out.size === 50)
    // every member of a cluster gets the representative's split
    assert(Set(out(0L), out(1L), out(2L)).size === 1)
    assert(out(0L)._1 === 0L)
    assert(Set(out(10L), out(11L)).size === 1)
    // docs outside any cluster degrade to the per-doc hash split
    val solo = Curation.hashSplit(docs.filter(col("doc_id") >= 20), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    solo.foreach { case (id, split) => assert(out(id)._2 === split, s"doc $id") }
  }

  test("canaryScan emits every (doc, needle) containment, nothing else") {
    import spark.implicits._
    val docs = Seq((1L, "the secret canary-X lives here"),
      (2L, "plain text"), (3L, "canary-X and canary-Y")).toDF("doc_id", "text")
    val out = Curation.canaryScan(docs, "doc_id", "text",
        Seq("canary-X", "canary-Y", "absent"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "canary-X"), (3L, "canary-X"), (3L, "canary-Y")))
  }

  test("snapshotDiff classifies all four transitions") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("corpusDrift: identical corpora have zero TV, disjoint have 1e6") {
    import spark.implicits._
    val a = Seq((1L, "x y z"), (2L, "x x w")).toDF("doc_id", "text")
    val same = Curation.corpusDrift(a, a, "text").collect().head
    assert(same.getLong(5) === 0L)
    assert(same.getLong(0) === 6L && same.getLong(4) === 4L)
    val b = Seq((1L, "p q"), (2L, "r p")).toDF("doc_id", "text")
    val disj = Curation.corpusDrift(a, b, "text").collect().head
    assert(disj.getLong(5) === 1000000L)
    assert(disj.getLong(4) === 0L)
  }

  test("corpusDrift TV matches a hand-computed mixed case") {
    import spark.implicits._
    // A: a=2, b=1, n=3; B: a=1, c=1, n=2
    // TV = (|2/3-1/2| + |1/3-0| + |0-1/2|)/2 = (1/6 + 1/3 + 1/2)/2 = 1/2
    val a = Seq((1L, "a b a")).toDF("doc_id", "text")
    val b = Seq((1L, "a c")).toDF("doc_id", "text")
    val r = Curation.corpusDrift(a, b, "text").collect().head
    assert(r.getLong(5) === 500000L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 2L, 1L)))
  }

  test("driftTokens ranks movers by absolute micro-share delta") {
    import spark.implicits._
    val a = Seq((1L, "a a a b")).toDF("doc_id", "text") // a 3/4, b 1/4
    val b = Seq((1L, "b b c d")).toDF("doc_id", "text") // b 1/2, c/d 1/4
    val rows = Curation.driftTokens(a, b, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(5)))
    // a: +750000; b: 250000-500000 = -250000; c,d: -250000 (ties -> token)
    assert(rows.head === (("a", 750000L)))
    assert(rows.map(_._1).toSeq === Seq("a", "b", "c", "d"))
  }

  test("psi: identical corpora score exactly 0; a shift reads as shifted") {
    import spark.implicits._
    val xs = Seq(10L, 200L, 700L, 1500L, 1500L, 3000L).toDF("v")
    // identical sides: every bin has p = q, so every term and the scalar
    // are exactly 0.0 (no float residue — the ln argument is exactly 1)
    val same = Curation.psiBins(xs, xs, col("v"), 0L, 2047L, bins = 16)
      .collect()
    assert(same.length === 16)
    assert(same.forall(_.getDouble(3) === 0.0))
    assert(Curation.psi(xs, xs, col("v"), 0L, 2047L, 16)
      .head().getDouble(0) === 0.0)
    // binning law: x div 128 with out-of-range clamped to the edge bin —
    // 3000 > hi lands in bin 15, the two 1500s in bin 11
    val byBin = same.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBin(15L) === 1L)
    assert(byBin(11L) === 2L)
    // a hard distribution shift scores above the 0.25 "shifted" bar
    val lo = Seq.fill(50)(100L).toDF("v")
    val hi = Seq.fill(50)(1900L).toDF("v")
    val shifted = Curation.psi(lo, hi, col("v"), 0L, 2047L, 16)
      .head().getDouble(0)
    assert(shifted > 0.25, s"psi=$shifted")
    // direction-symmetric up to the round-6 term grid
    val rev = Curation.psi(hi, lo, col("v"), 0L, 2047L, 16)
      .head().getDouble(0)
    assert(math.abs(rev - shifted) < 1e-4, s"$rev vs $shifted")
  }

  test("sourceOverlapMatrix: hand-computed containment, zero pairs kept") {
    import spark.implicits._
    // a: shingles {x y z, y z w}   (two docs, one each)
    // b: shingles {x y z}          (copied from a) -> common(a,b) = 1
    // c: shingles {p q r}          (disjoint)      -> common = 0 both ways
    val docs = Seq(
      ("a", "x y z"), ("a", "y z w"),
      ("b", "x y z"),
      ("c", "p q r")).toDF("source", "text")
    val out = Curation.sourceOverlapMatrix(docs, "source", "text", 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))
      .toMap
    assert(out.size === 6, "all ordered pairs, including zero-overlap")
    // containment is DIRECTIONAL: half of a appears in b, all of b in a
    assert(out(("a", "b")) === ((2L, 1L, 1L, 500000L, 500000L)))
    assert(out(("b", "a")) === ((1L, 2L, 1L, 1000000L, 500000L)))
    // disjoint source: zero common, zero ratios, pair still present
    assert(out(("a", "c")) === ((2L, 1L, 0L, 0L, 0L)))
    assert(out(("c", "b")) === ((1L, 1L, 0L, 0L, 0L)))
  }
}
