package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id_new", "id_old").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  // indexed corpus = doc_id % 10 <> 0; delta = doc_id % 10 == 0 plus
  // verbatim copies of three indexed docs under fresh ids (guaranteed
  // jaccard-1.0 cross pairs, so the equivalence tests cannot pass vacuously)
  private def split() = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val indexed = docs.filter(col("doc_id") % 10 =!= 0)
    val copies = indexed.filter(col("doc_id").isin(1L, 11L, 21L))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 10 === 0).unionByName(copies)
    (indexed, delta)
  }

  test("probe equals minhashLshPairs over the union, restricted to cross pairs") {
    val (indexed, delta) = split()
    val dir = Files.createTempDirectory("mh_idx").toString
    MinHashIndex.build(indexed, "doc_id", "text", dir)
    val probe = rows(
      MinHashIndex.probe(spark, dir, delta, "doc_id", "text", threshold = 0.8))
    assert(probe.exists(_._3 == 1.0), "planted copies must surface")

    val deltaIds = delta.select("doc_id").as[Long].collect().toSet
    val full = Dedup.minhashLshPairs(indexed.unionByName(delta),
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = full.collect {
      case (a, b, j) if deltaIds(a) ^ deltaIds(b) =>
        if (deltaIds(a)) (a, b, j) else (b, a, j)
    }.sortBy(t => (t._1, t._2)).toSeq
    assert(probe === cross)
  }

  test("build + merge probes identically to a full build") {
    val (indexed, delta) = split()
    // split the indexed corpus itself into a base and a merge shard
    val base = indexed.filter(col("doc_id") % 3 =!= 0)
    val shard = indexed.filter(col("doc_id") % 3 === 0)

    val dirInc = Files.createTempDirectory("mh_idx_inc").toString
    MinHashIndex.build(base, "doc_id", "text", dirInc)
    MinHashIndex.merge(shard, "doc_id", "text", dirInc)

    val dirFull = Files.createTempDirectory("mh_idx_full").toString
    MinHashIndex.build(indexed, "doc_id", "text", dirFull)

    val pInc = rows(
      MinHashIndex.probe(spark, dirInc, delta, "doc_id", "text", 0.8))
    val pFull = rows(
      MinHashIndex.probe(spark, dirFull, delta, "doc_id", "text", 0.8))
    assert(pInc === pFull)
    assert(pInc.nonEmpty)
  }

  test("delete masks pairs immediately; compact reclaims and re-merges") {
    val (indexed, delta) = split()
    // delete the three docs whose verbatim copies the delta plants —
    // the jaccard-1.0 pairs MUST vanish, so masking cannot pass vacuously
    val deadIds = Seq(1L, 11L, 21L)
    val live = indexed.filter(!col("doc_id").isin(deadIds.map(Long.box): _*))
    val dir = Files.createTempDirectory("mh_del").toString
    val ref = Files.createTempDirectory("mh_del_ref").toString
    MinHashIndex.build(indexed, "doc_id", "text", dir)
    MinHashIndex.build(live, "doc_id", "text", ref)

    val before = rows(
      MinHashIndex.probe(spark, dir, delta, "doc_id", "text", 0.8))
    assert(deadIds.forall(d => before.exists(_._2 == d)),
      "planted copies must pair with their originals pre-delete")
    MinHashIndex.delete(spark, dir, deadIds.toDF("doc_id"), "doc_id")
    val after = rows(
      MinHashIndex.probe(spark, dir, delta, "doc_id", "text", 0.8))
    assert(after === rows(
      MinHashIndex.probe(spark, ref, delta, "doc_id", "text", 0.8)))
    assert(deadIds.forall(d => !after.exists(_._2 == d)))

    MinHashIndex.compact(spark, dir)
    assert(rows(MinHashIndex.probe(spark, dir, delta, "doc_id", "text", 0.8))
      === after)
    assert(spark.read.parquet(s"$dir/bands")
      .filter(col("id").isin(deadIds.map(Long.box): _*)).count() === 0L)
    assert(spark.read.parquet(s"$dir/docs")
      .filter(col("id").isin(deadIds.map(Long.box): _*)).count() === 0L)
    assert(MinHashIndex.tombstones(spark, dir).count() === 0L)

    // update path: re-merge the deleted docs post-compact — the planted
    // pairs come back exactly as in the original full index
    MinHashIndex.merge(indexed.filter(
      col("doc_id").isin(deadIds.map(Long.box): _*)), "doc_id", "text", dir)
    assert(rows(MinHashIndex.probe(spark, dir, delta, "doc_id", "text", 0.8))
      === before)
  }

  test("probe reads only the band buckets the delta's keys hash into") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val (indexed, _) = split()
    val dir = Files.createTempDirectory("mh_idx_prune").toString
    MinHashIndex.build(indexed, "doc_id", "text", dir)
    // one-doc delta: at most `bands` distinct band buckets of the 64.
    // probe() caches its intermediates (CacheScope), so the file scans run
    // inside the candidates' materialization job, not the result plan —
    // assert pruning on the SAME pruned read probe constructs: the bucket
    // list of the delta's band keys filtered against the bands table.
    val oneDoc = indexed.filter(col("doc_id") === 1L)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val sigs = Dedup.withShingles(oneDoc, "doc_id", "text", 3)
      .select(col("id"),
        graft.functions.minhash_signature(col("sh"), 32).as("sig"))
    val bandBuckets = sigs
      .select(posexplode(Dedup.bandKeysOfSig(col("sig"), 32, 16))
        .as(Seq("band", "bkey")))
      .select(pmod(xxhash64(col("band"), col("bkey")), lit(64L))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    assert(bandBuckets.length <= 16)
    val pruned = spark.read.parquet(s"$dir/bands")
      .filter(col("__bucket").isin(bandBuckets.map(Integer.valueOf).toSeq: _*))
    pruned.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val bandScans = scans(pruned.queryExecution.executedPlan)
    assert(bandScans.nonEmpty)
    val totalFiles = spark.read.parquet(s"$dir/bands").inputFiles.length
    bandScans.foreach { sc =>
      val nf = sc.metrics("numFiles").value
      assert(nf > 0 && nf < totalFiles,
        s"bands scan read $nf of $totalFiles files — no partition pruning")
    }
    // and the probe built on that read finds the planted copy
    val hit = MinHashIndex.probe(spark, dir, oneDoc, "doc_id", "text", 0.8)
      .collect()
    assert(hit.exists(r => r.getLong(1) == 1L && r.getDouble(2) == 1.0))
  }
}
