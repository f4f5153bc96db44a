package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfPqIndexSpec extends SparkSpec {

  private def embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("IVF-PQ build is deterministic, compact, and cid-partitioned") {
    val dir = Files.createTempDirectory("ivfpq_det").toString
    IvfPqIndex.build(embs, "vec_id", "embedding", s"$dir/a", k = 16)
    IvfPqIndex.build(embs, "vec_id", "embedding", s"$dir/b", k = 16)
    def codes(d: String) = spark.read.parquet(s"$d/codes").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1), r.getInt(2)))
    val a = codes(s"$dir/a")
    assert(a.length === 500)
    assert(a.forall(_._2.length == 8), "m=8 -> 8 one-byte codes per vector")
    assert(a.toSeq === codes(s"$dir/b").toSeq,
      "same input + deterministic seeds -> identical index")
    // the full-vector coarse scaffolding must be gone: codes + centroids +
    // codebooks are the whole index
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/coarse")),
      "coarse full-vector lists must be deleted after encoding")
    // every vector sits in exactly one inverted list
    assert(spark.read.parquet(s"$dir/a/codes").select("id").distinct()
      .count() === 500)
  }

  test("IVF-PQ probe: recall vs brute force, scan pruned to nprobe lists") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    val dir = Files.createTempDirectory("ivfpq_topk").toString
    IvfPqIndex.build(embs, "vec_id", "embedding", dir, k = 16)
    val qv = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    val probe = IvfPqIndex.topK(spark, dir, qv, k = 11, nprobe = 4,
      rerankFrom = Some((embs, "vec_id", "embedding")))
    val got = probe.collect().map(_.getLong(0)).toSet - 0L
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    // same bar as IVF-flat at nprobe=4: list pruning caps recall; the PQ
    // rerank stage must not lose what the lists admit
    assert((brute & got).size >= 5,
      s"recall too low: ${(brute & got).size}/10")

    // ADC scan must read only the probed lists' files
    val raw = IvfPqIndex.topK(spark, dir, qv, k = 11, nprobe = 4)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    }
    raw.collect() // metrics are populated by execution
    val scan = scans(raw.queryExecution.executedPlan).head
    val scannedFiles = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(s"$dir/codes").inputFiles.length
    assert(scannedFiles > 0 && scannedFiles < totalFiles,
      s"scan read $scannedFiles of $totalFiles files — no list pruning")
  }

  test("IVF-PQ matches IVF-flat ranking when ADC is near-exact") {
    // raw ADC ordering (no rerank) must largely agree with the exact
    // ordering restricted to the SAME probed lists — isolates PQ
    // quantization loss from list-pruning loss
    val dir = Files.createTempDirectory("ivfpq_vs_ivf").toString
    IvfPqIndex.build(embs, "vec_id", "embedding", dir, k = 16)
    val ivfDir = Files.createTempDirectory("ivf_ref").toString
    IvfIndex.build(
      embs.select(col("vec_id"),
        transform(col("embedding"),
          v => (v / graft.functions.l2_norm(col("embedding"))).cast("float"))
          .as("u")),
      "vec_id", "u", ivfDir, k = 16, iterations = 2)
    val qv = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val adc = IvfPqIndex.topK(spark, dir, qv, k = 11, nprobe = 4)
      .collect().map(_.getLong(0)).toSet - 0L
    val flat = IvfIndex.topK(spark, ivfDir, qv, k = 11, nprobe = 4)
      .collect().map(_.getLong(0)).toSet - 0L
    assert((adc & flat).size >= 5,
      s"ADC vs flat agreement too low: ${(adc & flat).size}/10")
  }
}
