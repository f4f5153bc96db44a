package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed appends accumulate; probe sees vectors from every batch") {
    val log = Files.createTempDirectory("sai_log").toString
    val idx = Files.createTempDirectory("sai_idx").toString + "/index"
    val ckpt = Files.createTempDirectory("sai_ckpt").toString
    val schema = Seq((0L, Array(0f))).toDF("vec_id", "embedding").schema

    val embs = Tables.embeddings(spark, sfDir).limit(40)
      .select("vec_id", "embedding").cache()
    val qv = embs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    def runOnce(): Unit = {
      val q = StreamingAnnIndex.start(
        spark.readStream.schema(schema).parquet(log),
        "vec_id", "embedding", idx, ckpt, numPlanes = 4)
      q.awaitTermination()
    }

    // batch 1: first half of the vectors
    embs.filter(col("vec_id") < 20).write.mode("append").parquet(log)
    runOnce()
    val after1 = StreamingAnnIndex.probeTopK(spark, idx, qv, k = 40,
      numPlanes = 4, maxHamming = 4).collect().map(_.getLong(0)).toSet
    assert(after1.nonEmpty && after1.forall(_ < 20))

    // batch 2 (restart from checkpoint): second half, including an exact
    // duplicate of the query vector under a fresh id — it must become the
    // probe's top hit (cos = 1.0)
    embs.filter(col("vec_id") >= 20 && col("vec_id") < 40)
      .write.mode("append").parquet(log)
    Seq((999L, qv)).toDF("vec_id", "embedding").write.mode("append").parquet(log)
    runOnce()

    // maxHamming = numPlanes: probe every bucket -> exact over the index
    val after2 = StreamingAnnIndex.probeTopK(spark, idx, qv, k = 41,
      numPlanes = 4, maxHamming = 4).collect()
    assert(after2.length == 41) // 40 streamed + the planted twin, no dups
    val top = after2.filter(_.getDouble(1) == 1.0).map(_.getLong(0)).toSet
    assert(top.contains(999L), s"planted twin missing from $top")
    embs.unpersist()
  }

  test("redelivered batch is absorbed: probe returns no duplicate ids") {
    val idx = Files.createTempDirectory("sai_idx2").toString + "/index"
    val batch = Tables.embeddings(spark, sfDir).limit(10)
      .select("vec_id", "embedding")
    val qv = batch.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    // same batch appended twice = at-least-once redelivery
    StreamingAnnIndex.appendBatch(batch, "vec_id", "embedding", idx, numPlanes = 4)
    StreamingAnnIndex.appendBatch(batch, "vec_id", "embedding", idx, numPlanes = 4)
    val got = StreamingAnnIndex.probeTopK(spark, idx, qv, k = 20,
      numPlanes = 4, maxHamming = 4).collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicate ids in probe output")
    assert(got.length == 10)
  }

  test("streamed index probe agrees with a batch-built index probe") {
    val idx = Files.createTempDirectory("sai_idx3").toString + "/index"
    val embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val qv = embs.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    StreamingAnnIndex.appendBatch(embs, "vec_id", "embedding", idx, numPlanes = 6)
    val streamed = StreamingAnnIndex.probeTopK(spark, idx, qv, k = 5, numPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val direct = Files.createTempDirectory("sai_direct").toString
    Similarity.buildIndex(embs, "vec_id", "embedding", direct, numPlanes = 6)
    val batchBuilt = Similarity.indexTopK(spark, direct, qv, k = 5, numPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamed == batchBuilt)
  }
}
