package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class StreamingKnnSpec extends SparkSpec {
  import spark.implicits._

  private def rebuildEdges(corpus: org.apache.spark.sql.DataFrame) =
    Similarity.intDotTopKBatch(corpus, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 5)
      .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def stateEdges(path: String) =
    StreamingKnn.currentEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("streamed batches maintain the exact graph; restart resumes") {
    val log = Files.createTempDirectory("sknn_log").toString
    val path = Files.createTempDirectory("sknn_state").toString + "/knn"
    val ckpt = Files.createTempDirectory("sknn_ckpt").toString
    val embs = Tables.embeddings(spark, sfDir).limit(60)
      .select("vec_id", "embedding").cache()
    val schema = embs.schema

    def runOnce(): Unit = {
      val q = StreamingKnn.start(
        spark.readStream.schema(schema).parquet(log),
        "vec_id", "embedding", k = 5, path, ckpt)
      q.awaitTermination()
    }

    embs.filter(col("vec_id") < 30).write.mode("append").parquet(log)
    runOnce()
    assert(stateEdges(path) ===
      rebuildEdges(embs.filter(col("vec_id") < 30)))

    // restart from the checkpoint with a second slice — the merged state
    // must be bit-equal to a from-scratch rebuild over everything
    embs.filter(col("vec_id") >= 30).write.mode("append").parquet(log)
    runOnce()
    assert(stateEdges(path) === rebuildEdges(embs))
    embs.unpersist()
  }

  test("redelivered batch is skipped; crash window replays consistently") {
    val path = Files.createTempDirectory("sknn_state2").toString + "/knn"
    val embs = Tables.embeddings(spark, sfDir).limit(40)
      .select("vec_id", "embedding").cache()
    val b0 = embs.filter(col("vec_id") < 20)
    val b1 = embs.filter(col("vec_id") >= 20)
    StreamingKnn.applyBatch(spark, b0, "vec_id", "embedding", 5, path, 0L)
    StreamingKnn.applyBatch(spark, b1, "vec_id", "embedding", 5, path, 1L)
    val committed = stateEdges(path)
    // at-least-once: both batches redeliver — version tags skip them
    StreamingKnn.applyBatch(spark, b0, "vec_id", "embedding", 5, path, 0L)
    StreamingKnn.applyBatch(spark, b1, "vec_id", "embedding", 5, path, 1L)
    assert(stateEdges(path) === committed)
    assert(committed === rebuildEdges(embs))

    // crash window: vectors of an uncommitted batch 2 are on disk but its
    // edge version is not — a reader still resolves the v=1 state, and
    // the replayed batch 2 produces the exact union graph
    val b2 = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 40 && col("vec_id") < 50)
      .select("vec_id", "embedding")
    b2.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .withColumn("__batch", lit("b2"))
      .write.partitionBy("__batch").mode("append").parquet(s"$path/vectors")
    assert(stateEdges(path) === committed) // uncommitted vectors invisible
    StreamingKnn.applyBatch(spark, b2, "vec_id", "embedding", 5, path, 2L)
    assert(stateEdges(path) === rebuildEdges(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
        .select("vec_id", "embedding")))

    // crash DURING the v=3 write: the directory exists without _SUCCESS
    // (uncommitted) — the replay must overwrite it, not wedge on
    // ErrorIfExists
    val junk = new java.io.File(s"$path/edges/v=3")
    junk.mkdirs()
    new java.io.FileWriter(s"$path/edges/v=3/part-junk").close()
    val b3 = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 50 && col("vec_id") < 55)
      .select("vec_id", "embedding")
    StreamingKnn.applyBatch(spark, b3, "vec_id", "embedding", 5, path, 3L)
    assert(stateEdges(path) === rebuildEdges(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 55)
        .select("vec_id", "embedding")))

    // crash BETWEEN a state write and its prune: a stale complete older
    // version survives on disk — the NEXT call (here a redelivery that
    // otherwise skips) must prune it down to the current version
    val stale = new java.io.File(s"$path/edges/v=1")
    stale.mkdirs()
    new java.io.FileWriter(s"$path/edges/v=1/_SUCCESS").close()
    StreamingKnn.applyBatch(spark, b3, "vec_id", "embedding", 5, path, 3L)
    assert(!stale.exists(), "superseded version not pruned by the replay")
    assert(stateEdges(path) === rebuildEdges(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 55)
        .select("vec_id", "embedding")))
    embs.unpersist()
  }
}
