package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first-seen dedup across micro-batches, restarts, and redelivery") {
    val log = Files.createTempDirectory("sd_log").toString
    val idx = Files.createTempDirectory("sd_idx").toString + "/index"
    val out = Files.createTempDirectory("sd_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("sd_ckpt").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema

    def runOnce(ck: String): Unit = {
      val q = StreamingDedup.start(spark,
        spark.readStream.schema(schema).parquet(log),
        "doc_id", "text", idx, out, ck)
      q.awaitTermination()
    }

    // batch 1: two distinct docs
    Seq((1L, "hello world"), (2L, "foo bar")).toDF("doc_id", "text")
      .write.mode("append").parquet(log)
    runOnce(ckpt)
    // batch 2 (restart, same checkpoint): one normalized dup of doc 1 + one new
    Seq((3L, "  Hello   WORLD "), (4L, "baz qux")).toDF("doc_id", "text")
      .write.mode("append").parquet(log)
    runOnce(ckpt)

    val corpus = spark.read.parquet(out).as[(Long, String)].collect().toMap
    assert(corpus.keySet === Set(1L, 2L, 4L), corpus.toString)

    // full redelivery (fresh checkpoint): every fp already indexed -> no growth
    runOnce(Files.createTempDirectory("sd_ckpt2").toString)
    assert(spark.read.parquet(out).count() === 3)

    // index: one fp per admitted doc, bucket-partitioned layout
    val index = spark.read.parquet(idx)
    assert(index.select("fp").distinct().count() === 3)
    assert(index.columns.toSet === Set("fp", "__bucket"))
  }

  test("semantic streaming dedup: cosine near-dups rejected across and within batches") {
    val log = Files.createTempDirectory("se_log").toString
    val idx = Files.createTempDirectory("se_idx").toString + "/index"
    val out = Files.createTempDirectory("se_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("se_ckpt").toString

    def axis(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    def near(i: Int): Array[Float] =              // cos vs axis(i) ≈ 0.990
      Array.tabulate(8)(j =>
        if (j == i) 0.99f else if (j == (i + 1) % 8) 0.14f else 0.0f)

    val schema = Seq((0L, Array(0.0f))).toDF("vec_id", "embedding").schema
    def runOnce(ck: String): Unit = {
      val q = StreamingDedup.startSemanticDedup(spark,
        spark.readStream.schema(schema).parquet(log),
        "vec_id", "embedding", idx, out, ck, threshold = 0.9)
      q.awaitTermination()
    }

    Seq((1L, axis(0)), (2L, axis(1)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(log)
    runOnce(ckpt)
    Seq((3L, near(0)),                           // semantic dup of 1 (cross-batch)
        (4L, axis(2)),                           // new
        (5L, near(2)),                           // semantic dup of 4 (within batch)
        (6L, axis(3)))                           // new
      .toDF("vec_id", "embedding").write.mode("append").parquet(log)
    runOnce(ckpt)

    val corpus = spark.read.parquet(out).select("vec_id")
      .as[Long].collect().toSet
    assert(corpus === Set(1L, 2L, 4L, 6L), corpus.toString)

    // full redelivery with a fresh checkpoint: nothing new admitted
    runOnce(Files.createTempDirectory("se_ckpt2").toString)
    assert(spark.read.parquet(out).count() === 4)

    // state tables: exact band keys for 4 vectors x 16 bands; 4 vectors
    assert(spark.read.parquet(s"$idx/bands").count() === 4L * 16)
    assert(spark.read.parquet(s"$idx/vecs").count() === 4)
  }

  test("semantic streaming dedup: expectedCorpus sizes the index bands stream-lifetime") {
    val log = Files.createTempDirectory("sc_log").toString
    val idx = Files.createTempDirectory("sc_idx").toString + "/index"
    val out = Files.createTempDirectory("sc_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("sc_ckpt").toString

    def axis(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    def near(i: Int): Array[Float] =
      Array.tabulate(8)(j =>
        if (j == i) 0.99f else if (j == (i + 1) % 8) 0.14f else 0.0f)

    val schema = Seq((0L, Array(0.0f))).toDF("vec_id", "embedding").schema
    def runOnce(): Unit = {
      val q = StreamingDedup.startSemanticDedup(spark,
        spark.readStream.schema(schema).parquet(log),
        "vec_id", "embedding", idx, out, ckpt, threshold = 0.9,
        expectedCorpus = 50000) // -> planesForCorpus(50000) = 15, not 8
      q.awaitTermination()
    }

    Seq((1L, axis(0))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(log)
    runOnce()
    Seq((2L, near(0)), (3L, axis(1))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(log)
    runOnce()

    // dedup semantics unchanged under the wider stream-lifetime bands
    assert(spark.read.parquet(out).select("vec_id")
      .as[Long].collect().toSet === Set(1L, 3L))
    // and the stored keys really are 15-plane keys: 15 sign bits span
    // [0, 2^15) — every key must fit, and the wider space must be in use
    // (an 8-plane index would cap keys below 2^8 = 256)
    val keys = spark.read.parquet(s"$idx/bands").select("key")
      .as[Long].collect()
    assert(keys.forall(k => k >= 0 && k < (1L << 15)))
    assert(keys.exists(_ >= 256),
      "expectedCorpus band width not applied: all keys fit an 8-plane space")
  }

  test("near-dup streaming dedup: verified LSH matches rejected across and within batches") {
    val log = Files.createTempDirectory("nd_log").toString
    val idx = Files.createTempDirectory("nd_idx").toString + "/index"
    val out = Files.createTempDirectory("nd_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("nd_ckpt").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema

    def words(prefix: String) = (0 until 40).map(i => s"$prefix$i").mkString(" ")
    def variant(prefix: String) =
      (0 until 40).map(i => if (i == 20) "changed" else s"$prefix$i").mkString(" ")
    // one-word change in 40 words: trigram jaccard ≈ 35/41 ≈ 0.85 ≥ 0.8

    def runOnce(ck: String): Unit = {
      val q = StreamingDedup.startNearDedup(spark,
        spark.readStream.schema(schema).parquet(log),
        "doc_id", "text", idx, out, ck, threshold = 0.8)
      q.awaitTermination()
    }

    Seq((1L, words("alpha")), (2L, words("beta")))
      .toDF("doc_id", "text").write.mode("append").parquet(log)
    runOnce(ckpt)
    Seq((3L, variant("alpha")),              // near-dup of 1 (cross-batch)
        (4L, words("gamma")),                // new
        (5L, variant("gamma")),              // near-dup of 4 (within batch)
        (6L, words("delta")))                // new
      .toDF("doc_id", "text").write.mode("append").parquet(log)
    runOnce(ckpt)

    val corpus = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    assert(corpus === Set(1L, 2L, 4L, 6L), corpus.toString)

    // full redelivery with a fresh checkpoint: nothing new admitted
    runOnce(Files.createTempDirectory("nd_ckpt2").toString)
    assert(spark.read.parquet(out).count() === 4)

    // state tables: postings for 4 docs x 16 bands; 4 shingle sets
    assert(spark.read.parquet(s"$idx/bands").count() === 4L * 16)
    assert(spark.read.parquet(s"$idx/shingles").count() === 4)
  }
}
