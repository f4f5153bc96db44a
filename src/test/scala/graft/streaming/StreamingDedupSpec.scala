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
}
