package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges oversized buckets, preserves content, is idempotent") {
    val dir = Files.createTempDirectory("compact").toString + "/index"
    // 12 appends into ONE bucket (bucket count 1 forces collisions)
    (0 until 12).foreach { i =>
      Seq((s"fp$i", 0)).toDF("fp", "__bucket")
        .write.mode("append").partitionBy("__bucket").parquet(dir)
    }
    def bucketFiles(): Int = new java.io.File(s"$dir/__bucket=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(bucketFiles() === 12)

    val before = spark.read.parquet(dir).select("fp").as[String].collect().sorted
    assert(Compaction.compactBuckets(spark, dir, maxFilesPerBucket = 8) === Seq(0))
    assert(bucketFiles() === 1)
    val after = spark.read.parquet(dir).select("fp").as[String].collect().sorted
    assert(after.toSeq === before.toSeq)

    // under the threshold now: second run is a no-op
    assert(Compaction.compactBuckets(spark, dir, maxFilesPerBucket = 8).isEmpty)

    // the streaming-dedup consumer gives the same answer pre/post compaction
    val out = Files.createTempDirectory("compact_out").toString + "/corpus"
    StreamingDedup.dedupBatch(spark,
      Seq((100L, "fp3 payload"), (101L, "brand new")).toDF("doc_id", "text"),
      "doc_id", "text", dir, out, numBuckets = 1)
    assert(spark.read.parquet(out).count() === 2) // both texts are new fps
  }
}
