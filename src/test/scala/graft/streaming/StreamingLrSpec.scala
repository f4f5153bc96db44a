package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Classifier

class StreamingLrSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "text", "y")

  private val B = 128

  test("streamed steps equal manual sequential steps, across restarts") {
    val log = Files.createTempDirectory("slr_log").toString + "/data"
    val st = Files.createTempDirectory("slr_st").toString + "/state"
    val stRef = Files.createTempDirectory("slr_ref").toString + "/state"
    val ckpt = Files.createTempDirectory("slr_ckpt").toString
    val schema = docs(Seq((0L, "", 0L))).schema

    def runOnce(): Unit = {
      val q = StreamingLr.start(spark,
        spark.readStream.schema(schema).parquet(log), st, ckpt,
        "doc_id", "text", col("y") === 1L, buckets = B)
      q.awaitTermination()
    }

    val b1 = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "alpha up" else "beta down", i % 2))
    val b2 = (40L until 80L).map(i =>
      (i, if (i % 2 == 0) "alpha fast" else "beta slow", i % 2))
    docs(b1).write.mode("append").parquet(log); runOnce()
    docs(b2).write.mode("append").parquet(log); runOnce() // restart

    // reference: the same batches stepped manually in order
    StreamingLr.stepBatch(spark, docs(b1), 0, stRef, "doc_id", "text",
      col("y") === 1L, B)
    StreamingLr.stepBatch(spark, docs(b2), 1, stRef, "doc_id", "text",
      col("y") === 1L, B)
    val got = StreamingLr.readWeights(spark, st, Long.MaxValue, B)
    val want = StreamingLr.readWeights(spark, stRef, Long.MaxValue, B)
    assert(got.toSeq === want.toSeq)
    assert(got.exists(_ != 0L), "weights must have moved")
  }

  test("redelivered batch recomputes from the prior state: byte-identical weights") {
    val st = Files.createTempDirectory("slr_st2").toString + "/state"
    val b0 = docs((0L until 20L).map(i => (i, if (i % 2 == 0) "p q" else "r s", i % 2)))
    val b1 = docs((20L until 40L).map(i => (i, if (i % 2 == 0) "p t" else "r u", i % 2)))
    StreamingLr.stepBatch(spark, b0, 0, st, "doc_id", "text", col("y") === 1L, B)
    StreamingLr.stepBatch(spark, b1, 1, st, "doc_id", "text", col("y") === 1L, B)
    val after = StreamingLr.readWeights(spark, st, Long.MaxValue, B)
    // crash window: batch 1 redelivered after its state was written
    StreamingLr.stepBatch(spark, b1, 1, st, "doc_id", "text", col("y") === 1L, B)
    assert(StreamingLr.readWeights(spark, st, Long.MaxValue, B).toSeq
      === after.toSeq)
  }

  test("state log stays bounded and empty batches carry state forward") {
    val st = Files.createTempDirectory("slr_st3").toString + "/state"
    (0 until 20).foreach { i =>
      val b = if (i % 3 == 2) docs(Nil)
        else docs(Seq((i.toLong, if (i % 2 == 0) "alpha" else "beta", i % 2L)))
      StreamingLr.stepBatch(spark, b, i, st, "doc_id", "text",
        col("y") === 1L, B)
    }
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(st))
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    assert(files <= 9, s"state log grew to $files files")
    // the newest state is batch 19's (an empty batch that carried 18's)
    val w19 = StreamingLr.readWeights(spark, st, 20L, B)
    val w18 = StreamingLr.readWeights(spark, st, 19L, B)
    assert(w19.toSeq !== Array.fill(B + 1)(0L).toSeq)
    // batch 19 had docs (19 % 3 != 2 -> non-empty)? 19 % 3 == 1 -> docs.
    // batch 17 (17 % 3 == 2) was empty: its state equals batch 16's
    val w17 = StreamingLr.readWeights(spark, st, 18L, B)
    val w16 = StreamingLr.readWeights(spark, st, 17L, B)
    assert(w17.toSeq === w16.toSeq)
  }

  test("online model learns the planted split and scores via lrScore") {
    val st = Files.createTempDirectory("slr_st4").toString + "/state"
    (0 until 8).foreach { bi =>
      val b = docs((0L until 50L).map { i =>
        val id = bi * 50L + i
        (id, if (i % 2 == 0) "alpha alpha good" else "beta beta bad", i % 2)
      })
      StreamingLr.stepBatch(spark, b, bi, st, "doc_id", "text",
        col("y") === 1L, B, learnRate = 1.0)
    }
    val model = StreamingLr.currentModel(spark, st, B)
    val test0 = docs((1000L until 1100L).map(i =>
      (i, if (i % 2 == 0) "alpha good" else "beta bad", i % 2)))
    val wrong = Classifier.lrScore(test0, "doc_id", "text", model, B)
      .join(test0.select(col("doc_id"), col("y")), "doc_id")
      .filter(col("predicted") =!= col("y")).count()
    assert(wrong === 0L, s"online model misclassified $wrong/100")
  }
}
