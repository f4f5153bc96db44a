package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Classifier

class StreamingNbSpec extends SparkSpec {
  import spark.implicits._

  private val B = 512

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  private def modelRows(m: DataFrame) =
    m.as[(String, Long, Double)].collect().toSeq.sorted
  private def priorRows(p: DataFrame) =
    p.as[(String, Double, Double)].collect().toSeq.sorted

  test("streamed counts derive a model BIT-IDENTICAL to batch nbTrain") {
    val log = Files.createTempDirectory("snb_log").toString + "/data"
    val dir = Files.createTempDirectory("snb_dir").toString + "/counts"
    val ckpt = Files.createTempDirectory("snb_ckpt").toString
    val schema = docs(Seq((0L, "", ""))).schema

    def runOnce(): Unit = {
      val q = StreamingNb.start(spark,
        spark.readStream.schema(schema).parquet(log), dir, ckpt,
        "doc_id", "text", "lang", B)
      q.awaitTermination()
    }

    val b1 = Seq((1L, "cat cat dog", "a"), (2L, "dog", "b"))
    val b2 = Seq((3L, "cat fish", "a"), (4L, "dog dog fish", "b"),
      (5L, "bird", "c"))
    docs(b1).write.mode("append").parquet(log); runOnce()
    docs(b2).write.mode("append").parquet(log); runOnce() // restart

    val (sm, sp) = StreamingNb.currentModel(spark, dir, B)
    val (bm, bp) = Classifier.nbTrain(docs(b1 ++ b2), "doc_id", "text",
      "lang", B)
    assert(modelRows(sm) === modelRows(bm))
    assert(priorRows(sp) === priorRows(bp))
  }

  test("redelivery and compaction leave the derived model unchanged") {
    val dir = Files.createTempDirectory("snb_dir2").toString + "/counts"
    val b0 = docs(Seq((1L, "x y", "a"), (2L, "y", "b")))
    val b1 = docs(Seq((3L, "x x", "a")))
    StreamingNb.upsertBatch(spark, b0, 0, dir, "doc_id", "text", "lang", B)
    StreamingNb.upsertBatch(spark, b1, 1, dir, "doc_id", "text", "lang", B)
    val before = (modelRows(StreamingNb.currentModel(spark, dir, B)._1),
      priorRows(StreamingNb.currentModel(spark, dir, B)._2))
    // redelivery overwrites, compact folds, already-folded redelivery skips
    StreamingNb.upsertBatch(spark, b1, 1, dir, "doc_id", "text", "lang", B)
    StreamingNb.compact(spark, dir)
    StreamingNb.upsertBatch(spark, b1, 1, dir, "doc_id", "text", "lang", B)
    val after = (modelRows(StreamingNb.currentModel(spark, dir, B)._1),
      priorRows(StreamingNb.currentModel(spark, dir, B)._2))
    assert(after === before)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("__batch="))
    assert(parts.toSeq === Seq("__batch=c1"))
  }

  test("the streamed model scores through nbScore like the batch model") {
    val dir = Files.createTempDirectory("snb_dir3").toString + "/counts"
    val train = docs((0L until 100L).map(i =>
      (i, if (i % 2 == 0) "alpha alpha" else "beta beta",
        if (i % 2 == 0) "pos" else "neg")))
    StreamingNb.upsertBatch(spark, train, 0, dir, "doc_id", "text", "lang", B)
    val (m, p) = StreamingNb.currentModel(spark, dir, B)
    val test0 = docs(Seq((900L, "alpha", "?"), (901L, "beta", "?")))
    val got = Classifier.nbScore(test0, "doc_id", "text", m, p, B)
      .as[(Long, String, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(got === Map(900L -> "pos", 901L -> "neg"))
  }
}
