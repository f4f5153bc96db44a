package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def gridMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("streamed grid is bit-equal to the batch grid across restarts") {
    val log = Files.createTempDirectory("cms_log").toString + "/data"
    val dir = Files.createTempDirectory("cms_dir").toString + "/grid"
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    val schema = docs(Seq((0L, ""))).schema

    def runOnce(): Unit = {
      val q = StreamingCms.start(spark,
        spark.readStream.schema(schema).parquet(log), dir, ckpt, "text",
        depth = 3, width = 8)
      q.awaitTermination()
    }

    val b1 = Seq((1L, "a a b c"), (2L, "a c d"))
    val b2 = Seq((3L, "b e e a"), (4L, "f"))
    docs(b1).write.mode("append").parquet(log); runOnce()
    docs(b2).write.mode("append").parquet(log); runOnce() // restart, same ckpt

    val streamed = gridMap(StreamingCms.read(spark, dir))
    val batch = gridMap(
      TextAnalysis.countMinGrid(docs(b1 ++ b2), "text", depth = 3, width = 8))
    assert(streamed === batch)
    // and so are the estimates
    val est = StreamingCms.estimate(spark, dir, Seq("a", "e", "zz"),
        depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bEst = TextAnalysis.countMinEstimate(
        TextAnalysis.countMinGrid(docs(b1 ++ b2), "text", 3, 8),
        Seq("a", "e", "zz"), 3, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === bEst)
    assert(est("a") >= 4L && est("e") >= 2L)
  }

  test("redelivered batch overwrites its partition; compact preserves and stays mergeable") {
    val dir = Files.createTempDirectory("cms_dir2").toString + "/grid"
    val b = docs(Seq((1L, "x x y"), (2L, "x")))
    StreamingCms.upsertBatch(spark, b, 0, dir, "text", depth = 3, width = 8)
    StreamingCms.upsertBatch(spark, b, 0, dir, "text", depth = 3, width = 8)
    val once = gridMap(TextAnalysis.countMinGrid(b, "text", 3, 8))
    assert(gridMap(StreamingCms.read(spark, dir)) === once)

    StreamingCms.compact(spark, dir)
    assert(gridMap(StreamingCms.read(spark, dir)) === once)
    // post-compact merge of a fresh batch still adds pointwise
    val b2 = docs(Seq((3L, "y z")))
    StreamingCms.upsertBatch(spark, b2, 1, dir, "text", depth = 3, width = 8)
    val full = gridMap(TextAnalysis.countMinGrid(
      b.unionByName(b2), "text", 3, 8))
    assert(gridMap(StreamingCms.read(spark, dir)) === full)
  }
}
