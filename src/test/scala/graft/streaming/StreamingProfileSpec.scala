package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def decodeRead(dir: String, capacity: Int = 16) = {
    val r = StreamingProfile.read(spark, dir, capacity = capacity).head()
    val hitters = r.getSeq[Row](2).map(x => (x.getString(0), x.getLong(1)))
    (r.getLong(0), r.getLong(1), hitters, r.getSeq[Double](3))
  }

  test("streamed profile equals the one-shot batch profile across restarts") {
    val log = Files.createTempDirectory("sp_log").toString + "/data"
    val dir = Files.createTempDirectory("sp_dir").toString + "/profile"
    val ckpt = Files.createTempDirectory("sp_ckpt").toString
    val schema = docs(Seq((0L, ""))).schema

    def runOnce(): Unit = {
      val q = StreamingProfile.start(spark,
        spark.readStream.schema(schema).parquet(log), dir, ckpt, "text",
        capacity = 16)
      q.awaitTermination()
    }

    val b1 = Seq((1L, "a a b"), (2L, "a c"))
    val b2 = Seq((3L, "a b b d e"), (4L, "a"))
    docs(b1).write.mode("append").parquet(log); runOnce()
    docs(b2).write.mode("append").parquet(log); runOnce() // restart, same ckpt

    val (nDocs, nToks, hitters, quants) = decodeRead(dir)
    assert(nDocs === 4L && nToks === 11L)
    // capacity 16 > distinct tokens -> MG exact: a=5,b=3,c=1,d=1,e=1
    assert(hitters === Seq(("a", 5L), ("b", 3L), ("c", 1L), ("d", 1L), ("e", 1L)))
    // doc lengths {3,2,5,1}; KLL exact at this size: median = 2 or 3
    assert(quants.size === 3 && quants(1) >= 2.0 && quants(1) <= 3.0)
  }

  test("redelivered batch overwrites its partition: counts and sketches stable") {
    val dir = Files.createTempDirectory("sp_dir2").toString + "/profile"
    val b = docs(Seq((1L, "x x y"), (2L, "x")))
    StreamingProfile.upsertBatch(spark, b, 3, dir, "text", capacity = 16)
    StreamingProfile.upsertBatch(spark, b, 3, dir, "text", capacity = 16)
    val (nDocs, nToks, hitters, _) = decodeRead(dir)
    assert(nDocs === 2L && nToks === 4L)
    assert(hitters === Seq(("x", 3L), ("y", 1L)))
  }

  test("compact folds history to one partition; result and re-mergeability survive") {
    val dir = Files.createTempDirectory("sp_dir3").toString + "/profile"
    (0 until 5).foreach { i =>
      StreamingProfile.upsertBatch(spark,
        docs(Seq((i.toLong, s"w$i common"))), i, dir, "text", capacity = 16)
    }
    val before = decodeRead(dir)
    StreamingProfile.compact(spark, dir, capacity = 16)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("__batch="))
    assert(parts.length === 1 && parts.head === "__batch=c4")
    assert(decodeRead(dir) === before)
    // a post-compact batch merges on top of the fold
    StreamingProfile.upsertBatch(spark,
      docs(Seq((9L, "common common"))), 5, dir, "text", capacity = 16)
    val (nDocs, nToks, hitters, _) = decodeRead(dir)
    assert(nDocs === 6L && nToks === 12L)
    assert(hitters.head === (("common", 7L)))
    // redelivery of an already-folded batch is skipped, not double-counted
    StreamingProfile.upsertBatch(spark,
      docs(Seq((2L, "w2 common"))), 2, dir, "text", capacity = 16)
    assert(decodeRead(dir)._1 === 6L)
  }

  test("guarantee holds through batch + merge: planted hitter never lost") {
    val dir = Files.createTempDirectory("sp_dir4").toString + "/profile"
    // 3 batches, 400 tokens each; "hot" appears 60x per batch (180 total,
    // above the merged bound N/(cap+1) = 1200/9 ~ 133 -> guaranteed to
    // survive); the rest spread over cold tokens
    (0 until 3).foreach { bi =>
      val toks = Seq.fill(60)("hot") ++
        (0 until 340).map(i => s"cold${bi * 340 + i % 120}")
      StreamingProfile.upsertBatch(spark,
        docs(Seq((bi.toLong, toks.mkString(" ")))), bi, dir, "text",
        capacity = 8)
    }
    val (_, nToks, hitters, _) = decodeRead(dir, capacity = 8)
    assert(nToks === 1200L)
    val hot = hitters.find(_._1 == "hot")
    assert(hot.isDefined, s"hot missing from $hitters")
    assert(hot.get._2 <= 180L && hot.get._2 >= 180L - 1200L / 9)
  }
}
