package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqIndexSpec extends SparkSpec {

  private def embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def brute(qid: Long, k: Int): Seq[Long] =
    Similarity.bruteForceTopK(embs, "vec_id", "embedding", qid, k)
      .collect().map(_.getLong(0)).toSeq

  test("PQ build is deterministic and codes are m bytes") {
    val dir = Files.createTempDirectory("pq_det").toString
    PqIndex.build(embs, "vec_id", "embedding", s"$dir/a", m = 8, ksub = 256)
    PqIndex.build(embs, "vec_id", "embedding", s"$dir/b", m = 8, ksub = 256)
    val a = spark.read.parquet(s"$dir/a/codes").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1)))
    val b = spark.read.parquet(s"$dir/b/codes").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1)))
    assert(a.length === 500)
    assert(a.forall(_._2.length == 8), "m=8 -> 8 one-byte codes")
    assert(a.toSeq === b.toSeq, "same input + deterministic seeds -> same codes")
  }

  test("ADC top-k with exact rerank recovers the brute-force neighbors") {
    val dir = Files.createTempDirectory("pq_topk").toString
    PqIndex.build(embs, "vec_id", "embedding", dir, m = 8, ksub = 256)
    val qv = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = PqIndex.topK(spark, dir, qv, k = 11,
        rerankFrom = Some((embs, "vec_id", "embedding")))
      .filter(col("id") =!= 0).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val expected = brute(0L, 10)
    val overlap = got.toSet.intersect(expected.toSet).size
    assert(overlap >= 8,
      s"rerank recall@10 too low: $overlap/10 (got $got vs $expected)")
  }

  test("raw ADC scan (no rerank) still surfaces most true neighbors") {
    val dir = Files.createTempDirectory("pq_raw").toString
    PqIndex.build(embs, "vec_id", "embedding", dir, m = 8, ksub = 256)
    val qv = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = PqIndex.topK(spark, dir, qv, k = 11)
      .filter(col("id") =!= 0).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val overlap = got.toSet.intersect(brute(0L, 10).toSet).size
    assert(overlap >= 5, s"raw ADC recall@10 too low: $overlap/10")
  }
}
