package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packInterleaved: per-doc [IMG_BEGIN] patches [IMG_END] text-ids structure") {
    val base = Seq((1L, "aa bb"), (2L, "cc"), (3L, "dd ee ff"))
      .toDF("doc_id", "text")
    def hex2(c: org.apache.spark.sql.Column) = lpad(hex(c % 256), 2, "0")
    val payload = unhex(concat(hex2(col("doc_id")),
      hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
    val docs = base.select(col("doc_id"), payload.as("content"), col("text"))
    val out = Multimodal.packInterleaved(docs, "doc_id", "content", "text",
        w = 8, h = 6, outW = 4, outH = 4, p = 2, textVocab = 512,
        seqLen = 1000)
      .collect()
    // everything fits one example
    assert(out.length === 1)
    val r = out.head
    val nToks = Seq(2, 1, 3)
    assert(r.getAs[Int]("n_tokens") === nToks.map(_ + 6).sum)
    assert(r.getAs[Int]("n_docs_started") === 3)
    val ids = r.getSeq[Int](r.fieldIndex("ids"))
    val starts = r.getSeq[Int](r.fieldIndex("doc_starts"))
    assert(starts.length === 3 && starts.head === 0)
    // each document segment: IMG_BEGIN, 4 patch tokens, IMG_END, text ids
    val bounds = starts :+ ids.length
    bounds.sliding(2).foreach { case Seq(a, b) =>
      val seg = ids.slice(a, b)
      assert(seg.head === 512, s"segment $seg")
      assert(seg.slice(1, 5).forall(t => t >= 514 && t <= 769),
        s"patch tokens out of range in $seg")
      assert(seg(5) === 513, s"segment $seg")
      assert(seg.drop(6).forall(t => t >= 0 && t < 512),
        s"text ids out of range in $seg")
    }
    // segment lengths are 6 + token count, in SOME doc order (hash order)
    assert(bounds.sliding(2).map { case Seq(a, b) => b - a }.toSeq.sorted ===
      nToks.map(_ + 6).sorted)
  }

  test("packInterleaved carves across example boundaries conservatively") {
    val base = (0L until 20L).map(i => (i, s"t$i u$i v$i")).toDF("doc_id", "text")
    def hex2(c: org.apache.spark.sql.Column) = lpad(hex(c % 256), 2, "0")
    val payload = unhex(concat(hex2(col("doc_id")),
      hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
    val docs = base.select(col("doc_id"), payload.as("content"), col("text"))
    // 9 ids per doc (6 + 3), 20 docs = 180 ids at seqLen 16 -> 12 examples
    val out = Multimodal.packInterleaved(docs, "doc_id", "content", "text",
      w = 8, h = 6, outW = 4, outH = 4, p = 2, textVocab = 512, seqLen = 16)
    val agg = out.agg(count(lit(1)), sum("n_tokens"), max("n_tokens"),
      sum("n_docs_started")).head()
    assert(agg.getLong(0) === (180L + 15) / 16)
    assert(agg.getLong(1) === 180L)
    assert(agg.getInt(2) === 16)
    assert(agg.getLong(3) === 20L)
  }
}
