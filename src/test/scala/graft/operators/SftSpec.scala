package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SftSpec extends SparkSpec {
  import spark.implicits._

  // ---- renderChat ----

  test("renderChat: spans extract exactly the assistant contents") {
    val turns = Seq(
      (1L, 0, "user", "hello there"),
      (1L, 1, "assistant", "hi! how can i help"),
      (1L, 2, "user", "pack my bags"),
      (1L, 3, "assistant", "done"),
      (2L, 0, "user", "solo prompt")).toDF("conv", "idx", "role", "content")
    val r = Sft.renderChat(turns, "conv", "idx", "role", "content")
      .orderBy("conv_id")
      .as[(Long, Int, String, String)].collect()
    assert(r.length === 2)
    val (c1, n1, text1, spans1) = r(0)
    assert((c1, n1) === ((1L, 4)))
    assert(text1 ===
      "<|user|>hello there\n<|assistant|>hi! how can i help\n" +
        "<|user|>pack my bags\n<|assistant|>done")
    val extracted = spans1.split(";").toSeq.map { sp =>
      val Array(s, e) = sp.split(":").map(_.toInt)
      text1.substring(s, e)
    }
    assert(extracted === Seq("hi! how can i help", "done"))
    // a conversation with no assistant turns renders empty spans
    assert(r(1)._4 === "")
    assert(r(1)._3 === "<|user|>solo prompt")
  }

  test("renderChat: turn order follows idx regardless of input order") {
    val turns = Seq(
      (1L, 1, "assistant", "b"),
      (1L, 0, "user", "a"),
      (1L, 2, "user", "c")).toDF("conv", "idx", "role", "content")
    val text = Sft.renderChat(turns, "conv", "idx", "role", "content")
      .select("text").as[String].head()
    assert(text === "<|user|>a\n<|assistant|>b\n<|user|>c")
  }

  // ---- maskedPack ----

  private def idsCorpus = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    // deterministic fake ids: token -> length (any int works; the packer
    // never inspects values)
    docs.select(col("doc_id"),
      transform(col("toks"), t => length(t).cast("int")).as("ids"),
      least(lit(8), ((size(col("toks")) + 1) / 2).cast("int"))
        .as("prompt_len"))
  }

  test("maskedPack: boundaries identical to the unmasked packer; masks conserve") {
    val docs = idsCorpus
    val masked = Sft.maskedPack(docs, "doc_id", "ids", "prompt_len", seqLen = 64)
    val plain = Curation.packSequencesIds(docs, "doc_id", "ids", seqLen = 64)

    val m = masked.select("example_id", "n_tokens", "ids", "doc_starts")
      .as[(Long, Int, Seq[Int], Seq[Int])].collect().sortBy(_._1)
    val p = plain.select("example_id", "n_tokens", "ids", "doc_starts")
      .as[(Long, Int, Seq[Int], Seq[Int])].collect().sortBy(_._1)
    assert(m.toSeq === p.toSeq,
      "mask must not perturb packing (same ids, same boundaries)")

    // per-example mask arithmetic
    val bad = masked.filter(
      size(col("ids")) =!= size(col("mask")) ||
        col("n_loss_tokens") =!= aggregate(col("mask"), lit(0), (a, x) => a + x))
    assert(bad.isEmpty)

    // global conservation: sum of mask == sum over docs of (n - prompt_len)
    val lossTotal = masked.agg(sum("n_loss_tokens")).as[Long].head()
    val want = docs.agg(sum(greatest(lit(0),
      size(col("ids")) - col("prompt_len")))).as[Long].head()
    assert(lossTotal === want)
  }

  test("maskedPack: a doc split across examples keeps its mask aligned") {
    // one 10-token doc, prompt_len 4, seqLen 6 -> example 0 = 6 toks
    // (mask 0,0,0,0,1,1), example 1 = 4 toks (mask 1,1,1,1)
    val docs = Seq((1L, List.range(1, 11), 4)).toDF("doc_id", "ids", "prompt_len")
    val got = Sft.maskedPack(docs, "doc_id", "ids", "prompt_len", seqLen = 6)
      .orderBy("example_id")
      .select("ids", "mask").as[(Seq[Int], Seq[Int])].collect().toSeq
    assert(got === Seq(
      (Seq(1, 2, 3, 4, 5, 6), Seq(0, 0, 0, 0, 1, 1)),
      (Seq(7, 8, 9, 10), Seq(1, 1, 1, 1))))
  }

  // ---- preferencePairs ----

  test("preferencePairs: argmax/argmin with deterministic ties and margin floor") {
    val cands = Seq(
      ("p1", 1L, 0.9), ("p1", 2L, 0.2), ("p1", 3L, 0.9), // tie on max -> id 1
      ("p2", 4L, 0.5), ("p2", 5L, 0.5),                  // zero margin
      ("p3", 6L, 0.4)                                    // single candidate
    ).toDF("prompt", "cand_id", "score")
    val got = Sft.preferencePairs(cands, "prompt", "cand_id", "score",
        minMargin = 0.1)
      .select("prompt", "n_cands", "chosen_id", "rejected_id", "margin")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("p1", 3L, 1L, 2L, 0.7)))
  }

  test("preferencePairs: minMargin 0 keeps distinct-score pairs and drops singletons") {
    val cands = Seq(
      ("p1", 2L, 0.3), ("p1", 1L, 0.8),
      ("p2", 9L, 1.0)).toDF("prompt", "cand_id", "score")
    val got = Sft.preferencePairs(cands, "prompt", "cand_id", "score")
      .select("prompt", "chosen_id", "rejected_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("p1", 1L, 2L)))
  }
}
