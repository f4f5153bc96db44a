package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(texts: Seq[String], vocab: Seq[String]): Seq[Seq[String]] = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = WordPiece.encode(docs, "doc_id", "text",
        vocab.toDF("piece"))
      .orderBy("doc_id").select("pieces")
      .as[Seq[String]].collect().toSeq
    out
  }

  test("HuggingFace-convention golden: continuation pieces, longest match first") {
    assert(enc(Seq("unaffable"), Seq("un", "aff", "##aff", "##able")) ===
      Seq(Seq("un", "##aff", "##able")))
    // longest word-initial match wins over a shorter one
    assert(enc(Seq("abc"), Seq("a", "ab", "##c", "##bc")) ===
      Seq(Seq("ab", "##c")))
    // word-initial pieces never match mid-word (needs ##)
    assert(enc(Seq("abc"), Seq("a", "bc", "##c")) ===
      Seq(Seq("[UNK]")))
  }

  test("whole-word UNK: any unmatchable position collapses the word") {
    assert(enc(Seq("xq ok"), Seq("x", "ok")) === Seq(Seq("[UNK]", "ok")))
    // partial progress is reverted, not emitted
    assert(enc(Seq("abz"), Seq("a", "##b")) === Seq(Seq("[UNK]")))
  }

  test("property: kernel equals a serial greedy reference on random vocab") {
    val rnd = new Random(99)
    def serial(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        var j = math.min(word.length, i + maxLen)
        var m: String = null
        while (m == null && j > i) {
          val cand = if (i == 0) word.substring(i, j) else "##" + word.substring(i, j)
          if (vocab(cand)) m = cand else j -= 1
        }
        if (m == null) return Seq("[UNK]")
        out += m; i = j
      }
      out.toSeq
    }
    for (_ <- 0 until 30) {
      val alphabet = "abcd"
      val vocab = (Seq.fill(12) {
        val len = 1 + rnd.nextInt(3)
        val s = Seq.fill(len)(alphabet(rnd.nextInt(4))).mkString
        if (rnd.nextBoolean()) s else "##" + s
      } ++ alphabet.map(_.toString)).distinct // chars guarantee matchability
      val maxLen = vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
      val words = Seq.fill(8)(
        Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString)
      val got = enc(Seq(words.mkString(" ")), vocab).head
      val want = words.flatMap(w => serial(w, vocab.toSet, maxLen))
      assert(got === want, s"vocab=$vocab words=$words")
    }
  }

  test("prefix-free charWordVocab closed form: vocab word 1 piece, rest per-char") {
    val docs = graft.Tables.documents(spark, sfDir)
    val vocab = WordPiece.charWordVocab(docs, "text", topWords = 50,
      prefixFree = true)
    val top = vocab
      .filter(length(col("piece")) > 1 && !col("piece").startsWith("##"))
      .select("piece").as[String].collect().toSet
    val out = WordPiece.encode(docs, "doc_id", "text", vocab)
      .join(docs.select(col("doc_id"),
        filter(TextOps.tokens(col("text")), w => length(w) > 0).as("toks")),
        "doc_id")
      .as[(Long, Int, Seq[String], Seq[String])].collect()
    out.foreach { case (id, n, _, toks) =>
      val want = toks.map(w => if (top(w)) 1 else w.length).sum
      assert(n === want, s"doc $id")
    }
  }

  test("prefixFree drops exactly the top words that prefix another token") {
    val docs = Seq((1L, "play played player note note note")).toDF("doc_id", "text")
    val pieces = WordPiece.charWordVocab(docs, "text", topWords = 10,
        prefixFree = true)
      .select("piece").as[String].collect().toSet
    assert(pieces.contains("note") && pieces.contains("played")
      && pieces.contains("player"))
    assert(!pieces.contains("play"), "play prefixes played/player")
  }
}
