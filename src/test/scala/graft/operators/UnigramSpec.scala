package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramKernels
import graft.operators.Unigram.UnigramConfig

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(entries: (String, Long)*) =
    Unigram.modelDf(spark, entries.toArray)

  private def enc(texts: Seq[String],
                  m: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Unigram.encode(docs, "doc_id", "text", m)
      .orderBy("doc_id").select("pieces").as[Seq[String]].collect().toSeq
  }

  test("Viterbi golden: max-likelihood segmentation wins") {
    val m = model("a" -> -2000000000L, "b" -> -2000000000L,
      "ab" -> -1500000000L)
    // ab·ab = -3.0 beats a·b·a·b = -8.0 and ab·a·b = -5.5
    assert(enc(Seq("abab"), m) === Seq(Seq("ab", "ab")))
    // a cheap long piece loses to two good short ones: raise ab's cost
    val m2 = model("a" -> -1000000000L, "b" -> -1000000000L,
      "ab" -> -2500000000L)
    assert(enc(Seq("ab"), m2) === Seq(Seq("a", "b")))
  }

  test("whole-word UNK and tie-break determinism") {
    val m = model("a" -> -1000000000L, "ok" -> -1000000000L,
      "o" -> -1000000000L, "k" -> -1000000000L)
    // 'z' matches no piece: whole word collapses
    assert(enc(Seq("az ok"), m) === Seq(Seq("[UNK]", "ok")))
    // uniform probs: equal-likelihood tie [ab,a] vs [a,ba] resolves to the
    // shortest final piece (first candidate found), recursively
    val u = model("a" -> -1500000000L, "b" -> -1500000000L,
      "ab" -> -1500000000L, "ba" -> -1500000000L)
    assert(enc(Seq("aba"), u) === Seq(Seq("ab", "a")))
  }

  test("EM hand-check: one iteration on corpus {ab} matches forward-backward") {
    val cfg = UnigramConfig(vocabSize = 10, maxPieceLen = 2, seedSize = 10,
      emIters = 1)
    // seed: a=1, b=1, ab=1 -> uniform 1/3. Lattice of "ab":
    // [ab] mass 1/3, [a,b] mass 1/9, Z=4/9 -> posterior 3/4 vs 1/4.
    val idx = UnigramKernels.buildIndex(Array("a", "ab", "b"))
    val p = math.log(1.0 / 3)
    val probs = Array.fill(3)(math.exp(math.round(p * 1e9) / 1e9))
    val exp = UnigramKernels.expectedMicro("ab", 1L, idx, probs, 2)
    assert(exp.toMap === Map(0 -> 250000L, 1 -> 750000L, 2 -> 250000L))
    // M-step: counts (0.25, 0.75, 0.25)e6, total 1.25e6
    val trained = Unigram.trainLocal(Seq("ab" -> 1L), cfg).toMap
    def llp(c: Long) = math.round(
      (math.log(c.toDouble) - math.log(1250000.0)) * 1e9)
    assert(trained === Map("a" -> llp(250000), "ab" -> llp(750000),
      "b" -> llp(250000)))
  }

  test("pruning keeps all chars, ranks multi-char by count, tie on utf8") {
    val pieces = Array("a", "ab", "b", "ba", "z")
    val micro = Array(0L, 500L, 10L, 500L, 7L)
    val kept = Unigram.mStep(pieces, micro, vocabSize = 4)
    // chars a (floored to 1), b, z always survive; one multi slot left:
    // ab and ba tie at 500 -> ab wins on utf8 order
    assert(kept.map(_._1).toSeq === Seq("a", "ab", "b", "z"))
    val total = 1L + 500L + 10L + 7L
    assert(kept.toMap.apply("ab") ===
      math.round((math.log(500.0) - math.log(total.toDouble)) * 1e9))
  }

  test("property: distributed trainer equals serial bit-for-bit") {
    val docs = graft.Tables.documents(spark, sfDir)
    val cfg = UnigramConfig(vocabSize = 120, maxPieceLen = 4, seedSize = 200,
      emIters = 2, driverLocalMaxVocab = 0L)
    val words = Bpe.wordCounts(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val serial = Unigram.trainLocal(words, cfg)
    val dist = Unigram.trainDistributed(Bpe.wordCounts(docs, "text"), cfg)
    assert(dist.toSeq === serial.toSeq)
    // and train() routes to the same result either way
    val viaTrain = Unigram.train(docs, "text", cfg)
      .orderBy("piece").select("piece", "llp_nano")
      .as[(String, Long)].collect().toSeq
    assert(viaTrain === serial.toSeq)
  }

  test("uniform vocab closed form: vocab word 1 piece, rest per-char") {
    val docs = graft.Tables.documents(spark, sfDir)
    val m = Unigram.uniformVocab(docs, "text", topWords = 50)
    val top = m.filter(length(col("piece")) > 1)
      .select("piece").as[String].collect().toSet
    val out = Unigram.encode(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id"),
        filter(TextOps.tokens(col("text")), w => length(w) > 0).as("toks")),
        "doc_id")
      .as[(Long, Int, Seq[String], Seq[String])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, pieces, toks) =>
      val want = toks.map(w => if (top(w)) 1 else w.length).sum
      assert(n === want, s"doc $id")
      assert(pieces.mkString("") === toks.mkString(""), s"doc $id coverage")
    }
  }

  test("uniformVocab drops top words that are substrings of another token") {
    val docs = Seq((1L, "playing play play note note note"))
      .toDF("doc_id", "text")
    val m = Unigram.uniformVocab(docs, "text", topWords = 10)
    val multi = m.filter(length(col("piece")) > 1)
      .select("piece").as[String].collect().toSet
    assert(multi.contains("playing") && multi.contains("note"))
    assert(!multi.contains("play"), "play is a substring of playing")
    // and the dropped word now encodes per-char
    assert(enc(Seq("play"), m) === Seq(Seq("p", "l", "a", "y")))
  }

  test("sampleEncode: deterministic, covering, Viterbi-bounded, alpha-sensitive") {
    // 2000 copies of "ab" under uniform {a, b, ab}: posterior of the
    // 1-piece segmentation is p/(p+p^2) = 3/4 at alpha=1
    val docs = (0L until 2000L).map(i => (i, "ab")).toDF("doc_id", "text")
    val m = model("a" -> -1098612289L, "b" -> -1098612289L,
      "ab" -> -1098612289L) // ln(1/3) nano
    def frac(alpha: Double): Double = {
      val out = Unigram.sampleEncode(docs, "doc_id", "text", m, alpha,
        seed = 7L)
      out.filter(size(col("pieces")) === 1).count().toDouble / 2000.0
    }
    val f1 = frac(1.0)
    assert(math.abs(f1 - 0.75) < 0.05, s"alpha=1 whole-word fraction $f1")
    // flatter draw at small alpha: p^0.1 ratio -> ~0.53
    val f01 = frac(0.1)
    assert(math.abs(f01 - 0.527) < 0.05, s"alpha=0.1 fraction $f01")
    assert(f01 < f1)
    // deterministic: the exact same pieces on a rerun
    val a = Unigram.sampleEncode(docs, "doc_id", "text", m, 0.5, seed = 7L)
      .orderBy("doc_id").select("pieces").as[Seq[String]].collect().toSeq
    val b = Unigram.sampleEncode(docs, "doc_id", "text", m, 0.5, seed = 7L)
      .orderBy("doc_id").select("pieces").as[Seq[String]].collect().toSeq
    assert(a === b)
    // different seeds decorrelate
    val c = Unigram.sampleEncode(docs, "doc_id", "text", m, 0.5, seed = 8L)
      .orderBy("doc_id").select("pieces").as[Seq[String]].collect().toSeq
    assert(a !== c)

    // real corpus: coverage + vocab membership + Viterbi optimality bound
    val corpus = graft.Tables.documents(spark, sfDir).limit(200)
    val tm = Unigram.train(corpus, "text",
      UnigramConfig(vocabSize = 150, maxPieceLen = 4, seedSize = 300,
        emIters = 2))
    val llpOf = tm.select("piece", "llp_nano").as[(String, Long)]
      .collect().toMap
    val vit = Unigram.encode(corpus, "doc_id", "text", tm)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    val samp = Unigram.sampleEncode(corpus, "doc_id", "text", tm, 0.5, 3L)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    assert(samp.keySet === vit.keySet)
    samp.foreach { case (id, pieces) =>
      assert(pieces.forall(llpOf.contains), s"doc $id: non-vocab piece")
      assert(pieces.mkString("") === vit(id).mkString(""), s"doc $id coverage")
      assert(pieces.iterator.map(llpOf).sum <=
        vit(id).iterator.map(llpOf).sum, s"doc $id beats Viterbi")
    }
    // the sampler actually explores: some doc differs from argmax
    assert(samp.exists { case (id, pieces) => pieces != vit(id) })
  }

  test("encodeIds roundtrip through the model's id assignment") {
    val docs = graft.Tables.documents(spark, sfDir).limit(100)
    val m = Unigram.train(docs, "text",
      UnigramConfig(vocabSize = 150, maxPieceLen = 4, seedSize = 300,
        emIters = 2))
    val byId = m.select("id", "piece").as[(Int, String)].collect().toMap
    val texts = Unigram.encode(docs, "doc_id", "text", m)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    val ids = Unigram.encodeIds(docs, "doc_id", "text", m)
      .select("doc_id", "ids").as[(Long, Seq[Int])].collect().toMap
    assert(ids.keySet === texts.keySet)
    ids.foreach { case (d, seq) =>
      assert(seq.map(byId) === texts(d), s"doc $d")
    }
    // frequency-sorted dense ids: 0..V-1
    val allIds = m.select("id").as[Int].collect().sorted
    assert(allIds.toSeq === (0 until allIds.length))
  }
}
