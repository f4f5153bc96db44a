package graft.operators

import graft.{SparkSpec, Tables}

import org.apache.spark.sql.functions.col

class BpeSpec extends SparkSpec {
  import Bpe.{BpeConfig, Merge}

  private def docsDf = Tables.documents(spark, sfDir)

  test("serial reference: greedy left-to-right merge, deterministic ties") {
    // "aaaa"x3 + "ab"x2: best pair (a,a) count 3*3=9 -> "aaaa"=[aa,aa,</w>]
    val ms = Bpe.learnLocal(
      Seq("aaaa" -> 3L, "ab" -> 2L), BpeConfig(numMerges = 2))._1
    assert(ms.head == Merge(0, "a", "a", "aa", 9L))
    // next round: (aa,aa) 3, (aa,</w>) 3, (a,b) 2, (b,</w>) 2 — count tie
    // between (aa,aa) and (aa,</w>) breaks on right string: "</w>" < "aa"
    assert(ms(1) == Merge(1, "aa", "</w>", "aa</w>", 3L))
  }

  test("serial reference stops below minPairFreq") {
    val ms = Bpe.learnLocal(Seq("ab" -> 1L, "cd" -> 1L),
      BpeConfig(numMerges = 10, minPairFreq = 2L))._1
    assert(ms.isEmpty)
  }

  test("distributed merge loop matches the serial reference exactly") {
    val words = Bpe.wordCounts(docsDf, "text")
    val counts = words.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toSeq
    val cfg = BpeConfig(numMerges = 12)
    val serial = Bpe.learnLocal(counts, cfg)._1
    val (dist, vocabDf) = Bpe.learnDistributed(words, cfg)
    assert(serial.nonEmpty && dist == serial)
    // the distributed dictionary's symbols reproduce the serial rewrite
    val serialVocab = {
      var v = counts.map { case (w, c) =>
        w -> (w.split("").filter(_.nonEmpty) :+ Bpe.EndMark).toSeq
      }.toMap
      for (m <- serial) v = v.map { case (w, syms) =>
        val out = collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (out.nonEmpty && out.last == m.left && s == m.right)
            out(out.length - 1) = m.merged
          else out += s
        }
        w -> out.toSeq
      }
      v
    }
    val distVocab = vocabDf.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
    assert(distVocab == serialVocab)
  }

  test("learn() driver-local path equals the distributed path end-to-end") {
    val cfg = BpeConfig(numMerges = 8)
    val (mLocal, vLocal) = Bpe.learn(docsDf, "text", cfg)
    val (mDist, vDist) = Bpe.learn(docsDf, "text",
      cfg.copy(driverLocalMaxVocab = 0L))
    assert(mLocal.collect().toSeq == mDist.collect().toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
    assert(key(vLocal) == key(vDist))
  }

  test("encode reassembles word order and matches a serial encode") {
    val cfg = BpeConfig(numMerges = 10)
    val (_, vocab) = Bpe.learn(docsDf, "text", cfg)
    val enc = Bpe.encode(docsDf, "doc_id", "text", vocab).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val dict = vocab.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
    val docs = docsDf.select("doc_id", "text").collect()
    assert(enc.size == docs.length)
    for (r <- docs.take(50)) {
      val toks = r.getString(1).toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).toSeq
        .flatMap(w => dict.getOrElse(w,
          (w.split("").filter(_.nonEmpty) :+ Bpe.EndMark).toSeq))
      val (n, t) = enc(r.getLong(0))
      assert(n == toks.length && t == toks.mkString(" "),
        s"doc ${r.getLong(0)} encode mismatch")
    }
  }

  test("encode broadcast-dict and join paths are byte-equal") {
    import spark.implicits._
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 10))._2
    val docs = docsDf.select("doc_id", "text")
      .union(Seq((90001L, ""), (90002L, "   "), (90003L, "zzqx unseen"))
        .toDF("doc_id", "text"))
    val fast = Bpe.encode(docs, "doc_id", "text", vocab)
    val join = Bpe.encode(docs, "doc_id", "text", vocab, broadcastMaxVocab = 0L)
    assert(fast.exceptAll(join).isEmpty && join.exceptAll(fast).isEmpty)
    // token-less docs are dropped by both paths
    assert(fast.filter(col("doc_id") >= 90001L && col("doc_id") <= 90002L).isEmpty)
    assert(fast.filter(col("doc_id") === 90003L).count() == 1)
  }

  test("dict-path encode plans with zero shuffle exchanges") {
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 5))._2
    val enc = Bpe.encode(docsDf, "doc_id", "text", vocab)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case other => other.collect {
        case _: ShuffleExchangeLike => 1
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      }.sum
    }
    assert(shuffles(enc.queryExecution.executedPlan) == 0,
      "dict-path tokenization must stay a map-only scan pipeline:\n" +
        enc.queryExecution.executedPlan.toString)
  }

  test("encode falls back to character symbols for unseen words") {
    import spark.implicits._
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 5))._2
    val out = Bpe.encode(
      Seq((1L, "zzqx")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().head
    assert(out.getString(2) == s"z z q x ${Bpe.EndMark}")
  }

  test("symbolVocab ids are dense, frequency-sorted, deterministic") {
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 10))._2
    val sv = Bpe.symbolVocab(vocab).orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(sv.map(_._2).toSeq == sv.indices.toSeq, "ids must be dense from 0")
    val freqs = sv.map(_._3)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    // tie-break: equal-frequency symbols ordered by symbol string
    sv.groupBy(_._3).values.filter(_.length > 1).foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._1).toSeq == sorted.map(_._1).sorted.toSeq)
    }
  }

  test("encodeIds decodes back to the string encoding exactly") {
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 10))._2
    val idOf = Bpe.symbolVocab(vocab).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val tokOf = idOf.map(_.swap)
    val strs = Bpe.encode(docsDf, "doc_id", "text", vocab).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val ids = Bpe.encodeIds(docsDf, "doc_id", "text", vocab).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(ids.map(_._1).toSet == strs.keySet)
    for ((id, n, seq) <- ids) {
      assert(n == seq.length)
      assert(seq.map(tokOf).mkString(" ") == strs(id),
        s"doc $id id-decode mismatch")
    }
  }

  test("encodeIds falls back per character and emits unk for unknowns") {
    import spark.implicits._
    val vocab = Bpe.learn(docsDf, "text", BpeConfig(numMerges = 5))._2
    val idOf = Bpe.symbolVocab(vocab).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // "a" is a known character here; "¤" cannot be (corpus is ascii words)
    val out = Bpe.encodeIds(
      Seq((1L, "a¤")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().head.getSeq[Int](2)
    assert(out == Seq(idOf("a"), -1, idOf(Bpe.EndMark)))
  }

  test("merge sequence is stable across reruns") {
    val cfg = BpeConfig(numMerges = 6)
    val a = Bpe.learn(docsDf, "text", cfg)._1.collect().toSeq
    val b = Bpe.learn(docsDf, "text", cfg)._1.collect().toSeq
    assert(a == b && a.length == 6)
  }
}
