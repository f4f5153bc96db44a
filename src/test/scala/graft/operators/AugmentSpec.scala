package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AugmentSpec extends SparkSpec {
  import spark.implicits._

  test("fim: slices partition the token stream; reassembly recovers the doc") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Augment.fim(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks")), "doc_id")
      .as[(Long, Int, Int, Int, String, Seq[String])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, s1, s2, fimText, toks) =>
      assert(0 <= s1 && s1 <= s2 && s2 <= n, s"doc $id split out of range")
      // parse PSM back and reassemble P + M + S == original
      val body = fimText.split("<PRE>|<SUF>|<MID>", -1).map(_.trim)
      assert(body.length == 4) // leading empty + three segments
      val (p, sfx, m) = (body(1), body(2), body(3))
      val rebuilt = Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt === toks.mkString(" "), s"doc $id lost tokens")
      assert(p === toks.take(s1).mkString(" "))
      assert(m === toks.slice(s1, s2).mkString(" "))
      assert(sfx === toks.drop(s2).mkString(" "))
    }
    // deterministic rerun
    val again = Augment.fim(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq.sorted
    assert(again === Augment.fim(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq.sorted)
  }

  test("spanCorrupt: inputs context + target spans conserve every token") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Augment.spanCorrupt(docs, "doc_id", "text", nSpans = 2, spanLen = 3)
      .join(docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks")), "doc_id")
      .as[(Long, Int, String, String, Seq[String])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, inputs, targets, toks) =>
      val inToks = inputs.split(" ").filter(_.nonEmpty).toSeq
      val tgToks = targets.split(" ").filter(_.nonEmpty).toSeq
      val sentinelsIn = inToks.filter(_.startsWith("<X_"))
      val sentinelsTg = tgToks.filter(_.startsWith("<X_"))
      assert(sentinelsIn === sentinelsTg,
        s"doc $id: sentinel sequences must match ($sentinelsIn vs $sentinelsTg)")
      // interleave: replacing each sentinel in inputs with its span
      // recovers the original token stream
      val spans = {
        // split targets at sentinels -> span token groups in order
        val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[String]
        var started = false
        tgToks.foreach { tok =>
          if (tok.startsWith("<X_")) {
            if (started) acc += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[String]
            started = true
          } else cur += tok
        }
        if (started) acc += cur.toSeq
        acc.toSeq
      }
      var si = 0
      val rebuilt = inToks.flatMap { tok =>
        if (tok.startsWith("<X_")) { val s = spans(si); si += 1; s }
        else Seq(tok)
      }
      assert(rebuilt === toks, s"doc $id: tokens not conserved")
      // spans are bounded by spanLen
      spans.foreach(sp => assert(sp.size <= 3 && sp.nonEmpty))
    }
  }

  test("spanCorrupt handles tiny docs (n < nSpans) without dying") {
    val docs = Seq((1L, "one"), (2L, "a b")).toDF("doc_id", "text")
    val got = Augment.spanCorrupt(docs, "doc_id", "text", 2, 3)
      .as[(Long, Int, String, String)].collect().toSeq.sortBy(_._1)
    // n=1: window0 empty, window1 = [0,1): the whole doc is one span
    assert(got.head._3 === "<X_1>")
    assert(got.head._4 === "<X_1> one")
  }
}
