package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII redaction + corpus n-gram frequency (the oracle checks parity on
  * the real corpus; these specs pin the semantics on synthetic inputs the
  * corpus may not contain).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces email/phone spans with typed tokens and counts them") {
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
      (2L, "two mails a@b.io c@d.org, phone 111.222.3333 and 444-555-6666"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(got(0) == ((1L, 1, 1, "contact <EMAIL> or <PHONE> today")))
    assert(got(1) == ((2L, 2, 2, "two mails <EMAIL> <EMAIL>, phone <PHONE> and <PHONE>")))
    assert(got(2) == ((3L, 0, 0, "no pii here at all")))
  }

  test("topNgrams returns document frequencies with a total order") {
    val docs = Seq(
      (1L, "spark engine rules"),
      (2L, "spark engine rules"),  // same doc twice: each bigram df +1
      (3L, "spark engine spark engine"), // within-doc repeat counts ONCE
      (4L, "something else"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, "doc_id", "text", n = 2, k = 3)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(
      ("spark engine", 3L), ("engine rules", 2L), ("engine spark", 1L)))
  }

  test("repetition: duplicate-word fraction and top-bigram share") {
    val docs = Seq(
      (1L, "a a a b"),          // toks 4, distinct 2; bigrams: a a, a a, a b
      (2L, "x y z w")           // all distinct; each bigram unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) === ((0.5, 0.6667)))
    assert(out(2L) === ((0.0, 0.3333)))
  }

  test("duplicatedSpanStats: cross-doc + self-repetition, overlap-clipped coverage") {
    val docs = Seq(
      (1L, "a b c d e f"),                     // shares "a b c d e" with doc 2
      (2L, "x a b c d e y"),
      (3L, "u v w"),                           // shorter than k: no spans
      (4L, "p q r s t p q r s t p q r s t")    // periodic: every span duplicated
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpanStats(docs, "doc_id", "text", k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out(1L) === ((6L, 2L, 1L, 0.8333)))  // [0,5) of 6 tokens covered
    assert(out(2L) === ((7L, 3L, 1L, 0.7143)))  // [1,6) of 7 tokens covered
    assert(out(3L) === ((3L, 0L, 0L, 0.0)))
    // all 11 spans duplicated; overlapping intervals union to the full doc
    assert(out(4L) === ((15L, 11L, 11L, 1.0)))
  }

  test("stripDuplicatedSpans removes exactly the covered tokens and keeps all docs") {
    val docs = Seq(
      (1L, "a b c d e f"),                     // shares "a b c d e" with doc 2
      (2L, "x a b c d e y"),
      (3L, "u v w"),                           // shorter than k: untouched
      (4L, "p q r s t p q r s t p q r s t")    // fully covered: empty output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripDuplicatedSpans(docs, "doc_id", "text", k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((6L, 1L, "f")))        // [0,5) stripped
    assert(out(2L) === ((7L, 2L, "x y")))      // [1,6) stripped
    assert(out(3L) === ((3L, 3L, "u v w")))
    assert(out(4L) === ((15L, 0L, "")))

    // consistency with the stats operator: kept = n_tokens - covered
    val stats = TextAnalysis.duplicatedSpanStats(docs, "doc_id", "text", k = 5)
      .select(col("doc_id"), col("n_tokens"),
        round(col("dup_token_frac") * col("n_tokens")).cast("long").as("covered"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    for ((id, (_, kept, _)) <- out) assert(stats(id) == kept, s"doc $id")
  }

  test("bm25TopK: multi-term match outranks single-term; absent terms score 0") {
    val docs = Seq(
      (1L, "join join other"),
      (2L, "join stream"),
      (3L, "x y z w")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        terms = Seq("join", "stream", "dup"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

    // reference computation (N=3, avgdl=3, df_join=2, df_stream=1, df_dup=0)
    def idf(df: Double) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def part(tf: Double, df: Double, dl: Double) =
      (idf(df) * (tf * 2.2)) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    val s1 = math.rint(part(2, 2, 3) * 1e4) / 1e4
    val s2 = math.rint((part(1, 2, 2) + part(1, 1, 2)) * 1e4) / 1e4

    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L), out.mkString(","))
    assert(out.map(_._3).toSeq == Seq(1, 2, 3))
    assert(out(0)._2 == s2 && out(1)._2 == s1 && out(2)._2 == 0.0)
  }

  test("bigramLogProb: corpus-typical transitions outscore unique ones; empties report 0") {
    val docs = Seq(
      (1L, "the cat sat"),   // transitions shared with doc 2
      (2L, "the cat sat"),
      (3L, "zebra quark flux"), // transitions seen once in the corpus
      (4L, "solo"),            // no bigrams
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L) === out(2L), "identical docs must score identically")
    assert(out(1L)._1 === 2L && out(3L)._1 === 2L)
    assert(out(1L)._2 > out(3L)._2,
      "twice-seen transitions must outscore once-seen ones")
    assert(out(4L) === ((0L, 0.0)) && out(5L)._1 === 0L)
  }

  test("chunk: overlapping windows cover every token; short docs yield one chunk") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, doc), (2L, "tiny doc")).toDF("doc_id", "text")
    // chunkSize 4, overlap 1 -> stride 3: chunks at 0,3,6 — the third
    // window already reaches the last token, so no trailing window exists
    val got = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 4, "w4 w5 w6 w7"),
      (1L, 2, 4, "w7 w8 w9 w10")))
    // a document shorter than the window is one (short) chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 2, "tiny doc")))
    // consecutive chunks share exactly `overlap` tokens — context is
    // preserved across every boundary
    val texts = got.filter(_._1 == 1L).map(_._4.split(" ").toSeq).toSeq
    texts.sliding(2).foreach { pair =>
      assert(pair(0).takeRight(1) == pair(1).take(1), s"${pair(0)} / ${pair(1)}")
    }
  }

  test("charEntropy: uniform chars hit log2(k) bits, repeats score zero") {
    val docs = Seq(
      (1L, "aaaa"),   // one symbol: entropy 0
      (2L, "abcd"),   // 4 equiprobable symbols: exactly 2 bits
      (3L, "AAbb")    // lowercased first: {a,b} equiprobable -> 1 bit
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4, 1, 0.0)))
    assert(out(2L) === ((4, 4, 2.0)))
    assert(out(3L) === ((4, 2, 1.0)))
  }

  test("charEntropy kernel is BIT-identical to the Catalyst fold reference") {
    val docs = Seq(
      (0L, ""), (1L, "aaaa"), (2L, "The quick brown fox!  \t 123"),
      (3L, "ünïcode ünïcode mixed"), (4L, "zz  yy  xx  ww"),
      (5L, (0 until 500).map(i => ('a' + i % 23).toChar).mkString))
      .toDF("doc_id", "text")
    val kernel = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val ref = TextAnalysis.charEntropyFoldReference(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(kernel === ref)
  }

  test("trigramBackoff: each backoff branch matches the hand computation") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // N=4 train tokens, V=4 distinct
    val score = Seq(
      (1L, "a b c"),   // trigram seen: ln(c3/c2) = ln(1/1) = 0
      (2L, "x b c"),   // backoff to bigram (b,c): ln(0.4 * 1 / 1)
      (3L, "a b d"),   // backoff to unigram d (c=1): ln(0.16*1.5/6)
      (4L, "q q z"),   // OOV unigram z: ln(0.16*0.5/6)
      (5L, "hi")       // < 3 tokens: zero trigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trigramBackoff(train, score, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) === ((1L, 0.0)))
    assert(got(2L) === ((1L, r(r(math.log(0.4 * 1 / 1.0), 6) / 1, 4))))
    assert(got(3L) === ((1L,
      r(r(math.log(0.4 * 0.4 * (1 + 0.5) / (4 + 0.5 * 4)), 6) / 1, 4))))
    assert(got(4L) === ((1L,
      r(r(math.log(0.4 * 0.4 * (0 + 0.5) / (4 + 0.5 * 4)), 6) / 1, 4))))
    assert(got(5L) === ((0L, 0.0)))
  }

  test("trigramBackoff: n_trigrams accounting on the real table") {
    val docs = graft.Tables.documents(spark, sfDir)
    val b = pmod(graft.functions.md5_lower64(col("doc_id").cast("string")), lit(100L))
    val out = TextAnalysis.trigramBackoff(
        docs.filter(b < 80), docs.filter(b >= 80), "doc_id", "text")
      .join(docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n")), "doc_id")
    // every scored doc with >= 3 tokens scores exactly n-2 trigrams
    assert(out.filter(col("n") >= 3 && col("n_trigrams") =!= col("n") - 2).isEmpty)
    assert(out.filter(col("n") < 3 && col("n_trigrams") =!= 0).isEmpty)
  }

  test("corpusReport: one exact row, top-lang tie to the smaller code") {
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "a b c", "de", "s1", 5L),   // exact dup of doc 1
      (3L, "x y", "de", "s2", 3L),
      (4L, "p q r s", "en", "s2", 7L)  // 2 en vs 2 de -> tie -> 'de'
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = Curation.corpusReport(docs, "doc_id", "text",
      "lang", "source", "n_chars").collect().head
    assert(row.getLong(0) === 4L)        // n_docs
    assert(row.getLong(1) === 12L)       // total_tokens 3+3+2+4
    assert(row.getDouble(2) === 3.0)     // avg_tokens
    assert(row.getLong(3) === 20L)       // total_chars
    assert(row.getLong(4) === 2L)        // n_langs
    assert(row.getString(5) === "de")    // tie-break
    assert(row.getDouble(6) === 0.5)     // top share
    assert(row.getLong(7) === 2L)        // n_sources
    assert(row.getLong(8) === 2L)        // dup_docs (both copies)
    assert(row.getDouble(9) === 0.5)     // dup_frac
  }

  test("clusterLabels surfaces the cluster's distinctive tokens, not stopwords") {
    import spark.implicits._
    // cluster 0 = {0,1,2}: "orbit" appears in all three AND nowhere else;
    // "the" appears everywhere in the corpus (non-distinctive)
    val docs = Seq(
      (0L, "the satellite orbit decays fast"),
      (1L, "the orbit of the satellite shifts"),
      (2L, "a stable orbit requires the thrust"),
      (3L, "the recipe needs flour and water"),
      (4L, "the cat sat on the warm mat")).toDF("doc_id", "text")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 4L))
      .toDF("id", "cluster")
    val out = TextAnalysis.clusterLabels(docs, "doc_id", "text", clusters)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // only cluster 0 has >= 2 members; its top token is the exclusive one
    assert(out.keySet.forall(_._1 == 0L))
    assert(out((0L, 1)) === "orbit") // dfc 3 / dfg 3 -> score 1e6
    // "the" (dfc 3 / dfg 5) ranks below "orbit" and "satellite" (2/2)
    assert(out.values.toSeq.count(_ == "the") === 0 ||
      out((0L, 3)) === "the")
  }

  test("count-min estimates are one-sided: est >= exact, exact at wide width") {
    import spark.implicits._
    val docs = Seq((0L, "a b a c a b"), (1L, "b d d e a")).toDF("doc_id", "text")
    val terms = Seq("a", "b", "c", "d", "e", "zz")
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 1L, "d" -> 2L,
      "e" -> 1L, "zz" -> 0L)
    // tight grid: collisions likely, but never an underestimate
    val tight = TextAnalysis.countMinEstimate(
        TextAnalysis.countMinGrid(docs, "text", depth = 2, width = 4),
        terms, depth = 2, width = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach(t => assert(tight(t) >= exact(t), s"under at $t"))
    // wide grid: 5 distinct tokens into 1024 cells x 4 rows — a collision
    // on ALL rows of a term is (5/1024)^4-improbable and the fixture is
    // deterministic, so estimates are exact
    val wide = TextAnalysis.countMinEstimate(
        TextAnalysis.countMinGrid(docs, "text", depth = 4, width = 1024),
        terms, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === exact)
  }

  test("count-min shard grids merge to the full-corpus grid") {
    import spark.implicits._
    val a = Seq((0L, "x y x z w"), (1L, "y y v x")).toDF("doc_id", "text")
    val b = Seq((2L, "z z w x q"), (3L, "v q q y")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = rows(TextAnalysis.countMinMerge(
      TextAnalysis.countMinGrid(a, "text", 3, 8),
      TextAnalysis.countMinGrid(b, "text", 3, 8)))
    val full = rows(TextAnalysis.countMinGrid(
      a.unionByName(b), "text", 3, 8))
    assert(merged === full)
  }
}
