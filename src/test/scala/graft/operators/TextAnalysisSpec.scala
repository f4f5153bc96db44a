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
}
