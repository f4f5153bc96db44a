package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingPackSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8

  /** Serial reference: carve the delivery-order token stream at L. */
  private def reference(docs: Seq[(Long, Seq[String])]) = {
    val stream = docs.flatMap { case (_, toks) =>
      toks.zipWithIndex.map { case (t, p) => (t, p == 0) }
    }
    stream.zipWithIndex.groupBy(_._2 / L).toSeq.sortBy(_._1).map {
      case (ex, toks) =>
        val starts = toks.collect { case ((_, true), g) => g % L }
        (ex.toLong, toks.length, toks.map(_._1._1).mkString(" "),
          starts.mkString(","), starts.length)
    }
  }

  private def doc(id: Long, n: Int): (Long, Seq[String]) =
    id -> (0 until n).map(t => s"d${id}_$t")

  test("packs across micro-batches exactly like the serial stream") {
    val log = Files.createTempDirectory("sp_log").toString
    val state = Files.createTempDirectory("sp_state").toString + "/state"
    val out = Files.createTempDirectory("sp_out").toString + "/examples"
    val ckpt = Files.createTempDirectory("sp_ckpt").toString
    val schema = Seq((0L, Seq(""))).toDF("doc_id", "toks").schema

    def runOnce(): Unit = {
      val q = StreamingPack.start(spark,
        spark.readStream.schema(schema).parquet(log),
        "doc_id", "toks", L, state, out, ckpt)
      q.awaitTermination()
    }

    // batch 1: 3+5 tokens -> exactly one full example, empty carry;
    // batch 2: 20-token doc spans examples 1..3 and carries 4 tokens;
    // batch 3: 2+3 tokens -> still carrying (9 % 8 = 1 into example 4)
    val b1 = Seq(doc(1, 3), doc(2, 5))
    val b2 = Seq(doc(3, 20))
    val b3 = Seq(doc(4, 2), doc(5, 3))
    for (b <- Seq(b1, b2, b3)) {
      b.toDF("doc_id", "toks").write.mode("append").parquet(log)
      runOnce()
    }

    val expectedAll = reference(b1 ++ b2 ++ b3)
    val expectedFull = expectedAll.filter(_._2 == L)
    val got = spark.read.parquet(out)
      .orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect().toSeq
    assert(got == expectedFull, s"\ngot      $got\nexpected $expectedFull")

    // flush emits the partial tail; together they are the whole stream
    assert(StreamingPack.flush(spark, state, out, L) == 1)
    val all = spark.read.parquet(out).orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect().toSeq
    assert(all == expectedAll)
    // token conservation
    val totalIn = (b1 ++ b2 ++ b3).map(_._2.length).sum
    assert(all.map(_._2).sum == totalIn)
  }

  test("redelivered batch recomputes from the same state (byte-equal)") {
    val state = Files.createTempDirectory("sp2_state").toString + "/state"
    val out = Files.createTempDirectory("sp2_out").toString + "/examples"

    val b1 = Seq(doc(1, 11)).toDF("doc_id", "toks")
    StreamingPack.packBatch(spark, b1, "doc_id", "toks", L, state, out, 0L)
    val afterFirst = spark.read.parquet(out)
      .as[(Long, Int, String, String, Int)].collect().toSeq.sorted

    // redelivery of batch 0: reads state BEFORE batch 0 -> same rows again
    StreamingPack.packBatch(spark, b1, "doc_id", "toks", L, state, out, 0L)
    val afterRedeliver = spark.read.parquet(out)
      .as[(Long, Int, String, String, Int)].collect().toSeq.sorted
    assert(afterRedeliver == (afterFirst ++ afterFirst).sorted,
      "redelivery must append byte-identical rows, not drift state")

    // the NEXT batch still sees exactly one post-batch-0 state
    StreamingPack.packBatch(spark,
      Seq(doc(2, 5)).toDF("doc_id", "toks"), "doc_id", "toks", L,
      state, out, 1L)
    val ex1 = spark.read.parquet(out).filter(col("example_id") === 1L)
      .dropDuplicates().as[(Long, Int, String, String, Int)].collect()
    // tokens 8..15 of the stream: 3 tail tokens of doc 1 + all of doc 2
    assert(ex1.length == 1 && ex1.head._2 == L && ex1.head._5 == 1)
  }

  test("carry round-trips tokens containing whitespace and string doc ids") {
    import spark.implicits._
    val state = Files.createTempDirectory("sp4_state").toString + "/state"
    val out = Files.createTempDirectory("sp4_out").toString + "/examples"
    // 5 multi-word tokens force a carry that a split(example_text) would
    // inflate; string ids exercise non-numeric arrival ordering
    val b1 = Seq(("docA", Seq("new york", "city", "of london", "x", "y")))
      .toDF("doc_id", "toks")
    val b2 = Seq(("docB", Seq("p", "q", "r", "s", "t", "u"))).toDF("doc_id", "toks")
    StreamingPack.packBatch(spark, b1, "doc_id", "toks", L, state, out, 0L)
    StreamingPack.packBatch(spark, b2, "doc_id", "toks", L, state, out, 1L)
    assert(StreamingPack.flush(spark, state, out, L) == 1)
    val all = spark.read.parquet(out).orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect().toSeq
    // 11 tokens -> one full example of 8 + a 3-token tail; boundaries at
    // stream positions 0 (docA) and 5 (docB)
    assert(all.map(_._2).sum == 11)
    assert(all == Seq(
      (0L, 8, "new york city of london x y p q r", "0,5", 2),
      (1L, 3, "s t u", "", 0)))
  }

  test("id packer mirrors the text packer across batches, carry included") {
    import spark.implicits._
    val stateT = Files.createTempDirectory("sp5_st").toString + "/state"
    val outT = Files.createTempDirectory("sp5_ot").toString + "/examples"
    val stateI = Files.createTempDirectory("sp5_si").toString + "/state"
    val outI = Files.createTempDirectory("sp5_oi").toString + "/examples"
    // same stream, text and id forms (id = token's ordinal in a fixed dict)
    val raw = Seq(
      Seq(doc(1, 3), doc(2, 9)),   // batch 0: spans + carries
      Seq(doc(3, 7)),              // batch 1
      Seq(doc(4, 2), doc(5, 4)))   // batch 2
    val dict = raw.flatten.flatMap(_._2).distinct.sorted.zipWithIndex.toMap
    raw.zipWithIndex.foreach { case (b, i) =>
      StreamingPack.packBatch(spark,
        b.toDF("doc_id", "toks"), "doc_id", "toks", L, stateT, outT, i.toLong)
      StreamingPack.packIdsBatch(spark,
        b.map { case (id, ts) => (id, ts.map(dict)) }.toDF("doc_id", "ids"),
        "doc_id", "ids", L, stateI, outI, i.toLong)
    }
    assert(StreamingPack.flush(spark, stateT, outT, L) == 1)
    assert(StreamingPack.flushIds(spark, stateI, outI, L) == 1)
    val text = spark.read.parquet(outT).orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect()
    val ids = spark.read.parquet(outI).orderBy("example_id")
      .as[(Long, Int, Seq[Int], Seq[Int], Int)].collect()
    val inv = dict.map(_.swap)
    assert(text.length == ids.length)
    text.zip(ids).foreach { case ((ex, n, t, st, ns), (exI, nI, idSeq, stI, nsI)) =>
      assert(ex == exI && n == nI && ns == nsI)
      assert(stI.mkString(",") == st)
      assert(idSeq.map(inv).mkString(" ") == t)
    }
    // and the stream total is conserved
    assert(ids.map(_._2).sum == raw.flatten.map(_._2.length).sum)
  }

  test("state log auto-compacts to a bounded file count without changing results") {
    val state = Files.createTempDirectory("sp6_state").toString + "/state"
    val out = Files.createTempDirectory("sp6_out").toString + "/examples"
    val batches = (0 until 20).map(i => doc(i.toLong, 3))
    batches.zipWithIndex.foreach { case (d, i) =>
      StreamingPack.packBatch(spark,
        Seq(d).toDF("doc_id", "toks"), "doc_id", "toks", L, state, out,
        i.toLong)
    }
    def partFiles() = {
      val root = new org.apache.hadoop.fs.Path(state)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(root)
        .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    }
    // the auto-hook fires past 16 part files: 20 appends must NOT leave
    // 20 files behind (growth is bounded by the threshold, not the
    // batch count)
    assert(partFiles() <= 17, s"state log grew unbounded: ${partFiles()} files")
    assert(partFiles() < 20)
    // and the packed stream is still exactly the serial reference
    assert(StreamingPack.flush(spark, state, out, L) == 1)
    val all = spark.read.parquet(out).orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect().toSeq
    assert(all == reference(batches))
  }

  test("compacted id-state log resumes identically under redelivery") {
    import spark.implicits._
    val state = Files.createTempDirectory("sp7_state").toString + "/state"
    val out = Files.createTempDirectory("sp7_out").toString + "/examples"
    val mk = (id: Long, n: Int) => (id, (0 until n).map(t => (id * 100 + t).toInt))
    val b0 = Seq(mk(1, 5)); val b1 = Seq(mk(2, 6)); val b2 = Seq(mk(3, 4))
    StreamingPack.packIdsBatch(spark, b0.toDF("doc_id", "ids"), "doc_id",
      "ids", L, state, out, 0L)
    StreamingPack.packIdsBatch(spark, b1.toDF("doc_id", "ids"), "doc_id",
      "ids", L, state, out, 1L)
    StreamingPack.packIdsBatch(spark, b2.toDF("doc_id", "ids"), "doc_id",
      "ids", L, state, out, 2L)
    val before = spark.read.parquet(out)
      .as[(Long, Int, Seq[Int], Seq[Int], Int)].collect().toSeq.sortBy(_._1)

    assert(StreamingPack.compactStateLog(spark, state) == 3)
    // keep=2 covers the redelivery window: batch 2 redelivered after the
    // compaction reads batch 1's state and appends byte-identical rows
    StreamingPack.packIdsBatch(spark, b2.toDF("doc_id", "ids"), "doc_id",
      "ids", L, state, out, 2L)
    val after = spark.read.parquet(out)
      .as[(Long, Int, Seq[Int], Seq[Int], Int)].collect().toSeq.sortBy(_._1)
    // every pre-compaction row still appears, and the only additions are
    // byte-identical duplicates of existing rows
    assert(after.toSet == before.toSet,
      "redelivery after compaction must only duplicate existing rows")
    assert(after.length >= before.length)
    // a FRESH batch then continues the stream correctly (10 tokens keeps
    // the stream total off the example boundary so a carry remains to
    // flush: 5+6+4+10 = 25 = 3*8 + 1)
    StreamingPack.packIdsBatch(spark, Seq(mk(4, 10)).toDF("doc_id", "ids"),
      "doc_id", "ids", L, state, out, 3L)
    assert(StreamingPack.flushIds(spark, state, out, L) == 1)
    val total = spark.read.parquet(out).dropDuplicates()
      .as[(Long, Int, Seq[Int], Seq[Int], Int)].collect().map(_._2).sum
    assert(total == 5 + 6 + 4 + 10)
  }

  test("empty and token-less batches leave the stream unchanged") {
    val state = Files.createTempDirectory("sp3_state").toString + "/state"
    val out = Files.createTempDirectory("sp3_out").toString + "/examples"
    StreamingPack.packBatch(spark,
      Seq(doc(1, 5)).toDF("doc_id", "toks"), "doc_id", "toks", L,
      state, out, 0L)
    StreamingPack.packBatch(spark,
      Seq((9L, Seq.empty[String])).toDF("doc_id", "toks"), "doc_id", "toks", L,
      state, out, 1L)
    StreamingPack.packBatch(spark,
      Seq(doc(2, 4)).toDF("doc_id", "toks"), "doc_id", "toks", L,
      state, out, 2L)
    assert(StreamingPack.flush(spark, state, out, L) == 1)
    val all = spark.read.parquet(out).orderBy("example_id")
      .as[(Long, Int, String, String, Int)].collect().toSeq
    assert(all == reference(Seq(doc(1, 5), doc(2, 4))))
  }
}
