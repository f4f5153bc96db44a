package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.TextHashKernels

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(feat: String, buckets: Int): Long = {
    val h = TextHashKernels.md5Lower64(UTF8String.fromString(feat))
    ((h % buckets) + buckets) % buckets
  }

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---------------------------------------------------------------- NB

  test("nbTrain/nbScore match a hand computation on a collision-free toy set") {
    val B = 4096
    // features per doc: unigrams then bigrams, e.g. "cat cat" ->
    // [cat, cat, "cat cat"]
    val train = Seq(
      (1L, "cat cat", "a"), (2L, "cat dog", "a"),
      (3L, "dog dog", "b")).toDF("doc_id", "text", "lang")
    val feats = Seq("cat", "dog", "cat cat", "cat dog", "dog dog")
    assert(feats.map(bucket(_, B)).distinct.size === feats.size,
      "hand computation assumes no bucket collisions")
    val (model, priors) = Classifier.nbTrain(train, "doc_id", "text", "lang", B)

    val k = 0.5
    // class a: 6 features (cat,cat,"cat cat" / cat,dog,"cat dog"), class b: 3
    def llhA(n: Long) = r(math.log((n + k) / (6 + k * B)), 6)
    def llhB(n: Long) = r(math.log((n + k) / (3 + k * B)), 6)
    val m = model.as[(String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("a", bucket("cat", B))) === llhA(3))
    assert(m(("a", bucket("dog", B))) === llhA(1))
    assert(m(("b", bucket("dog", B))) === llhB(2))
    assert(m.get(("b", bucket("cat", B))).isEmpty) // unseen in class b
    val p = priors.as[(String, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(p("a") === ((r(math.log(2.0 / 3), 6), llhA(0))))
    assert(p("b") === ((r(math.log(1.0 / 3), 6), llhB(0))))

    // score "cat dog": features [cat, dog, "cat dog"]
    val got = Classifier.nbScore(Seq((9L, "cat dog")).toDF("doc_id", "text"),
        "doc_id", "text", model, priors, B)
      .as[(Long, String, Double)].collect().toSeq
    val sa = r(p("a")._1 + (llhA(3) + llhA(1) + llhA(1)), 4)
    val sb = r(p("b")._1 + (llhB(0) + llhB(2) + llhB(0)), 4)
    assert(sa > sb)
    assert(got === Seq((9L, "a", sa)))
  }

  test("nb prediction tie-breaks to the lexically smaller label") {
    val B = 4096
    // perfectly symmetric classes -> equal scores for a symmetric doc
    val train = Seq(
      (1L, "x", "b2"), (2L, "y", "a9")).toDF("doc_id", "text", "lang")
    val (model, priors) = Classifier.nbTrain(train, "doc_id", "text", "lang", B)
    val got = Classifier.nbScore(Seq((5L, "z")).toDF("doc_id", "text"),
        "doc_id", "text", model, priors, B)
      .as[(Long, String, Double)].collect().toSeq
    assert(got.head._2 === "a9") // equal scores, smaller label wins
  }

  test("nb learns a planted vocabulary split exactly") {
    val n = 200
    val docs = (0 until n).map { i =>
      val cls = if (i % 2 == 0) "pos" else "neg"
      val word = if (cls == "pos") "alpha" else "beta"
      (i.toLong, s"$word $word filler$i", cls)
    }.toDF("doc_id", "text", "lang")
    val train = docs.filter(col("doc_id") < 150)
    val test0 = docs.filter(col("doc_id") >= 150)
    val (model, priors) = Classifier.nbTrain(train, "doc_id", "text", "lang")
    val scored = Classifier.nbScore(test0, "doc_id", "text", model, priors)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    assert(scored.filter(col("predicted") =!= col("lang")).isEmpty)
  }

  // ---------------------------------------------------------------- LR

  /** Serial reference: identical arithmetic to [[Classifier.lrTrain]] on
    * collected rows — integer nano-grid weights, micro-grid residuals.
    */
  private def lrSerial(docs: Seq[(Long, String, Long)], buckets: Int,
                       iters: Int, learnRate: Double): Array[Long] = {
    // per-doc feature bucket counts (unigrams + bigrams)
    val featRows = docs.map { case (id, text, y) =>
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      val f = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (id, y, f.groupBy(x => bucket(x, buckets)).map { case (b, xs) => b -> xs.size.toLong })
    }
    val n = docs.size
    var w = Array.fill(buckets + 1)(0L)
    for (_ <- 0 until iters) {
      val resid = featRows.map { case (id, y, cnts) =>
        val mNano = cnts.map { case (b, c) => w(b.toInt + 1) * c }.sum + w(0)
        val p = 1e6 / (1.0 + math.exp(-(mNano / 1e9)))
        (id, math.round(p) - y * 1000000L, cnts)
      }
      val grads = resid.flatMap { case (_, rm, cnts) =>
        cnts.map { case (b, c) => b -> rm * c }
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      val biasGrad = resid.map(_._2).sum
      def upd(wOld: Long, g: Long): Long =
        math.round(wOld.toDouble - learnRate * (g / 1e6) / n * 1e9)
      w = upd(w(0), biasGrad) +:
        Array.tabulate(buckets)(b => upd(w(b + 1), grads.getOrElse(b.toLong, 0L)))
    }
    w
  }

  test("lrTrain equals the serial reference bit-for-bit, any partitioning") {
    val rnd = new scala.util.Random(7)
    val words = Vector("red", "blue", "green", "fast", "slow", "cold")
    val docs = (0L until 120L).map { i =>
      val pos = i % 3 == 0
      val base = if (pos) "alpha up" else "beta down"
      val noise = Seq.fill(3)(words(rnd.nextInt(words.size))).mkString(" ")
      (i, s"$base $noise", if (pos) 1L else 0L)
    }
    val B = 256
    val serial = lrSerial(docs, B, iters = 4, learnRate = 0.5)
    for (parts <- Seq(1, 7)) {
      val df = docs.toDF("doc_id", "text", "y").repartition(parts)
      val got = Classifier.lrTrain(df, "doc_id", "text", col("y") === 1L,
          buckets = B, iters = 4, learnRate = 0.5)
        .select("b", "w_nano").as[(Long, Long)].collect()
        .map { case (b, w) => (b + 1).toInt -> w }.toMap
      val gotArr = Array.tabulate(B + 1)(i => got(i))
      assert(gotArr.toSeq === serial.toSeq, s"parts=$parts diverged")
    }
  }

  test("lr separates a planted vocabulary and lrScore thresholds at 0.5") {
    val docs = (0L until 200L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) s"alpha alpha token$i" else s"beta beta token$i",
        if (pos) 1L else 0L)
    }
    val df = docs.toDF("doc_id", "text", "y")
    val model = Classifier.lrTrain(df, "doc_id", "text", col("y") === 1L,
      buckets = 256, iters = 8, learnRate = 1.0)
    val scored = Classifier.lrScore(df, "doc_id", "text", model, buckets = 256)
      .join(df.select(col("doc_id"), col("y")), "doc_id")
    assert(scored.filter(col("predicted") =!= col("y")).isEmpty)
    val agree = scored.filter((col("p") >= 0.5).cast("int") === col("predicted"))
    assert(agree.count() === 200L)
  }

  test("lr model round-trips through parquet and scores identically") {
    val docs = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "alpha x" else "beta y", i % 2)).toDF("doc_id", "text", "y")
    val model = Classifier.lrTrain(docs, "doc_id", "text", col("y") === 1,
      buckets = 128, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("lrmodel").toString
    model.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = Classifier.lrScore(docs, "doc_id", "text", model, 128)
      .orderBy("doc_id").as[(Long, Double, Double, Int)].collect().toSeq
    val b = Classifier.lrScore(docs, "doc_id", "text", back, 128)
      .orderBy("doc_id").as[(Long, Double, Double, Int)].collect().toSeq
    assert(a === b)
  }

  test("prCurve matches the hand-computed sweep on planted separation") {
    // scores 4,3,2,1 with positives at 4 and 2 (one doc each score)
    val scored = Seq((4.0, true), (3.0, false), (2.0, true), (1.0, false))
      .toDF("score", "pos")
    val got = Classifier.prCurve(scored, "score", col("pos"))
      .orderBy(col("thr").desc)
      .as[(Double, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    def f1(p: Double, r: Double) =
      BigDecimal(2 * p * r / (p + r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (4.0, 1L, 0L, 1L, 1.0, 0.5, f1(1.0, 0.5)),
      (3.0, 1L, 1L, 1L, 0.5, 0.5, 0.5),
      (2.0, 2L, 1L, 0L, 0.666667, 1.0, f1(0.666667, 1.0)),
      (1.0, 2L, 2L, 0L, 0.5, 1.0, f1(0.5, 1.0))))
    // duplicate scores collapse to one threshold row
    val dup = Classifier.prCurve(
      Seq((2.0, true), (2.0, false), (1.0, true)).toDF("score", "pos"),
      "score", col("pos"))
      .orderBy(col("thr").desc)
      .as[(Double, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(dup.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq((2.0, 1L, 1L, 1L), (1.0, 2L, 1L, 0L)))
    // degenerate all-negative input: recall undefined-as-zero, f1 = 0
    val neg = Classifier.prCurve(
      Seq((1.0, false)).toDF("score", "pos"), "score", col("pos"))
      .as[(Double, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(neg.head._2 === 0L && neg.head._7 === 0.0)
  }

  test("nbScores carries every class and agrees with nbScore's argmax") {
    val docs = (0L until 100L).map { i =>
      (i, if (i % 2 == 0) "alpha alpha common" else "beta beta common",
        if (i % 2 == 0) "en" else "fr")
    }.toDF("doc_id", "text", "lang")
    val (model, priors) = Classifier.nbTrain(docs, "doc_id", "text", "lang", 256)
    val all = Classifier.nbScores(docs, "doc_id", "text", model, priors, 256)
    assert(all.select("label").distinct().count() === 2L)
    assert(all.count() === 200L)
    val top = all.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label"), col("score"))
      .orderBy("doc_id").collect().toSeq
    val argmax = Classifier.nbScore(docs, "doc_id", "text", model, priors, 256)
      .orderBy("doc_id").collect().toSeq
    assert(top.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))) ===
      argmax.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))))
  }

  test("rocAuc: hand-computed tie-corrected AUC") {
    // positives {0.9, 0.8, 0.8, 0.3}, negatives {0.8, 0.2, 0.1}:
    // U = 3 (0.9 beats all) + 2.5 + 2.5 (each 0.8 beats two, ties one)
    //   + 2 (0.3 beats two) = 10; AUC = 10 / (4*3)
    val scored = Seq((0.9, true), (0.8, true), (0.8, true), (0.3, true),
      (0.8, false), (0.2, false), (0.1, false)).toDF("score", "pos")
    val got = Classifier.rocAuc(scored, "score", col("pos"))
      .as[(Long, Long, Double)].head()
    assert(got === ((4L, 3L, BigDecimal(10.0 / 12.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("rocAuc: perfect separation 1.0, coin-flip ties 0.5, degenerate 0") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "pos")
    assert(Classifier.rocAuc(perfect, "score", col("pos"))
      .as[(Long, Long, Double)].head() === ((2L, 2L, 1.0)))
    val tied = Seq((0.5, true), (0.5, true), (0.5, false), (0.5, false))
      .toDF("score", "pos")
    assert(Classifier.rocAuc(tied, "score", col("pos"))
      .as[(Long, Long, Double)].head() === ((2L, 2L, 0.5)))
    val onlyPos = Seq((0.5, true)).toDF("score", "pos")
    assert(Classifier.rocAuc(onlyPos, "score", col("pos"))
      .as[(Long, Long, Double)].head() === ((1L, 0L, 0.0)))
  }

  test("nbPosterior: two-class log-space posterior matches the closed form") {
    // doc 1: en score ln(3), de score ln(1) -> p = 3/(3+1) = 0.75
    // doc 2: en -2.0, de -1.0 -> p = 1/(1+e^1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = Seq(
      (1L, "en", r6(math.log(3.0))), (1L, "de", 0.0),
      (2L, "en", -2.0), (2L, "de", -1.0)).toDF("doc_id", "label", "score")
    val got = Classifier.nbPosterior(s, "en").orderBy("doc_id")
      .as[(Long, Double)].collect().toSeq
    val p1 = r6(1.0 / (1.0 + r6(math.exp(0.0 - r6(math.log(3.0))))))
    val p2 = r6(1.0 / (1.0 + r6(math.exp(-1.0 + 2.0))))
    assert(got === Seq((1L, p1), (2L, p2)))
  }

  test("calibrationBins: binning, rates, integer-exact means, order-free") {
    val scored = Seq(
      (0.05, false), (0.05, true),   // bin 0
      (0.55, true), (0.55, true),    // bin 5
      (1.0, true)                    // clamps to bin 9
    ).toDF("p", "pos")
    val got = Classifier.calibrationBins(scored, "p", col("pos"))
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0, 2L, 1L, 0.5, 0.05, -0.45),
      (5, 2L, 2L, 1.0, 0.55, -0.45),
      (9, 1L, 1L, 1.0, 1.0, 0.0)))
    // shuffling input rows cannot move the mean (integer-exact sum)
    val rev = Classifier.calibrationBins(
      scored.orderBy(col("p").desc), "p", col("pos"))
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rev === got)
  }

  test("classPrf: hand-computed per-class rows, never-predicted class kept") {
    val pairs = (Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b")) ++
      Seq.fill(3)(("a", "c"))) // class c exists only as truth
      .toDF("pred", "truth")
    val got = Classifier.classPrf(pairs, "pred", "truth")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // a: tp=20 pc=28 ac=30 -> P=714286 R=666667 F1=HALF_UP(2PR/(P+R))
    assert(got("a") === ((20L, 8L, 10L, 714286L, 666667L, 689655L)))
    // b: tp=15 pc=25 ac=20 -> P=600000 R=750000 F1=666667
    assert(got("b") === ((15L, 10L, 5L, 600000L, 750000L, 666667L)))
    // c: never predicted -> tp=0 fp=0 fn=3, all ratios 0
    assert(got("c") === ((0L, 0L, 3L, 0L, 0L, 0L)))
  }

  test("cohenKappa: hand-computed table, perfect, degenerate, below-chance") {
    def pairs(rows: Seq[(String, String, Int)]) =
      rows.flatMap { case (p, a, k) => Seq.fill(k)((p, a)) }
        .toDF("pred", "truth")
    def kappa(df: org.apache.spark.sql.DataFrame) =
      Classifier.cohenKappa(df, "pred", "truth")
        .as[(Long, Long, Long, Long, Long)].collect().head
    // 20 aa + 5 ab + 10 ba + 15 bb: po=0.7, pe=(25·30+25·20)/2500=0.5,
    // kappa=(0.7−0.5)/0.5=0.4
    assert(kappa(pairs(Seq(("a", "a", 20), ("a", "b", 5),
      ("b", "a", 10), ("b", "b", 15)))) ===
      ((50L, 35L, 700000L, 500000L, 400000L)))
    // perfect agreement with 2 classes: kappa = 1
    assert(kappa(pairs(Seq(("a", "a", 3), ("b", "b", 7))))._5 === 1000000L)
    // both sides constant and equal: pe = 1, defined as 0
    assert(kappa(pairs(Seq(("a", "a", 5)))) ===
      ((5L, 5L, 1000000L, 1000000L, 0L)))
    // below-chance (systematic disagreement on a balanced table):
    // po=0, pe=0.5, kappa=−1 — sign·HALF_UP magnitude
    assert(kappa(pairs(Seq(("a", "b", 5), ("b", "a", 5))))._5 ===
      -1000000L)
    // null rows drop (the prCurve convention)
    val withNull = Seq((Some("a"), Some("a")), (None, Some("a")),
      (Some("a"), None)).toDF("pred", "truth")
    assert(kappa(withNull)._1 === 1L)
  }
}
