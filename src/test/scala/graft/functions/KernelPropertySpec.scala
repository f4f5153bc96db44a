package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized properties for the custom codegen'd kernels — the
  * expressions where a silent bug corrupts data rather than failing a
  * query. Complements the behavioral specs (golden vectors, recall
  * assertions) with structural invariants over random inputs.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  test("property: minhash signature has length k and is shingle-order invariant") {
    val sets = Seq.fill(100) {
      Seq.fill(3 + rnd.nextInt(40))(s"sh${rnd.nextInt(5000)}").distinct
    }
    val rows = sets.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, rnd.shuffle(s))
    }.toDF("id", "sh", "sh_perm")
      .select(col("id"),
        minhash_signature(col("sh"), 32).as("sig"),
        minhash_signature(col("sh_perm"), 32).as("sig_perm"))
      .collect()
    rows.foreach { r =>
      val sig = r.getSeq[Long](1)
      assert(sig.length === 32)
      assert(sig === r.getSeq[Long](2),
        s"signature must depend on the shingle SET, not its order (id=${r.getLong(0)})")
    }
  }

  test("property: probe-key lists are keyed by the exact band key and stay in range") {
    val r = 8; val b = 16; val probeBits = 2; val probePlanes = 6
    val nKeys = 1 + probePlanes + probePlanes * (probePlanes - 1) / 2
    val vecs = Seq.fill(100)(
      (rnd.nextLong(), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
      .select(col("id"),
        hyperplane_bands(col("v"), r, b).as("keys"),
        hyperplane_probes(col("v"), r, b, probeBits, probePlanes).as("pk"))
      .collect()
    vecs.foreach { row =>
      val keys = row.getSeq[Long](1)
      val pk = row.getSeq[scala.collection.Seq[Long]](2)
      assert(keys.length === b && pk.length === b)
      pk.zip(keys).foreach { case (list, key) =>
        assert(list.length === nKeys,
          s"each band probes 1 exact + $probePlanes single + C($probePlanes,2) double flips")
        assert(list.head === key,
          "probe list must lead with the exact band key hyperplane_bands emits")
        assert(list.forall(k => k >= 0 && k < (1L << r)),
          s"keys must be $r-bit band keys")
      }
    }
  }

  test("property: int8-quantized cosine tracks float cosine within quantization error") {
    val pairs = Seq.fill(200) {
      val dims = 64
      val a = Array.fill(dims)(rnd.nextFloat() * 2 - 1)
      // half related pairs (perturbed copies), half independent
      val bv = if (rnd.nextBoolean())
        a.map(x => x + rnd.nextFloat() * 0.2f - 0.1f)
      else Array.fill(dims)(rnd.nextFloat() * 2 - 1)
      (a, bv)
    }
    val rows = pairs.toDF("a", "b")
      .select(
        round(cosine_similarity(col("a"), col("b")), 6).as("cf"),
        cosine_i8(i8_quantize(col("a")), i8_quantize(col("b"))).as("ci"))
      .collect()
    rows.foreach { r =>
      val delta = math.abs(r.getDouble(0) - r.getDouble(1))
      assert(delta <= 0.06,
        f"quantized cosine drifted $delta%.4f from float (cf=${r.getDouble(0)}%.4f)")
    }
  }

  test("property: simhash64 is token-order invariant and 0-distance to itself") {
    val rows = Seq.fill(100) {
      val toks = Seq.fill(5 + rnd.nextInt(60))(s"w${rnd.nextInt(300)}")
      (toks, rnd.shuffle(toks))
    }.toDF("t", "t_perm")
      .select(simhash64(col("t")).as("h"), simhash64(col("t_perm")).as("hp"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1),
        "simhash sums per-token votes — permuting tokens must not change it")
    }
  }

  test("property: MG sketch guarantee on random zipf streams, random merge trees") {
    for (trial <- 0 until 5) {
      val n = 2000 + rnd.nextInt(3000)
      val items = Seq.fill(n)(s"i${math.min(rnd.nextInt(rnd.nextInt(400) + 1), 60)}")
      val cap = 8 + rnd.nextInt(24)
      val parts = 1 + rnd.nextInt(10)
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val sk = items.toDF("x").repartition(parts)
        .agg(mg_agg(col("x"), cap)).head().getAs[Array[Byte]](0)
      val est = MgKernels.deserialize(sk).counts
      val bound = n.toDouble / (cap + 1)
      est.foreach { case (k, e) =>
        assert(e <= truth(k) && e >= truth(k) - bound,
          s"trial=$trial cap=$cap parts=$parts item=$k est=$e true=${truth(k)}")
      }
      truth.filter(_._2 > bound).keys.foreach(k =>
        assert(est.contains(k), s"trial=$trial guaranteed hitter $k missing"))
    }
  }

  test("property: theta estimates exact below nominal entries, any split") {
    for (trial <- 0 until 5) {
      val distinct = 50 + rnd.nextInt(3000)
      val items = Seq.fill(6000)(s"t${rnd.nextInt(distinct)}")
      val trueD = items.distinct.size
      val parts = 1 + rnd.nextInt(8)
      val sk = items.toDF("x").repartition(parts)
        .agg(theta_agg(col("x"))).head().getAs[Array[Byte]](0)
      assert(ThetaKernels.wrap(sk).getEstimate === trueD.toDouble,
        s"trial=$trial distinct=$trueD parts=$parts")
    }
  }

  test("property: pcm16 frame features match a scalar reference on random audio") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 0 until 20) {
      val samples = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(65536) - 32768)
      val frameLen = 1 + rnd.nextInt(7)
      val bytes = samples.flatMap { v =>
        val u = v & 0xFFFF; Seq((u % 256).toByte, (u / 256).toByte)
      }.toArray
      val got = Seq(Tuple1(bytes)).toDF("c")
        .select(explode(pcm16_frames(frameLen, col("c"))).as("f"))
        .select("f.frame", "f.n", "f.rms", "f.zcr", "f.peak")
        .as[(Int, Int, Double, Int, Int)].collect().toSeq
      val want = samples.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
        val zcr = fr.sliding(2).count(p => p.size == 2 && p(0).toLong * p(1) < 0)
        (i, fr.size, r6(math.sqrt(fr.map(s => s.toLong * s).sum.toDouble / fr.size)),
          zcr, fr.map(math.abs).max)
      }.toSeq
      assert(got === want)
    }
  }

  test("property: bucket_weight_sum equals a scalar dot product, ignores out-of-range") {
    for (_ <- 0 until 20) {
      val nW = 1 + rnd.nextInt(64)
      val w = Array.fill(nW)(rnd.nextLong() % 1000000L)
      val bs = Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong() % (nW + 10) - 1)
      val cnts = Seq.fill(bs.size)(rnd.nextInt(5).toLong + 1)
      val wB = spark.sparkContext.broadcast(w)
      val got = Seq((bs, cnts)).toDF("bs", "cnts")
        .select(bucket_weight_sum(wB, col("bs"), col("cnts")))
        .head().getLong(0)
      val want = bs.zip(cnts).map { case (b, c) =>
        val idx = b + 1
        if (idx >= 0 && idx < nW) w(idx.toInt) * c else 0L
      }.sum
      assert(got === want)
      wB.destroy()
    }
  }

  test("property: gray resize+patch pipeline matches a scalar reference") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 0 until 10) {
      val (w, h) = (2 + rnd.nextInt(12), 2 + rnd.nextInt(12))
      val (ow, oh, p) = (4, 4, 2)
      val content = Array.fill(1 + rnd.nextInt(20))(rnd.nextInt(256).toByte)
      val pixels = Array.tabulate(w * h)(i => content(i % content.length))
      val resized = Array.tabulate(ow * oh) { i =>
        val (y, x) = (i / ow, i % ow)
        pixels(((y.toLong * h / oh) * w + x.toLong * w / ow).toInt)
      }
      val want = (for (py <- 0 until oh / p; px <- 0 until ow / p) yield {
        val vs = for (dy <- 0 until p; dx <- 0 until p)
          yield resized((py * p + dy) * ow + (px * p + dx)) & 0xFF
        val mean = vs.sum / (p * p).toDouble
        (py, px, r6(mean),
          r6(math.sqrt(vs.map(v => v.toLong * v).sum / (p * p).toDouble - mean * mean)))
      }).toSeq
      val got = Seq(Tuple1(content)).toDF("c")
        .select(explode(gray_patch_stats(p,
          gray_resize(ow, oh, gray_decode(TileDecoder, col("c"), lit(w), lit(h)),
            lit(w), lit(h)), lit(ow), lit(oh))).as("s"))
        .select("s.py", "s.px", "s.mean", "s.std")
        .as[(Int, Int, Double, Double)].collect().toSeq
      assert(got === want, s"w=$w h=$h content=${content.toSeq}")
    }
  }
}
