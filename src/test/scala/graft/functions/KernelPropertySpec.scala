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
}
