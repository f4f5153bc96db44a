package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * A warmup pass first touches every table and runs the whole suite at the
  * smallest SF, so parquet footer reads, page-cache fill, and JIT/codegen
  * compilation don't land on whichever query happens to run first.
  *
  * Reported numbers are STEADY-STATE and SLOW-WINDOW-PROOF. This host
  * occasionally enters multi-second windows where every task is ~4× slower
  * (shared-machine noise; load stays low, plans unchanged). Round 5 proved
  * that min-of-2 *back-to-back* sampling does not defeat such a window —
  * both samples land inside it, and an alphabetically-contiguous block of
  * queries read as ×7–×18 regressions that an idle machine runs in 0.2 s.
  * The fix is twofold:
  *
  *  1. **Samples of one query are never adjacent.** Every query is sampled
  *     once per PASS, and re-sample passes iterate the whole remaining
  *     suite, so consecutive samples of the same query are separated by
  *     everything else that still needs a sample.
  *  2. **A canary gates every sample.** Immediately after each timed query
  *     a tiny fixed computation (`spark.range` + hash-sum, all cores,
  *     ~30 ms warm) is timed; its baseline is the min of several runs at
  *     startup. A sample whose canary exceeds 3× baseline was taken inside
  *     a slow window and is re-sampled in a later pass (up to
  *     `MaxPasses`). If a query never yields a clean sample it is reported
  *     from its fastest suspect sample and listed in `"suspect"` so a
  *     consumer can discount it instead of chasing a phantom regression.
  *
  * Queries with build side effects stay honest under re-runs: the `*_build`
  * entries wipe their output first, so each sample is a genuinely cold
  * build. A query that THROWS is not silently recorded as a fast time:
  * errors are counted per query and emitted in `"errors"`; an erroring
  * sample never competes in the min.
  *
  * `SPARK_GRAFT_SKIP=q1,q2` excludes queries by name (bisection aid); the
  * skip list and the sampling policy are emitted in the JSON line so
  * downstream comparisons can detect reduced coverage or changed
  * methodology.
  */
object Bench {
  /** Re-sample threshold: queries faster than this on a clean canary are
    * accepted from one sample (second samples buy nothing below noise).
    */
  private val ResampleSec = 0.3
  private val CanaryFactor = 3.0
  private val MaxPasses = 4

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup pass: run the ENTIRE suite once, untimed, against the smallest
    // SF. This pays every one-time JVM cost outside the timed region — the
    // big one in Spark 4.x is CollationAwareUTF8String.<clinit> (~6 s of ICU
    // case-mapping table construction, triggered by the first lower()/upper()
    // call), plus whole-stage-codegen compilation per plan shape and C2 JIT
    // of the kernel loops. Warming at sf0.001 keeps the pass cheap while
    // hitting the same generated-code cache entries the timed run uses.
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // then touch every table at the TARGET SF so footer reads and OS page
    // cache are warm for the timed pass
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    // materialize the ANN index-catalog entries for the target SF: an index
    // is built once per dataset version (IndexCatalog) and amortized over
    // every query — the timed region measures the production shape, the
    // bucket-pruned probe, not a rebuild the catalog exists to avoid
    try queries.PipelineQueries.warmIndexes(spark, sfDir)
    catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // Canary: fixed CPU-bound work across all cores — a faithful proxy for
    // the slow-window symptom ("every task ~4× slower"). Baseline = min of
    // several runs so one inflated startup run can't loosen the gate.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 4000000, 1, cpus.toInt)
        .selectExpr("max(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // JIT/codegen for the canary itself stays out of its baseline
    val canaryBase = (1 to 5).map(_ => canary()).min

    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").filter(_.nonEmpty).toSet

    // One timed sample: (seconds, errored, canary-clean).
    def sample(fn: (SparkSession, String) => DataFrame): (Double, Boolean, Boolean) = {
      val t0 = System.nanoTime()
      val errored =
        try { fn(spark, sfDir).count(); false }
        catch { case _: Throwable => true }
      val dt = (System.nanoTime() - t0) / 1e9
      // outside the timer: caches one query leaves behind must not squeeze
      // executor storage for the next; the canary then certifies the window.
      // Min-of-2 canary runs: a single run right after a heavy query can be
      // slowed by that query's own GC/cleanup tail (a false positive that
      // would burn a re-sample pass), while a genuine host slow window is
      // multi-second and inflates both.
      spark.catalog.clearCache()
      val clean = math.min(canary(), canary()) <= CanaryFactor * canaryBase
      (dt, errored, clean)
    }

    val names = SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))
    val best = scala.collection.mutable.Map[String, Double]()   // min CLEAN non-error time
    val bestAny = scala.collection.mutable.Map[String, Double]() // min non-error time incl. suspect
    val cleanSamples = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val errors = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)

    // A query is settled once it has either (a) a clean sample under the
    // re-sample threshold, or (b) two clean samples (min-of-2, taken in
    // SEPARATE passes — never back-to-back).
    def settled(name: String): Boolean =
      best.get(name).exists(t => t <= ResampleSec || cleanSamples(name) >= 2)

    var pass = 0
    var pending = names
    while (pending.nonEmpty && pass < MaxPasses) {
      pending.foreach { case (name, fn) =>
        val (t, errored, clean) = sample(fn)
        if (errored) errors(name) += 1
        else {
          bestAny(name) = math.min(bestAny.getOrElse(name, Double.MaxValue), t)
          if (clean) {
            cleanSamples(name) += 1
            best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
          }
        }
      }
      pass += 1
      pending = pending.filterNot(q => settled(q._1))
      // an erroring query will never settle — stop burning passes on it
      pending = pending.filterNot(q => errors(q._1) >= 2 && !bestAny.contains(q._1))
    }

    val suspect = names.map(_._1).filter(n => !best.contains(n) && bestAny.contains(n))
    val failed = names.map(_._1).filter(n => !best.contains(n) && !bestAny.contains(n))
    val results = names.flatMap { case (name, _) =>
      best.get(name).orElse(bestAny.get(name)).map(name -> _)
    }

    def jArr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","policy":"min-of-2-separate-passes-canary-gated","canary_base_sec":$canaryBase,"passes":$pass,"skipped":${jArr(skip.toSeq.sorted)},"suspect":${jArr(suspect)},"failed":${jArr(failed)},"errors":$errJson}""")
    spark.stop()
  }
}
