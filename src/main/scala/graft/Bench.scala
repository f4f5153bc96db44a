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

  /** Fixed cross-round host-speed references. CPU: the canary baseline of
    * the last drift-clean round (r13, 0.036 s). IO: the first IO-canary
    * round's cleanest base (r17, 0.175 s). These must NOT change between
    * rounds or the ambient factors stop being comparable.
    *
    * r18 (verdict item 4, after two rounds of IO-ledger history):
    * `value_normalized` / `queries_normalized` are RETIRED. The r16
    * five-attempt ledger proved the CPU-canary normalization
    * anti-correlates with ambient on IO-bound queries (higher-ambient runs
    * normalized LOWER), and the r17 adoption rule already made raw the
    * only headline. A second, IO-normalized column was considered and
    * rejected: per-query CPU/IO weights are unknowable without per-query
    * instrumentation, so it would repeat the same bias with a different
    * sign. Instead the line now reports the RAW total plus two AMBIENT
    * FACTORS — `ambient_cpu` and `ambient_io`, each the run's median
    * canary observation over its fixed cross-round reference — which is
    * everything the retired column actually communicated: how slow the
    * host was, on each axis, while the raw numbers were taken. Cross-round
    * comparison = raw totals read against the two ambients (and the
    * per-pass ledger for windows within a run).
    */
  private val CanaryRefCpuSec = 0.036
  private val CanaryRefIoSec = 0.175

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000") // TypedImperativeAggregate (top_n_by) groups per task
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing's MIN-PARTITION-SIZE floor (default 1 MB), r18
      // optimization: with parallelismFirst (default) the coalesced
      // partition target is max(shuffleBytes/defaultParallelism,
      // minPartitionSize), so any exchange carrying < cores·1 MB
      // collapses to a handful of partitions — byte-blind coalescing
      // that SERIALIZES CPU-dense post-shuffle stages (pair cosines,
      // edit-distance verifies, k-means assignment) whose bytes are tiny
      // but whose per-row work is not. 16 KB keeps those stages at the
      // session's parallelism. Scale-inert by construction: any exchange
      // carrying >= cores·1 MB (every real stage at 100 TB) coalesces
      // identically under either floor — only the small-shuffle regime
      // changes, which is exactly the regime the bench runs in.
      // Paired A/B (one JVM, alternating samples, sf0.1): 22 of 25
      // heaviest queries improved — knn_graph 3.57→1.58, fuzzy_join
      // 2.47→1.09, ivf_build 2.68→1.38, ngram_jaccard 2.61→1.38 —
      // the two LR regressions were then fixed structurally in
      // Classifier (array-partial gradient; see OPTIMIZATION_r18.md).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "16k"))
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
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
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
    // bucket-pruned probe, not a rebuild the catalog exists to avoid.
    // SPARK_GRAFT_NO_INDEX_WARM=1 skips this (bisection aid: isolates
    // warmup-vs-suite interactions; catalog-probing queries then pay their
    // own builds)
    if (!sys.env.get("SPARK_GRAFT_NO_INDEX_WARM").contains("1"))
      try queries.PipelineQueries.warmIndexes(spark, sfDir)
      catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // Plan audit: a plan regression should FAIL the bench line, not just
    // slow it. Every declared query's STATIC plan (AQE off — the adaptive
    // planner can rescue a bad static plan on one data shape and not
    // another) is checked against PlanAudit's invariants; offenders land
    // in "plan_violations" (expected: {}).
    val planViolations: Seq[(String, Seq[String])] = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val out = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try {
          val v = PlanAudit.violations(fn(spark, sfDir).queryExecution.executedPlan)
          if (v.nonEmpty) Some(name -> v) else None
        } catch { case _: Throwable =>
          // the query may have published only SOME of its oracle-feed
          // tables at the target SF before throwing — drop them from the
          // publish-once memo so the timed path re-publishes a coherent set
          queries.OracleFeed.invalidate(name)
          None
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.catalog.clearCache()
      out
    }
    // The plan-audit pass above invoked every query lambda once, so every
    // OracleFeed table is already published (untimed). From here on,
    // re-publishes are skipped: the fed queries' timed samples measure
    // the query, not the correctness gate's coalesce(1) write+read-back
    // (r15 verdict item 3 — ns_quality_lr_score carried +0.53 s of feed
    // write per sample).
    queries.OracleFeed.enablePublishOnce()

    // Canary: fixed CPU-bound work across all cores — a faithful proxy for
    // the slow-window symptom ("every task ~4× slower"). Baseline = min of
    // several runs so one inflated startup run can't loosen the gate.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 4000000, 1, cpus.toInt)
        .selectExpr("max(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Second, IO/shuffle-bound canary (r16 verdict item 4): the CPU canary
    // provably ANTI-correlates with ambient slowness on IO-bound queries
    // (r16 five-attempt ledger: raw tracked ambient while normalized moved
    // the other way), so a CPU-only normalization overcorrects exactly the
    // queries that spend their time in exchange writes. This one forces a
    // small fixed sort-exchange (range → hash repartition → sort within
    // partitions → count), touching shuffle-file write+read on every core.
    // It GATES nothing — it is reported (startup base + per-pass medians in
    // bench_out.json's ledger, plus the headline ambient_io factor) so a
    // consumer can tell a CPU window from an IO window.
    def canaryIo(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 1000000, 1, cpus.toInt)
        .selectExpr("id", "xxhash64(id) as k")
        .repartition(cpus.toInt, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // JIT/codegen for the canary itself stays out of its baseline
    canaryIo()
    // ROLLING baseline: if startup itself lands inside a slow window, a
    // min-of-5-at-startup baseline is inflated ~4× and the 3× gate would
    // certify slow-window samples as clean for the whole run. So every
    // canary observation tightens the baseline (min over the run), the gate
    // uses the current rolling min, and — because a sample certified early
    // under a loose gate may be bogus — ALL samples are re-classified
    // against the FINAL baseline before reporting. `canary_drift` flags a
    // run whose startup baseline was materially inflated.
    val canaryStartup = (1 to 5).map(_ => canary()).min
    var canaryBase = canaryStartup
    val canaryIoStartup = (1 to 5).map(_ => canaryIo()).min
    var canaryIoBase = canaryIoStartup

    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").filter(_.nonEmpty).toSet

    // One timed sample: (seconds, errored, canary-observation, io-canary
    // observation). The CPU canary observation is kept with the sample so it
    // can be re-classified against the final rolling baseline at report
    // time; the IO observation only feeds the per-pass ledger medians.
    // The timed action is the NOOP SINK, not count(): count() lets
    // Catalyst prune every column the action doesn't need, so a query
    // whose cost lives in its final projection benches as a phantom
    // no-op (ns_text_repetition read 0.12 s under count() while a full
    // materialization cost minutes before its rewrite). The noop sink
    // evaluates every output column at full parallelism and discards the
    // rows — the honest cost of producing the query's result.
    def sample(fn: (SparkSession, String) => DataFrame): (Double, Boolean, Double, Double) = {
      val t0 = System.nanoTime()
      val errored =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); false }
        catch { case _: Throwable => true }
      val dt = (System.nanoTime() - t0) / 1e9
      // outside the timer: caches one query leaves behind must not squeeze
      // executor storage for the next; the canary then certifies the window.
      // (Round-7 bisection note: the heaviest shuffle entry,
      // ns_dedup_ngram_jaccard, reads ~1.5 s isolated but 2.1-2.5 s
      // mid-suite; skipping warmIndexes and forcing System.gc() here were
      // both tried and neither recovers the isolated number, so the
      // overhead is suite-context state the canary rightly ignores —
      // recorded in SURVEY, not "fixed" with a GC that costs the suite
      // ~4 s of pauses without helping.)
      // Min-of-2 canary runs: a single run right after a heavy query can be
      // slowed by that query's own GC/cleanup tail (a false positive that
      // would burn a re-sample pass), while a genuine host slow window is
      // multi-second and inflates both.
      spark.catalog.clearCache()
      val cObs = math.min(canary(), canary())
      canaryBase = math.min(canaryBase, cObs) // rolling min tightens the gate
      val cIoObs = canaryIo() // advisory only — no gate, single run suffices
      canaryIoBase = math.min(canaryIoBase, cIoObs)
      (dt, errored, cObs, cIoObs)
    }

    val names = SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))
    // all non-error samples as (seconds, canaryObs) — classification happens
    // against the rolling baseline during passes and the FINAL one at report
    val samples = scala.collection.mutable.Map[String, List[(Double, Double)]]()
      .withDefaultValue(Nil)
    val errors = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)

    def cleanTimes(name: String): List[Double] =
      samples(name).collect { case (t, c) if c <= CanaryFactor * canaryBase => t }

    // A query is settled once it has either (a) a clean sample under the
    // re-sample threshold, or (b) two clean samples (min-of-2, taken in
    // SEPARATE passes — never back-to-back). Evaluated against the CURRENT
    // rolling baseline, so a window discovered late un-settles its victims.
    def settled(name: String): Boolean = {
      val ts = cleanTimes(name)
      ts.nonEmpty && (ts.min <= ResampleSec || ts.size >= 2)
    }

    var pass = 0
    var pending = names
    // Per-pass canary ledger: which queries each pass sampled (pass 1 =
    // the whole suite; later passes = re-runs) and the pass's canary
    // observation profile. Makes "canary_drift" adjudicable from the
    // artifact alone — a drift flag with a clean ledger means one
    // inflated startup baseline, while a pass whose canary median is ~4×
    // the final base is a genuine slow window and names its victims.
    val passLedger = scala.collection.mutable.ListBuffer[
      (Int, Seq[String], Seq[Double], Seq[Double])]()
    while (pending.nonEmpty && pass < MaxPasses) {
      val passCanaries = scala.collection.mutable.ListBuffer[Double]()
      val passIoCanaries = scala.collection.mutable.ListBuffer[Double]()
      pending.foreach { case (name, fn) =>
        val (t, errored, cObs, cIoObs) = sample(fn)
        passCanaries += cObs
        passIoCanaries += cIoObs
        if (errored) errors(name) += 1
        else samples(name) = (t, cObs) :: samples(name)
      }
      pass += 1
      passLedger += ((pass,
        if (pass == 1) Seq.empty else pending.map(_._1),
        passCanaries.toSeq, passIoCanaries.toSeq))
      pending = names.filterNot(q => settled(q._1))
      // an erroring query will never settle — stop burning passes on it
      pending = pending.filterNot(q => errors(q._1) >= 2 && samples(q._1).isEmpty)
    }

    // Final classification against the final (tightest) baseline. Best
    // samples keep their own canary observation — the normalization input.
    val best = names.map(_._1).flatMap { n =>
      val ts = samples(n).filter(_._2 <= CanaryFactor * canaryBase)
      if (ts.nonEmpty) Some(n -> ts.minBy(_._1)) else None
    }.toMap
    val bestAny = names.map(_._1).flatMap { n =>
      val ts = samples(n); if (ts.nonEmpty) Some(n -> ts.minBy(_._1)) else None
    }.toMap
    val suspect = names.map(_._1).filter(n => !best.contains(n) && bestAny.contains(n))
    val failed = names.map(_._1).filter(n => !best.contains(n) && !bestAny.contains(n))
    val resultPairs = names.flatMap { case (name, _) =>
      best.get(name).orElse(bestAny.get(name)).map(name -> _)
    }
    val results = resultPairs.map { case (n, (t, _)) => n -> t }

    // 3-decimal seconds: ~40% shorter line (the full-precision doubles
    // overflowed the driver's tail capture two rounds running), and ms
    // precision is below this host's noise floor anyway.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def jArr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Two DISTINCT drift truths (r15 verdict: the single startup flag
    // read as "clean window" on a run whose mid-run ambient was 2×):
    //  - startup drift: the startup baseline was >1.5× the final rolling
    //    min — the run STARTED inside a slow window; samples were
    //    re-classified against the final baseline, so reported times are
    //    still clean unless listed in "suspect".
    //  - ambient drift: some pass's MEDIAN canary ran >1.2× the final
    //    base (the r13 clean-window criterion) — the host was slow for a
    //    sustained stretch MID-run. Raw seconds from such a pass are
    //    inflated even when each sample clears the 3× gate; read the raw
    //    total against the ambient factors. Only passes with
    //    >= 5 canary observations vote (a 2-observation re-sample pass
    //    median is noise, and pass 1 always qualifies at suite size).
    // The headline canary_drift is the OR — a false flag now certifies
    // both truths at once and cannot over-claim.
    val driftStartup = canaryStartup > 1.5 * canaryBase
    val driftAmbient = passLedger.exists { case (_, _, cs, _) =>
      cs.size >= 5 && { val s = cs.sorted; s(s.size / 2) > 1.2 * canaryBase }
    }
    val drift = driftStartup || driftAmbient
    val pvJson = planViolations
      .map { case (k, vs) => "\"" + k + "\":" + jArr(vs) }.mkString("{", ",", "}")
    // canary_drift = canary_drift_startup || canary_drift_ambient (see
    // the flag definitions above). The ledger below gives per-pass canary
    // min/med/max for BOTH canaries (CPU + IO) and the re-sampled query
    // names, so both flags — and whether an ambient window was CPU- or
    // IO-shaped — are adjudicable from the artifact alone.
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else { val s = xs.sorted; s(s.size / 2) }
    val ledgerJson = passLedger.map { case (p, resampled, cs, ios) =>
      val sorted = cs.sorted
      // cap the name list: a noisy pass can re-sample most of the suite,
      // and a 170-name array would bloat the full artifact — the count is
      // always exact, the names are a bounded sample
      val names = if (resampled.size <= 20) resampled
        else resampled.take(20) :+ s"...+${resampled.size - 20} more"
      s"""{"pass":$p,"sampled":${cs.size},"canary_min":${fmt(if (sorted.isEmpty) 0.0 else sorted.head)},"canary_med":${fmt(med(cs))},"canary_max":${fmt(if (sorted.isEmpty) 0.0 else sorted.last)},"canary_io_med":${fmt(med(ios))},"resampled_n":${resampled.size},"resampled":${jArr(names)}}"""
    }.mkString("[", ",", "]")
    // Adoption rule, codified (r16 verdict item 4): the number a round
    // ADOPTS as its headline is the RAW total of the attempt taken at the
    // cleanest ambient (lowest ambient factors), capped at 2 attempts.
    // r18 (verdict item 4): value_normalized is RETIRED — see the
    // CanaryRef scaladoc. The two ambient factors below are the run's
    // median canary observation over its fixed cross-round reference:
    // 1.0 = reference host speed, 2.0 = host ran 2x slow on that axis.
    val adoptionRule = "raw-at-cleanest-ambient-max-2-attempts"
    val ambientCpu = med(passLedger.toSeq.flatMap(_._3)) / CanaryRefCpuSec
    val ambientIo = med(passLedger.toSeq.flatMap(_._4)) / CanaryRefIoSec
    val common = s""""unit":"sec","ambient_cpu":${fmt(ambientCpu)},"ambient_io":${fmt(ambientIo)},"ambient_ref_cpu_sec":${fmt(CanaryRefCpuSec)},"ambient_ref_io_sec":${fmt(CanaryRefIoSec)},"normalized_retired":"r18 — raw + ambient factors replace value_normalized (CPU-normalization anti-correlated with ambient on IO-bound queries, r16 ledger)","adoption_rule":"$adoptionRule","sf":"$sfDir","policy":"min-of-2-separate-passes-canary-gated-rolling","canary_base_sec":${fmt(canaryBase)},"canary_base_startup_sec":${fmt(canaryStartup)},"canary_io_base_sec":${fmt(canaryIoBase)},"canary_io_base_startup_sec":${fmt(canaryIoStartup)},"canary_drift":$drift,"canary_drift_startup":$driftStartup,"canary_drift_ambient":$driftAmbient,"passes":$pass"""
    val fullLine = s"""{"metric":"total","value":${fmt(total)},$common,"queries":$qs,"canary_drift_means":"drift = startup (baseline >1.5x final rolling min; samples re-classified against final baseline) OR ambient (some pass median canary >1.2x final base; raw secs inflated — read value against ambient_cpu/ambient_io and the per-pass ledger)","canary_ledger":$ledgerJson,"skipped":${jArr(skip.toSeq.sorted)},"suspect":${jArr(suspect)},"failed":${jArr(failed)},"errors":$errJson,"plan_violations":$pvJson}"""
    // FULL artifact (per-query maps, ledger) goes to a committable file.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    // STDOUT gets ONLY a compact line. The driver captures the last 2000
    // chars of stdout and json-parses a line found there; every prior
    // round's BENCH_r*.json carries `parsed: null` because the full line
    // (12 KB at 203 queries) never fit. Budget: sbt appends its own
    // "[success] Total time..." (~80 chars) after us, so the compact line
    // must stay under ~1.9 KB — totals, flags, counts, the slowest-8 map
    // (the queries a consumer actually eyeballs), and a pointer to the
    // full artifact. Names in failed/suspect/plan_violations are the
    // actionable signal and are near-always empty; they are capped so a
    // catastrophic run cannot re-overflow the capture.
    def capN(xs: Seq[String], n: Int) =
      if (xs.size <= n) xs else xs.take(n) :+ s"...+${xs.size - n}"
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(total)},$common,"n_queries":${results.size},"slowest":$slowest,"skipped_n":${skip.size},"suspect_n":${suspect.size},"suspect":${jArr(capN(suspect, 8))},"failed_n":${failed.size},"failed":${jArr(capN(failed, 8))},"errors_n":${errors.size},"plan_violations_n":${planViolations.size},"plan_violations":${jArr(capN(planViolations.map(_._1), 8))},"full":"bench_out.json"}"""
    println(compact)
    spark.stop()
  }
}
