package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CdcFold, Skew}

/** Core-relational scale stages shared by [[ScaleSmoke]] (manual harness;
  * not part of the driver gates).
  *
  * Round 16 proved the core queries at-or-below linear under UNIFORM 20×/50×
  * replication of the real sf0.1 tables (`SCALE_CORE_r16.json`). Round 17
  * adds the two postures that uniform replication cannot exercise:
  *
  *  - [[skewStage]] — Zipf-reality: ONE hot key holding ~20 % of rows
  *    (the reference's per-key ordering, `setup.md:729-734`, meets hot
  *    Salesforce entities in production). Asserts which mechanism absorbs
  *    the skew per query shape: map-side partial aggregation (q07),
  *    broadcast joins (q05), AQE's runtime skew-split on sort-merge joins
  *    (`skew=true` in the adaptive plan), the [[Skew.saltedJoin]] equality
  *    fallback, and the [[CdcFold.latestWinsAgg]] aggregate twin for the
  *    one genuinely skew-sensitive shape (latest-wins via window sort).
  *  - [[pressureStage]] — one deliberately memory-constrained run
  *    (launch with `SPARK_DRIVER_MEM=10g`) at 100–200× sf0.1, recording
  *    task spill bytes, to document where the single-box envelope ends
  *    and that plans stay clean under spill.
  *
  * All replicated data lives in a temp dir deleted in `finally` (r16
  * ADVICE: the 50× core runs left multiple GB in /tmp per invocation).
  */
object CoreScale {
  val Base = "/root/testdata/sf0.1"

  private def t[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"SCALE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Replicate the sf0.1 fact tables `mult`× with key-shifting (see the
    * `core` stage scaladoc in [[ScaleSmoke]]) into a temp dir, copy the
    * dims, run `body(dir)`, and ALWAYS delete the temp dir afterwards.
    *
    * `hotFraction` plants skew during generation: that fraction of rows
    * (chosen by a deterministic row hash, so reruns are identical) has its
    * SKEW KEY redirected to one hot value — `l_partkey` → min part,
    * `o_custkey` → min customer, `user_id` → min user. Key-shifted columns
    * (`l_orderkey`/`o_orderkey`/`event_id`) stay unique, so offsets remain
    * valid replay ids.
    */
  def withReplicated(spark: SparkSession, mult: Int,
                     hotFraction: Double = 0.0,
                     tables: Set[String] = Set("lineitem", "orders", "events"))
                    (body: String => Unit): Unit = {
    val dirPath = java.nio.file.Files.createTempDirectory("graft_core_scale")
    val dir = dirPath.toString
    try {
      val rep = spark.range(mult).toDF("rep")
      val hotDen = if (hotFraction > 0) math.round(1.0 / hotFraction) else 0L
      def hot(h: Seq[org.apache.spark.sql.Column]) =
        pmod(xxhash64(h: _*), lit(hotDen)) === 0

      if (tables("lineitem")) {
        val li = spark.read.parquet(s"$Base/lineitem.parquet")
        val ord0 = spark.read.parquet(s"$Base/orders.parquet")
        val okStride = ord0.agg(max("o_orderkey")).head().getLong(0) + 1
        val hotPart = spark.read.parquet(s"$Base/part.parquet")
          .agg(min("p_partkey")).head().getLong(0)
        t(s"core_gen_lineitem_x$mult") {
          val shifted = li.crossJoin(broadcast(rep))
            .withColumn("l_orderkey", col("l_orderkey") + col("rep") * okStride)
          val skewed = if (hotFraction > 0)
            shifted.withColumn("l_partkey",
              when(hot(Seq(col("l_orderkey"), col("l_linenumber"))),
                lit(hotPart)).otherwise(col("l_partkey")))
          else shifted
          // repartition before write: the sf0.1 source is ONE scan split,
          // so an un-repartitioned replica lands in 1-2 parquet files and
          // reads back with 1-2 map tasks — under-parallelizing every
          // downstream scan AND defeating AQE's skew split, which divides
          // a skewed reduce partition at MAPPER boundaries (one mapper =
          // nothing to divide; at 100 TB there are thousands). 32 files
          // mirrors the multi-mapper reality the smoke exists to model.
          skewed.repartition(spark.sparkContext.defaultParallelism)
            .select(li.columns.toIndexedSeq.map(col): _*)
            .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        }
      }
      if (tables("orders")) {
        val ord = spark.read.parquet(s"$Base/orders.parquet")
        val okStride = ord.agg(max("o_orderkey")).head().getLong(0) + 1
        val hotCust = spark.read.parquet(s"$Base/customer.parquet")
          .agg(min("c_custkey")).head().getLong(0)
        t(s"core_gen_orders_x$mult") {
          val shifted = ord.crossJoin(broadcast(rep))
            .withColumn("o_orderkey", col("o_orderkey") + col("rep") * okStride)
          val skewed = if (hotFraction > 0)
            shifted.withColumn("o_custkey",
              when(hot(Seq(col("o_orderkey"))), lit(hotCust))
                .otherwise(col("o_custkey")))
          else shifted
          skewed.repartition(spark.sparkContext.defaultParallelism)
            .select(ord.columns.toIndexedSeq.map(col): _*)
            .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        }
      }
      if (tables("events")) {
        val ev = Tables.events(spark, Base)
        val evStride = ev.agg(max("event_id")).head().getLong(0) + 1
        val uStride = ev.agg(max("user_id")).head().getLong(0) + 1
        val hotUser = ev.agg(min("user_id")).head().getLong(0)
        t(s"core_gen_events_x$mult") {
          val shifted = ev.crossJoin(broadcast(rep))
            .withColumn("event_id", col("event_id") + col("rep") * evStride)
            .withColumn("user_id", col("user_id") + col("rep") * uStride)
          val skewed = if (hotFraction > 0)
            shifted.withColumn("user_id",
              when(hot(Seq(col("event_id"))), lit(hotUser))
                .otherwise(col("user_id")))
          else shifted
          skewed.repartition(spark.sparkContext.defaultParallelism)
            .select(ev.columns.toIndexedSeq.map(col): _*)
            .write.mode("overwrite").parquet(s"$dir/events.parquet")
        }
      }
      Seq("region", "nation", "customer", "supplier", "part",
        "documents", "embeddings").foreach { tb =>
        spark.read.parquet(s"$Base/$tb.parquet")
          .write.mode("overwrite").parquet(s"$dir/$tb.parquet")
      }
      body(dir)
    } finally deleteRecursively(dirPath)
  }

  /** Static-plan audit (the bench's posture: AQE off) + one timed noop run.
    * Shared by every core-scale stage so the measurement protocol cannot
    * drift between the uniform, skew, and pressure runs.
    */
  private[graft] def auditAndTime(spark: SparkSession, name: String, tag: String,
                                  dir: String): Double = {
    val fn = SparkEntry.queries(name)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val v = PlanAudit.violations(fn(spark, dir).queryExecution.executedPlan)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    require(v.isEmpty, s"$name plan violations ($tag): $v")
    val t0 = System.nanoTime()
    fn(spark, dir).write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"SCALE $tag%-28s $dt%8.2f s")
    spark.catalog.clearCache()
    dt
  }

  /** Skewed-key core smoke: `runMain graft.ScaleSmoke <mult> coreskew`. */
  def skewStage(spark: SparkSession, mult: Int): Unit = {
    require(mult <= 64, s"coreskew multiplier $mult looks like a row count")
    withReplicated(spark, mult) { uni =>
      withReplicated(spark, mult, hotFraction = 0.2) { skw =>
        // --- plant check: the hot key must actually hold ~20 % ---
        val ev = Tables.events(spark, skw)
        val hotUser = ev.agg(min("user_id")).head().getLong(0)
        val Seq(hotN, totN) = ev
          .agg(sum(when(col("user_id") === hotUser, 1L).otherwise(0L)),
            count(lit(1))).head().toSeq.map(_.asInstanceOf[Long]).toSeq
        val frac = hotN.toDouble / totN
        require(frac > 0.15 && frac < 0.25,
          s"skew plant drifted: hot user holds $frac of $totN rows")
        println(f"SCALE   skew plant OK: hot user $hotN%,d / $totN%,d rows (${frac * 100}%.1f%%)")

        // --- the three named queries, uniform vs skewed ---
        // q05: joins are BROADCAST (plan-audited) — key skew never touches
        //   an exchange, and the groupBy's partial agg combines map-side.
        // q07: pure groupBy — partial aggregation absorbs the hot key.
        // q10: row_number window — the one genuinely skew-sensitive shape:
        //   the hot key's 20 % of rows sort in ONE task (~6.4× a perfectly
        //   even spread at 32 slots as the analytic bound; in practice the
        //   other 31 slots stream the remaining 80 % concurrently). The
        //   production-shape fix is latestWinsAgg, measured below.
        // The skew/uniform ratio is REPORTED, not require()d (r17 ADVICE):
        // a timing gate on a shared host fails the whole manual run on an
        // ambient spike even when the engine behaved correctly — exactly
        // the flakiness the bench's canary machinery exists to absorb.
        // Gated assertions in this stage are the STRUCTURAL ones only:
        // the plant fraction (deterministic row-hash, ambient-free),
        // plan cleanliness, skew=true, row equality, exact merge counts.
        Seq("q05_star_join", "q07_max_offset", "q10_latest_wins")
          .foreach { name =>
          val tu = auditAndTime(spark, name, s"skew_${name}_uniform", uni)
          val ts = auditAndTime(spark, name, s"skew_${name}_hot20", skw)
          val ratio = ts / math.max(tu, 0.05)
          println(f"SCALE   $name skew/uniform ratio $ratio%.2f" +
            (if (ratio > 4.0) " (above the 4x analytic bound — re-measure on calm ambient)" else ""))
        }

        // --- latest-wins: window form vs skew-immune aggregate twin ---
        // Equality is exact here (event_id unique per key), and the agg
        // form's partial aggregation is the 100 TB posture for hot keys.
        val evAll = Tables.events(spark, skw)
        val tWin = { val t0 = System.nanoTime()
          CdcFold.latestWins(evAll, col("user_id"), col("event_id"))
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9 }
        val tAgg = { val t0 = System.nanoTime()
          CdcFold.latestWinsAgg(evAll, col("user_id"), col("event_id"))
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9 }
        val win = CdcFold.latestWins(evAll, col("user_id"), col("event_id"))
        val agg = CdcFold.latestWinsAgg(evAll, col("user_id"), col("event_id"))
          .select(win.columns.toIndexedSeq.map(col): _*)
        val diff = win.exceptAll(agg).count() + agg.exceptAll(win).count()
        require(diff == 0, s"latestWinsAgg != latestWins on skewed events ($diff rows)")
        println(f"SCALE   latest-wins hot20: window $tWin%.2f s, agg twin $tAgg%.2f s (outputs EQUAL)")

        // --- AQE skew-split on a forced sort-merge join ---
        // orders(hot custkey) ⋈ customer with broadcast disabled: the hot
        // shuffle partition must be runtime-split (skew=true in the final
        // adaptive plan). Thresholds are lowered to engage at smoke scale —
        // at 100 TB the default 256 MB threshold fires on the same shape.
        val saved = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
          .map(k => k -> spark.conf.getOption(k)).toMap
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
          val ordS = spark.read.parquet(s"$skw/orders.parquet")
          val cust = spark.read.parquet(s"$skw/customer.parquet")
          val j = ordS.join(cust, col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
          // the action must run through THIS Dataset's own QueryExecution:
          // a .write would execute a separate command QueryExecution and
          // leave j's adaptive plan un-finalized (no skew markers to read)
          t(s"skew_smj_aqe_split_x$mult") { j.collect(); () }
          val plan = j.queryExecution.executedPlan.toString
          require(plan.contains("skew=true"),
            "AQE skew-join did not engage on the hot-custkey SMJ:\n" + plan)
          println("SCALE   AQE skew-split engaged (skew=true in final plan)")

          // --- explicit salting fallback: result-equal to the plain join ---
          val plainN = ordS.join(cust, col("o_custkey") === col("c_custkey")).count()
          val salted = Skew.saltedJoin(
            ordS.withColumnRenamed("o_custkey", "k"),
            cust.withColumnRenamed("c_custkey", "k"), "k", salts = 32)
          val saltedN = t(s"skew_salted_join_x$mult")(salted.count())
          require(saltedN == plainN,
            s"saltedJoin row drift: $saltedN vs $plainN")
          println(s"SCALE   saltedJoin EQUAL to plain join ($plainN rows)")
        } finally saved.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
        }

        // --- MERGE path with a hot key ---
        // Target = folded state of the skewed log; changes = the log itself
        // with a derived change type (every 10th event a DELETE). The fold
        // inside mergeBatch is the window form — the honest hot-key cost —
        // and the uniform twin bounds the ratio.
        def mergeRun(d: String, tag: String): (Double, Long) = {
          val log = Tables.events(spark, d)
          val changes = log.withColumn("__ct",
            when(pmod(xxhash64(col("event_id")), lit(10L)) === 0, "DELETE")
              .otherwise("UPDATE"))
          val target = CdcFold.latestWinsAgg(log, col("user_id"), col("event_id"))
          val merged = CdcFold.mergeBatch(target, changes, "user_id",
            "event_id", "__ct")
          val t0 = System.nanoTime()
          merged.write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"SCALE $tag%-28s $dt%8.2f s")
          // every change key exists in the target, so the merged count is
          // exactly: target keys minus keys whose WINNING change is DELETE
          val nDel = CdcFold.latestWinsAgg(changes, col("user_id"), col("event_id"))
            .filter(col("__ct") === "DELETE").count()
          val expect = target.count() - nDel
          val got = merged.count()
          require(got == expect, s"merge count drift ($tag): $got vs $expect")
          (dt, got)
        }
        val (mu, _) = mergeRun(uni, s"skew_merge_uniform_x$mult")
        val (ms, _) = mergeRun(skw, s"skew_merge_hot20_x$mult")
        val mRatio = ms / math.max(mu, 0.05)
        // reported, not gated (r17 ADVICE — timing; the counts ARE gated)
        println(f"SCALE   merge skew/uniform ratio $mRatio%.2f (counts exact)" +
          (if (mRatio > 4.0) " (above the 4x analytic bound — re-measure on calm ambient)" else ""))
      }
    }
  }

  /** Sliding-window state growth: `runMain graft.ScaleSmoke <mult>
    * slidestate`. slide < width multiplies OPEN-window state by
    * width/slide (each row lives in width/slide windows until the
    * watermark passes them) — this stage measures the state store under
    * the tumbling shape (slide = width = 1 h) and a 12-slides-per-width
    * shape (slide = 5 min) over the same day-ordered replay of the
    * replicated events log, and asserts the two STRUCTURAL bounds the
    * 100 TB posture needs:
    *
    *  1. max state rows under slide 12 stays O(width/slide) of the
    *     tumbling run — NOT O(total windows): the multiplier is the open
    *     horizon, bounded by (width + watermark delay)/slide per key;
    *  2. max state rows stays far below the total finalized windows the
    *     sink receives — i.e. the watermark genuinely EVICTS; unbounded
    *     state would grow with stream length.
    *
    * Timings are incidental here and not gated (the r17 ADVICE rule:
    * structural gates only in manual smoke stages).
    */
  def slideStage(spark: SparkSession, mult: Int): Unit = {
    require(mult <= 64, s"slidestate multiplier $mult looks like a row count")
    withReplicated(spark, mult, tables = Set("events")) { dir =>
      val ev = Tables.events(spark, dir)
        .select("event_id", "ts", "event_type", "value")
      val tmpPath = java.nio.file.Files.createTempDirectory("graft_slide_state")
      try {
        val tmp = tmpPath.toString
        val wlog = s"$tmp/log"
        // day-ordered file log, one file per day with increasing modTimes:
        // micro-batches then advance event time monotonically like a live
        // ingest, so the watermark moves and evicts exactly as production
        // state management would (an arbitrary-order replay would measure
        // late-drop behavior, not state growth)
        val bounds = ev.agg(min("ts"), max("ts")).head()
        val d0 = bounds.getAs[java.time.LocalDateTime](0).toLocalDate
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          d0, bounds.getAs[java.time.LocalDateTime](1).toLocalDate).toInt + 1
        val t0 = System.currentTimeMillis() - 86400000L
        (0 until days).foreach { i =>
          val lo = java.sql.Timestamp.valueOf(d0.plusDays(i).atStartOfDay)
          val hi = java.sql.Timestamp.valueOf(d0.plusDays(i + 1L).atStartOfDay)
          val dirF = new java.io.File(wlog)
          val before = Option(dirF.listFiles())
            .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
          ev.filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
            .coalesce(1).write.mode("append").parquet(wlog)
          dirF.listFiles().filter(f => !before(f.getName) &&
              !f.getName.startsWith("_") && !f.getName.startsWith("."))
            .foreach(f => require(f.setLastModified(t0 + i * 1000L)))
        }
        def run(tag: String, slide: String): (Long, Long, Long) = {
          val q = graft.streaming.EventTimeWindow.start(spark,
            spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(wlog),
            "ts", Seq("event_type"), Seq("value"), "1 hour", "1 hour",
            s"$tmp/out_$tag", s"$tmp/ckpt_$tag", slide = slide)
          q.awaitTermination()
          val states = q.recentProgress.toSeq
            .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
          val maxState = if (states.isEmpty) 0L else states.max
          val lastState = if (states.isEmpty) 0L else states.last
          val sinkRows = spark.read.parquet(s"$tmp/out_$tag").count()
          println(f"SCALE   slidestate[$tag] max state rows $maxState%,d, " +
            f"final $lastState%,d, finalized windows $sinkRows%,d")
          (maxState, lastState, sinkRows)
        }
        val (maxTumble, _, sinkTumble) = t(s"slidestate_tumble_x$mult") {
          run("tumble", "1 hour")
        }
        val (maxSlide, lastSlide, sinkSlide) = t(s"slidestate_slide12_x$mult") {
          run("slide12", "5 minutes")
        }
        println(f"SCALE   slidestate ratios: state ${maxSlide.toDouble / math.max(maxTumble, 1)}%.1fx " +
          f"(width/slide = 12), windows ${sinkSlide.toDouble / math.max(sinkTumble, 1)}%.1fx")
        // structural gate 1: O(width/slide), with headroom for per-batch
        // in-flight windows — NOT O(total windows), which would be ~720x
        require(maxSlide <= 30L * math.max(maxTumble, 1),
          s"sliding state grew past O(width/slide): $maxSlide vs $maxTumble tumbling")
        // structural gate 2: the watermark evicts — concurrent state stays
        // far below the total finalized windows the sink accumulated
        require(maxSlide < sinkSlide / 5,
          s"watermark not bounding state: $maxSlide open vs $sinkSlide total windows")
        require(lastSlide <= maxSlide, "state metric inconsistent")
      } finally deleteRecursively(tmpPath)
    }
  }

  /** Memory-pressure point: `SPARK_DRIVER_MEM=10g sbt "runMain
    * graft.ScaleSmoke <mult> corepressure"` with mult 100–200. Reports
    * per-query seconds + task spill bytes; plans must stay clean.
    */
  def pressureStage(spark: SparkSession, mult: Int): Unit = {
    require(mult >= 64 && mult <= 256,
      s"corepressure expects a 64-256 multiplier, got $mult")
    println(s"SCALE   pressure heap: ${Runtime.getRuntime.maxMemory / (1 << 20)} MiB max")
    val disk = new java.util.concurrent.atomic.AtomicLong
    val mem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          disk.addAndGet(m.diskBytesSpilled); mem.addAndGet(m.memoryBytesSpilled); ()
        }
      }
    })
    def spillReport(tag: String)(f: => Unit): Unit = {
      val d0 = disk.get(); val m0 = mem.get()
      f
      // the listener bus drains asynchronously: poll until the counters
      // are stable for two consecutive intervals (r17 ADVICE — a fixed
      // 500 ms wait on a loaded host attributed late onTaskEnd events to
      // the NEXT query's delta), capped so a wedged bus can't hang the run
      var last = (disk.get, mem.get)
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(250); waited += 250
        val now = (disk.get, mem.get)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      if (stable < 2) println(s"SCALE   $tag spill counters still moving " +
        "after 10 s — attribution may bleed into the next query's delta")
      println(f"SCALE   $tag spill: disk ${(disk.get - d0) / 1e9}%.2f GB, " +
        f"in-mem ${(mem.get - m0) / 1e9}%.2f GB")
    }
    withReplicated(spark, mult) { dir =>
      Seq("q05_star_join", "q08_tpch_q1", "q17_rollup").foreach { name =>
        spillReport(name) {
          auditAndTime(spark, name, s"pressure_${name}_x$mult", dir)
        }
      }
      // The named queries carry O(groups) aggregate state — scan-bound, not
      // memory-bound, at any multiplier. The spill-prone shape at 100 TB is
      // a big sort: force the orders↔lineitem SORT-MERGE join (broadcast
      // off) so both sides sort `mult`× sf0.1 under the constrained heap.
      val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.join.preferSortMergeJoin")
        .map(k => k -> spark.conf.getOption(k)).toMap
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // shuffled-hash would dodge the sort; prefer SMJ explicitly
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val ord = spark.read.parquet(s"$dir/orders.parquet")
        spillReport("smj_probe") {
          t(s"pressure_smj_li_ord_x$mult") {
            li.join(ord, col("l_orderkey") === col("o_orderkey"))
              .groupBy("o_orderpriority")
              .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
              .write.mode("overwrite").format("noop").save()
          }
        }
      } finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
  }
}
