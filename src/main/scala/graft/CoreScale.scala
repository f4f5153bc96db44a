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
        //   the hot key's 20 % of rows sort in ONE task. Tolerance 4× the
        //   uniform run (at 32 slots a single task holding 20 % of rows
        //   bounds the stage at ~6.4× a perfectly even spread; in practice
        //   the other 31 slots stream the remaining 80 % concurrently).
        //   The production-shape fix is latestWinsAgg, measured below.
        Seq(("q05_star_join", 4.0), ("q07_max_offset", 4.0),
          ("q10_latest_wins", 4.0)).foreach { case (name, tol) =>
          val tu = auditAndTime(spark, name, s"skew_${name}_uniform", uni)
          val ts = auditAndTime(spark, name, s"skew_${name}_hot20", skw)
          val ratio = ts / math.max(tu, 0.05)
          println(f"SCALE   $name skew/uniform ratio $ratio%.2f")
          require(ratio <= tol, s"$name skew blow-up: ${ts}s vs ${tu}s uniform")
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
        println(f"SCALE   merge skew/uniform ratio $mRatio%.2f (counts exact)")
        require(mRatio <= 4.0, s"merge hot-key blow-up: ${ms}s vs ${mu}s")
      }
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
      Thread.sleep(500) // listener bus drains asynchronously
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
