package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("shiftFor: smallest power-of-two cell width covering the range") {
    assert(Layout.shiftFor(0, 10, 3) === 1) // 11 > 8, 11 <= 16
    assert(Layout.shiftFor(0, 7, 3) === 0) // exactly 8 values
    assert(Layout.shiftFor(5, 5, 4) === 0) // singleton range
    // shift target never overflows: full long range at 8 bits
    assert(Layout.shiftFor(Long.MinValue + 1, Long.MaxValue - 1, 8) <= 56)
  }

  test("interleave matches the hand-computed Morton code") {
    // bu=0b101, be=0b011 -> bits: pos0=be0=1, pos1=bu0=1, pos2=be1=1,
    // pos3=bu1=0, pos4=be2=0, pos5=bu2=1 -> 0b100111 = 39
    val z = Seq((5L, 3L)).toDF("bu", "be")
      .select(Layout.interleave(Seq(col("bu"), col("be")), 3).as("z"))
      .head().getLong(0)
    assert(z === 39L)
  }

  test("interleave is a bijection on the full bucket grid") {
    // every (bu, be) in [0,16)^2 maps to a distinct z in [0, 256)
    val grid = (for (bu <- 0L until 16L; be <- 0L until 16L)
      yield (bu, be)).toDF("bu", "be")
    val zs = grid.select(Layout.interleave(Seq(col("bu"), col("be")), 4))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 256)
    assert(zs.min === 0L && zs.max === 255L)
  }

  test("zorderBy: buckets cover, z_bin is the z prefix, partitioning-invariant") {
    val df = (0 until 4096).map { i =>
      (i.toLong, ((i * 2654435761L) % 1000) + 50, (i * 3L) + 7)
    }.toDF("id", "x", "y")
    val z = Layout.zorderBy(df, Seq("x", "y"), bits = 8, log2Bins = 4)
    val rows = z.select("id", "z_value", "z_bin").collect()
    assert(rows.length === 4096)
    rows.foreach { r =>
      val (zv, zb) = (r.getLong(1), r.getLong(2))
      assert(zv >= 0 && zv < (1L << 16))
      assert(zb === (zv >> 12))
    }
    val again = Layout.zorderBy(df.repartition(16), Seq("x", "y"), 8, 4)
      .select("id", "z_value").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getLong(1)))
  }

  test("z-order bins bound BOTH dimensions' spans; a 1-d sort does not") {
    // uniform 64x64 grid: every (x, y) cell once
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val z = Layout.zorderBy(grid, Seq("x", "y"), bits = 6, log2Bins = 4)
    val spans = Layout.binStats(z, "z_bin", Seq("x", "y"))
      .select(max(col("x_max") - col("x_min")),
        max(col("y_max") - col("y_min"))).head()
    // 16 z-bins over a 12-bit z-space: each bin is a 16x16 tile (the top
    // 4 interleaved bits fix 2 x-bits and 2 y-bits)
    assert(spans.getLong(0) === 15L)
    assert(spans.getLong(1) === 15L)
    // same data laid out by x alone: y spans stay the full range
    val linear = grid.withColumn("bin", shiftright(col("x"), 2)) // 16 bins
    val linSpan = Layout.binStats(linear, "bin", Seq("x", "y"))
      .select(max(col("y_max") - col("y_min"))).head().getLong(0)
    assert(linSpan === 63L)
  }

  test("skippingAudit matches a driver-side reference on the grid") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val z = Layout.zorderBy(grid, Seq("x", "y"), 6, 4)
      .withColumnRenamed("z_bin", "bin")
    val preds = Seq("x_band" -> Seq(Some((10L, 20L)), None),
      "y_band" -> Seq(None, Some((0L, 5L))))
    val got = Layout.skippingAudit(Seq("zorder" -> z), "bin",
        Seq("x", "y"), preds)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // reference: recompute bin boxes by hand
    val bins = z.select("bin", "x", "y").collect()
      .groupBy(_.getLong(0)).view.mapValues { rs =>
        (rs.map(_.getLong(1)).min, rs.map(_.getLong(1)).max,
          rs.map(_.getLong(2)).min, rs.map(_.getLong(2)).max)
      }.toMap
    val xHit = bins.values.count { case (xmn, xmx, _, _) =>
      xmn <= 20 && xmx >= 10 }
    val yHit = bins.values.count { case (_, _, ymn, ymx) =>
      ymn <= 5 && ymx >= 0 }
    assert(got(("zorder", "x_band")) === (bins.size.toLong, xHit.toLong))
    assert(got(("zorder", "y_band")) === (bins.size.toLong, yHit.toLong))
    // and the pruning is real: a 16x16-tiled 64x64 grid has 16 bins, an
    // 11-wide x band touches 2 of 4 x-tile columns = 8 bins
    assert(got(("zorder", "x_band"))._2 === 8L)
  }

  test("writeClustered + prunedRead: directory pruning bites, result exact") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val path = Files.createTempDirectory("zlayout").toString
    Layout.writeClustered(grid, Seq("x", "y"), bits = 6, log2Bins = 4, path)
    val bounds = Seq(("x", 10L, 20L), ("y", 0L, 63L))
    val pruned = Layout.prunedRead(spark, path, bounds)
    // collect THIS DataFrame (a .select would execute a different
    // QueryExecution and leave pruned's scan metrics at zero)
    val got = pruned.collect().map(_.getAs[Long]("id")).toSet
    val want = grid.filter(col("x").between(10, 20))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the scan touched fewer files than the layout holds (8/16 bins)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val total = spark.read.parquet(s"$path/data").inputFiles.length
    val scanned = scans(pruned.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned > 0 && scanned < total,
      s"scan read $scanned of $total files — no directory pruning")
  }

  test("zorderByQuantiles balances exponential skew that min-max cells cannot") {
    // 20 distinct values 2^0..2^19, ~equal mass each: min-max 64-cell
    // widths put the 14 smallest values (70% of rows) into cell 0
    val df = (0 until 10000).map(i => (i.toLong, 1L << (i % 20)))
      .toDF("id", "sk")
    def maxShare(binned: org.apache.spark.sql.DataFrame): Double =
      binned.groupBy("z_bin").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0) / 10000.0
    val mm = maxShare(Layout.zorderBy(df, Seq("sk"), 6, 6))
    val qt = maxShare(Layout.zorderByQuantiles(df, Seq("sk"), 6, 6))
    assert(mm >= 0.5, s"min-max should degenerate, max share $mm")
    assert(qt <= 0.2, s"quantile cells should balance, max share $qt")
    // every bucket stays inside the bit budget
    val zmax = Layout.zorderByQuantiles(df, Seq("sk"), 6, 6)
      .agg(max("z_value")).head().getLong(0)
    assert(zmax < (1L << 6))
  }

  test("mergeClustered: frozen bucket law, exact reads, associative stats") {
    import java.nio.file.Files
    val a = (for (x <- 0 until 64; y <- 0 until 64; if x < 48)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    // delta includes out-of-range values (x up to 80) that must clamp
    val b = (for (x <- 40 until 81; y <- 0 until 8)
      yield (100000L + x * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val path = Files.createTempDirectory("zmerge").toString
    Layout.writeClustered(a, Seq("x", "y"), bits = 6, log2Bins = 4, path)
    Layout.mergeClustered(spark, path, b)
    // reads over the merged layout are exact, including the clamped tail
    val got = Layout.prunedRead(spark, path, Seq(("x", 44L, 90L)))
      .collect().map(_.getAs[Long]("id")).toSet
    val want = a.unionByName(b).filter(col("x").between(44, 90))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got === want)
    // stats re-merge is exact: equals stats recomputed from scratch over
    // the union under the SAME frozen law (a's min/max, clamped)
    val stats = spark.read.parquet(s"$path/stats")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val all = spark.read.parquet(s"$path/data")
    val fresh = Layout.binStats(all, "z_bin", Seq("x", "y"))
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("x_min"), r.getAs[Long]("x_max"),
          r.getAs[Long]("y_min"), r.getAs[Long]("y_max"))).toMap
    assert(stats === fresh)
  }
}
