package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning — the knob that decides how
  * much of a 100 TB table a selective query has to READ. Parquet/ORC
  * readers skip whole files and row groups whose footer min/max stats
  * exclude a predicate; a single-column sort gives that skipping to ONE
  * column and destroys it for every other. Z-ORDER clustering (Morton
  * order — the bit-interleaved space-filling curve Delta's
  * OPTIMIZE ZORDER BY and Iceberg's sort orders use) makes every written
  * file a small hyper-rectangle in the layout columns' joint space, so
  * range predicates on ANY clustered column prune most files.
  *
  * Determinism contract (these queries are driver-oracled, so every
  * step must be bit-replicable in SQL):
  *  - per-dimension buckets use POWER-OF-TWO cell widths over the exact
  *    integer [min,max]: `bucket = (x - min) >> shift` with `shift` the
  *    smallest s where `range+1 <= 2^s * 2^bits` — integer-only, no
  *    float log/quantile anywhere, so Spark and the oracle agree at
  *    every boundary. (Range partitioning on sampled quantiles — the
  *    production default for SKEWED dimensions — trades this exactness
  *    for balance; the bucket law here is the oracle-friendly variant
  *    and the right one for roughly-uniform keys.)
  *  - the z-value interleaves bucket bits LSB-first, earlier layout
  *    columns at the more-significant position within each bit group;
  *  - a "file" is a fixed-width z-prefix bin (`z >> (d*bits - log2Bins)`)
  *    — what a size-targeted writer (`Curation.packShards`) would cut,
  *    made deterministic. Bins can be UNEVEN under skew (the power-of-two
  *    trade documented above); [[skippingAudit]] reports per-bin rows so
  *    imbalance is visible, not hidden.
  *
  * Scale shape: one exact min/max aggregate per layout column (map-side
  * combined, 2·d longs to the driver — planning state), then the z-value
  * is a per-row projection of shifts/masks (whole-stage codegen'd
  * built-ins, no UDF, no custom expression needed); the physical
  * clustering itself is `repartitionByRange(z_bin)` + per-partition sort
  * at write time. Nothing here shuffles except that final write.
  */
object Layout {

  /** Smallest shift giving at most `2^bits` power-of-two-width cells
    * over `[minV, maxV]`; integer-only, so any engine reproduces it.
    */
  def shiftFor(minV: Long, maxV: Long, bits: Int): Int = {
    require(maxV >= minV, s"empty range [$minV, $maxV]")
    require(bits > 0 && bits <= 31, s"bits out of range: $bits")
    // s+bits stays <= 62: the shift target can't overflow a signed long
    (0 to (62 - bits)).find(s => maxV - minV + 1 <= (1L << (s + bits))).get
  }

  /** Morton interleave of per-dimension buckets (each < 2^bits):
    * bit i of column j lands at position `i*d + (d-1-j)` — LSB groups
    * first, earlier columns more significant within a group. Pure
    * shift/mask built-ins: stays inside whole-stage codegen.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "need at least one layout column")
    val d = buckets.size
    // JVM shiftleft masks the shift count mod 64: at d·bits > 63 the
    // high bit-groups would silently WRAP onto low positions (colliding
    // z-values, wrong bins, no error) — refuse instead. Every zorder*
    // entry point funnels through here, so this guards them all.
    require(d * bits <= 63,
      s"$d columns x $bits bits = ${d * bits} z-bits > 63: a 64-bit " +
        "Morton code cannot hold them; lower bits or split the layout")
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + (d - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /** Exact per-column (min, max) — ONE aggregate pass, 2·d longs of
    * planning state to the driver.
    */
  def columnRanges(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    // cast in the aggregate, not the driver: "integral" includes int /
    // smallint columns, and an uncast min(int) would make the getLong
    // below throw an opaque ClassCastException
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
  }

  /** `df` + `z_value` (interleaved Morton code) + `z_bin` (the
    * deterministic "file": top `log2Bins` bits of the z-value). Layout
    * columns must be integral and non-null.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int,
               log2Bins: Int): DataFrame = {
    require(log2Bins > 0 && log2Bins <= cols.size * bits,
      s"log2Bins $log2Bins out of range for ${cols.size} cols x $bits bits")
    val ranges = columnRanges(df, cols)
    val buckets = cols.zip(ranges).map { case (c, (mn, mx)) =>
      shiftright(col(c) - lit(mn), shiftFor(mn, mx, bits))
    }
    df.withColumn("z_value", interleave(buckets, bits))
      .withColumn("z_bin",
        shiftright(col("z_value"), cols.size * bits - log2Bins))
  }

  /** Per-bin footer stats a z-layout write would produce: rows plus each
    * dimension's min/max. `binCol` names the file column; output columns
    * are `bin, n_rows, <dim>_min, <dim>_max ...`.
    */
  def binStats(df: DataFrame, binCol: String, dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    df.groupBy(col(binCol).as("bin")).agg(aggs.head, aggs.tail: _*)
  }

  /** Skew-robust variant: per-dimension buckets from KLL QUANTILE
    * boundaries (equal-POPULATION cells) instead of equal-width cells —
    * the production choice when a layout column is Zipf/exponential and
    * min-max cells would dump most of the corpus into one bin (pruning
    * dies with the balance). The trade is exactness: sketch boundaries
    * are approximate and run-varying, so this path forfeits the bit
    * oracle [[zorderBy]] has and is verified by the BALANCE AUDIT
    * (`ns_layout_skew_audit`) instead — max bin share bounded under
    * quantile bucketing, provably degenerate under min-max on the same
    * data. Boundary extraction is one KLL aggregate per column (a few KB
    * of planning state); duplicates collapse so heavy singleton values
    * share one cell rather than faking balance.
    */
  def zorderByQuantiles(df: DataFrame, cols: Seq[String], bits: Int,
                        log2Bins: Int): DataFrame =
    zorderWithQuantileBounds(df, cols,
      quantileBounds(df, cols, bits), bits, log2Bins)

  /** The learned per-column bucket boundaries alone (one KLL pass, ≤
    * 2^bits−1 doubles per column of planning state) — split out so
    * callers can materialize or publish the boundaries (the OracleFeed
    * path) and re-apply them with [[zorderWithQuantileBounds]]. */
  def quantileBounds(df: DataFrame, cols: Seq[String],
                     bits: Int): Seq[Array[Double]] = {
    val nb = 1 << bits
    val sketchRow = df.agg(
      graft.functions.kll_agg(col(cols.head).cast("double")).as("s0"),
      cols.tail.zipWithIndex.map { case (c, i) =>
        graft.functions.kll_agg(col(c).cast("double")).as(s"s${i + 1}") }: _*)
      .head()
    cols.indices.map { i =>
      val qs = graft.functions.KllKernels
        .deserialize(sketchRow.getAs[Array[Byte]](i))
      (1 until nb).map(j => qs.getQuantile(j.toDouble / nb))
        .distinct.sorted.toArray
    }
  }

  /** Z-order against PRE-LEARNED quantile boundaries. */
  def zorderWithQuantileBounds(df: DataFrame, cols: Seq[String],
                               bounds: Seq[Array[Double]], bits: Int,
                               log2Bins: Int): DataFrame = {
    require(log2Bins > 0 && log2Bins <= cols.size * bits,
      s"log2Bins $log2Bins out of range for ${cols.size} cols x $bits bits")
    val buckets = cols.indices.map { i =>
      // bucket = #boundaries <= x (counting scan over the tiny literal
      // boundary array — codegen'd, no join)
      aggregate(typedLit(bounds(i)), lit(0L),
        (acc, b) => acc + when(col(cols(i)).cast("double") >= b, 1L)
          .otherwise(0L))
    }
    df.withColumn("z_value", interleave(buckets, bits))
      .withColumn("z_bin",
        shiftright(col("z_value"), cols.size * bits - log2Bins))
  }

  /** Physically cluster and write: `repartitionByRange(z_bin)` + an
    * in-partition sort by the full z-value, emitted as a
    * `z_bin=K/`-partitioned parquet layout under `path/data` with the
    * per-bin footer stats ([[binStats]]) materialized once under
    * `path/stats` (≤ 2^log2Bins rows — planning state, like the IVF
    * centroid table). The sort means even WITHIN a bin's files, parquet
    * row-group min/max stats stay tight on every layout column.
    */
  def writeClustered(df: DataFrame, cols: Seq[String], bits: Int,
                     log2Bins: Int, path: String): Unit = {
    val law = lawFor(df, cols, bits, log2Bins)
    val z = zorderWith(df, law, clamp = false)
    z.repartitionByRange(col("z_bin"))
      .sortWithinPartitions("z_value")
      .write.partitionBy("z_bin").mode("overwrite").parquet(s"$path/data")
    binStats(z, "z_bin", cols).write.mode("overwrite").parquet(s"$path/stats")
    // the bucket law frozen at first write — what incremental merges must
    // reuse, or their z-values land in a different space
    writeMeta(df.sparkSession, path, law)
  }

  /** The frozen bucket law of a clustered layout: what `path/meta`
    * persists and every incremental writer must reuse.
    */
  case class LayoutLaw(cols: Seq[String], mins: Seq[Long], shifts: Seq[Int],
                       bits: Int, log2Bins: Int)

  /** Derive a fresh law from the data's exact ranges. */
  def lawFor(df: DataFrame, cols: Seq[String], bits: Int,
             log2Bins: Int): LayoutLaw = {
    val ranges = columnRanges(df, cols)
    LayoutLaw(cols, ranges.map(_._1),
      cols.zip(ranges).map { case (_, (mn, mx)) => shiftFor(mn, mx, bits) },
      bits, log2Bins)
  }

  def writeMeta(spark: org.apache.spark.sql.SparkSession, path: String,
                law: LayoutLaw): Unit = {
    import spark.implicits._
    law.cols.indices.map { i =>
      (i, law.cols(i), law.mins(i), law.shifts(i), law.bits, law.log2Bins)
    }.toDF("pos", "col", "min", "shift", "bits", "log2bins")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def readMeta(spark: org.apache.spark.sql.SparkSession,
               path: String): LayoutLaw = {
    val meta = spark.read.parquet(s"$path/meta").orderBy("pos").collect()
    LayoutLaw(meta.map(_.getAs[String]("col")).toSeq,
      meta.map(_.getAs[Long]("min")).toSeq,
      meta.map(_.getAs[Int]("shift")).toSeq,
      meta.head.getAs[Int]("bits"), meta.head.getAs[Int]("log2bins"))
  }

  /** z-value + z_bin under an EXPLICIT bucket law (`clamp` pins
    * out-of-range newcomers to the edge cells so they stay inside the
    * original z-space) — the shared core of [[writeClustered]] (fresh
    * law), [[mergeClustered]], and the streaming maintainer.
    */
  private[graft] def zorderWith(df: DataFrame, law: LayoutLaw,
                                clamp: Boolean): DataFrame =
    zorderWith(df, law.cols, law.mins, law.shifts, law.bits, law.log2Bins,
      clamp)

  private def zorderWith(df: DataFrame, cols: Seq[String], mins: Seq[Long],
                         shifts: Seq[Int], bits: Int, log2Bins: Int,
                         clamp: Boolean): DataFrame = {
    val buckets = cols.indices.map { i =>
      val raw = shiftright(col(cols(i)) - lit(mins(i)), shifts(i))
      if (clamp) least(greatest(raw, lit(0L)), lit((1L << bits) - 1)) else raw
    }
    df.withColumn("z_value", interleave(buckets, bits))
      .withColumn("z_bin",
        shiftright(col("z_value"), cols.size * bits - log2Bins))
  }

  /** Incrementally merge new rows into an existing clustered layout:
    * the FROZEN bucket law from `path/meta` places newcomers in the same
    * z-space (out-of-range values clamp to edge cells — their bins' stats
    * widen honestly, pruning just gets weaker there), data appends in the
    * same `z_bin=K/` directories, and the stats table re-merges
    * associatively (min/min, max/max, rows+rows — exact, the
    * mergeable-summaries shape). Same economics as `Bm25Index.merge`:
    * O(delta) work, never a rewrite of the resident layout.
    */
  def mergeClustered(spark: org.apache.spark.sql.SparkSession,
                     path: String, df: DataFrame): Unit = {
    val law = readMeta(spark, path)
    val cols = law.cols
    val z = zorderWith(df, law, clamp = true)
    z.repartitionByRange(col("z_bin"))
      .sortWithinPartitions("z_value")
      .write.partitionBy("z_bin").mode("append").parquet(s"$path/data")
    // stats re-merge: both sides are <= 2^log2Bins rows — planning state
    val aggs = sum(col("n_rows")).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(s"${c}_min")).as(s"${c}_min"),
        max(col(s"${c}_max")).as(s"${c}_max")))
    val merged = spark.read.parquet(s"$path/stats")
      .unionByName(binStats(z, "z_bin", cols))
      .groupBy("bin").agg(aggs.head, aggs.tail: _*)
      .collect()
    val schema = spark.read.parquet(s"$path/stats").schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(merged.toIndexedSeq, 1), schema)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Read a clustered layout under a per-dimension bound box, touching
    * only the bins whose stats intersect it: the stats table (tiny)
    * selects candidate bins driver-side, the `z_bin IN (...)` predicate
    * prunes DIRECTORIES at planning time (asserted via scan metrics in
    * LayoutSpec), and the residual bound filter runs only over surviving
    * files. This is the read path the skipping numbers in
    * `ns_layout_skip_audit` model.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
                 bounds: Seq[(String, Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "need at least one bound")
    val stats = spark.read.parquet(s"$path/stats")
    val hit = bounds.map { case (c, lo, hi) =>
      col(s"${c}_min") <= lit(hi) && col(s"${c}_max") >= lit(lo)
    }.reduce(_ && _)
    val bins = stats.filter(hit).select("bin").collect().map(_.getLong(0))
    spark.read.parquet(s"$path/data")
      .filter(col("z_bin").isin(bins.toIndexedSeq.map(Long.box): _*))
      .filter(bounds.map { case (c, lo, hi) =>
        col(c) >= lit(lo) && col(c) <= lit(hi)
      }.reduce(_ && _))
  }

  /** How many "files" a min/max-pruning reader must scan per layout for
    * each predicate box: one row per (layout, predicate) with the bin
    * totals. `layouts` maps a layout name to a binned DataFrame;
    * `predicates` maps a predicate name to per-dim `[lo, hi]` bounds
    * (None = unconstrained dim). A bin is HIT when every constrained
    * dim's [min,max] intersects its bound — exactly the parquet
    * row-group pruning rule.
    */
  def skippingAudit(layouts: Seq[(String, DataFrame)], binCol: String,
                    dims: Seq[String],
                    predicates: Seq[(String, Seq[Option[(Long, Long)]])]): DataFrame = {
    val stats = layouts.map { case (name, df) =>
      binStats(df, binCol, dims).withColumn("layout", lit(name))
    }.reduce(_ unionByName _)
    val perPred = predicates.map { case (pname, bounds) =>
      val hit = dims.zip(bounds).collect { case (dim, Some((lo, hi))) =>
        col(s"${dim}_min") <= lit(hi) && col(s"${dim}_max") >= lit(lo)
      }.reduceOption(_ && _).getOrElse(lit(true))
      stats.groupBy("layout").agg(
        count(lit(1)).as("bins_total"),
        sum(when(hit, 1L).otherwise(0L)).as("bins_hit"))
        .withColumn("predicate", lit(pname))
    }
    perPred.reduce(_ unionByName _)
      .select("layout", "predicate", "bins_total", "bins_hit")
  }
}
