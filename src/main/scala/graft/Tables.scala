package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver test tables (`TESTDATA.md`).
  *
  * All reads are plain parquet scans so Catalyst's pushdown/pruning applies.
  * `events.ts` has shipped in two physical layouts across testdata
  * generations — parquet TIMESTAMP(NANOS) (readable only as INT64 via
  * `legacy.parquet.nanosAsLong`) and native TIMESTAMP(MICROS). The loader
  * dispatches on the dtype it actually reads, so either layout normalizes to
  * the same microsecond TIMESTAMP_NTZ column (the truncation DuckDB applies
  * on read) and event-time operators and the oracle agree.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Harmless for native-timestamp files; required to read NANOS files at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize `ts` to microsecond TIMESTAMP_NTZ regardless of source layout. */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => // NANOS read as epoch-nanos long: truncate ns -> us
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet dtype $other (expected INT64 nanos or timestamp)")
    }

  /** Fan a NARROW scan out to the session's parallelism before a
    * CPU-dense per-row kernel (image decode, tokenizer, hash features).
    *
    * The driver testdata ships each table as ONE parquet row group, and a
    * row group is the unit of scan splitting — so every scan is a single
    * task regardless of split-size configs, and a per-row kernel behind
    * it runs serial on a 32-core session (guide §2.5's "one huge
    * unsplittable file" input-skew case; its fix — "repartition
    * immediately after the read" — is exactly this). CONDITIONAL so it is
    * scale-inert: when the scan already has at least half the session's
    * parallelism (any real multi-file corpus at 100 TB), this is a no-op
    * and no shuffle is added. Hash-partitioning on `key` (never
    * round-robin) keeps row placement content-deterministic and skips
    * the sort-before-repartition a keyless repartition pays.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df else df.repartition(p, key)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
