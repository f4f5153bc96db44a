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
