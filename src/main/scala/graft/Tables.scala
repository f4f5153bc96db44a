package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver test tables (`TESTDATA.md`).
  *
  * All reads are plain parquet scans so Catalyst's pushdown/pruning applies;
  * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark only reads
  * via `legacy.parquet.nanosAsLong` — we normalize it to microsecond
  * TIMESTAMP_NTZ (same truncation DuckDB applies on read) so event-time
  * operators and the oracle agree.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // ns -> us truncation, then NTZ timestamp (session TZ is UTC everywhere).
    raw.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
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
