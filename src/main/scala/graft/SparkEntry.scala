package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CoreQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the declared query set
  * ([[graft.queries.CoreQueries]], SURVEY §2.9 Q1–Q16 + CDC codec checks)
  * and the training-data pipeline operators
  * ([[graft.queries.PipelineQueries]]: dedup, similarity search, text
  * analysis, multimodal plumbing).
  */
object SparkEntry {

  private val allDefs = CoreQueries.defs ++ PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join with broadcast dims + exact-decimal aggregation — the shape
    * the engine is optimized for.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand", "s_name")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose output is
    * implementation-defined (HLL sketches, approximate ANN). */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
