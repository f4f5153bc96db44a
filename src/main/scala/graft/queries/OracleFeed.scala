package graft.queries

import org.apache.spark.sql.DataFrame

/** Artifact feed for the cross-engine oracle: declared queries whose
  * ranking math runs against LEARNED index state (LSH buckets, k-means
  * centroids, PQ codebooks) publish that state as small parquet tables at
  * a FIXED path, and their DuckDB oracle reads it back with
  * `read_parquet` — so the PROBE math (candidate selection, scoring,
  * ranking, rerank) is hash-oracled end-to-end while build correctness
  * stays with the recall audits (the build itself — xxhash64 seeding,
  * distributed Lloyd — is not SQL-expressible, which is exactly why these
  * queries were rows-only before the feed existed).
  *
  * The path is a compile-time constant because `SparkEntry.oracleSql`
  * strings are static: the feed cannot vary with the sf directory.
  * Instead, every Verify/Bench invocation of a feeding query OVERWRITES
  * its feed with the artifacts of THAT run before the driver's DuckDB
  * pass reads them — the driver runs Verify to completion first, so the
  * oracle always sees the artifacts the engine result came from. This is
  * correctness-gate plumbing, not a production surface: the write is a
  * coalesced single file of at most corpus-row size (bucket maps) and
  * usually geometry-bounded (centroids, codebooks).
  */
object OracleFeed {
  val Root = "/tmp/graft-oracle-feed"

  private def dir(query: String, table: String) = s"$Root/$query/$table"

  /** Publish one feed table (overwrite) and return the input unchanged
    * so call sites can feed mid-pipeline. */
  def publish(query: String, table: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(dir(query, table))

  /** The `read_parquet('…')` operand for this feed table, for oracle
    * SQL construction. */
  def sqlPath(query: String, table: String): String =
    s"read_parquet('${dir(query, table)}/*.parquet')"

  /** Read a just-published feed table back. For queries whose RESULT
    * consumes the fed artifact (e.g. fed thresholds applied to every
    * row): reading the published parquet guarantees the engine result
    * and the oracle saw byte-identical values, and skips recomputing
    * the artifact's lineage. */
  def readBack(spark: org.apache.spark.sql.SparkSession, query: String,
               table: String): DataFrame =
    spark.read.parquet(dir(query, table))
}
