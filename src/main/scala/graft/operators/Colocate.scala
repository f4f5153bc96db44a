package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Co-located equi-joins via Spark's native bucketed-table layout — the
  * shuffle-elimination contract for the engine's MATERIALIZED tables.
  *
  * The streaming MERGE sink already lays its state out in key-hash buckets
  * (`CdcIngest`: `__bucket = pmod(xxhash64(key), N)` partition dirs) so
  * per-batch upserts touch only dirty buckets. That layout is private to
  * the sink; this utility is the complementary ANALYTICAL layout: tables a
  * user materializes for repeated key-joins (entity snapshots, signal
  * tables keyed by doc id, feature tables keyed by record id) are written
  * `bucketBy(N, key)` into the session catalog, and a join of two tables
  * bucketed the same way satisfies both sides' required distribution from
  * the FILES — Catalyst plans a sort-merge join with NO Exchange on either
  * side (asserted in ColocateSpec). At 100 TB that turns the dominant cost
  * of every recurring key-join — two full shuffles — into zero; the price
  * is paid once at write time, exactly like the reference's per-topic
  * indexed tables (`setup.md:922-928` — indexes paid on write, served on
  * read).
  *
  * [[join]] fails loud on layout mismatch (different bucket counts or
  * keys) instead of silently planning shuffles — a mis-bucketed 100 TB
  * join should be a deploy-time error, not a 2× cost surprise.
  */
object Colocate {

  /** Materialize `df` as a managed table bucketed (and per-file sorted) by
    * `keyCol`. One-time write cost; every subsequent same-layout key-join
    * reads shuffle-free.
    */
  def materialize(df: DataFrame, table: String, keyCol: String,
                  numBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)

  private def bucketSpecOf(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"table $table is not bucketed — co-located join impossible"))

  /** Join two same-layout bucketed tables on their bucket key. Verifies
    * layout compatibility from catalog metadata and fails loud on
    * mismatch; the resulting plan shuffles neither side.
    */
  def join(spark: SparkSession, left: String, right: String,
           how: String = "inner"): DataFrame = {
    val ls = bucketSpecOf(spark, left)
    val rs = bucketSpecOf(spark, right)
    require(ls.numBuckets == rs.numBuckets,
      s"bucket counts differ: $left=${ls.numBuckets}, $right=${rs.numBuckets}" +
        " — rewrite one side (bucket counts must match for co-location)")
    require(ls.bucketColumnNames == rs.bucketColumnNames,
      s"bucket keys differ: $left=${ls.bucketColumnNames}, " +
        s"$right=${rs.bucketColumnNames}")
    // key TYPES must match too: same-named keys of different types would
    // pass the name check, then Catalyst inserts a cast on one side whose
    // hash no longer agrees with the file layout — and plans an Exchange,
    // silently voiding the contract this helper exists to enforce
    val lt = spark.table(left)
    val rt = spark.table(right)
    val mismatched = ls.bucketColumnNames.filter { c =>
      lt.schema(c).dataType != rt.schema(c).dataType
    }
    require(mismatched.isEmpty,
      s"bucket key types differ on ${mismatched.mkString(", ")}: " +
        mismatched.map(c => s"$left.$c=${lt.schema(c).dataType.simpleString} vs " +
          s"$right.$c=${rt.schema(c).dataType.simpleString}").mkString("; ") +
        " — a cast would force an Exchange; rewrite one side with matching types")
    lt.join(rt, ls.bucketColumnNames, how)
  }
}
