package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader robustness: the driver regenerates `/root/testdata` between rounds
  * and has already switched `events.ts` from parquet TIMESTAMP(NANOS) to
  * native TIMESTAMP(MICROS) once (round 8 lost 21 queries to it). These
  * specs pin the loader's behavior on BOTH layouts and pin the dtypes every
  * query assumes, so the next regeneration shows up as a red spec, not a
  * zeroed round.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val usec = 1723500000123456L // arbitrary epoch-micros instant

  /** Write a tiny events file with `ts` as epoch-nanos INT64 — the dtype
    * Spark yields for TIMESTAMP(NANOS) parquet under `nanosAsLong`.
    */
  private def writeLongLayout(dir: String): Unit =
    Seq((usec * 1000L + 789L, 1L), (usec * 1000L, 2L)) // sub-us noise on row 1
      .toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  /** Write the same instants with `ts` as a native NTZ timestamp column. */
  private def writeTimestampLayout(dir: String): Unit = {
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("event_id", LongType)))
    val rows = Seq(
      Row(java.time.LocalDateTime.ofEpochSecond(
        usec / 1000000L, ((usec % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), 1L),
      Row(java.time.LocalDateTime.ofEpochSecond(
        usec / 1000000L, ((usec % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), 2L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader yields identical NTZ micros on nanos-long and native-timestamp layouts") {
    val longDir = Files.createTempDirectory("graft_ev_long").toString
    val tsDir = Files.createTempDirectory("graft_ev_ts").toString
    writeLongLayout(longDir)
    writeTimestampLayout(tsDir)

    val a = Tables.events(spark, longDir).orderBy("event_id")
    val b = Tables.events(spark, tsDir).orderBy("event_id")
    assert(a.schema("ts").dataType == TimestampNTZType)
    assert(b.schema("ts").dataType == TimestampNTZType)

    val av = a.select(unix_micros(col("ts").cast(TimestampType)), $"event_id")
      .as[(Long, Long)].collect().toSeq
    val bv = b.select(unix_micros(col("ts").cast(TimestampType)), $"event_id")
      .as[(Long, Long)].collect().toSeq
    // nanos layout truncates sub-microsecond noise; both land on `usec`
    assert(av == Seq((usec, 1L), (usec, 2L)))
    assert(av == bv)
  }

  test("events loader rejects an unusable ts dtype instead of failing downstream") {
    val dir = Files.createTempDirectory("graft_ev_bad").toString
    Seq(("2024-01-01", 1L)).toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet dtype"))
  }

  test("live testdata: every table loads with the dtypes the queries assume") {
    def dtypes(name: String): Map[String, DataType] =
      Tables.load(spark, sfDir, name).schema.fields
        .map(f => f.name -> f.dataType).toMap

    val ev = dtypes("events")
    assert(ev("ts") == TimestampNTZType, s"events.ts was ${ev("ts")}")
    assert(ev.contains("event_id") || ev.nonEmpty)

    // Columns the CoreQueries cast/aggregate paths depend on, pinned loosely
    // (exact decimal widths are normalized by dec(...) casts in the queries).
    val dateish: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    val li = dtypes("lineitem")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(li(c).isInstanceOf[NumericType], s"lineitem.$c was ${li(c)}")
    assert(dateish(li("l_shipdate")), s"l_shipdate was ${li("l_shipdate")}")

    val ord = dtypes("orders")
    assert(ord("o_totalprice").isInstanceOf[NumericType])
    assert(dateish(ord("o_orderdate")), s"o_orderdate was ${ord("o_orderdate")}")

    val docs = dtypes("documents")
    assert(docs("text") == StringType, s"documents.text was ${docs("text")}")

    val emb = dtypes("embeddings")
    assert(emb.values.exists {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"embeddings has no float-array column: $emb")
  }
}
