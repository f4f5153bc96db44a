package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Event-time tumbling-window aggregation over a stream — the STREAMING
  * twin of the batch `groupBy(window(ts, width))` shape (T11: q14 proves
  * the batch form; this runs the same aggregate through Structured
  * Streaming's watermark + windowed-state machinery, the engine's Spark
  * mapping for the reference's periodic ingest metrics, `setup.md`).
  *
  * APPEND output mode: a window's row is emitted exactly once, when the
  * WATERMARK (max observed event time minus `delay`) passes the window
  * end — i.e. when the window can no longer change. Rows later than the
  * watermark are dropped by contract; the sink only ever holds FINAL
  * window aggregates, so redelivered/restarted runs cannot emit a window
  * twice (exactly-once via the checkpoint + file-sink manifest).
  *
  * Finite replays (AvailableNow over a file log) have the standard
  * append-mode caveat: the LAST windows only flush once some event
  * advances the watermark past their end. Callers replaying a bounded
  * log append a watermark-advancing sentinel event (strictly later than
  * `maxTs + width + delay`) as the final file and filter its key back
  * out — the `ns_streaming_audit` leg and the spec both do exactly this.
  *
  * Aggregates are additive (count + exact-decimal sums, the
  * [[MaterializedAgg]] convention), so partial aggregation combines
  * map-side before the one keyed shuffle; state size is O(open windows ×
  * keys), independent of stream length. At 100 TB-scale ingest the state
  * store bounds memory by watermark horizon — exactly the posture a
  * 1000-executor cluster needs.
  */
object EventTimeWindow {

  /** Watermark event time must be TIMESTAMP (Spark rejects TIMESTAMP_NTZ,
    * `EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`); the engine's event tables
    * carry NTZ micros (see [[graft.Tables.events]]). Under the session's
    * pinned UTC zone the cast is a pure reinterpretation — no wall-clock
    * shift — and BOTH the streamed and batch sides apply it, so the two
    * outputs stay bit-comparable.
    */
  private def withEventTime(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("__ts", col(tsCol).cast(TimestampType))

  /** The one windowed-aggregate expression BOTH sides share — the streamed
    * and batch plans must stay bit-comparable, so the grouping, the
    * decimal-sum convention, and the flattening live in exactly one place.
    * `slide` = `width` is a tumbling window; a shorter slide assigns each
    * row to `width/slide` overlapping windows (Spark's epoch-aligned
    * convention), which APPEND mode still emits exactly once per window
    * as the watermark passes each end.
    */
  private def windowed(df: DataFrame, keyCols: Seq[String],
                       valueCols: Seq[String], width: String,
                       slide: String): DataFrame =
    df.groupBy(window(col("__ts"), width, slide).as("__w") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(v =>
          sum(col(v).cast(DecimalType(28, 6))).as(s"sum_$v")): _*)
      .select(col("__w.start").as("w_start") +: col("__w.end").as("w_end") +:
        (keyCols.map(col) ++ (col("cnt") +: valueCols.map(v => col(s"sum_$v")))): _*)

  /** Flattened windowed aggregate of `stream`: one row per closed
    * (`w_start`, `w_end`, key) with `cnt` and `sum_<v>` columns.
    */
  def aggregate(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                valueCols: Seq[String], width: String,
                delay: String, slide: String = ""): DataFrame =
    windowed(withEventTime(stream, tsCol).withWatermark("__ts", delay),
      keyCols, valueCols, width, if (slide.isEmpty) width else slide)

  /** Start the checkpointed append-mode stream into a parquet sink. */
  def start(spark: SparkSession, stream: DataFrame, tsCol: String,
            keyCols: Seq[String], valueCols: Seq[String], width: String,
            delay: String, outDir: String, checkpointDir: String,
            availableNow: Boolean = true, slide: String = ""): StreamingQuery = {
    val writer = aggregate(stream, tsCol, keyCols, valueCols, width, delay, slide)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The batch reference: the identical aggregate computed by one
    * `groupBy(window(...))` over the full log — what the streamed sink
    * must equal once every window has flushed.
    */
  def batchReference(log: DataFrame, tsCol: String, keyCols: Seq[String],
                     valueCols: Seq[String], width: String,
                     slide: String = ""): DataFrame =
    windowed(withEventTime(log, tsCol), keyCols, valueCols, width,
      if (slide.isEmpty) width else slide)
}
