package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins: correlate two live streams (e.g. change
  * events with their delivery acknowledgements) within a bounded event-time
  * window, with watermarks on BOTH sides so join state is provably bounded.
  *
  * Spark's stream-stream join buffers each side's rows as state until the
  * other side's watermark passes the join condition's time bound; without
  * the interval condition + watermarks the state grows forever. This
  * wrapper encodes that discipline once:
  *  - both inputs get `withWatermark(ts, delay)`;
  *  - the join condition is `leftKey = rightKey AND rightTs ∈ [leftTs,
  *    leftTs + tolerance]` — the interval bound that lets Spark expire
  *    state as watermarks advance (state per key ≈ tolerance + delay of
  *    data, independent of stream lifetime).
  *
  * Inner joins emit as soon as both sides arrive; `leftOuter` additionally
  * emits unmatched left rows AFTER the right watermark passes their
  * interval (a "timed out without ack" signal — the reference's
  * publish-then-await-callback pattern, client.js ack correlation).
  */
object StreamJoin {

  def eventTimeJoin(left: DataFrame, right: DataFrame, key: String,
                    leftTs: String, rightTs: String,
                    tolerance: String, watermarkDelay: String,
                    joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond: Column =
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $tolerance")
    l.join(r, cond, joinType)
  }
}
