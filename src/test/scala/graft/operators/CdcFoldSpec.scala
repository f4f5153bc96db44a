package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC-replay golden tests (SURVEY §5.2 item 4 / FIXTURES A.5): duplicate
  * replayIds, out-of-order arrival, DELETE-then-reCREATE — final state must
  * match a latest-wins replay regardless of arrival order.
  */
class CdcFoldSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // (replayId, sfId, changeType, value)
    (1L, "a", "CREATE", "v1"),
    (2L, "a", "UPDATE", "v2"),
    (2L, "a", "UPDATE", "v2"), // duplicate delivery (at-least-once, T6)
    (5L, "b", "CREATE", "b1"),
    (7L, "b", "DELETE", null),
    (4L, "c", "CREATE", "c1"),
    (6L, "c", "DELETE", null),
    (9L, "c", "CREATE", "c2"), // re-create after delete
    (3L, "a", "UPDATE", "v3-late") // out-of-order: lower replayId arrives last
  ).toDF("replayId", "sfId", "changeType", "value")

  test("fold: latest-wins + delete-through, order-insensitive") {
    val result = CdcFold.fold(log.orderBy(rand(42)), col("sfId"),
        col("replayId"), col("changeType"))
      .select("sfId", "replayId", "value").as[(String, Long, String)]
      .collect().sortBy(_._1)
    assert(result.toSeq == Seq(("a", 3L, "v3-late"), ("c", 9L, "c2")))
  }

  test("latestWinsAgg: hash-agg twin equals the window form on unique offsets") {
    // the duplicate replayId rows are identical payloads, so even though
    // max_by_row tie-breaking is a byte order the outputs must still agree
    // here; keys with genuinely unique offsets are the documented contract
    val win = CdcFold.latestWins(log, col("sfId"), col("replayId"))
      .select("sfId", "replayId", "changeType", "value")
    val agg = CdcFold.latestWinsAgg(log, col("sfId"), col("replayId"))
      .select("sfId", "replayId", "changeType", "value")
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
    assert(agg.count() === 3) // one row per key
  }

  test("mergeBatch applies a change batch over a snapshot (S8/S9)") {
    val target = Seq(("a", "old-a"), ("b", "old-b"), ("z", "keep-z"))
      .toDF("sfId", "value")
    val changes = log
    val merged = CdcFold.mergeBatch(target, changes, "sfId", "replayId", "changeType")
      .as[(String, String)].collect().sortBy(_._1)
    // a updated to latest, b deleted, c inserted (re-created), z untouched
    assert(merged.toSeq == Seq(("a", "v3-late"), ("c", "c2"), ("z", "keep-z")))
  }

  test("latestWins keeps exactly one row per key") {
    val lw = CdcFold.latestWins(log, col("sfId"), col("replayId"))
    assert(lw.groupBy("sfId").count().filter(col("count") > 1).count() == 0)
  }
}
