package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** flatMapGroupsWithState latest-wins: per-key state, replay-ID
  * monotonicity across micro-batches, delete tombstones.
  */
class StatefulLatestWinsSpec extends SparkSpec {

  test("stateful fold keeps max-replayId per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[ChangeEvent]
    val out = StatefulLatestWins.fold(input.toDS())
    val q = out.writeStream.format("memory").queryName("lw_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", Files.createTempDirectory("lw").toString)
      .start()

    input.addData(
      ChangeEvent("a", 1, "CREATE", "v1"),
      ChangeEvent("a", 3, "UPDATE", "v3"),
      ChangeEvent("b", 2, "CREATE", "b1"))
    q.processAllAvailable()

    input.addData(
      ChangeEvent("a", 2, "UPDATE", "stale"), // below current replayId: ignored
      ChangeEvent("b", 4, "DELETE", null),    // tombstone
      ChangeEvent("c", 5, "CREATE", "c1"))
    q.processAllAvailable()

    val rows = spark.table("lw_out").as[KeyedState].collect()
    // batch 1 emits a@3, b@2; batch 2 emits b@4 tombstone + c@5 (a@2 ignored)
    assert(rows.map(r => (r.sfId, r.replayId, r.data)).toSet == Set(
      ("a", 3L, "v3"), ("b", 2L, "b1"), ("b", 4L, null), ("c", 5L, "c1")))
    q.stop()
  }

  test("delete tombstone blocks resurrection by a redelivered older upsert") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[ChangeEvent]
    val q = StatefulLatestWins.fold(input.toDS())
      .writeStream.format("memory").queryName("lw_tomb")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", Files.createTempDirectory("lw_tomb").toString)
      .start()

    input.addData(ChangeEvent("a", 5, "DELETE", null))
    q.processAllAvailable()
    // at-least-once redelivery of an OLDER upsert after the delete: the
    // tombstone's replay-ID watermark must reject it (setup.md:542)
    input.addData(ChangeEvent("a", 3, "UPDATE", "stale"))
    q.processAllAvailable()

    val rows = spark.table("lw_tomb").as[KeyedState].collect()
    assert(rows.map(r => (r.sfId, r.replayId, r.data)).toSet ==
      Set(("a", 5L, null)))
    q.stop()
  }
}
