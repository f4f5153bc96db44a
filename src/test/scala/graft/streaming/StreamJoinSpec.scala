package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("stream-stream interval join correlates events with in-window acks") {
    val evDir = Files.createTempDirectory("sj_ev").toString + "/data"
    val ackDir = Files.createTempDirectory("sj_ack").toString + "/data"
    val ckpt = Files.createTempDirectory("sj_ckpt").toString

    val events = Seq(
      ("k1", ts(0)), ("k2", ts(10)), ("k3", ts(20))
    ).toDF("key", "ev_ts")
    val acks = Seq(
      ("k1", ts(3)),   // in window (tolerance 5s)
      ("k2", ts(40)),  // too late: outside [10, 15]
      ("k3", ts(19))   // BEFORE the event: no match
    ).toDF("key", "ack_ts")
    events.write.parquet(evDir)
    acks.write.parquet(ackDir)

    val joined = StreamJoin.eventTimeJoin(
      spark.readStream.schema(events.schema).parquet(evDir),
      spark.readStream.schema(acks.schema).parquet(ackDir),
      key = "key", leftTs = "ev_ts", rightTs = "ack_ts",
      tolerance = "5 SECONDS", watermarkDelay = "10 SECONDS")

    val q = joined.select(col("l.key"), col("ack_ts"))
      .writeStream.format("memory").queryName("sj_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sj_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(got == Set(("k1", ts(3))))
  }

  test("streaming inner join agrees with the equivalent batch join") {
    val evDir = Files.createTempDirectory("sj_ev2").toString + "/data"
    val ackDir = Files.createTempDirectory("sj_ack2").toString + "/data"
    val ckpt = Files.createTempDirectory("sj_ckpt2").toString

    val events = (0L until 50L).map(i => (s"k${i % 10}", ts(i))).toDF("key", "ev_ts")
    val acks = (0L until 50L).map(i => (s"k${i % 10}", ts(i + i % 4))).toDF("key", "ack_ts")
    events.write.parquet(evDir)
    acks.write.parquet(ackDir)

    val q = StreamJoin.eventTimeJoin(
      spark.readStream.schema(events.schema).parquet(evDir),
      spark.readStream.schema(acks.schema).parquet(ackDir),
      "key", "ev_ts", "ack_ts", "3 SECONDS", "10 SECONDS")
      .select(col("l.key"), col("ev_ts"), col("ack_ts"))
      .writeStream.format("memory").queryName("sj_out2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val batch = events.as("l").join(acks.as("r"),
      col("l.key") === col("r.key") &&
        col("ack_ts") >= col("ev_ts") &&
        col("ack_ts") <= col("ev_ts") + expr("INTERVAL 3 SECONDS"))
      .select(col("l.key"), col("ev_ts"), col("ack_ts"))

    val streamed = spark.table("sj_out2")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
