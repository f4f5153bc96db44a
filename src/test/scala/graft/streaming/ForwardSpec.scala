package graft.streaming

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Flaky wrapper: the FIRST send of every chunkId throws; retries delegate.
  * Attempt counts live in a static map — executors share the JVM in local
  * mode, so the spec can observe them.
  */
object FlakyRegistry {
  val attempts: TrieMap[String, Int] = TrieMap.empty
  def clear(): Unit = attempts.clear()
}

class FlakyTransport(inner: ForwardTransport) extends ForwardTransport {
  override def send(chunkId: String, events: Seq[String]): Unit = {
    val n = FlakyRegistry.attempts.updateWith(chunkId) {
      case Some(k) => Some(k + 1); case None => Some(1)
    }.get
    if (n == 1) throw new RuntimeException(s"transient failure for $chunkId")
    inner.send(chunkId, events)
  }
}

class ForwardSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int) =
    (0 until n).map(i => (s"k${i % 7}", i.toLong, s"payload-$i"))
      .toDF("sfId", "replayId", "data")

  private def landedLines(dir: String): Seq[(String, Seq[String])] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.startsWith("chunk-")).sortBy(_.getName)
      .toSeq.map { f =>
        (f.getName,
          scala.io.Source.fromFile(f).getLines().toSeq)
      }
  }

  test("forwardBatch delivers every event exactly once, ordered per key") {
    val dir = Files.createTempDirectory("fwd").toString
    val t = Forward.dirTransport(spark, dir, "s3cret", "s3cret")
    Forward.forwardBatch(events(100), batchId = 0, t, "sfId", "replayId",
      chunkSize = 8)
    val lines = landedLines(dir).flatMap(_._2)
    assert(lines.size === 100)
    val parsed = spark.read.json(lines.toDS())
      .select("sfId", "replayId").as[(String, Long)].collect()
    assert(parsed.toSet === (0 until 100).map(i => (s"k${i % 7}", i.toLong)).toSet)
    // per-key order: within the name-ordered chunk stream of one partition,
    // a key's replayIds must be increasing
    val byFileOrder = landedLines(dir).flatMap { case (name, ls) =>
      val pid = name.split("-")(2)
      ls.map(l => (pid, l))
    }
    val offsetsByKeyPart = byFileOrder
      .map { case (pid, l) =>
        val df = spark.read.json(Seq(l).toDS()).select("sfId", "replayId")
          .as[(String, Long)].head()
        ((pid, df._1), df._2)
      }
    offsetsByKeyPart.groupBy(_._1).values.foreach { grp =>
      val offs = grp.map(_._2)
      assert(offs === offs.sorted, s"per-key delivery out of order: $offs")
    }
  }

  test("transient send failures retry and converge (T7 on the forward path)") {
    FlakyRegistry.clear()
    val dir = Files.createTempDirectory("fwd_flaky").toString
    val t = new FlakyTransport(Forward.dirTransport(spark, dir, "s", "s"))
    Forward.forwardBatch(events(40), batchId = 7, t, "sfId", "replayId",
      chunkSize = 10, retryBaseDelayMs = 10)
    val lines = landedLines(dir).flatMap(_._2)
    assert(lines.size === 40)
    // every chunk needed exactly 2 attempts (1 failure + 1 success)
    assert(FlakyRegistry.attempts.values.forall(_ == 2),
      FlakyRegistry.attempts.toString)
  }

  test("a bad shared secret is a permanent failure after exhausted retries") {
    val dir = Files.createTempDirectory("fwd_auth").toString
    val t = Forward.dirTransport(spark, dir, "wrong", "right")
    val ex = intercept[Exception] {
      Forward.forwardBatch(events(5), batchId = 1, t, "sfId", "replayId",
        retryAttempts = 2, retryBaseDelayMs = 5)
    }
    assert(ex.getMessage != null)
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.startsWith("chunk-")), "nothing may land on auth failure")
  }

  test("token bucket meters events, sleeps out deficits, refills capped (T8)") {
    RateLimitedTransport.reset()
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    RateLimitedTransport.nanoTime = () => now
    RateLimitedTransport.sleep = ms => sleeps += ms
    try {
      // capacity 10, rate 5/s: a full burst passes free
      RateLimitedTransport.acquire("k", 5.0, 10.0, 10)
      assert(sleeps.isEmpty)
      // 5 more with an empty bucket -> wait 5/5 = 1s
      RateLimitedTransport.acquire("k", 5.0, 10.0, 5)
      assert(sleeps.toSeq === Seq(1000L))
      // 3 s later the bucket holds min(10, -5 + 15) = 10: burst passes free
      now = 3L * 1000 * 1000 * 1000
      RateLimitedTransport.acquire("k", 5.0, 10.0, 10)
      assert(sleeps.toSeq === Seq(1000L))
    } finally {
      RateLimitedTransport.nanoTime = () => System.nanoTime()
      RateLimitedTransport.sleep = Thread.sleep
      RateLimitedTransport.reset()
    }
  }

  test("rate-limited transport delivers through the inner transport") {
    RateLimitedTransport.reset()
    val dir = Files.createTempDirectory("fwd_rl").toString
    val t = new RateLimitedTransport(
      Forward.dirTransport(spark, dir, "s", "s"), "rl-spec",
      ratePerSec = 1e6, capacity = 1e6)
    Forward.forwardBatch(events(30), batchId = 3, t, "sfId", "replayId",
      chunkSize = 10)
    assert(landedLines(dir).flatMap(_._2).size === 30)
  }

  test("streaming forward: checkpointed end-to-end delivery") {
    val log = Files.createTempDirectory("fwd_log").toString
    val ckpt = Files.createTempDirectory("fwd_ckpt").toString
    val out = Files.createTempDirectory("fwd_out").toString
    events(60).write.mode("overwrite").parquet(log)
    val t = Forward.dirTransport(spark, out, "s", "s")
    val q = Forward.start(spark,
      spark.readStream.schema(events(1).schema).parquet(log),
      t, ckpt, chunkSize = 16)
    q.awaitTermination()
    assert(landedLines(out).flatMap(_._2).size === 60)
  }
}
