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

/** In-process HTTP receiver for [[HttpForwardTransport]] specs. Records
  * every request thread-safely (partitions POST in parallel) and can 503
  * the first `failFirst` attempts of each chunk id.
  */
object HttpReceiver {
  import java.net.InetSocketAddress

  import com.sun.net.httpserver.HttpServer

  final case class Req(seq: Int, chunkId: String, secret: String,
                       body: String, status: Int)

  def start(expectedSecret: String, failFirst: Int = 0)
      : (HttpServer, java.util.List[Req]) = {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Req]())
    val attempts = TrieMap.empty[String, Int]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/receive", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      val chunkId = exchange.getRequestHeaders.getFirst("X-Chunk-Id")
      val secret = exchange.getRequestHeaders.getFirst("X-Webhook-Secret")
      val n = attempts.updateWith(chunkId) {
        case Some(k) => Some(k + 1); case None => Some(1)
      }.get
      val status =
        if (secret != expectedSecret) 401
        else if (n <= failFirst) 503
        else 200
      received.synchronized {
        received.add(Req(received.size(), chunkId, secret, body, status))
      }
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    (server, received)
  }

  def endpoint(server: HttpServer): String =
    s"http://127.0.0.1:${server.getAddress.getPort}/receive"
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

  private val eventRe = """\{"sfId":"(k\d+)","replayId":(\d+)[,}]""".r

  test("HTTP transport: chunked POSTs carry secret + chunk id, ordered per key") {
    import scala.jdk.CollectionConverters._
    val (server, received) = HttpReceiver.start("hush")
    try {
      val t = new HttpForwardTransport(HttpReceiver.endpoint(server), "hush")
      Forward.forwardBatch(events(60), batchId = 2, t, "sfId", "replayId",
        chunkSize = 8)
      val reqs = received.asScala.toSeq.sortBy(_.seq)
      assert(reqs.nonEmpty && reqs.forall(_.secret == "hush"))
      val all = reqs.flatMap(r =>
        eventRe.findAllMatchIn(r.body).map(m => (m.group(1), m.group(2).toLong)))
      assert(all.size == 60)
      assert(all.toSet === (0 until 60).map(i => (s"k${i % 7}", i.toLong)).toSet)
      // a key lives in ONE partition whose chunks POST sequentially, so the
      // key's replayIds must increase in arrival order
      all.groupBy(_._1).values.foreach { grp =>
        val offs = grp.map(_._2)
        assert(offs == offs.sorted, s"per-key HTTP delivery out of order: $offs")
      }
    } finally server.stop(0)
  }

  test("HTTP transport: 503 responses retry with backoff and converge") {
    import scala.jdk.CollectionConverters._
    val (server, received) = HttpReceiver.start("s", failFirst = 1)
    try {
      val t = new HttpForwardTransport(HttpReceiver.endpoint(server), "s")
      Forward.forwardBatch(events(40), batchId = 9, t, "sfId", "replayId",
        chunkSize = 10, retryBaseDelayMs = 10)
      val byChunk = received.asScala.toSeq.groupBy(_.chunkId)
      assert(byChunk.nonEmpty)
      assert(byChunk.values.forall(g =>
        g.count(_.status == 503) == 1 && g.count(_.status == 200) == 1),
        byChunk.view.mapValues(_.map(_.status)).toMap.toString)
    } finally server.stop(0)
  }

  test("HTTP transport: auth rejection fails loudly; rate limit composes") {
    import scala.jdk.CollectionConverters._
    val (server, received) = HttpReceiver.start("right")
    try {
      val bad = new HttpForwardTransport(HttpReceiver.endpoint(server), "wrong")
      intercept[Exception] {
        Forward.forwardBatch(events(5), batchId = 1, bad, "sfId", "replayId",
          retryAttempts = 2, retryBaseDelayMs = 5)
      }
      assert(received.asScala.nonEmpty && received.asScala.forall(_.status == 401))
      received.clear()
      RateLimitedTransport.reset()
      val limited = new RateLimitedTransport(
        new HttpForwardTransport(HttpReceiver.endpoint(server), "right"),
        "http-rl-spec", ratePerSec = 1e6, capacity = 1e6)
      Forward.forwardBatch(events(30), batchId = 3, limited, "sfId", "replayId",
        chunkSize = 10)
      val delivered = received.asScala.toSeq.filter(_.status == 200)
        .flatMap(r => eventRe.findAllMatchIn(r.body)).size
      assert(delivered == 30)
    } finally server.stop(0)
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
