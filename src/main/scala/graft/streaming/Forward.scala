package graft.streaming

import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.SerializableConfiguration

/** Transport behind the forward sink: one `send` delivers one bounded chunk
  * of JSON events — the shape of a single authenticated HTTP POST to a
  * downstream receiver (the reference forwards decoded events to an HTTP
  * action with a shared secret, `index.ts:44-71`, `setup.md:1084-1115`).
  *
  * `chunkId` is stable across retries and micro-batch redeliveries of the
  * same chunk, so an idempotent receiver can key duplicate suppression on
  * it — the same contract the reference gets from (sfId, replayId) upserts.
  *
  * Implementations are instantiated on the DRIVER and shipped to executors
  * (must be serializable); sends run per-partition on executors, in
  * parallel across partitions.
  */
trait ForwardTransport extends Serializable {
  def send(chunkId: String, events: Seq[String]): Unit
}

/** File-landing transport: each chunk lands atomically (temp + rename) as
  * one file `chunk-<chunkId>.jsonl` — the local stand-in for an HTTP
  * endpoint (no network egress in this environment; an HTTP transport is a
  * drop-in `ForwardTransport` with an HTTP client in `send`). Idempotent:
  * a redelivered chunk overwrites the same file. A non-matching `secret`
  * fails every attempt, modeling an auth rejection (non-transient).
  */
class DirForwardTransport(dir: String, secret: String,
                          expectedSecret: String,
                          conf: SerializableConfiguration)
  extends ForwardTransport {
  override def send(chunkId: String, events: Seq[String]): Unit = {
    if (secret != expectedSecret)
      throw new SecurityException(s"forward rejected: bad shared secret")
    val fs = new Path(dir).getFileSystem(conf.value)
    val tmp = new Path(dir, s".chunk-$chunkId.tmp")
    val out = fs.create(tmp, true)
    try events.foreach { e => out.write((e + "\n").getBytes(StandardCharsets.UTF_8)) }
    finally out.close()
    val dest = new Path(dir, s"chunk-$chunkId.jsonl")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(tmp, dest)
  }
}

/** HTTP transport: POSTs each chunk to `endpoint` as a JSON array body,
  * authenticated by a shared secret sent with every request (the
  * reference forwards each decoded event to its backend action together
  * with `webhookSecret`, `index.ts:49-54`; here the secret rides the
  * `X-Webhook-Secret` header so the body stays the bare event array).
  * The chunk id rides in `X-Chunk-Id`, giving an idempotent receiver its
  * deduplication key for redeliveries.
  *
  * Any non-2xx response throws, handing delivery to the caller's
  * retry/backoff wrapper (T7): a 503 from a struggling receiver gets
  * retried with backoff, an auth rejection keeps failing loudly — the
  * reference logs-and-drops on forward failure (`index.ts:56-59`, with a
  * TODO for retry/DLQ); this sink upgrades that to real retries plus the
  * fail-loud batch abort that makes the checkpoint redeliver.
  *
  * The client is per-JVM-instance (`@transient lazy`), so executors reuse
  * connections across sends instead of serializing driver state.
  */
class HttpForwardTransport(endpoint: String, secret: String,
                           connectTimeoutMs: Long = 5000,
                           requestTimeoutMs: Long = 30000)
  extends ForwardTransport {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    .build()

  override def send(chunkId: String, events: Seq[String]): Unit = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .header("X-Webhook-Secret", secret)
      .header("X-Chunk-Id", chunkId)
      .POST(HttpRequest.BodyPublishers.ofString(
        events.mkString("[", ",", "]"), StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"forward POST chunk $chunkId -> " +
        s"HTTP ${resp.statusCode()}: ${String.valueOf(resp.body()).take(200)}")
  }
}

/** Token-bucket rate limit on the forward path (T8) — the reference's
  * `ingestEvents` limiter (`setup.md:989-1002`: rate 50/min, capacity 100,
  * over-limit requests wait `retryAfter`). Wraps any [[ForwardTransport]]:
  * each send acquires one token per EVENT (the reference meters events,
  * not requests), blocking until the bucket refills — backpressure to the
  * producing micro-batch, which is exactly where the reference applies its
  * 429+retryAfter loop.
  *
  * One bucket per JVM (executor), lazily keyed by `bucketKey`: with E
  * executors the aggregate send rate is ≤ E·ratePerSec, so size the rate
  * for per-executor share on a cluster (same reasoning as the reference's
  * 4-shard fixed-window limiter, which also multiplies by shard count).
  * `nanoTime`/`sleep` are injectable for deterministic tests.
  */
class RateLimitedTransport(inner: ForwardTransport, bucketKey: String,
                           ratePerSec: Double, capacity: Double)
  extends ForwardTransport {
  override def send(chunkId: String, events: Seq[String]): Unit = {
    RateLimitedTransport.acquire(bucketKey, ratePerSec, capacity, events.size)
    inner.send(chunkId, events)
  }
}

object RateLimitedTransport {
  private final class Bucket(var tokens: Double, var lastNanos: Long)
  private val buckets = TrieMap.empty[String, Bucket]

  // injectable clock/sleeper for tests
  @volatile private[streaming] var nanoTime: () => Long = () => System.nanoTime()
  @volatile private[streaming] var sleep: Long => Unit = Thread.sleep

  private[streaming] def reset(): Unit = buckets.clear()

  /** Blocking token acquisition: refill at `ratePerSec` up to `capacity`,
    * take `n`, sleeping out any deficit (the `retryAfter` wait).
    */
  def acquire(key: String, ratePerSec: Double, capacity: Double, n: Int): Unit = {
    val b = buckets.getOrElseUpdate(key, new Bucket(capacity, nanoTime()))
    val waitMs = b.synchronized {
      val now = nanoTime()
      b.tokens = math.min(capacity,
        b.tokens + (now - b.lastNanos) / 1e9 * ratePerSec)
      b.lastNanos = now
      b.tokens -= n
      if (b.tokens >= 0) 0L else math.ceil(-b.tokens / ratePerSec * 1000).toLong
    }
    if (waitMs > 0) sleep(waitMs)
  }
}

/** Forward sink (S7): stream events to a downstream consumer through a
  * [[ForwardTransport]], at-least-once, ordered per key.
  *
  * Spark-native rendering of the reference's worker → HTTP forward loop:
  * where the reference POSTs one event at a time from a single process,
  * this sink repartitions the micro-batch by key — all events of a key land
  * in one partition, sorted by replay offset, so a key's events are
  * delivered in order within the batch (the reference's per-topic serial
  * ordering) — then ships bounded chunks per partition, each chunk wrapped
  * in the T7 retry/backoff policy. Delivery is at-least-once end-to-end:
  * a crashed batch is redelivered by the checkpoint and chunk ids repeat,
  * so receivers deduplicate on `chunkId` (or (key, offset), like the
  * reference's upsert receiver).
  *
  * Scale shape: no driver-side iteration — the only shuffle is the key
  * repartition (which also bounds per-receiver concurrency to the partition
  * count), and chunking is a per-partition iterator walk.
  */
object Forward {

  /** Forward one (micro-)batch. Exposed for `foreachBatch` composition.
    * Chunk ids are zero-padded so receivers can reconstruct delivery order
    * from ids alone.
    */
  def forwardBatch(batch: DataFrame, batchId: Long, transport: ForwardTransport,
                   key: String, offset: String, chunkSize: Int = 100,
                   retryAttempts: Int = 4, retryBaseDelayMs: Long = 500): Unit = {
    val ordered = batch.repartition(col(key))
      .sortWithinPartitions(col(key), col(offset))
    ordered.toJSON.foreachPartition { (it: Iterator[String]) =>
      val pid = TaskContext.getPartitionId()
      it.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
        Retry.withBackoff(attempts = retryAttempts,
          baseDelayMs = retryBaseDelayMs) {
          transport.send(f"$batchId%d-$pid%05d-$i%05d", chunk)
        }
      }
    }
  }

  /** Start the forwarding stream: checkpointed, at-least-once. */
  def start(spark: org.apache.spark.sql.SparkSession, stream: DataFrame,
            transport: ForwardTransport, checkpointDir: String,
            key: String = "sfId", offset: String = "replayId",
            chunkSize: Int = 100, availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        forwardBatch(batch, batchId, transport, key, offset, chunkSize)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Convenience: a [[DirForwardTransport]] carrying the session's Hadoop
    * conf (so executors resolve the same filesystem the driver does).
    */
  def dirTransport(spark: org.apache.spark.sql.SparkSession, dir: String,
                   secret: String, expectedSecret: String): DirForwardTransport =
    new DirForwardTransport(dir, secret, expectedSecret,
      new SerializableConfiguration(
        new Configuration(spark.sparkContext.hadoopConfiguration)))
}
