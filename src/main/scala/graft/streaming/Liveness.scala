package graft.streaming

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Keepalive / liveness watchdog (T5) — the Spark-native rendering of the
  * reference's subscription keepalive loop (`client.js:846-871`: the server
  * emits periodic keepalives carrying `latestReplayId`; the worker tracks
  * the last receipt and tears down + reconnects a silent subscription).
  *
  * In Structured Streaming the driver's trigger loop IS the keepalive
  * cycle: every trigger polls the source (`reportLatestOffset`) and emits a
  * progress event even when zero rows arrived — exactly a keepalive
  * receipt. This monitor is a `StreamingQueryListener` that records, per
  * query name:
  *   - the wall time of the last progress (the keepalive receipt time),
  *   - the batch id, cumulative input rows, and
  *   - the source-reported latest offset (the keepalive's `latestReplayId`).
  *
  * [[deadQueries]] flags queries silent past a timeout (reference default:
  * 2.5× the keepalive interval); [[superviseOnce]] invokes a restart
  * callback for each — with checkpointed queries a restart resumes from the
  * committed offset, the same recovery the reference's reconnect performs.
  *
  * Driver-side by design: listener events are driver-local and the state is
  * O(#queries) — this is control-plane, not data-plane.
  */
class LivenessMonitor extends StreamingQueryListener {
  import LivenessMonitor.Heartbeat

  private val beats = TrieMap.empty[String, Heartbeat]
  private val mapper = new ObjectMapper()

  private def parseReplayId(offsetJson: String): Option[Long] =
    try {
      val n = mapper.readTree(offsetJson)
      if (n != null && n.has("replayId")) Some(n.get("replayId").asLong()) else None
    } catch { case _: Exception => None }

  /** Unnamed queries have a null `name`; key those on the stable query id
    * instead (a null key would NPE inside the listener bus and silently
    * disable the watchdog for every unnamed ingest query).
    */
  private def keyOf(name: String, id: java.util.UUID): String =
    if (name != null) name else id.toString

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    beats.put(keyOf(event.name, event.id),
      Heartbeat(System.currentTimeMillis(), -1L, 0L, None))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val key = keyOf(p.name, p.id)
    val latest = p.sources.headOption
      .flatMap(s => Option(s.latestOffset)).flatMap(parseReplayId)
    val prevRows = beats.get(key).map(_.inputRows).getOrElse(0L)
    beats.put(key,
      Heartbeat(System.currentTimeMillis(), p.batchId,
        prevRows + p.numInputRows, latest))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Last keepalive receipt for a query name, if any. */
  def heartbeat(name: String): Option[Heartbeat] = beats.get(name)

  /** Receipt injection for tests/manual wiring. */
  private[streaming] def record(name: String, hb: Heartbeat): Unit =
    beats.put(name, hb)

  /** Names whose last receipt is older than `timeoutMillis` — dead
    * subscriptions needing a reconnect.
    */
  def deadQueries(nowMillis: Long, timeoutMillis: Long): Seq[String] =
    beats.collect {
      case (name, hb) if hb.atMillis < nowMillis - timeoutMillis => name
    }.toSeq.sorted

  /** One supervision sweep: restart every dead query via `restart` and
    * refresh its heartbeat (so one sweep restarts a query once, not on
    * every subsequent sweep). Returns the names restarted.
    */
  def superviseOnce(nowMillis: Long, timeoutMillis: Long)
                   (restart: String => Unit): Seq[String] = {
    val dead = deadQueries(nowMillis, timeoutMillis)
    dead.foreach { name =>
      restart(name)
      beats.put(name, Heartbeat(System.currentTimeMillis(), -1L, 0L, None))
    }
    dead
  }
}

object LivenessMonitor {
  /** One keepalive receipt. Companion-scoped (not an inner class) so the
    * pattern-matchable type carries no outer-instance reference.
    */
  final case class Heartbeat(atMillis: Long, batchId: Long, inputRows: Long,
                             latestReplayId: Option[Long])
}

object Liveness {
  /** Install a monitor on the session's listener bus. */
  def install(spark: SparkSession): LivenessMonitor = {
    val m = new LivenessMonitor
    spark.streams.addListener(m)
    m
  }

  def uninstall(spark: SparkSession, m: LivenessMonitor): Unit =
    spark.streams.removeListener(m)
}
