package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

/** Owner of the intermediate `.cache()`s an operator acquires.
  *
  * Several dedup operators cache intermediates that feed their result plan
  * more than once (shingle sets, band postings). The result is lazy, so the
  * operator itself cannot know when it is safe to unpersist — a caller that
  * invokes such an operator repeatedly (a micro-batch loop, a bench harness)
  * would otherwise accumulate orphaned cached RDDs in executor storage for
  * the session's lifetime.
  *
  * Callers that consume results eagerly create a scope, pass it to the
  * operator, and `close()` it after the result is materialized. The default
  * [[CacheScope.unmanaged]] reproduces plain `.cache()` semantics (cache for
  * the session, never tracked) — right for interactive reuse of the same
  * lazy result.
  */
final class CacheScope private (track: Boolean) {
  private val acquired = ArrayBuffer.empty[Dataset[_]]

  /** Cache `ds` and, in a tracking scope, register it for release. */
  def own[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    if (track) synchronized { acquired += ds }
    ds
  }

  /** Unpersist every owned cache (non-blocking). Idempotent. */
  def close(): Unit = synchronized {
    acquired.foreach(_.unpersist(blocking = false))
    acquired.clear()
  }
}

object CacheScope {
  /** A tracking scope: the caller owns the unpersist. */
  def apply(): CacheScope = new CacheScope(true)

  /** Session-lifetime caches — never tracked, never released. */
  val unmanaged: CacheScope = new CacheScope(false)
}
