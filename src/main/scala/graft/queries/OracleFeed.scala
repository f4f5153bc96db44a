package graft.queries

import org.apache.spark.sql.DataFrame

/** Artifact feed for the cross-engine oracle: declared queries whose
  * ranking math runs against LEARNED index state (LSH buckets, k-means
  * centroids, PQ codebooks) publish that state as small parquet tables,
  * and their DuckDB oracle reads it back with `read_parquet` — so the
  * PROBE math (candidate selection, scoring, ranking, rerank) is
  * hash-oracled end-to-end while build correctness stays with the recall
  * audits (the build itself — xxhash64 seeding, distributed Lloyd — is
  * not SQL-expressible, which is exactly why these queries were
  * rows-only before the feed existed).
  *
  * Isolation (round 15, the ADVICE item): the feed root is PER-USER and
  * PER-JVM (`/tmp/graft-oracle-feed-<user>/run-<pid>-<startMillis>`),
  * not a fixed shared path. `SparkEntry.oracleSql` strings only need to
  * be constant WITHIN one Verify/Bench invocation — the driver runs
  * Verify to completion (publishing feeds and dumping the SQL, nonce'd
  * paths embedded) before its DuckDB pass reads either — so a per-JVM
  * nonce keeps the publish/read pairing exact while making interference
  * impossible: a concurrent Verify/Bench (or another user on a shared
  * host) writes under its own run dir, and a query that fails before
  * publishing leaves NO feed at this run's path — the oracle fails
  * loudly on a missing file instead of silently reading a stale
  * artifact from a prior run at a possibly different SF.
  *
  * This is correctness-gate plumbing, not a production surface: the
  * write is a coalesced single file of at most corpus-row size (bucket
  * maps) and usually geometry-bounded (centroids, codebooks). Run dirs
  * older than a day are swept at first use (best-effort) so repeated
  * gate runs don't accumulate in /tmp.
  */
object OracleFeed {
  private val userRoot = {
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-oracle-feed-$user"
  }

  /** This JVM's feed root — stable for the life of the process, distinct
    * across processes. */
  val Root: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    sweepStale()
    s"$userRoot/run-${rt.getName.takeWhile(_ != '@')}-${rt.getStartTime}"
  }

  /** Best-effort removal of run dirs from DEAD JVMs: >24 h old by the
    * startMillis embedded in the dir name (no filesystem mtime
    * dependence) AND the embedded pid no longer alive (`/proc/<pid>`
    * check — a >24 h Verify/Bench that is still mid-suite keeps its
    * feeds; POSIX delete would otherwise succeed under it and its
    * oracle pass would read nothing). Where /proc is unavailable the
    * age rule alone applies. Failures are ignored. */
  private[queries] def sweepStale(): Unit = try {
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val procfs = new java.io.File("/proc").isDirectory
    def alive(pid: String): Boolean =
      procfs && pid.nonEmpty && new java.io.File(s"/proc/$pid").exists()
    val kids = new java.io.File(userRoot).listFiles()
    if (kids != null) kids.foreach { d =>
      // dir name shape: run-<pid>-<startMillis>
      val parts = d.getName.split("-")
      val started = parts.lastOption.flatMap(_.toLongOption)
      val pid = if (parts.length >= 3) parts(1) else ""
      if (started.exists(_ < cutoff) && !alive(pid)) deleteRecursively(d)
    }
  } catch { case _: Exception => () }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
  }

  private def dir(query: String, table: String) = s"$Root/$query/$table"

  /** Publish-once mode (r15 verdict item 3): with it ON, a (query,
    * table) pair that this JVM already published is NOT re-written —
    * [[graft.Bench]] enables it AFTER its untimed plan-audit pass (which
    * invokes every query lambda once, paying every feed write outside
    * the timers), so the 14 fed queries' timed samples stop carrying a
    * `coalesce(1)` parquet write + read-back that belongs to the
    * correctness gate, not the query. Sound because feeds are
    * deterministic in (spark, sfDir), both fixed for a bench run. OFF by
    * default: Verify runs each query once (nothing to memoize) and specs
    * legitimately re-publish different content under one key.
    */
  private val publishOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val alreadyPublished =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[graft] def enablePublishOnce(): Unit = publishOnce.set(true)

  // test hook: the switch is one-way JVM-global by design (Bench owns the
  // JVM), but a spec exercising it must restore the default or it would
  // silently break later suites' legitimate re-publishes
  private[graft] def resetPublishOnceForTest(): Unit = {
    publishOnce.set(false)
    alreadyPublished.clear()
  }

  /** Drop a query's feed tables from the publish-once memo, so its next
    * publish writes again. [[graft.Bench]] calls this when a query THROWS
    * during the untimed plan-audit pass: that query may have published
    * only some of its tables at the target SF (the rest still hold the
    * warmup SF's content), and memoizing that mixed state would freeze it
    * for the timed samples. */
  private[graft] def invalidate(query: String): Unit = {
    val it = alreadyPublished.iterator()
    while (it.hasNext) if (it.next().startsWith(query + "/")) it.remove()
  }

  /** Publish one feed table (overwrite); a no-op for keys already
    * published by this JVM when publish-once mode is on. */
  def publish(query: String, table: String, df: DataFrame): Unit = {
    val key = s"$query/$table"
    if (!(publishOnce.get && alreadyPublished.contains(key))) {
      df.coalesce(1).write.mode("overwrite").parquet(dir(query, table))
      alreadyPublished.add(key)
      ()
    }
  }

  /** The `read_parquet('…')` operand for this feed table, for oracle
    * SQL construction. */
  def sqlPath(query: String, table: String): String =
    s"read_parquet('${dir(query, table)}/*.parquet')"

  /** Read a just-published feed table back. For queries whose RESULT
    * consumes the fed artifact (e.g. fed thresholds applied to every
    * row): reading the published parquet guarantees the engine result
    * and the oracle saw byte-identical values, and skips recomputing
    * the artifact's lineage. */
  def readBack(spark: org.apache.spark.sql.SparkSession, query: String,
               table: String): DataFrame =
    spark.read.parquet(dir(query, table))
}
