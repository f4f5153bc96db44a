package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Content-addressed catalog of materialized index directories (the LSH ANN
  * index, the IVF inverted lists, …). An index is a derived artifact: build
  * it ONCE per (input data version, build parameters) and let every
  * subsequent query probe the existing layout — rebuilding per query throws
  * away exactly the amortization that makes a materialized index worth its
  * write cost (the reference keeps materialized per-topic tables for the
  * same reason, `setup.md`: objects are upserted into tables once, then
  * served to every reader).
  *
  * Identity: an index location is `root/<kind>-<key>` where `key` hashes the
  * build parameters plus a fingerprint of the input files (path, length,
  * modification time from a FileSystem listing — no data scan). Any change
  * to the inputs changes the key, so a stale index is never served; it is
  * simply a different (absent) catalog entry, and the old one ages out with
  * the cache root.
  *
  * Build protocol (crash- and race-safe, same discipline as
  * [[graft.streaming.CdcIngest]]'s staged bucket swap):
  *  1. build into `root/.staging-<uuid>` (dot-prefixed: Spark/Hadoop
  *     listings ignore it);
  *  2. atomically rename to the final location;
  *  3. if the rename fails because a concurrent builder won the race, drop
  *     the staging dir and serve the winner's — both were built from
  *     identical inputs, so the artifacts are interchangeable.
  * A crashed build leaves only an ignored staging dir, never a half-visible
  * index.
  */
object IndexCatalog {

  /** Root for cached indexes; overridable for tests and for pointing at
    * shared storage on a cluster (`spark.graft.index.root` Spark conf).
    */
  private def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.index.root")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-index-cache")

  // JVM-local memo: cache key -> resolved dir. Purely an FS-roundtrip saver;
  // the FS directory is the source of truth (other JVMs build/read the same
  // entries). Keyed including the root so tests with distinct roots don't
  // alias.
  private val resolved = new ConcurrentHashMap[String, String]()

  /** Fingerprint of the input files: (path, len, mtime) of every non-hidden
    * file under each input path, RECURSIVELY — a change two directory
    * levels deep (one file of a bucket-partitioned input) must change the
    * fingerprint, or a stale index would be served. A listing, not a
    * scan — O(files), the same cost Spark pays to plan a read of the input.
    */
  private[operators] def fingerprint(spark: SparkSession, inputs: Seq[String]): String = {
    val conf = spark.sessionState.newHadoopConf()
    inputs.sorted.map { in =>
      val p = new Path(in)
      val fs = p.getFileSystem(conf)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        // hidden if any path component below the input is _ or . prefixed
        val rel = st.getPath.toString.stripPrefix(p.toString).stripPrefix("/")
        if (!rel.split('/').exists(c => c.startsWith("_") || c.startsWith(".")))
          buf += s"${st.getPath}#${st.getLen}#${st.getModificationTime}"
      }
      buf.sorted.mkString(in + "::", "|", "")
    }.mkString(";")
  }

  /** Return the directory of a ready index for (kind, inputs, params),
    * building it via `build(stagingDir)` only if absent. Thread-safe within
    * the JVM and race-safe across JVMs (rename-arbitrated).
    */
  def ensure(spark: SparkSession, kind: String, inputs: Seq[String],
             params: String)(build: String => Unit): String = {
    val identity = params + " " + fingerprint(spark, inputs)
    // md5 of the identity string: collision-safe enough for a cache key and
    // stable across JVMs (unlike hashCode, which is unspecified)
    val key = kind + "-" + java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

    val rootStr = root(spark)
    resolved.computeIfAbsent(rootStr + "/" + key, _ => {
      val conf = spark.sessionState.newHadoopConf()
      val rootDir = new Path(rootStr)
      val fs = rootDir.getFileSystem(conf)
      val finalDir = new Path(rootDir, key)
      if (!fs.exists(finalDir)) {
        val staging = new Path(rootDir, s".staging-${java.util.UUID.randomUUID()}")
        build(staging.toString)
        fs.mkdirs(rootDir) // no-op if present; rename needs the parent
        if (!fs.rename(staging, finalDir)) {
          // lost the race (or a previous build completed between the exists
          // check and now): the winner's artifact is equivalent — use it
          fs.delete(staging, true)
          if (!fs.exists(finalDir))
            throw new IllegalStateException(
              s"IndexCatalog: rename to $finalDir failed and no index exists")
        }
      }
      finalDir.toString
    })
  }

  /** Rebuild-on-drift hook: resolve (building if needed) the entry for the
    * CURRENT inputs, then delete every other entry of the same `kind` —
    * their fingerprints no longer match any live input, so they are stale
    * by construction. This closes the maintenance loop for indexes that
    * cannot be kept fresh incrementally (IVF: appended vectors shift the
    * centroids, which is why [[graft.streaming.StreamingAnnIndex]] refuses
    * IVF appends): a drifted corpus triggers a rebuild here instead of
    * silently degrading probe recall against an old index.
    *
    * Single-maintainer contract: callers racing ensureCurrent for the same
    * kind may delete an entry another JVM is mid-probe on — run it from the
    * maintenance path (post-ingest, scheduled), not from concurrent readers
    * (those use [[ensure]], which never deletes).
    */
  def ensureCurrent(spark: SparkSession, kind: String, inputs: Seq[String],
                    params: String)(build: String => Unit): String = {
    val dir = ensure(spark, kind, inputs, params)(build)
    val rootStr = root(spark)
    val conf = spark.sessionState.newHadoopConf()
    val rootDir = new Path(rootStr)
    val fs = rootDir.getFileSystem(conf)
    val keep = new Path(dir).getName
    if (fs.exists(rootDir)) {
      fs.listStatus(rootDir)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(kind + "-") &&
          st.getPath.getName != keep) // name compare: listings are scheme-qualified
        .foreach { st =>
          fs.delete(st.getPath, true)
          resolved.remove(rootStr + "/" + st.getPath.getName)
        }
    }
    dir
  }

  /** Garbage-collect the cache root: delete entries (and crashed builds'
    * staging wreckage) whose directory modification time is older than
    * `olderThanMs`. Superseded entries — inputs changed, so nothing
    * resolves to them anymore — age out here; an entry still in use is
    * simply rebuilt on next ensure() if pruned too aggressively, so the
    * worst case of a bad TTL is one redundant build, never wrong results.
    * Returns the number of directories removed.
    */
  def prune(spark: SparkSession, olderThanMs: Long): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val rootDir = new Path(root(spark))
    val fs = rootDir.getFileSystem(conf)
    if (!fs.exists(rootDir)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    val doomed = fs.listStatus(rootDir)
      .filter(st => st.isDirectory && st.getModificationTime < cutoff)
    doomed.foreach(st => fs.delete(st.getPath, true))
    resolved.clear() // memoized paths may now dangle; re-resolve lazily
    doomed.length
  }

  /** Test hook: forget JVM-local resolutions (FS entries survive). */
  private[graft] def invalidateMemo(): Unit = resolved.clear()
}
