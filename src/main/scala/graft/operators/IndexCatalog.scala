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
  * Build protocol — MANIFEST-POINTER COMMIT (crash- and race-safe on
  * object stores, where directory rename is a non-atomic copy+delete loop
  * that a crash can leave half-copied):
  *  1. build into a uniquely-named data directory
  *     `root/<kind>-<key>/d-<uuid>` — never renamed, never visible to a
  *     reader on its own;
  *  2. commit by writing the tiny manifest
  *     `root/<kind>-<key>/entry.json` (naming the data directory) LAST —
  *     staged as a dot-file and renamed into place: a one-block file, so
  *     even where file rename is a copy it materializes as a single PUT,
  *     and a reader observes the old manifest, the new manifest, or none;
  *  3. readers resolve ONLY through the manifest: no manifest, no entry.
  *     A crash at any earlier point leaves an orphan `d-<uuid>` that
  *     nothing references (GC'd by [[prune]]), never a half-visible index;
  *  4. if the manifest rename loses a cross-JVM race, the loser deletes
  *     its own data dir and serves the winner's — both were built from
  *     identical inputs, so the artifacts are interchangeable.
  */
object IndexCatalog {

  /** Root for cached indexes; overridable for tests and for pointing at
    * shared storage on a cluster (`spark.graft.index.root` Spark conf).
    */
  private def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.index.root")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-index-cache")

  /** Algorithm-version token per index kind — part of the cache identity
    * alongside params and the input fingerprint. BUMP a kind's entry
    * whenever its BUILDER's output contract changes (artifact schema,
    * layout, arithmetic), so an artifact built by OLDER code is never
    * served to newer probe code: the bumped version changes every key of
    * that kind, old entries simply stop resolving and age out via
    * [[prune]]. Central registry rather than per-call-site strings
    * because the version is a property of the BUILDER (the operator
    * whose `build` lambda each call site invokes), and N call sites
    * sharing a kind must move together — a forgotten call site would
    * silently keep serving the stale artifact, which is exactly the bug
    * class this table exists to kill. Unlisted kinds (test fixtures)
    * default to "v1".
    */
  private val algoVersions = Map(
    "ann-lsh" -> "v1",
    // v2 (round 16): the r15 assignment-law change — raw-cosine
    // max_by ties-to-LARGER-cid became rounded-3 cosine ties-to-SMALLER
    // cid, and encode past k=4096 dispatches to the approximate routed
    // hierarchy. Per this registry's own contract that is a builder
    // arithmetic change: a v1 artifact's lists/centroids were assigned
    // under the old law, so serving them to v2 probe code would break
    // the "rebuilt index is byte-identical" determinism story.
    // "ann-ivfpq" bumps with "ann-ivf": its coarse lists come from
    // IvfIndex.build, so the same law change is baked into its artifact.
    "ann-ivf" -> "v2", "ann-pq" -> "v1",
    "ann-ivfpq" -> "v2", "minhash" -> "v1", "minhashupd" -> "v1",
    "bm25" -> "v1", "bm25upd" -> "v1",
    "bm25merge" -> "v1", "bpe" -> "v1", "nb-quality" -> "v1",
    "unigram" -> "v1", "dup-clusters" -> "v1", "sem-clusters" -> "v1",
    "semdedup-kmeans" -> "v2", "knn-intdot" -> "v1")

  // test hook: simulate a version bump without editing the registry
  private val versionOverrides = new ConcurrentHashMap[String, String]()
  private[graft] def overrideVersionForTest(kind: String, v: String): Unit = {
    versionOverrides.put(kind, v); ()
  }
  private[graft] def clearVersionOverrides(): Unit = versionOverrides.clear()
  private[operators] def versionFor(kind: String): String =
    Option(versionOverrides.get(kind))
      .getOrElse(algoVersions.getOrElse(kind, "v1"))

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

  private val ManifestName = "entry.json"

  /** The committed data directory of an entry, resolved through its
    * manifest — `None` when no manifest exists OR the manifest is
    * unreadable/unparseable (a torn write is treated as "no entry", never
    * as a partial one).
    */
  private def committedDataDir(fs: org.apache.hadoop.fs.FileSystem,
                               entryDir: Path): Option[Path] = {
    val manifest = new Path(entryDir, ManifestName)
    try {
      if (!fs.exists(manifest)) None
      else {
        val in = fs.open(manifest)
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        Option(node.get("data")).map(d => new Path(entryDir, d.asText()))
          .filter(fs.exists(_))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Return the directory of a ready index for (kind, inputs, params),
    * building it via `build(dataDir)` only if absent. Thread-safe within
    * the JVM and race-safe across JVMs (manifest-arbitrated; see the
    * commit protocol in the class doc). The returned path is the DATA
    * directory (`…/<kind>-<key>/d-<uuid>`), resolved through the entry's
    * manifest.
    */
  def ensure(spark: SparkSession, kind: String, inputs: Seq[String],
             params: String)(build: String => Unit): String = {
    // layout tag in the identity: pre-manifest caches never alias new keys
    val identity = "layout=manifest-v2 algo=" + versionFor(kind) + " " +
      params + " " + fingerprint(spark, inputs)
    // md5 of the identity string: collision-safe enough for a cache key and
    // stable across JVMs (unlike hashCode, which is unspecified)
    val key = kind + "-" + java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

    val rootStr = root(spark)
    resolved.computeIfAbsent(rootStr + "/" + key, _ => {
      val conf = spark.sessionState.newHadoopConf()
      val entryDir = new Path(new Path(rootStr), key)
      val fs = entryDir.getFileSystem(conf)
      committedDataDir(fs, entryDir) match {
        case Some(d) => d.toString
        case None =>
          val uuid = java.util.UUID.randomUUID().toString
          val dataDir = new Path(entryDir, s"d-$uuid")
          build(dataDir.toString)
          fs.mkdirs(entryDir) // no-op if the build already created it
          // commit: stage the manifest as a dot-file, rename into place —
          // written LAST, so no crash before this line can expose the entry
          val tmp = new Path(entryDir, s".entry-$uuid.tmp")
          val out = fs.create(tmp, true)
          try out.write(
            s"""{"data":"d-$uuid","kind":"$kind","key":"$key"}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          val manifest = new Path(entryDir, ManifestName)
          if (fs.rename(tmp, manifest)) dataDir.toString
          else committedDataDir(fs, entryDir) match {
            case Some(winner) =>
              // lost the commit race: the winner's artifact was built from
              // identical inputs — serve it, drop ours (nothing can have
              // resolved our uncommitted data dir)
              fs.delete(tmp, true)
              fs.delete(dataDir, true)
              winner.toString
            case None =>
              // manifest exists but is torn debris (crashed overwrite):
              // replace it with ours, once
              fs.delete(manifest, false)
              if (fs.rename(tmp, manifest)) dataDir.toString
              else {
                fs.delete(tmp, true)
                fs.delete(dataDir, true)
                committedDataDir(fs, entryDir).map(_.toString).getOrElse(
                  throw new IllegalStateException(
                    s"IndexCatalog: manifest commit to $manifest failed " +
                      "and no committed entry exists"))
              }
          }
      }
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
    // `dir` is the DATA dir (…/<kind>-<key>/d-<uuid>); the catalog entry to
    // keep is its parent
    val keep = new Path(dir).getParent.getName
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

  /** Garbage-collect the cache root: delete entries whose directory
    * modification time is older than `olderThanMs`. Crashed builds' orphan
    * data dirs (uncommitted `d-<uuid>` — no manifest references them) live
    * INSIDE their entry dir and age out with it. Superseded entries — inputs changed, so nothing
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

  /** Replace `dst` with `tmp` (delete + rename) — the compaction swap
    * used by the materialized indexes' [[Bm25Index.compact]] /
    * [[MinHashIndex.compact]]. Single-maintainer contract, like
    * [[ensureCurrent]]: the swap is NOT crash-atomic on object stores
    * (a crash between delete and rename leaves `dst` absent and the
    * compacted data parked at `tmp`) — run it from the maintenance
    * path and re-run compaction after a crash, never from concurrent
    * readers. Index dirs managed by [[ensure]] are immutable by
    * contract; in-place maintenance applies only to self-managed dirs
    * (or inside a build lambda, before the manifest commit).
    */
  private[operators] def replaceDir(spark: SparkSession, tmp: String,
                                    dst: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dstP = new Path(dst)
    val fs = dstP.getFileSystem(conf)
    fs.delete(dstP, true)
    if (!fs.rename(new Path(tmp), dstP))
      throw new IllegalStateException(
        s"compaction swap failed: could not rename $tmp over $dst")
    // Spark's shared FileStatusCache keys listings by path: without this,
    // the next read of `dst` would serve the PRE-swap file names and fail
    // with FILE_NOT_EXIST (observed) — or worse, silently read stale data
    // on an object store that kept the old objects
    spark.catalog.refreshByPath(dst)
  }
}
