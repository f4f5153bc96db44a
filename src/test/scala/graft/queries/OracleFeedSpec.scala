package graft.queries

import java.io.File

import graft.SparkSpec

/** The oracle-feed isolation contract (round 15, the ADVICE item): the
  * feed root is per-user and per-JVM, publish/readBack round-trips
  * byte-identically, sqlPath points inside THIS run's root, and stale
  * run dirs from dead JVMs are swept while fresh ones survive.
  */
class OracleFeedSpec extends SparkSpec {

  test("root is per-user, per-JVM, and stable within the process") {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val pid = rt.getName.takeWhile(_ != '@')
    assert(OracleFeed.Root.contains(s"run-$pid-${rt.getStartTime}"),
      s"root must embed this JVM's pid+start: ${OracleFeed.Root}")
    assert(OracleFeed.Root.contains(
      sys.props("user.name").replaceAll("[^A-Za-z0-9_.-]", "_")))
    // the object is a singleton: every reference is the same run dir
    assert(OracleFeed.Root eq OracleFeed.Root)
  }

  test("publish/readBack round-trips and sqlPath targets this run's dir") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    OracleFeed.publish("spec_query", "t1", df)
    val back = OracleFeed.readBack(spark, "spec_query", "t1")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
    val p = OracleFeed.sqlPath("spec_query", "t1")
    assert(p == s"read_parquet('${OracleFeed.Root}/spec_query/t1/*.parquet')")
    // overwrite semantics: a re-publish replaces, never appends
    OracleFeed.publish("spec_query", "t1", Seq((3L, "c")).toDF("k", "v"))
    assert(OracleFeed.readBack(spark, "spec_query", "t1").count() == 1)
  }

  test("publish-once: skips re-publish after enable, invalidate re-opens, reset restores") {
    // the r16 bench contract: the untimed plan pass publishes everything,
    // enablePublishOnce() freezes it, timed samples skip the write; a
    // query that THREW mid-pass gets invalidated so its next publish is
    // real again
    import spark.implicits._
    try {
      OracleFeed.publish("once_query", "t", Seq((1L, "a")).toDF("k", "v"))
      OracleFeed.enablePublishOnce()
      // skipped: the artifact keeps the pre-enable content
      OracleFeed.publish("once_query", "t", Seq((2L, "b"), (3L, "c")).toDF("k", "v"))
      assert(OracleFeed.readBack(spark, "once_query", "t").count() == 1)
      // a key never published before the enable still publishes
      OracleFeed.publish("once_query", "t2", Seq((9L, "z")).toDF("k", "v"))
      assert(OracleFeed.readBack(spark, "once_query", "t2").count() == 1)
      // ...and is then memoized too
      OracleFeed.publish("once_query", "t2", Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
      assert(OracleFeed.readBack(spark, "once_query", "t2").count() == 1)
      // invalidate re-opens ONLY this query's keys
      OracleFeed.invalidate("once_query")
      OracleFeed.publish("once_query", "t", Seq((2L, "b"), (3L, "c")).toDF("k", "v"))
      assert(OracleFeed.readBack(spark, "once_query", "t").count() == 2)
    } finally OracleFeed.resetPublishOnceForTest()
    // default restored: re-publish overwrites again (the spec contract
    // the round-trip test above relies on)
    OracleFeed.publish("once_query", "t", Seq((1L, "a")).toDF("k", "v"))
    assert(OracleFeed.readBack(spark, "once_query", "t").count() == 1)
  }

  test("a query that never published has NO feed at this run's path") {
    val d = new File(s"${OracleFeed.Root}/never_published/t")
    assert(!d.exists, "stale-feed hazard: path must not pre-exist")
  }

  test("stale run dirs (>24h by embedded start time) are swept; fresh survive") {
    val userRoot = new File(OracleFeed.Root).getParentFile
    // pid 999999999 exceeds every Linux pid_max, so the dir is provably
    // from a dead JVM and the liveness guard cannot veto the sweep
    val old = new File(userRoot, s"run-999999999-${
      System.currentTimeMillis() - 25L * 3600 * 1000}")
    val fresh = new File(userRoot, s"run-999999998-${System.currentTimeMillis()}")
    assert(old.mkdirs() && fresh.mkdirs())
    new java.io.FileOutputStream(new File(old, "x.parquet")).close()
    OracleFeed.sweepStale() // the real sweep, re-run after init
    assert(!old.exists, "25h-old run dir must be swept")
    assert(fresh.exists, "fresh run dir must survive")
    fresh.delete()
  }
}
