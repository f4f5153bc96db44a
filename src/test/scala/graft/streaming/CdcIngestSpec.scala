package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming fold with restart (SURVEY §5.2 item 4): append change-log
  * files, run the ingest to completion, append more, restart from the
  * checkpoint — final table state must equal a batch fold of the full log.
  * Plus the scale contract of the bucketed MERGE: a batch rewrites only the
  * buckets its keys hash into.
  */
class CdcIngestSpec extends SparkSpec {
  import spark.implicits._

  test("latest-wins ingest survives restart and matches batch fold") {
    val base = Files.createTempDirectory("cdc_ingest").toString
    val logDir = s"$base/log"
    val targetDir = s"$base/target"
    val checkpointDir = s"$base/ckpt"

    val part1 = Seq(
      (1L, "a", "CREATE", "v1"),
      (2L, "b", "CREATE", "b1"),
      (3L, "a", "UPDATE", "v2"))
    val part2 = Seq(
      (3L, "a", "UPDATE", "v2"), // duplicate redelivery across restart
      (4L, "b", "DELETE", null.asInstanceOf[String]),
      (5L, "c", "CREATE", "c1"))

    def append(rows: Seq[(Long, String, String, String)]): Unit =
      rows.toDF("replayId", "sfId", "changeType", "value")
        .coalesce(1).write.mode("append").parquet(logDir)

    append(part1)
    val schema = spark.read.parquet(logDir).schema
    val dataCols = Seq("sfId", "value")

    def runOnce(): Unit = {
      val q = CdcIngest.start(spark, logDir, schema, targetDir, checkpointDir, dataCols)
      q.awaitTermination()
    }

    runOnce()
    val mid = CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().sortBy(_._1)
    assert(mid.toSeq == Seq(("a", "v2"), ("b", "b1")))

    append(part2)
    runOnce() // restart from checkpoint; only part2 is a new batch
    val fin = CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().sortBy(_._1)
    assert(fin.toSeq == Seq(("a", "v2"), ("c", "c1")))
  }

  test("invalid rows are dead-lettered with a cause, valid rows merge") {
    val base = Files.createTempDirectory("cdc_dead").toString
    val logDir = s"$base/log"
    val targetDir = s"$base/target"

    Seq((1L, "a", "CREATE", "ok"), (2L, null.asInstanceOf[String], "CREATE", "bad"))
      .toDF("replayId", "sfId", "changeType", "value")
      .write.mode("append").parquet(logDir)
    val schema = spark.read.parquet(logDir).schema

    val q = CdcIngest.start(spark, logDir, schema, targetDir, s"$base/ckpt",
      Seq("sfId", "value"), valid = col("sfId").isNotNull)
    q.awaitTermination()

    assert(CdcIngest.readTarget(spark, targetDir).count() == 1)
    val dead = spark.read.parquet(targetDir + "_dead_letter")
    assert(dead.count() == 1)
    assert(dead.select("replayId").as[Long].collect().toSeq == Seq(2L))
    // eventParseError parity: cause names the failed predicate, raw_event
    // carries the whole original row
    val (cause, raw) = dead.select("cause", "raw_event").as[(String, String)].head()
    assert(cause.contains("validation failed"))
    assert(raw.contains("\"replayId\":2"))
  }

  test("merge rewrites only the touched buckets' files") {
    val base = Files.createTempDirectory("cdc_bucket").toString
    val targetDir = s"$base/target"
    val nb = 8
    val dataCols = Seq("sfId", "value")

    def merge(rows: Seq[(Long, String, String, String)]): Unit =
      CdcIngest.mergeIntoTarget(spark,
        rows.toDF("replayId", "sfId", "changeType", "value"),
        targetDir, dataCols, "sfId", "replayId", "changeType", numBuckets = nb)

    // spread keys over buckets
    val keys = (0 until 16).map(i => s"k$i")
    merge(keys.zipWithIndex.map { case (k, i) => (i.toLong, k, "CREATE", s"v$i") })

    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles: Map[String, Set[String]] =
      fs.listStatus(new Path(targetDir)).filter(_.getPath.getName.startsWith("__bucket="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).map(_.getPath.getName).toSet).toMap

    val before = bucketFiles
    assert(before.size > 1, "expected keys spread over multiple buckets")

    // touch exactly one key -> its bucket only
    merge(Seq((100L, "k0", "UPDATE", "v0b")))
    val after = bucketFiles

    val touchedBucket = spark.range(1)
      .select(CdcIngest.bucketOf(lit("k0"), nb)).as[Int].head()
    val touchedName = s"__bucket=$touchedBucket"
    assert(after(touchedName) != before(touchedName),
      "the touched bucket must be rewritten")
    (before.keySet - touchedName).foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b was rewritten")
    }

    // and the merge itself is correct
    val got = CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().toMap
    assert(got("k0") == "v0b" && got("k1") == "v1" && got.size == 16)
  }

  test("an interrupted bucket swap recovers from complete staging") {
    val base = Files.createTempDirectory("cdc_recover").toString
    val targetDir = s"$base/target"
    val dataCols = Seq("sfId", "value")

    def merge(rows: Seq[(Long, String, String, String)]): Unit =
      CdcIngest.mergeIntoTarget(spark,
        rows.toDF("replayId", "sfId", "changeType", "value"),
        targetDir, dataCols, "sfId", "replayId", "changeType", numBuckets = 4)

    merge(Seq((1L, "a", "CREATE", "v1"), (2L, "b", "CREATE", "b1")))

    // simulate a crash between "delete old bucket" and "rename staging in":
    // move a's bucket dir into a staging dir with _SUCCESS, delete it from
    // the target
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aBucket = spark.range(1)
      .select(CdcIngest.bucketOf(lit("a"), 4)).as[Int].head()
    val staging = new Path(targetDir + "__staging")
    fs.mkdirs(staging)
    fs.rename(new Path(targetDir, s"__bucket=$aBucket"),
      new Path(staging, s"__bucket=$aBucket"))
    fs.create(new Path(staging, "_SUCCESS")).close()

    // next merge (the checkpoint's redelivery of the interrupted batch)
    // must first restore a's bucket from staging, then converge
    merge(Seq((3L, "b", "UPDATE", "b2")))
    val got = CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", "v1"), ("b", "b2")))
    assert(!fs.exists(staging))
  }

  test("transient sink failure retries with backoff and converges (T7)") {
    val base = Files.createTempDirectory("cdc_retry").toString
    val targetDir = s"$base/target"
    val batch = Seq((1L, "a", "CREATE", "v1")).toDF("replayId", "sfId", "changeType", "value")

    var calls = 0
    val observed = ArrayBuffer.empty[Int]
    Retry.withBackoff(attempts = 4, baseDelayMs = 1,
      onRetry = (a, _) => observed += a) {
      calls += 1
      if (calls == 1) throw new java.io.IOException("transient fs failure")
      CdcIngest.mergeIntoTarget(spark, batch, targetDir,
        Seq("sfId", "value"), "sfId", "replayId", "changeType")
    }
    assert(calls == 2 && observed.toSeq == Seq(1))
    assert(CdcIngest.readTarget(spark, targetDir)
      .as[(String, String)].collect().toSeq == Seq(("a", "v1")))
  }

  test("permanent sink failure exhausts attempts and rethrows (T7)") {
    var calls = 0
    val ex = intercept[java.io.IOException] {
      Retry.withBackoff(attempts = 4, baseDelayMs = 1) {
        calls += 1
        throw new java.io.IOException(s"permanent failure $calls")
      }
    }
    assert(calls == 4)
    assert(ex.getMessage == "permanent failure 4")
  }

  test("schema-dispatched ingest: two schema ids in one batch decode and merge; unknown id dead-letters") {
    import graft.functions.avro_encode
    val base = Files.createTempDirectory("cdc_dispatch").toString
    val logDir = s"$base/log"
    new java.io.File(logDir).mkdirs()
    val targetDir = s"$base/target"

    val acctSchema =
      """{"type":"record","name":"Acct","fields":[
        |{"name":"Name","type":["null","string"],"default":null}]}""".stripMargin
    val contSchema =
      """{"type":"record","name":"Cont","fields":[
        |{"name":"Email","type":["null","string"],"default":null}]}""".stripMargin
    val registry = new graft.sources.SchemaRegistry({
      case "acct" => acctSchema
      case "cont" => contSchema
      case other => throw new graft.sources.SchemaNotFoundException(other)
    })

    // publish a mixed batch: per-event schemaId + headers in the envelope,
    // base64 Avro payloads in `data` (proto:57-80 ProducerEvent shape)
    val hdrs = array(struct(lit("src").as("key"), lit("unit-test").as("value")))
    val events = Seq(("a1", "Acme"), ("a2", "Globex")).toDF("sfId", "Name")
      .select(col("sfId"), lit("CREATE").as("changeType"),
        base64(avro_encode(struct(col("Name")), acctSchema)).as("data"),
        lit("acct").as("schemaId"), hdrs.as("headers"))
      .unionByName(Seq(Tuple1("c@x.com")).toDF("Email")
        .select(lit("c1").as("sfId"), lit("CREATE").as("changeType"),
          base64(avro_encode(struct(col("Email")), contSchema)).as("data"),
          lit("cont").as("schemaId"), hdrs.as("headers")))
      .unionByName(Seq(Tuple1("x1")).toDF("sfId")
        .select(col("sfId"), lit("CREATE").as("changeType"),
          base64(lit(Array[Byte](1, 2, 3))).as("data"),
          lit("mystery").as("schemaId"),
          lit(null).cast("array<struct<key:string,value:string>>").as("headers")))
    Publish.append(spark, events, logDir)

    val stream = spark.readStream.format("graft.sources.ChangeEventLogProvider")
      .option("path", logDir).load()
    val q = CdcIngest.startSchemaDispatched(spark, stream, registry,
      targetDir, s"$base/ckpt")
    q.awaitTermination()

    // both schemas decoded IN THE SAME BATCH and merged into the field
    // superset (append-only evolution shape)
    val target = CdcIngest.readTarget(spark, targetDir)
    assert(target.columns.toSet ==
      Set("replayId", "sfId", "changeType", "Name", "Email"))
    val byId = target.collect().map(r => r.getAs[String]("sfId") ->
      ((r.getAs[String]("Name"), r.getAs[String]("Email")))).toMap
    assert(byId == Map("a1" -> (("Acme", null)), "a2" -> (("Globex", null)),
      "c1" -> ((null, "c@x.com"))))

    // the unknown schema id dead-letters with the id in the cause; the
    // batch itself succeeded (S10 — one bad producer never fails the batch)
    val dead = spark.read.parquet(targetDir + "_dead_letter")
    assert(dead.count() == 1)
    val row = dead.collect()(0)
    assert(row.getAs[String]("sfId") == "x1")
    assert(row.getAs[String]("cause").contains("mystery"))

    // headers survive the envelope round trip THROUGH the DSv2 source
    // (publish → jsonl → source parse), not just in the file
    assert(row.getAs[String]("raw_event").contains("\"schemaId\":\"mystery\""))
    val out = Files.createTempDirectory("cdc_hdr").toString
    val hq = spark.readStream.format("graft.sources.ChangeEventLogProvider")
      .option("path", logDir).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", out + "_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    hq.awaitTermination()
    val headerVals = spark.read.parquet(out)
      .filter(col("schemaId") === "acct")
      .select(explode(col("headers")).as("h")).select("h.key", "h.value")
      .as[(String, String)].collect().toSet
    assert(headerVals == Set(("src", "unit-test")))
  }
}
