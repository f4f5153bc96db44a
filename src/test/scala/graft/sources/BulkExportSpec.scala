package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Bulk snapshot export against an in-process REST-query endpoint (same
  * server pattern as AuthSpec/ForwardSpec): locator paging, PK-range
  * slices, batch-size header, 503 retry, injection guards, tooling
  * lookup heuristics (`toolingApiHelper.js:21-49`,
  * `setup.md:1240-1292`).
  */
class BulkExportSpec extends SparkSpec {

  private val NRows = 95
  private def idOf(i: Int) = f"001$i%015d"
  private case class Row0(id: String, name: String, amount: Int)
  private val table = (0 until NRows).map(i => Row0(idOf(i), s"acct-$i", i * 10))

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("Name", StringType),
    StructField("Amount", IntegerType)))

  /** Serves `/query/?q=…` + locator follow-ups over `table`, honoring the
    * `Sforce-Query-Options: batchSize` header. `flakyPages` URLs fail
    * with 503 on their first attempt. Records every requested URL.
    */
  private def startServer(flakyFirstAttempt: String => Boolean = _ => false)
      : (HttpServer, String,
         java.util.List[String], ConcurrentHashMap[String, Integer]) = {
    val requested = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val attempts = new ConcurrentHashMap[String, Integer]()
    // locator -> (remaining rows, batchSize)
    val locators = new ConcurrentHashMap[String, (Seq[Row0], Int)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def pageJson(rows: Seq[Row0], batch: Int, locPrefix: String): String = {
      val (page, rest) = rows.splitAt(batch)
      val recs = page.map { r =>
        s"""{"attributes":{"type":"Account"},"Id":"${r.id}",""" +
          s""""Name":"${r.name}","Amount":${r.amount}}"""
      }.mkString("[", ",", "]")
      val next = if (rest.isEmpty) "" else {
        val loc = locPrefix + "-" + java.util.UUID.randomUUID().toString
        locators.put(loc, (rest, batch))
        s""","nextRecordsUrl":"/services/data/v62.0/query/$loc""""
      }
      s"""{"totalSize":${rows.size},"done":${rest.isEmpty},"records":$recs$next}"""
    }
    // one WHERE grammar: the predicates idSlices/read generate
    def filterRows(soql: String): Seq[Row0] = {
      val where = soql.split("(?i) WHERE ", 2)
      if (where.length == 1) table
      else {
        val gt = "Id > '([^']*)'".r.findFirstMatchIn(where(1)).map(_.group(1))
        val le = "Id <= '([^']*)'".r.findFirstMatchIn(where(1)).map(_.group(1))
        table.filter(r => gt.forall(r.id > _) && le.forall(r.id <= _))
      }
    }
    server.createContext("/services/data/v62.0/query/", { ex =>
      val uri = ex.getRequestURI
      val url = uri.getPath + Option(uri.getRawQuery).map("?" + _).getOrElse("")
      requested.add(url)
      val n = attempts.merge(url, 1, (a, b) => a + b)
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer tok-123")
        respond(ex, 401, """{"error":"INVALID_SESSION_ID"}""")
      else if (flakyFirstAttempt(url) && n == 1)
        respond(ex, 503, """{"error":"SERVER_UNAVAILABLE"}""")
      else {
        val batch = Option(ex.getRequestHeaders.getFirst("Sforce-Query-Options"))
          .map(_.stripPrefix("batchSize=").toInt).getOrElse(2000)
        val path = uri.getPath.stripPrefix("/services/data/v62.0/query/")
        if (path.nonEmpty) { // locator follow-up
          val st = locators.remove(path)
          if (st == null) respond(ex, 400, """{"error":"INVALID_QUERY_LOCATOR"}""")
          else respond(ex, 200, pageJson(st._1, st._2, "loc"))
        } else {
          val q = java.net.URLDecoder.decode(
            uri.getRawQuery.stripPrefix("q="), UTF_8)
          respond(ex, 200, pageJson(filterRows(q), batch, "loc"))
        }
      }
    })
    server.createContext("/services/data/v62.0/tooling/query/", { ex =>
      val q = java.net.URLDecoder.decode(
        ex.getRequestURI.getRawQuery.stripPrefix("q="), UTF_8)
      requested.add("tooling:" + q)
      val recs =
        if (q.contains("Id='18x000000000000AAA'") ||
          q.contains("DeveloperName='MySub'"))
          """[{"Id":"18x000000000000AAA","DeveloperName":"MySub","Metadata":{"topicName":"/data/AccountChangeEvent"}}]"""
        else "[]"
      respond(ex, 200, s"""{"size":${if (recs.length > 2) 1 else 0},"records":$recs,"done":true}""")
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}", requested, attempts)
  }

  private def cfg(url: String, batch: Int = 40) = BulkExport.Config(
    instanceUrl = url, accessToken = "tok-123", batchSize = batch,
    callsPerMin = 1e9, retryBaseDelayMs = 1) // tests: no artificial waits

  private val soql = "SELECT Id, Name, Amount FROM Account"

  test("serial read pages the locator chain and projects the schema") {
    val (server, url, requested, _) = startServer()
    try {
      val df = BulkExport.read(spark, cfg(url), soql, schema, http = BulkExport.defaultHttp)
      val rows = df.orderBy("Id").collect()
      assert(rows.length == NRows)
      assert(rows.head.getString(0) == idOf(0) && rows.head.getString(1) == "acct-0")
      assert(rows.last.getInt(2) == (NRows - 1) * 10)
      // 95 rows at batchSize=40 -> initial + 2 locator pages
      assert(requested.size == 3)
    } finally server.stop(0)
  }

  test("PK-range slices cover the keyspace disjointly and fetch in parallel chains") {
    val (server, url, requested, _) = startServer()
    try {
      val slices = BulkExport.idSlices(Seq(idOf(29), idOf(59)))
      assert(slices == Seq(
        s"Id <= '${idOf(29)}'",
        s"Id > '${idOf(29)}' AND Id <= '${idOf(59)}'",
        s"Id > '${idOf(59)}'"))
      val df = BulkExport.read(spark, cfg(url), soql, schema, slices)
      val got = df.select("Id").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().sorted
      assert(got.toSeq == table.map(_.id)) // every row exactly once
      // three independent locator chains: 3 initial queries, and 30/30/35
      // rows at batch 40 -> no follow-ups
      assert(requested.size == 3)
    } finally server.stop(0)
  }

  test("a transient 503 on a locator page retries and completes the slice") {
    val (server, url, _, attempts) = startServer(
      flakyFirstAttempt = _.contains("/query/loc"))
    try {
      val df = BulkExport.read(spark, cfg(url, batch = 50), soql, schema)
      assert(df.count() == NRows)
      val flaky = attempts.entrySet().iterator()
      var sawRetry = false
      while (flaky.hasNext) { val e = flaky.next()
        if (e.getKey.contains("/query/loc") && e.getValue >= 2) sawRetry = true }
      assert(sawRetry, "the flaky locator page must have been retried")
    } finally server.stop(0)
  }

  test("auth failures and exhausted retries fail loudly with the HTTP body") {
    val (server, url, _, _) = startServer()
    try {
      val bad = cfg(url).copy(accessToken = "wrong", retries = 2)
      val e = intercept[org.apache.spark.SparkException] {
        BulkExport.read(spark, bad, soql, schema).count()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("Bulk export error: HTTP 401") ||
        e.toString.contains("Bulk export error: HTTP 401"))
    } finally server.stop(0)
  }

  test("SOQL injection guards: slice boundaries and subscription lookup") {
    intercept[IllegalArgumentException] {
      BulkExport.idSlices(Seq("001'; DROP--"))
    }
    intercept[IllegalArgumentException] {
      BulkExport.getManagedSubscription(BulkExport.defaultHttp,
        cfg("http://unused"), "My'Sub")
    }
  }

  test("managed-subscription lookup: Id heuristic vs DeveloperName, empty result throws") {
    val (server, url, requested, _) = startServer()
    try {
      val byId = BulkExport.getManagedSubscription(
        BulkExport.defaultHttp, cfg(url), "18x000000000000AAA")
      assert(byId.contains("\"DeveloperName\":\"MySub\""))
      val byName = BulkExport.getManagedSubscription(
        BulkExport.defaultHttp, cfg(url), "MySub")
      assert(byName.contains("\"Id\":\"18x000000000000AAA\""))
      // 18-char 18x-prefixed -> Id filter; otherwise DeveloperName
      assert(requested.get(0).contains("Id='18x000000000000AAA'"))
      assert(requested.get(1).contains("DeveloperName='MySub'"))
      intercept[NoSuchElementException] {
        BulkExport.getManagedSubscription(
          BulkExport.defaultHttp, cfg(url), "NoSuchSub")
      }
    } finally server.stop(0)
  }

  test("snapshot feeds Bootstrap: exported rows land in the bucketed target layout") {
    val (server, url, _, _) = startServer()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("bulk_boot").toString
      val snap = BulkExport.read(spark, cfg(url), soql, schema,
          BulkExport.idSlices(Seq(idOf(47))))
        .select(col("Id").as("sfId"), col("Name").as("name"),
          col("Amount").as("amount"))
      // the Bootstrap write path: bucketed overwrite (idempotent re-run)
      snap.withColumn("__bucket",
          graft.streaming.CdcIngest.bucketOf(col("sfId"), 8))
        .write.mode("overwrite").partitionBy("__bucket").parquet(s"$tmp/target")
      val back = spark.read.parquet(s"$tmp/target")
      assert(back.count() == NRows)
      assert(back.select("__bucket").distinct().count() > 1)
    } finally server.stop(0)
  }
}
