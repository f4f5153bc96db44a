package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paginated HTTP snapshot export — the reference's bulk-load path
  * (`setup.md:1240-1292`: `fetchAllRecords` initiates an export and pages
  * through it under the `salesforceQueries` rate limiter, `bulkLoad`/
  * `fullSyncWorkflow` feed the pages into the snapshot upsert) plus the
  * Tooling query lookup (`toolingApiHelper.js:21-49`).
  *
  * Protocol: the REST query resource. `GET {instance}/services/data/
  * v{api}/query/?q={soql}` returns `{"totalSize":N,"done":bool,
  * "nextRecordsUrl":"/services/data/…-2000","records":[…]}`; followers GET
  * the locator URL until `done`. Page size rides the standard
  * `Sforce-Query-Options: batchSize=n` header.
  *
  * Scale shape: one locator chain is inherently serial (each page names
  * the next), so the 100 TB path is PK-RANGE SLICING — the caller (or
  * [[idSlices]]) splits the keyspace into disjoint `Id` ranges and each
  * range runs its own locator chain in its own Spark task, in parallel
  * across executors (the same idea as Bulk API PK chunking, applied
  * client-side). Inside a task the page loop is bounded imperative HTTP —
  * the one place `mapPartitions` is the right tool — and everything after
  * the fetch is declarative: pages land as raw JSON strings and a single
  * codegen'd `from_json` projects them into the caller's schema, so
  * parsing scales with executors and the driver never touches record
  * data.
  *
  * Failure model: each page GET retries with the T7 backoff policy
  * ([[graft.streaming.Retry]], the reference's `ActionRetrier`
  * `setup.md:1005-1009`) and then fails the task loudly (`Bulk export
  * error: HTTP <status> - <body>`, the same fail-shape as [[Auth]]); Spark
  * task retry re-runs the whole slice, which is safe because the snapshot
  * consumer ([[graft.streaming.Bootstrap.snapshotThenStream]]) writes
  * idempotently. Page fetches are metered per executor by the
  * `salesforceQueries` token bucket (`setup.md:996-1001`: 100 calls/min —
  * size `callsPerMin` to the per-executor share, as the reference does
  * per shard).
  */
object BulkExport {

  /** Injectable page GET: (absolute url, headers) → (status, body) —
    * same seam as [[Auth.HttpExec]] but executor-side, so implementations
    * must be serializable. The default rides `java.net.http` with a
    * per-JVM lazy client (connection reuse across pages, like the forward
    * transport).
    */
  trait HttpGet extends ((String, Map[String, String]) => (Int, String))
    with Serializable

  final class DefaultHttpGet(connectTimeoutMs: Long = 5000,
                             requestTimeoutMs: Long = 60000) extends HttpGet {
    @transient private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .build()
    override def apply(url: String, headers: Map[String, String]): (Int, String) = {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      headers.foreach { case (k, v) => b.header(k, v) }
      val res = client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
      (res.statusCode(), res.body())
    }
  }

  def defaultHttp: HttpGet = new DefaultHttpGet()

  /** Export connection + paging policy. `accessToken`/`instanceUrl` come
    * from [[Auth.authenticate]]'s ConnectionMetadata. `callsPerMin` is the
    * per-executor share of the query rate limit; `batchSize` is the
    * requested page size (the server may clamp it).
    */
  final case class Config(instanceUrl: String, accessToken: String,
                          apiVersion: String = "62.0",
                          batchSize: Int = 2000,
                          callsPerMin: Double = 100.0,
                          burst: Double = 4.0,
                          retries: Int = 4,
                          retryBaseDelayMs: Long = 500) extends Serializable {
    private[sources] def queryUrl(soql: String): String =
      s"$instanceUrl/services/data/v$apiVersion/query/?q=${urlEncode(soql)}"
    private[sources] def toolingQueryUrl(soql: String): String =
      s"$instanceUrl/services/data/v$apiVersion/tooling/query/?q=${urlEncode(soql)}"
    private[sources] def headers: Map[String, String] = Map(
      "Authorization" -> s"Bearer $accessToken",
      "Sforce-Query-Options" -> s"batchSize=$batchSize")
  }

  private def urlEncode(s: String) = java.net.URLEncoder.encode(s, UTF_8)

  /** The reference's SOQL-injection guard (`toolingApiHelper.js:21-26`):
    * any single quote in a value that will be spliced into a SOQL literal
    * fails loudly before a request is made.
    */
  private[sources] def soqlGuard(value: String, what: String): Unit =
    require(!value.contains("'"),
      s"Suspected SOQL injection in $what string value: $value")

  /** One locator chain: GET `firstUrl`, then follow `nextRecordsUrl`
    * (instance-relative) until `done`, yielding each record as its raw
    * JSON object text. Page-at-a-time: one page is in memory per task,
    * never the whole export. Each GET is rate-limited and retried; a
    * non-2xx after retries throws with the page body.
    */
  private[sources] def pageRecords(http: HttpGet, cfg: Config,
                                   firstUrl: String,
                                   bucketKey: String): Iterator[String] = {
    val mapper = new ObjectMapper()
    new Iterator[Iterator[String]] {
      private var pending: Option[String] = Some(firstUrl)
      override def hasNext: Boolean = pending.isDefined
      override def next(): Iterator[String] = {
        val url = pending.get
        val body = graft.streaming.Retry.withBackoff(
          attempts = cfg.retries, baseDelayMs = cfg.retryBaseDelayMs) {
          graft.streaming.RateLimitedTransport.acquire(
            bucketKey, cfg.callsPerMin / 60.0, cfg.burst, 1)
          val (status, b) = http(url, cfg.headers)
          if (status / 100 != 2)
            throw new java.io.IOException(
              s"Bulk export error: HTTP $status - ${String.valueOf(b).take(200)}")
          b
        }
        val page = mapper.readTree(body)
        pending =
          if (page.path("done").asBoolean(true)) None
          else Some(cfg.instanceUrl + page.path("nextRecordsUrl").asText())
        val recs = page.path("records")
        (0 until recs.size()).iterator.map(i => recs.get(i).toString)
      }
    }.flatten
  }

  /** Disjoint PK-range predicates covering the id keyspace: `(lo, hi]`
    * half-open on the 15/18-char base-62 `Id` collation, `boundaries`
    * sorted ascending. First slice is unbounded below, last unbounded
    * above — every id lands in exactly one slice regardless of the
    * boundary choice (boundaries usually come from a cheap
    * `MIN(Id)/MAX(Id)` probe or the previous export's manifest).
    */
  def idSlices(boundaries: Seq[String]): Seq[String] = {
    boundaries.foreach(soqlGuard(_, "id slice boundary"))
    val bs = boundaries.sorted
    if (bs.isEmpty) Seq("")
    else {
      val lo = s"Id <= '${bs.head}'"
      val mids = bs.sliding(2).collect {
        case Seq(a, b) => s"Id > '$a' AND Id <= '$b'"
      }.toSeq
      val hi = s"Id > '${bs.last}'"
      (lo +: mids) :+ hi
    }
  }

  /** Snapshot read: run `soql` (a SELECT without a WHERE on Id) once per
    * slice predicate, each slice's locator chain in its own Spark task,
    * and project the fetched records into `schema` with one codegen'd
    * `from_json`. `slices` from [[idSlices]] — or the single empty-string
    * slice for a small serial export. Attribute-record noise (the
    * `attributes` envelope the REST resource adds) is dropped by the
    * schema projection.
    */
  def read(spark: SparkSession, cfg: Config, soql: String, schema: StructType,
           slices: Seq[String] = Seq(""), http: HttpGet = defaultHttp): DataFrame = {
    require(slices.nonEmpty, "at least one slice predicate required")
    val lowered = soql.toLowerCase
    require(!lowered.contains(" where ") || slices == Seq(""),
      "sliced reads own the WHERE clause; put static filters in the slice predicates")
    val sliceSoql = slices.map { s =>
      if (s.isEmpty) soql else s"$soql WHERE $s"
    }
    import spark.implicits._
    val jsons = spark.createDataset(sliceSoql)
      .repartition(sliceSoql.size) // one task per locator chain
      .mapPartitions { it =>
        it.flatMap { q =>
          pageRecords(http, cfg, cfg.queryUrl(q), bucketKey = "bulk-export")
        }
      }
    jsons.select(from_json(col("value"), schema).as("r")).select("r.*")
  }

  /** Tooling lookup of a managed event subscription by 18-char Id or
    * DeveloperName (`toolingApiHelper.js:21-49`): injection guard, the
    * `18x`-prefix/15-or-18-length Id heuristic, `LIMIT 1`, loud error on
    * an empty result. Returns the record's raw JSON (callers read
    * `Metadata.topicName` etc. from it).
    */
  def getManagedSubscription(http: HttpGet, cfg: Config,
                             subscriptionIdOrName: String): String = {
    soqlGuard(subscriptionIdOrName, "subscription ID or name")
    val isId = (subscriptionIdOrName.length == 15 ||
      subscriptionIdOrName.length == 18) &&
      subscriptionIdOrName.toLowerCase.startsWith("18x")
    val filter =
      if (isId) s"Id='$subscriptionIdOrName'"
      else s"DeveloperName='$subscriptionIdOrName'"
    val soql = "SELECT Id, DeveloperName, Metadata FROM " +
      s"ManagedEventSubscription WHERE $filter LIMIT 1"
    val recs = pageRecords(http, cfg, cfg.toolingQueryUrl(soql),
      bucketKey = "tooling-query").toSeq
    if (recs.isEmpty)
      throw new NoSuchElementException(
        s"Failed to retrieve managed event subscription with $filter")
    recs.head
  }
}
