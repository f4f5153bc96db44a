package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{avro_decode, avro_encode}

/** Thrown by a `fetch` implementation to signal that a schema id is
  * GENUINELY unknown to the registry (the RPC's NOT_FOUND), as opposed to a
  * transient failure. Only this exception routes events to the dead-letter
  * path; any other fetch error is retried and then fails the batch.
  */
final class SchemaNotFoundException(val schemaId: String)
  extends RuntimeException(s"schema not found: $schemaId")

/** Schema-by-ID registry + per-event Avro decode dispatch — the Spark
  * rendering of the reference's `GetSchema` cache and per-event decoder
  * selection (`client.js:68-71,758-764,896-969`).
  *
  * The registry is a driver-side memoizing map (schemaId → Avro schema
  * JSON), exactly like the reference's `Map<string, Schema>`; `fetch` is the
  * pluggable `GetSchema` RPC stand-in. Decode dispatch groups the batch by
  * schemaId and applies [[graft.functions.AvroDecode]] per group — one pass per distinct
  * schema, not per event, so a batch with S schemas costs S codegen'd
  * column scans (S is tiny in practice: schemas change rarely).
  */
class SchemaRegistry(fetch: String => String,
                     fetchRetries: Int = 3,
                     retryBackoffMs: Long = 50) {
  private val cache = TrieMap.empty[String, String]

  /** Memoized schema lookup (S4). A transient fetch failure (network blip,
    * registry restart) is retried `fetchRetries` times with exponential
    * backoff and RETHROWN on exhaustion — failing the micro-batch so
    * Structured Streaming replays it, exactly like the reference where a
    * `GetSchema` RPC failure fails the call and the subscription retries.
    * Only a typed [[SchemaNotFoundException]] — the fetch saying "this id
    * genuinely does not exist" — propagates immediately without retry; that
    * is the one case [[resolvable]] maps to the dead-letter path.
    */
  def schemaJson(schemaId: String): String = cache.getOrElseUpdate(schemaId, {
    var attempt = 0
    var result: String = null
    while (result == null) {
      try result = fetch(schemaId)
      catch {
        case nf: SchemaNotFoundException => throw nf
        case scala.util.control.NonFatal(e) if attempt < fetchRetries =>
          attempt += 1
          Thread.sleep(retryBackoffMs << (attempt - 1))
      }
    }
    result
  })

  def knownIds: Set[String] = cache.keySet.toSet

  /** Whether `id` resolves — the ingest's dispatch predicate: only ids the
    * registry POSITIVELY reports unknown ([[SchemaNotFoundException]]) go to
    * the dead-letter path (S10). A transient fetch failure is retried by
    * [[schemaJson]] and, on exhaustion, propagates out of this method so the
    * micro-batch fails and is retried — valid events must never be silently
    * diverted to dead-letter because the registry had a blip.
    */
  def resolvable(id: String): Boolean =
    cache.contains(id) ||
      (try { schemaJson(id); true }
       catch { case _: SchemaNotFoundException => false })

  /** Decode `payloadCol` (binary Avro) against the schema named by
    * `schemaIdCol`, producing `decoded` struct columns per schema id.
    * Rows with unknown schema ids are returned with null `decoded` —
    * callers route them to the dead-letter path (S10).
    *
    * `ids` must enumerate the schema ids expected in the batch (from the
    * registry); the per-id branches are unioned back together. No
    * driver-side data access — only the schema list is driver-resident.
    */
  def decode(df: DataFrame, schemaIdCol: String, payloadCol: String,
             ids: Seq[String]): DataFrame = {
    require(ids.nonEmpty, "at least one schema id required")
    val branches = ids.map { id =>
      df.filter(col(schemaIdCol) === id)
        .withColumn("decoded", avro_decode(col(payloadCol), schemaJson(id)))
    }
    // allowMissingColumns merges heterogeneous decoded structs into their
    // field superset — also how append-only schema evolution (new fields on
    // a topic, setup.md:402) surfaces: old events carry null for new fields.
    val known = branches.reduce(_.unionByName(_, allowMissingColumns = true))
    // NULL schema ids must land in the unknown branch too: a bare
    // `!isin(...)` evaluates to NULL for them (three-valued logic), which
    // would silently drop the rows from both branches.
    val unknown = df.filter(col(schemaIdCol).isNull || !col(schemaIdCol).isin(ids: _*))
      .withColumn("decoded", lit(null).cast(branches.head.schema("decoded").dataType))
    known.unionByName(unknown, allowMissingColumns = true)
  }

  /** Encode a struct column back to Avro binary for publish (P2/S5). */
  def encode(df: DataFrame, structCol: String, schemaId: String): DataFrame =
    df.withColumn("payload", avro_encode(col(structCol), schemaJson(schemaId)))
}
