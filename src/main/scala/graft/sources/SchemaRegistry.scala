package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{avro_decode, avro_encode}

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
class SchemaRegistry(fetch: String => String) {
  private val cache = TrieMap.empty[String, String]

  /** Memoized schema lookup (S4). */
  def schemaJson(schemaId: String): String = cache.getOrElseUpdate(schemaId, fetch(schemaId))

  def knownIds: Set[String] = cache.keySet.toSet

  /** Whether `id` resolves (cached, or fetchable without throwing) — the
    * ingest's dispatch predicate: events whose id doesn't resolve go to
    * the dead-letter path instead of failing the batch (S10), mirroring
    * the reference's per-event parse-failure handling.
    */
  def resolvable(id: String): Boolean =
    cache.contains(id) ||
      (try { schemaJson(id); true }
       catch { case scala.util.control.NonFatal(_) => false })

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
