package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{decode_replay_id, expand_bitmap}

/** The `parseEvent` pipeline (`eventParser.js:10-48`) as one declarative
  * projection: decode the replay ID, splice the expanded field bitmaps into
  * the CDC header, keep everything else.
  *
  * Avro-union flattening (`flattenSinglePropertyObjects`,
  * `eventParser.js:57-70`) needs no operator at all: Spark's Avro reader
  * (`from_avro`) already unwraps `["null", T]` unions into plain nullable
  * columns — SURVEY §2.2 P5.
  *
  * Fully codegen-compatible projection over the decoded struct; the schema
  * field lists are plan-time literals from the [[graft.sources.SchemaRegistry]],
  * so bitmap expansion is a pure scalar expression (no shuffle, no UDF).
  */
object EventEnrich {

  /** Enrich a decoded change-event DataFrame:
    *  - `replayIdCol` (binary) → `replayId` long (P3);
    *  - `headerCol` (ChangeEventHeader struct) gets `nulledFields` /
    *    `diffFields` / `changedFields` expanded from hex bitmaps to field
    *    names (P4), given the entity schema's ordered `fields` and
    *    compound-parent `childFields`.
    */
  def enrich(df: DataFrame, replayIdCol: String, headerCol: String,
             fields: Seq[String], childFields: Map[String, Seq[String]]): DataFrame = {
    val f = typedlit(fields)
    val cf = typedlit(childFields)
    def expanded(name: String): Column =
      expand_bitmap(col(s"$headerCol.$name"), f, cf).as(name)
    val headerFields = df.schema(headerCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    val rebuilt = struct(headerFields.map {
      case n @ ("nulledFields" | "diffFields" | "changedFields") => expanded(n)
      case other => col(s"$headerCol.$other").as(other)
    }.toIndexedSeq: _*)
    df.withColumn("replayId", decode_replay_id(col(replayIdCol)))
      .withColumn(headerCol, rebuilt)
  }
}
