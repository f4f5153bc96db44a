package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⇄ Catalyst codec built directly on avro-core (the runtime ships no
  * spark-avro connector), covering the type surface the reference's events
  * use (SURVEY §1.2): primitives, records, arrays, maps, enums, fixed, and
  * `["null", T]` unions.
  *
  * Union handling IS the reference's `flattenSinglePropertyObjects`
  * (`eventParser.js:57-70`): a nullable union decodes to a plain nullable
  * column — the JS wrapper-object problem does not exist in Catalyst rows.
  *
  * Reference: schema-driven per-event decode (`client.js:758-764`,
  * `eventParser.js:13`), encode for publish (`client.js:570,690`).
  */
object AvroCatalyst {

  /** Avro schema JSON → Catalyst DataType (SURVEY §1.2 mapping). */
  def toSqlType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL => NullType
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.map(f =>
        StructField(f.name(), toSqlType(f.schema()), nullable = isNullable(f.schema()))).toSeq)
    case Schema.Type.ARRAY =>
      ArrayType(toSqlType(nonNull(schema.getElementType)),
        containsNull = isNullable(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSqlType(nonNull(schema.getValueType)),
        valueContainsNull = isNullable(schema.getValueType))
    case Schema.Type.UNION => toSqlType(nonNull(schema))
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The single non-null branch of a `["null", T]` union (or the schema
    * itself). Multi-branch unions beyond null+T are not in the reference's
    * event surface and are rejected.
    */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"unsupported multi-branch union: $s")
      branches.head
    }

  /** Avro runtime value → Catalyst value, schema-directed. */
  def toCatalyst(value: Any, schema: Schema): Any = {
    if (value == null) return null
    nonNull(schema).getType match {
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
           Schema.Type.FLOAT | Schema.Type.DOUBLE => value
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(value.toString)
      case Schema.Type.BYTES =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.FIXED => value.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.RECORD =>
        val s = nonNull(schema)
        val rec = value.asInstanceOf[GenericRecord]
        InternalRow.fromSeq(s.getFields.asScala.map(f =>
          toCatalyst(rec.get(f.pos()), f.schema())).toSeq)
      case Schema.Type.ARRAY =>
        val s = nonNull(schema)
        val xs = value.asInstanceOf[java.util.Collection[Any]].asScala
        new GenericArrayData(xs.map(toCatalyst(_, s.getElementType)).toArray)
      case Schema.Type.MAP =>
        val s = nonNull(schema)
        val m = value.asInstanceOf[java.util.Map[Any, Any]].asScala
        ArrayBasedMapData(
          m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
          m.values.map(toCatalyst(_, s.getValueType)).toArray)
      case other => throw new UnsupportedOperationException(s"avro type $other")
    }
  }

  /** Catalyst value → Avro runtime value, schema-directed (for encode). */
  def fromCatalyst(value: Any, schema: Schema, sql: DataType): Any = {
    if (value == null) return null
    val s = nonNull(schema)
    (s.getType, sql) match {
      case (Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
            Schema.Type.FLOAT | Schema.Type.DOUBLE, _) => value
      case (Schema.Type.STRING, _) => value.toString
      case (Schema.Type.ENUM, _) => new GenericData.EnumSymbol(s, value.toString)
      case (Schema.Type.BYTES, _) =>
        java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case (Schema.Type.FIXED, _) =>
        new GenericData.Fixed(s, value.asInstanceOf[Array[Byte]])
      case (Schema.Type.RECORD, st: StructType) =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.pos(),
            fromCatalyst(row.get(i, st(i).dataType), f.schema(), st(i).dataType))
        }
        rec
      case (Schema.Type.ARRAY, at: ArrayType) =>
        val arr = value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        arr.toObjectArray(at.elementType)
          .map(fromCatalyst(_, s.getElementType, at.elementType)).toBuffer.asJava
      case (Schema.Type.MAP, mt: MapType) =>
        val m = value.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val keys = m.keyArray().toObjectArray(StringType)
        val vals = m.valueArray().toObjectArray(mt.valueType)
        val out = new java.util.HashMap[String, Any]()
        keys.indices.foreach(i => out.put(keys(i).toString,
          fromCatalyst(vals(i), s.getValueType, mt.valueType)))
        out
      case (other, _) => throw new UnsupportedOperationException(s"avro type $other")
    }
  }
}

/** `avro_decode(payload, schemaJson) -> struct` — per-event Avro decode
  * (P1). Returns null on corrupt payloads (PERMISSIVE) so callers can route
  * failures to the dead-letter table (S10) instead of failing the batch.
  */
case class AvroDecode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  // reader + decoder are stateful and not thread-safe; expression instances
  // can be shared across tasks in one JVM (local mode), so keep them
  // per-thread.
  @transient private lazy val local =
    ThreadLocal.withInitial[(GenericDatumReader[GenericRecord], Array[BinaryDecoder])](() =>
      (new GenericDatumReader[GenericRecord](schema), new Array[BinaryDecoder](1)))

  override def dataType: DataType = AvroCatalyst.toSqlType(schema)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "avro_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"avro_decode expects binary, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val (reader, decoderHolder) = local.get()
    try {
      decoderHolder(0) = DecoderFactory.get().binaryDecoder(bytes, decoderHolder(0))
      AvroCatalyst.toCatalyst(reader.read(null, decoderHolder(0)), schema)
    } catch { case _: Exception => null } // corrupt payload -> dead-letter path
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

/** `avro_encode(struct, schemaJson) -> binary` — Avro encode for publish
  * (P2, `client.js:570,690`).
  */
case class AvroEncode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val local =
    ThreadLocal.withInitial[(GenericDatumWriter[GenericRecord], Array[BinaryEncoder])](() =>
      (new GenericDatumWriter[GenericRecord](schema), new Array[BinaryEncoder](1)))

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "avro_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StructType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"avro_encode expects struct, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val rec = AvroCatalyst.fromCatalyst(input.asInstanceOf[InternalRow], schema,
      child.dataType).asInstanceOf[GenericRecord]
    val (writer, encoderHolder) = local.get()
    val out = new ByteArrayOutputStream()
    encoderHolder(0) = EncoderFactory.get().binaryEncoder(out, encoderHolder(0))
    writer.write(rec, encoderHolder(0))
    encoderHolder(0).flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}
