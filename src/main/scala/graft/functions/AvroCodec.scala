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
  * use (SURVEY §1.2): primitives, records, arrays, maps, enums, fixed,
  * unions (nullable AND multi-branch), and the logical types common in
  * Salesforce field schemas (decimal, date, timestamp-millis/micros).
  *
  * Union handling IS the reference's `flattenSinglePropertyObjects`
  * (`eventParser.js:57-70`), which unwraps ANY single-property union
  * wrapper object: a `["null", T]` union decodes to a plain nullable
  * column; a multi-branch union whose branches share one Catalyst type
  * (e.g. string|enum) flattens to that type; genuinely mixed-type unions
  * decode to a struct of one nullable field per branch (`member_<type>`),
  * exactly one non-null — the closed-schema analog of the JS dynamic value.
  *
  * Reference: schema-driven per-event decode (`client.js:758-764`,
  * `eventParser.js:13`), encode for publish (`client.js:570,690`).
  */
object AvroCatalyst {

  import org.apache.avro.LogicalTypes

  /** The Catalyst type a logical-type annotation maps to, if any. */
  private def logicalSqlType(s: Schema): Option[DataType] = s.getLogicalType match {
    case d: LogicalTypes.Decimal => Some(DecimalType(d.getPrecision, d.getScale))
    case _: LogicalTypes.Date => Some(DateType)
    case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
      Some(TimestampType)
    case _ => None
  }

  /** Avro schema JSON → Catalyst DataType (SURVEY §1.2 mapping). */
  def toSqlType(schema: Schema): DataType = logicalSqlType(schema).getOrElse(
    schema.getType match {
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
      case Schema.Type.UNION => unionSqlType(schema)
    })

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def unionBranches(s: Schema): Seq[Schema] =
    s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq

  /** Catalyst type of a union: single branch → that branch's type;
    * branches agreeing on one Catalyst type → that type (flattening,
    * `eventParser.js:57-70`); mixed types → one nullable `member_<name>`
    * field per branch.
    */
  private def unionSqlType(s: Schema): DataType = {
    val branches = unionBranches(s)
    val sqlTypes = branches.map(toSqlType)
    if (sqlTypes.distinct.size == 1) sqlTypes.head
    else StructType(branches.zip(sqlTypes).map { case (b, t) =>
      StructField(memberName(b), t, nullable = true)
    })
  }

  private def memberName(branch: Schema): String = branch.getType match {
    case Schema.Type.RECORD | Schema.Type.ENUM | Schema.Type.FIXED =>
      "member_" + branch.getName.toLowerCase
    case t => "member_" + t.getName.toLowerCase
  }

  /** Whether a union needs the member-struct representation. */
  private def isMixedUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && {
      val types = unionBranches(s).map(toSqlType)
      types.size > 1 && types.distinct.size > 1
    }

  /** The single non-null branch of a `["null", T]` union (or the schema
    * itself). Same-Catalyst-type multi-branch unions pick the branch
    * matching the runtime value at decode; [[toCatalyst]]/[[fromCatalyst]]
    * resolve that per value, so this helper is only for the single-branch
    * shape.
    */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = unionBranches(s)
      if (branches.size == 1) branches.head
      else s // multi-branch: resolved per-value by the codec
    }

  /** Avro runtime value → Catalyst value, schema-directed. */
  def toCatalyst(value: Any, schema: Schema): Any = {
    if (value == null) return null
    if (schema.getType == Schema.Type.UNION) {
      // resolve which branch this runtime value belongs to, then either
      // flatten (single/same-type) or slot it into the member struct
      val branch = schema.getTypes.get(GenericData.get().resolveUnion(schema, value))
      if (!isMixedUnion(schema)) return toCatalyst(value, branch)
      val branches = unionBranches(schema)
      val arr = new Array[Any](branches.size)
      arr(branches.indexOf(branch)) = toCatalyst(value, branch)
      return InternalRow.fromSeq(arr.toSeq)
    }
    logicalSqlType(schema) match {
      case Some(dt: DecimalType) =>
        val unscaled = schema.getType match {
          case Schema.Type.FIXED => value.asInstanceOf[GenericData.Fixed].bytes()
          case _ =>
            val bb = value.asInstanceOf[java.nio.ByteBuffer]
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
        }
        Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(unscaled), dt.scale), dt.precision, dt.scale)
      case Some(DateType) => value // int days since epoch, both sides
      case Some(TimestampType) => schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis => value.asInstanceOf[Long] * 1000L
        case _ => value // micros, Catalyst-native
      }
      case _ => schema.getType match {
        case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
             Schema.Type.FLOAT | Schema.Type.DOUBLE => value
        case Schema.Type.STRING | Schema.Type.ENUM =>
          UTF8String.fromString(value.toString)
        case Schema.Type.BYTES =>
          val bb = value.asInstanceOf[java.nio.ByteBuffer]
          val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
        case Schema.Type.FIXED => value.asInstanceOf[GenericData.Fixed].bytes().clone()
        case Schema.Type.RECORD =>
          val rec = value.asInstanceOf[GenericRecord]
          InternalRow.fromSeq(schema.getFields.asScala.map(f =>
            toCatalyst(rec.get(f.pos()), f.schema())).toSeq)
        case Schema.Type.ARRAY =>
          val xs = value.asInstanceOf[java.util.Collection[Any]].asScala
          new GenericArrayData(xs.map(toCatalyst(_, schema.getElementType)).toArray)
        case Schema.Type.MAP =>
          val m = value.asInstanceOf[java.util.Map[Any, Any]].asScala
          ArrayBasedMapData(
            m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
            m.values.map(toCatalyst(_, schema.getValueType)).toArray)
        case other => throw new UnsupportedOperationException(s"avro type $other")
      }
    }
  }

  /** Catalyst value → Avro runtime value, schema-directed (for encode). */
  def fromCatalyst(value: Any, schema: Schema, sql: DataType): Any = {
    if (value == null) return null
    if (isMixedUnion(schema)) {
      // member struct: exactly one non-null field selects the branch
      val row = value.asInstanceOf[InternalRow]
      val branches = unionBranches(schema)
      val st = unionSqlType(schema).asInstanceOf[StructType]
      branches.indices.foreach { i =>
        if (!row.isNullAt(i))
          return fromCatalyst(row.get(i, st(i).dataType), branches(i), st(i).dataType)
      }
      return null
    }
    val s = nonNull(schema) match {
      // same-Catalyst-type multi-branch union: encode via the branch that
      // accepts any value of the type (a plain string/primitive over
      // enum/fixed, which validate symbols/size)
      case u if u.getType == Schema.Type.UNION =>
        val bs = unionBranches(u)
        bs.find(b => b.getType != Schema.Type.ENUM && b.getType != Schema.Type.FIXED)
          .getOrElse(bs.head)
      case other => other
    }
    logicalSqlType(s) match {
      case Some(_: DecimalType) =>
        val unscaled = value.asInstanceOf[Decimal]
          .toJavaBigDecimal.unscaledValue().toByteArray
        s.getType match {
          case Schema.Type.FIXED =>
            // left-pad with the sign byte to the fixed size
            val out = new Array[Byte](s.getFixedSize)
            val pad: Byte = if (unscaled.head < 0) -1 else 0
            java.util.Arrays.fill(out, pad)
            System.arraycopy(unscaled, 0, out, out.length - unscaled.length, unscaled.length)
            new GenericData.Fixed(s, out)
          case _ => java.nio.ByteBuffer.wrap(unscaled)
        }
      case Some(DateType) => value // int days
      case Some(TimestampType) => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          java.lang.Long.valueOf(value.asInstanceOf[Long] / 1000L)
        case _ => value // micros
      }
      case _ => fromCatalystBase(value, s, sql)
    }
  }

  private def fromCatalystBase(value: Any, s: Schema, sql: DataType): Any = {
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
