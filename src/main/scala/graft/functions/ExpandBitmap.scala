package graft.functions

import java.math.BigInteger

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `expand_bitmap(bitmaps, fields, childFields) -> array<string>` —
  * CDC header field-bitmap expansion.
  *
  * A CDC `ChangeEventHeader` carries `nulledFields` / `diffFields` /
  * `changedFields` as hex bitmaps over the entity schema's ordered field
  * list; compound fields (e.g. `BillingAddress`) arrive as `"<parentIdx>-0xNN"`
  * entries whose bitmap indexes the parent's child-record fields.
  *
  * Reference semantics (`docs/pub-sub-api-node-client/src/utils/eventParser.js`):
  *  - `parseFieldBitmaps` (79-114): first entry expanded iff it starts with
  *    `"0x"`; compound entries processed only when the list has >1 entries and
  *    the LAST entry contains `'-'`; child names emitted as `parent.child`.
  *  - `getFieldNamesFromBitmap` (140-152): hex → binary, reverse, bit i set →
  *    `fields(i)` — i.e. plain LSB-first bit indexing of the hex integer.
  *  - `getChildFields` (122-131): children = fields of the record branch(es)
  *    of the parent's union type — supplied here pre-flattened via the
  *    `childFields` map (parent name → ordered child field names).
  *
  * Deviation: the reference's `hexToBin` (195-214) maps only uppercase hex
  * digits; we parse case-insensitively.
  *
  * Pure function of its inputs, so with literal `fields` / `childFields`
  * (the usual case — they come from the schema registry at plan time) it is
  * foldable-friendly. Interpreted eval only (CodegenFallback): header
  * expansion is a per-event metadata transform, not a columnar hot loop.
  */
case class ExpandBitmap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "expand_bitmap"
  // pure function of its inputs: with literal bitmaps/fields (constant CDC
  // headers), Catalyst's ConstantFolding collapses the call at plan time —
  // the "foldable bitmap rule" from SURVEY §4.2 for free.
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType.isInstanceOf[ArrayType] &&
      second.dataType.isInstanceOf[ArrayType] &&
      third.dataType.isInstanceOf[MapType]
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expand_bitmap expects (array<string>, array<string>, map<string,array<string>>), " +
        s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  private def namesFromBitmap(fields: IndexedSeq[String], hex: String): Seq[String] = {
    val digits = if (hex.startsWith("0x") || hex.startsWith("0X")) hex.substring(2) else hex
    if (digits.isEmpty) return Nil
    val value = new BigInteger(digits, 16)
    val maxBits = math.min(4 * digits.length, fields.length)
    (0 until maxBits).collect { case i if value.testBit(i) => fields(i) }
  }

  override protected def nullSafeEval(bmAny: Any, fieldsAny: Any, childAny: Any): Any = {
    val bitmaps = bmAny.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString)
    val fields = fieldsAny.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString).toIndexedSeq
    val childMapData = childAny.asInstanceOf[MapData]
    val childKeys = childMapData.keyArray().toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString)
    val childVals = childMapData.valueArray().toObjectArray(ArrayType(StringType))
      .map(_.asInstanceOf[ArrayData].toObjectArray(StringType)
        .map(_.asInstanceOf[UTF8String].toString).toIndexedSeq)
    val childMap = childKeys.zip(childVals).toMap

    val out = ArrayBuffer.empty[String]
    if (bitmaps.nonEmpty) {
      if (bitmaps.head.startsWith("0x")) out ++= namesFromBitmap(fields, bitmaps.head)
      if (bitmaps.length > 1 && bitmaps.last.contains('-')) {
        bitmaps.foreach { bm =>
          val parts = bm.split("-")
          if (parts.length >= 2) {
            val parent = fields(Integer.parseInt(parts(0), 10))
            val children = childMap.getOrElse(parent, IndexedSeq.empty)
            out ++= namesFromBitmap(children, parts(1)).map(c => s"$parent.$c")
          }
        }
      }
    }
    new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ExpandBitmap =
    copy(first = newFirst, second = newSecond, third = newThird)
}
