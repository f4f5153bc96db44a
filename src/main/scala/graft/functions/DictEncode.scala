package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-dictionary subword encoding: maps a token array through a
  * torrent-broadcast `word -> subword-tokens` dictionary in one codegen'd
  * map-side pass — the encode analogue of [[BloomBroadcastProbe]]'s
  * broadcast-handle shape. The equivalent join formulation pays a
  * token-granular `posexplode` + per-document reassembly shuffle (one row
  * per corpus token); this expression keeps the document row intact, so
  * tokenizing with a learned vocabulary is a pure scan → project pipeline
  * with zero shuffle. Tasks build the hash map once per executor (lazy on
  * the broadcast value) with `UTF8String` keys, so probing never converts
  * the incoming tokens to java Strings.
  *
  * Unseen words fall back to their per-character symbol sequence +
  * `fallbackMark` — byte-identical to the join path's fallback (the spec
  * asserts both paths equal on the same corpus).
  */
case class BpeDictEncode(
    dict: Broadcast[Array[(String, Array[String])]],
    fallbackMark: String,
    child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_dict_encode expects array<string> tokens, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_dict_encode"

  @transient private lazy val map: java.util.HashMap[UTF8String, Array[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]](
      dict.value.length * 2)
    for ((w, syms) <- dict.value)
      m.put(UTF8String.fromString(w), syms.map(UTF8String.fromString))
    m
  }

  @transient private lazy val mark = UTF8String.fromString(fallbackMark)

  private def fallback(tok: UTF8String): Array[UTF8String] = {
    val chars = tok.toString.split("").filter(_.nonEmpty)
    val out = new Array[UTF8String](chars.length + 1)
    var i = 0
    while (i < chars.length) { out(i) = UTF8String.fromString(chars(i)); i += 1 }
    out(chars.length) = mark
    out
  }

  def encode(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val parts = new Array[Array[UTF8String]](n)
    var total = 0
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      val hit = if (tok == null) null else map.get(tok)
      val syms = if (hit != null) hit
                 else if (tok == null || tok.numBytes() == 0) Array.empty[UTF8String]
                 else fallback(tok)
      parts(i) = syms
      total += syms.length
      i += 1
    }
    val out = new Array[Any](total)
    var k = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { out(k) = p(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDictEncode", this,
      classOf[BpeDictEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDictEncode =
    copy(child = newChild)
}

/** Integer-id sibling of [[BpeDictEncode]]: maps a token array straight to
  * the flattened SUBWORD-ID stream (the model-input artifact) in one
  * map-side pass. `dict` is `word -> subword ids`; unseen words fall back
  * per character through `symIds` (character symbol -> id), and symbols
  * absent from the vocabulary emit `unkId`.
  */
case class BpeDictEncodeIds(
    dict: Broadcast[Array[(String, Array[Int])]],
    symIds: Broadcast[Array[(String, Int)]],
    fallbackMark: String,
    unkId: Int,
    child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_dict_encode_ids expects array<string> tokens, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_dict_encode_ids"

  @transient private lazy val map: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]](dict.value.length * 2)
    for ((w, ids) <- dict.value) m.put(UTF8String.fromString(w), ids)
    m
  }

  @transient private lazy val syms: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](symIds.value.length * 2)
    for ((s, id) <- symIds.value) m.put(UTF8String.fromString(s), id)
    m
  }

  private def idOf(s: UTF8String): Int = {
    val v = syms.get(s)
    if (v == null) unkId else v.intValue()
  }

  private def fallback(tok: UTF8String): Array[Int] = {
    val chars = tok.toString.split("").filter(_.nonEmpty)
    val out = new Array[Int](chars.length + 1)
    var i = 0
    while (i < chars.length) {
      out(i) = idOf(UTF8String.fromString(chars(i))); i += 1
    }
    out(chars.length) = idOf(UTF8String.fromString(fallbackMark))
    out
  }

  def encode(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val parts = new Array[Array[Int]](n)
    var total = 0
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      val hit = if (tok == null) null else map.get(tok)
      val ids = if (hit != null) hit
                else if (tok == null || tok.numBytes() == 0) Array.empty[Int]
                else fallback(tok)
      parts(i) = ids
      total += ids.length
      i += 1
    }
    val out = new Array[Int](total)
    var k = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { out(k) = p(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDictEncodeIds", this,
      classOf[BpeDictEncodeIds].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDictEncodeIds =
    copy(child = newChild)
}
