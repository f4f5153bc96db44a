package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static helpers shared by interpreted eval and generated code. */
object ReplayIdCodec {
  /** Big-endian unsigned 64-bit decode of a replay-ID byte buffer.
    *
    * Semantics from the reference's `Buffer.readBigUInt64BE()`
    * (`docs/pub-sub-api-node-client/src/utils/eventParser.js:160-162`).
    * Buffers shorter than 8 bytes are treated as left-padded with zeros.
    * The JS BigInt cliff at 2^53 (`src/utils/avroHelper.js:8-34`) does not
    * exist on the JVM: a `Long` carries the full 64 bits.
    */
  def decode(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    val n = bytes.length
    val start = if (n > 8) n - 8 else 0
    i = start
    while (i < n) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    v
  }

  /** Big-endian 8-byte encode (`eventParser.js:170-174`). */
  def encode(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(i) = ((v >>> (8 * (7 - i))) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** `decode_replay_id(binary) -> long` — stream-offset decode.
  *
  * Reference: `eventParser.js:160-162` (big-endian uint64). Codegen'd so it
  * stays inside whole-stage codegen on the ingest hot path.
  */
case class DecodeReplayId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"decode_replay_id expects binary, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decode_replay_id"
  override protected def nullSafeEval(input: Any): Any =
    ReplayIdCodec.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReplayIdCodec.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): DecodeReplayId =
    copy(child = newChild)
}

/** `encode_replay_id(long) -> binary` — inverse of [[DecodeReplayId]].
  * Reference: `eventParser.js:170-174`. */
case class EncodeReplayId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"encode_replay_id expects long, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "encode_replay_id"
  override protected def nullSafeEval(input: Any): Any =
    ReplayIdCodec.encode(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReplayIdCodec.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): EncodeReplayId =
    copy(child = newChild)
}
