package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hash kernels (shared by eval + codegen). */
object TextHashKernels {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Little-endian int64 of md5-digest bytes [8..16) — numerically identical
    * to DuckDB's `md5_number_lower`, which makes hash-dependent operators
    * (SimHash) independently checkable against a SQL oracle.
    */
  def md5Lower64(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (digest(i) & 0xffL); i -= 1 }
    v
  }

  /** SimHash over a token list (duplicates count): for each bit position,
    * sum +1/-1 per token according to bit of md5Lower64(token); bit set iff
    * the sum is positive. Single pass per document — O(tokens) per row, no
    * shuffle, scales linearly in document count.
    */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = md5Lower64(tokens.getUTF8String(t))
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def simhash32(tokens: ArrayData): Long = simhash(tokens, 32)
  def simhash64(tokens: ArrayData): Long = simhash(tokens, 64)

  /** 128-bit SimHash over a token list, as `[hi, lo]` longs: `lo` uses the
    * md5 digest's lower-half bits (bytes [8..16) LE — DuckDB
    * `md5_number_lower`, so it EQUALS [[simhash]]`(tokens, 64)`), `hi` the
    * upper half (bytes [0..8) LE — `md5_number_upper`). One digest call
    * per token feeds both halves. The longer sketch exists for the banding
    * ceiling (see `Dedup.simhash128Pairs`): 4×32-bit bands give 2^32 keys
    * per band — occupancy stays sub-linear far past the 2^16-key ceiling
    * of the 64-bit sketch — while preserving the pigeonhole hamming ≤ 3
    * guarantee.
    */
  def simhash128(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](128) // [0..64) lo bits, [64..128) hi bits
    val n = tokens.numElements()
    val d = md5Local.get()
    var t = 0
    while (t < n) {
      d.reset()
      val digest = d.digest(tokens.getUTF8String(t).getBytes)
      var lo = 0L
      var hi = 0L
      var i = 15
      while (i >= 8) { lo = (lo << 8) | (digest(i) & 0xffL); i -= 1 }
      i = 7
      while (i >= 0) { hi = (hi << 8) | (digest(i) & 0xffL); i -= 1 }
      var b = 0
      while (b < 64) {
        if (((lo >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        if (((hi >>> b) & 1L) == 1L) counts(64 + b) += 1 else counts(64 + b) -= 1
        b += 1
      }
      t += 1
    }
    var outLo = 0L
    var outHi = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) outLo |= (1L << b)
      if (counts(64 + b) > 0) outHi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(outHi, outLo))
  }

  /** Polynomial rolling hash (Rabin-Karp style) of a UTF-8 string: 64-bit
    * base-31 polynomial with natural overflow wrap. Document fingerprinting
    * primitive — one sequential pass, codegen-friendly.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

/** `md5_lower64(string) -> long` — see [[TextHashKernels.md5Lower64]]. */
case class Md5Lower64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bad input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_lower64"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.md5Lower64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.md5Lower64($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Lower64 =
    copy(child = newChild)
}

/** `simhash(array<string>, bits) -> long` — near-duplicate sketch over
  * tokens (32- or 64-bit).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 32 || bits == 64, "bits must be 32 or 64")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] && child.dataType.asInstanceOf[ArrayType].elementType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bad input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"simhash$bits"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** `simhash128(array<string>) -> array<long>` — 128-bit near-duplicate
  * sketch as `[hi, lo]`; see [[TextHashKernels.simhash128]].
  */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] && child.dataType.asInstanceOf[ArrayType].elementType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bad input type ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash128"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash128(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash128($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

/** `rolling_hash(string) -> long` — polynomial fingerprint (mod 2^61-1). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bad input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
