package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** MinHash signature kernel: ONE xxhash64 per shingle, then k affine
  * transforms `a_i * h + b_i` (odd multipliers from SplitMix64) with an
  * unsigned min per slot — the standard universal-hashing family. O(n + nk)
  * multiply-adds instead of nk string hashes, single pass per row, no
  * shuffle; codegen'd so the signature stage stays inside whole-stage
  * codegen (the previous higher-order-function formulation was interpreted
  * and single-pass-per-seed).
  */
object MinHashKernel {
  private val MaxHashes = 256
  // SplitMix64-generated affine coefficients, fixed seed for determinism.
  private[functions] val (mulA, addB): (Array[Long], Array[Long]) = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.fill(MaxHashes)(next() | 1L) // odd -> bijective mod 2^64
    val b = Array.fill(MaxHashes)(next())
    (a, b)
  }

  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue) // flipped-space min (unsigned)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val utf8 = shingles.getUTF8String(s)
      val h = XXH64.hashUnsafeBytes(utf8.getBaseObject, utf8.getBaseOffset,
        utf8.numBytes(), 42L)
      var i = 0
      while (i < k) {
        val v = (mulA(i) * h + addB(i)) ^ Long.MinValue // flip for unsigned cmp
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_signature(array<string>, k) -> array<long>`. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 256, "numHashes in [1, 256]")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.signature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
