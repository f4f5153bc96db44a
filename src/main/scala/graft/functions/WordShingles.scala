package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling: lowercase → trim → split on `\s+` →
  * space-joined n-grams → distinct (first-occurrence order).
  *
  * Exists because the composable formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i, n)))`)
  * re-evaluates the `tokens` child — a regex split — once per lambda
  * iteration (no common-subexpression elimination inside higher-order
  * lambdas), turning an O(tokens) projection into O(tokens²) regex work.
  * This kernel does one split and one linear scan per row, and codegens.
  */
object WordShingleKernel {
  private val Ws = Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val tokens = Ws.split(text.toLowerCase.trim.toString)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((tokens.length - n + 1) * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n) -> array<string>` (distinct n-gram shingles). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    WordShingleKernel.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingleKernel.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
