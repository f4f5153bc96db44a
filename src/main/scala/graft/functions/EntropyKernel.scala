package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_entropy_stats(string) -> struct<n:int, n_distinct:int,
  * sum_plnp:double>` — per-row character counts and the Σ p·ln p fold in
  * one JVM pass.
  *
  * Replaces the Catalyst formulation (split → array_sort → struct-fold
  * over equal-runs): that shape materializes an n-element string ARRAY
  * and threads a boxed struct accumulator through a higher-order
  * aggregate per character — ~3 s at sf0.1 for what is a counting loop.
  * This kernel is one code-point scan into a TreeMap (ascending
  * code-point order == the UTF8 binary order `array_sort` produced), and
  * the fold `acc + p * ln p` runs over the SAME sorted-unique sequence
  * with the SAME IEEE ops — the float result, and therefore the oracle
  * hash, is bit-identical to the old plan (asserted in
  * TextAnalysisSpec). Takes the ALREADY-LOWERED string so case law stays
  * with Spark's `lower`.
  */
case class CharEntropyStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "char_entropy_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_plnp", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects string, got ${other.simpleString(10)}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      counts.merge(cp, 1L, (a, b) => a + b)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n.toDouble
      acc = acc + p * math.log(p)
    }
    new GenericInternalRow(Array[Any](n, counts.size, acc))
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}
