package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-random-projection (hyperplane LSH) band keys for a float32 vector:
  * `bands` keys, each from `planesPerBand` pseudo-random ±1 hyperplanes —
  * bit p of band b is `[dot(vec, plane_{b*r+p}) > 0]`.
  *
  * Plane components are ±1 from the parity of `xxhash64(dim, seed =
  * xxhash64(plane, 42))` — deterministic across executors with no broadcast
  * of plane matrices, and free of inter-plane correlation at any
  * dimensionality (a fixed-stride `plane*K + dim` index would make plane p
  * a shifted copy of plane p+1 once dims exceed K). The ±1 sign matrix is memoized per (planes, dims) JVM-wide, so
  * the per-row work is a plain multiply-add sweep (planes × dims), fully
  * inside whole-stage codegen — the round-1 higher-order-function
  * formulation was interpreted and re-hashed every row.
  */
object HyperplaneKernels {
  // sign matrix cache: (numPlanes, dims) -> row-major [plane][dim] signs
  private val signs = new ConcurrentHashMap[(Int, Int), Array[Byte]]()

  private def signMatrix(numPlanes: Int, dims: Int): Array[Byte] =
    signs.computeIfAbsent((numPlanes, dims), { case (p, d) =>
      val m = new Array[Byte](p * d)
      var i = 0
      while (i < p) {
        // per-plane seed derived by a full hash round (not a fixed stride):
        // with `i * K + j` style indexing, dims > K made plane p's tail a
        // shifted copy of plane p+1's head — correlated hyperplanes degrade
        // LSH selectivity. Hashing j under a per-plane seed decorrelates
        // planes for any dimensionality.
        val planeSeed = XXH64.hashLong(i.toLong, 42L)
        var j = 0
        while (j < d) {
          val h = XXH64.hashLong(j.toLong, planeSeed)
          m(i * d + j) = if ((h & 1L) == 0L) 1 else -1
          j += 1
        }
        i += 1
      }
      m
    })

  /** All `bands` band keys in one pass over the vector. */
  def bandKeys(vec: ArrayData, planesPerBand: Int, bands: Int): ArrayData = {
    val dims = vec.numElements()
    val numPlanes = planesPerBand * bands
    val m = signMatrix(numPlanes, dims)
    val out = new Array[Long](bands)
    var plane = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planesPerBand) {
        var dot = 0.0
        var d = 0
        val base = plane * dims
        while (d < dims) {
          dot += vec.getFloat(d).toDouble * m(base + d)
          d += 1
        }
        key = key * 2 + (if (dot > 0) 1L else 0L)
        p += 1
        plane += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `hyperplane_bands(array<float>, planesPerBand, bands) -> array<long>`. */
case class HyperplaneBands(child: Expression, planesPerBand: Int, bands: Int)
    extends UnaryExpression {
  require(planesPerBand >= 1 && planesPerBand <= 62, "planesPerBand in [1, 62]")
  require(bands >= 1, "bands >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"
  override protected def nullSafeEval(input: Any): Any =
    HyperplaneKernels.bandKeys(input.asInstanceOf[ArrayData], planesPerBand, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneKernels.bandKeys($c, $planesPerBand, $bands)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
