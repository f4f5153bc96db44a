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

  /** Per-band probe-key lists for query-directed multi-probe (Lv et al.,
    * "Multi-Probe LSH: Efficient Indexing for High-Dimensional Similarity
    * Search", VLDB 2007): band b's list is its own key followed by the keys
    * reached by flipping subsets (size ≤ `probeBits`) of the `probePlanes`
    * planes with the smallest |dot| — a sign bit flips between two near
    * vectors exactly when the projection crosses 0, so disagreements
    * concentrate on low-|margin| planes and probing only those retains
    * nearly all of blind multi-probe's recall at a fraction of the keys
    * (11 vs 37 at r=8, probeBits=2, probePlanes=4).
    *
    * Same sign matrix and bit layout as [[bandKeys]], so probe keys join
    * exactly against plain band keys.
    */
  def probeKeys(vec: ArrayData, planesPerBand: Int, bands: Int,
                probeBits: Int, probePlanes: Int): ArrayData = {
    val dims = vec.numElements()
    val numPlanes = planesPerBand * bands
    val m = signMatrix(numPlanes, dims)
    val pp = probePlanes
    val nKeys = 1 + (if (probeBits >= 1) pp else 0) +
      (if (probeBits >= 2) pp * (pp - 1) / 2 else 0)
    val out = new Array[ArrayData](bands)
    val dots = new Array[Double](planesPerBand)
    val order = new Array[Int](planesPerBand)
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
        dots(p) = dot
        key = key * 2 + (if (dot > 0) 1L else 0L)
        p += 1
        plane += 1
      }
      // insertion-sort plane indices by |dot| ascending (r ≤ 62, tiny)
      var i = 0
      while (i < planesPerBand) { order(i) = i; i += 1 }
      i = 1
      while (i < planesPerBand) {
        val oi = order(i)
        val ki = math.abs(dots(oi))
        var j = i - 1
        while (j >= 0 && math.abs(dots(order(j))) > ki) {
          order(j + 1) = order(j); j -= 1
        }
        order(j + 1) = oi
        i += 1
      }
      // plane p occupies key bit (planesPerBand - 1 - p)
      def bit(p: Int): Long = 1L << (planesPerBand - 1 - order(p))
      val keys = new Array[Long](nKeys)
      keys(0) = key
      var w = 1
      if (probeBits >= 1) {
        var a = 0
        while (a < pp) { keys(w) = key ^ bit(a); w += 1; a += 1 }
      }
      if (probeBits >= 2) {
        var a = 0
        while (a < pp) {
          var c = a + 1
          while (c < pp) { keys(w) = key ^ bit(a) ^ bit(c); w += 1; c += 1 }
          a += 1
        }
      }
      out(b) = new GenericArrayData(keys)
      b += 1
    }
    new GenericArrayData(out)
  }

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

/** `hyperplane_probes(array<float>, r, bands, probeBits, probePlanes) ->
  * array<array<long>>` — per band `[key, probe keys…]` for query-directed
  * multi-probe (see [[HyperplaneKernels.probeKeys]]).
  */
case class HyperplaneProbes(child: Expression, planesPerBand: Int, bands: Int,
                            probeBits: Int, probePlanes: Int)
    extends UnaryExpression {
  require(planesPerBand >= 1 && planesPerBand <= 62, "planesPerBand in [1, 62]")
  require(bands >= 1, "bands >= 1")
  require(probeBits >= 0 && probeBits <= 2, "probeBits in [0, 2]")
  require(probePlanes >= math.min(probeBits, 1) && probePlanes <= planesPerBand,
    "probePlanes in [probeBits>0, planesPerBand]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got $other")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_probes"
  override protected def nullSafeEval(input: Any): Any =
    HyperplaneKernels.probeKeys(input.asInstanceOf[ArrayData],
      planesPerBand, bands, probeBits, probePlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneKernels.probeKeys($c, $planesPerBand, " +
        s"$bands, $probeBits, $probePlanes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbes =
    copy(child = newChild)
}
