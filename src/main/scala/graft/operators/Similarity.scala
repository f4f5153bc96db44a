package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the correctness baseline;
  * sign-random-projection (hyperplane LSH) bucketing is the scale path —
  * candidate generation cost O(N·planes·dim) + a bucket-pruned scan instead
  * of a full O(N·dim) scan per query (and O(N²) for all-pairs).
  */
object Similarity {

  /** Brute-force cosine top-k against a single query vector (given as the
    * row of `embs` with `idCol == queryId`). The one-row query side is
    * broadcast; the scan stays fully parallel and codegen'd; TakeOrdered
    * handles the top-k without a global sort.
    */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val query = embs.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    embs.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("cos", round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * parity of xxhash64 — reproducible across executors with no broadcast
    * of plane matrices.
    */
  private def signComponent(plane: Column, d: Column): Column =
    when(pmod(xxhash64(plane * 1024 + d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Bucket expression: for each of `numPlanes` pseudo-random hyperplanes,
    * bit p = [dot(vec, plane_p) > 0]; bucket = bits as an integer.
    */
  def bucketExpr(vec: Column, numPlanes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(numPlanes - 1)), p => {
      // dot(vec, plane_p) with plane components ±1 derived from xxhash64:
      // zip vector values with their positions via zip_with over indices.
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, d) =>
          v * signComponent(p, d)),
        lit(0.0).cast("double"),
        (acc, x) => acc + x)
      when(dotp > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed ANN top-k: prune to vectors whose bucket is within
    * `maxHamming` bits of the query's bucket (multi-probe), then exact
    * cosine + top-k on the pruned candidate set.
    */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int = 8,
              maxHamming: Int = 2): DataFrame = {
    val withBucket = embs.withColumn("bucket", bucketExpr(col(vecCol), numPlanes))
    val query = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("bucket").as("query_bucket"))
    withBucket.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .filter(bit_count(col("bucket").bitwiseXOR(col("query_bucket"))) <= maxHamming)
      .withColumn("cos", round(cosine_similarity(col(vecCol), col("query_vec")), 3))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
