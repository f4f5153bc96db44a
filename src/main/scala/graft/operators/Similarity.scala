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

  /** Bucket expression: for each of `numPlanes` pseudo-random ±1
    * hyperplanes (components from fixed hashes — reproducible across
    * executors with no plane-matrix broadcast), bit p =
    * [dot(vec, plane_p) > 0]; bucket = bits as an integer. One codegen'd
    * multiply-add pass ([[graft.functions.HyperplaneBands]], bands = 1).
    */
  def bucketExpr(vec: Column, numPlanes: Int): Column =
    element_at(graft.functions.hyperplane_bands(vec, numPlanes, 1), 1)

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
