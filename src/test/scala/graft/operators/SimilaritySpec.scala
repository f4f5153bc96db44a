package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorKernels

import org.apache.spark.sql.catalyst.util.GenericArrayData

class SimilaritySpec extends SparkSpec {

  test("cosine kernel basics") {
    def arr(xs: Float*) = new GenericArrayData(xs.toArray)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(0f, 1f))) < 1e-12)
    assert(VectorKernels.cosine(arr(0f, 0f), arr(1f, 1f)) == 0.0)
    assert(math.abs(VectorKernels.dot(arr(1f, 2f), arr(3f, 4f)) - 11.0) < 1e-12)
  }

  test("brute-force top-k returns k rows sorted by similarity desc") {
    val topk = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10).collect()
    assert(topk.length == 10)
    val sims = topk.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("LSH top-k recall vs brute force is reasonable") {
    val brute = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0, 10)
      .collect().map(_.getLong(0)).toSet
    // multi-probe hamming<=2 over 8 planes: expect most of the true top-10
    assert((brute & lsh).size >= 5, s"recall too low: ${(brute & lsh).size}/10")
  }
}
