package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming maintenance of the hyperplane-LSH ANN index: new embedding
  * vectors arriving on a stream are appended into the same `bucket=K/`
  * partition layout [[Similarity.buildIndex]] writes, so the index is a
  * LIVING table — probes see newly ingested vectors after their micro-batch
  * commits, with no global rebuild ever.
  *
  * This works because sign-random-projection buckets are DATA-INDEPENDENT:
  * a vector's bucket depends only on the fixed hyperplanes, never on the
  * rest of the corpus, so append is semantically exact (contrast IVF, whose
  * centroids drift with the data distribution and need periodic
  * re-clustering — that is why [[graft.operators.IvfIndex]] has no
  * streaming append; its maintenance hook is
  * [[graft.operators.IndexCatalog.ensureCurrent]], which rebuilds the IVF
  * entry when the input fingerprint drifts and prunes the superseded one).
  *
  * Per micro-batch: one codegen'd bucket pass over the batch, a
  * `repartition(bucket)` so each touched bucket gets ONE new file (not
  * tasks×buckets small files), and an append-only partitioned write — the
  * same O(batch + touched buckets) I/O contract as
  * [[StreamingDedup.dedupBatch]]'s fingerprint index. Small files from many
  * micro-batches are reclaimed by [[Compaction]], which is safe here for
  * the same reason as there: probes tolerate duplicate rows
  * ([[probeTopK]] folds them), and appends never modify existing files.
  *
  * At-least-once: a redelivered batch appends its vectors twice; probes
  * fold duplicates by id before ranking ([[probeTopK]]'s dropDuplicates —
  * the rows are byte-identical, so any representative is correct). This is
  * the standard duplicate-absorbing contract of every append-only table in
  * this engine.
  */
object StreamingAnnIndex {

  /** Append one batch of vectors into the bucket-partitioned index. */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, numPlanes: Int = 8): Unit =
    batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Similarity.bucketExpr(col("vec"), numPlanes))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(indexDir)

  /** Start the checkpointed streaming index maintenance. */
  def start(stream: DataFrame, idCol: String, vecCol: String,
            indexDir: String, checkpointDir: String, numPlanes: Int = 8,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retry.withBackoff() {
          appendBatch(batch, idCol, vecCol, indexDir, numPlanes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Top-k probe of the living index: identical bucket pruning to
    * [[Similarity.indexTopK]] (literal `isin` on the partition column —
    * only matching `bucket=K/` dirs are opened), plus a fold of duplicate
    * ids that at-least-once redelivery may have appended. The fold runs on
    * the bucket-pruned candidate set, so its cost is O(candidates), not
    * O(index).
    */
  def probeTopK(spark: SparkSession, indexDir: String, queryVec: Array[Float],
                k: Int, numPlanes: Int = 8, maxHamming: Int = 2): DataFrame = {
    val qb = graft.functions.HyperplaneKernels.bandKeys(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(queryVec),
      numPlanes, 1).getLong(0)
    val probes = Similarity.probeBuckets(qb, numPlanes, maxHamming)
    spark.read.parquet(indexDir)
      .filter(col("bucket").isin(probes: _*))
      .dropDuplicates("id") // absorb at-least-once re-appends
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("vec"),
          typedlit(queryVec.toSeq)), 3))
      .select(col("id"), col("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
