package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Online logistic-regression training over a document stream — the
  * streaming twin of [[graft.operators.Classifier.lrTrain]]: each
  * micro-batch performs ONE mini-batch gradient step from the persisted
  * weight state and appends the post-batch weights as a versioned state
  * row. The quality-filter model keeps learning as the corpus is
  * ingested, instead of waiting for a batch retrain.
  *
  * Same determinism contract as the batch trainer: weights on the integer
  * nano-grid, residuals on the micro-grid, every distributed sum an exact
  * `long` sum — so the weight sequence is a PURE FUNCTION of the batch
  * sequence (bit-identical to stepping the batches serially, any
  * per-batch partitioning; spec-pinned). Redelivery is idempotent in
  * VALUE, not in bytes: batch `b` recomputes from the newest state with
  * `batch_id < b` and appends a duplicate state row with the identical
  * weight vector (mode "append"), so the log may briefly hold several
  * value-identical rows per batch id — harmless because [[readWeights]]
  * takes `limit(1)` of the newest and duplicates compare equal. The log
  * auto-compacts down to the 8 newest rows once it exceeds 16 files
  * (redelivery only ever needs the previous row).
  *
  * Per-batch scale shape: one zero-shuffle codegen'd margin pass
  * ([[graft.functions.BucketWeightSum]]) over the batch + one bucket-keyed
  * gradient aggregate (map-side partials ≤ buckets+1 rows) — O(batch),
  * independent of stream history.
  */
object StreamingLr {

  private val StateSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("w_nano", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Newest weights with `batch_id < beforeBatch` (zeros if none). */
  def readWeights(spark: SparkSession, stateDir: String, beforeBatch: Long,
                  buckets: Int): Array[Long] = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(stateDir))) return Array.fill(buckets + 1)(0L)
    spark.read.schema(StateSchema).parquet(stateDir)
      .filter(col("batch_id") < beforeBatch)
      .orderBy(desc("batch_id")).limit(1).collect()
      .headOption.map(_.getSeq[Long](1).toArray)
      .getOrElse(Array.fill(buckets + 1)(0L))
  }

  /** The newest weight state as a scoring model `(b, w_nano, w)` — feed
    * to [[graft.operators.Classifier.lrScore]].
    */
  def currentModel(spark: SparkSession, stateDir: String,
                   buckets: Int): DataFrame = {
    import spark.implicits._
    readWeights(spark, stateDir, Long.MaxValue, buckets).zipWithIndex
      .map { case (w, i) => (i - 1L, w, w / 1e9) }
      .toSeq.toDF("b", "w_nano", "w")
  }

  /** One online step: gradient of `batch` at the persisted weights, then
    * append the updated state row (idempotent under redelivery).
    */
  def stepBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                stateDir: String, idCol: String, textCol: String,
                positive: Column, buckets: Int = 1024,
                learnRate: Double = 0.5): Unit = {
    import spark.implicits._
    import graft.functions.bucket_weight_sum
    StreamingPack.warnIfRewound(spark, stateDir, batchId, "StreamingLr")
    val w0 = readWeights(spark, stateDir, batchId, buckets)
    val f = graft.operators.Classifier
      .lrFeatureArrays(batch, idCol, textCol, positive, buckets)
    val nDocs = f.count()
    val w1 =
      if (nDocs == 0L) w0 // empty batch: carry the state forward
      else {
        val wB = spark.sparkContext.broadcast(w0)
        val grads =
          try {
            f.withColumn("m_nano",
                bucket_weight_sum(wB, col("bs"), col("cnts")))
              .withColumn("r_micro",
                round(lit(1e6) / (lit(1.0) + exp(-(col("m_nano") / 1e9))))
                  .cast("long") - col("y") * 1000000L)
              .select(col("r_micro"),
                explode(arrays_zip(col("bs"), col("cnts"))).as("f"))
              .groupBy(col("f.bs").as("b"))
              .agg(sum(col("r_micro") * col("f.cnts")).as("g"))
              .as[(Long, Long)].collect().toMap
          } finally wB.destroy()
        Array.tabulate(buckets + 1)(i =>
          math.round(w0(i).toDouble
            - learnRate * (grads.getOrElse(i - 1L, 0L) / 1e6) / nDocs * 1e9))
      }
    Seq((batchId, w1.toSeq)).toDF("batch_id", "w_nano")
      .coalesce(1).write.mode("append").parquet(stateDir)
    // keep 8 newest rows (redelivery needs 2); compacts every ~6 batches
    StreamingPack.compactStateLog(spark, stateDir, keep = 8)
  }

  /** Start checkpointed online training over a document stream. */
  def start(spark: SparkSession, stream: DataFrame, stateDir: String,
            checkpointDir: String, idCol: String, textCol: String,
            positive: Column, buckets: Int = 1024, learnRate: Double = 0.5,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          stepBatch(spark, batch, batchId, stateDir, idCol, textCol,
            positive, buckets, learnRate)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
