package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{KnnGraph, Similarity}

/** The exact KNN edge state maintained UNDER A VECTOR STREAM — every
  * graph-analytics consumer (propagation, PageRank, communities,
  * triangles) reads a graph that is ALWAYS the exact top-k relation over
  * the vectors ingested so far, with per-batch cost
  * O(|resident|·|batch|) dots ([[KnnGraph.insertExact]]'s mergeable-
  * top-k contract), never the O(N²) rebuild a batch pipeline would
  * re-pay per refresh.
  *
  * State layout under `path/`:
  *  - `vectors/__batch=bN/` — the ingested vectors, each batch
  *    DYNAMICALLY OVERWRITING its own partition (the [[StreamingLayout]]
  *    idempotency shape), so redelivery rewrites rather than duplicates;
  *  - `edges/v=N/` — full edge-state versions: batch N writes the new
  *    state to `v=N` (parquet `_SUCCESS` = commit mark), then prunes
  *    older versions. The VERSION TAG is the idempotency arbiter, the
  *    [[MaterializedAgg]] fold-tag rule: a redelivered batch whose tag
  *    already exists complete is SKIPPED, and a crash between the state
  *    write and the prune leaves only extra complete versions that the
  *    replay prunes — readers always resolve the max complete version,
  *    so every crash window reads as either fully-before or fully-after.
  *
  * Batch 0 bootstraps with a self top-k over its own vectors; later
  * batches resolve their resident set as the vector partitions `≤` the
  * current edge version (vectors written by an uncommitted successor
  * batch are excluded by construction, closing the crash-between-writes
  * window).
  *
  * Contract: stream ids are NEW ids (insert-only — the
  * [[KnnGraph.insertExact]] disjointness contract); upstream id dedup is
  * [[StreamingDedup]]'s job, and vector DELETES are a batch-side
  * operation ([[KnnGraph.deleteExact]] against the current version, the
  * text indexes' convention).
  */
object StreamingKnn {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Complete (committed) edge-state versions, ascending. */
  private def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(s"$path/edges")
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Idempotent micro-batch apply — the `foreachBatch` body. */
  def applyBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                 vecCol: String, k: Int, path: String,
                 batchId: Long): Unit = {
    val vers = versions(spark, path)
    // prune superseded versions FIRST, so a crash that landed between a
    // state write and its prune is healed by ANY later call — including
    // the redelivery of the already-committed batch that then skips
    if (vers.size > 1) {
      val root = new Path(s"$path/edges")
      val f = fs(spark, root)
      vers.dropRight(1).foreach(v => f.delete(new Path(root, s"v=$v"), true))
    }
    // At-least-once: redelivery of ANY committed batch skips (spec-pinned
    // — batch 0 may legitimately redeliver while v=1 is committed). But a
    // batchId BELOW the max committed version is also what a RESET
    // checkpoint looks like (batchIds restart at 0) against a surviving
    // state dir — and in that failure mode the skip silently drops every
    // new batch forever while currentEdges serves stale state. The two
    // are indistinguishable from one call, so the skip stays (correct
    // for the legitimate case) and the suspicious shape logs LOUDLY so a
    // stuck pipeline names its own cause. Contract (scaladoc on
    // [[start]]): the checkpoint dir and the state dir live and die
    // together.
    vers.lastOption.filter(_ > batchId).foreach { m =>
      System.err.println(
        s"[StreamingKnn] WARNING: skipping batchId $batchId below " +
          s"committed state version $m at $path. Legitimate only as an " +
          "at-least-once redelivery; if the streaming checkpoint was " +
          "deleted/reset while this state dir survived, EVERY new batch " +
          "will be skipped — delete the state dir and checkpoint dir " +
          "together.")
    }
    if (vers.exists(_ >= batchId)) return // redelivery of a committed batch
    val delta = batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
    delta.withColumn("__batch", lit(s"b$batchId"))
      .write.partitionBy("__batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$path/vectors")
    val next = vers.lastOption match {
      case None =>
        Similarity.intDotTopKBatch(delta, "id", "vec", delta, "id", "vec",
            k)
          .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
      case Some(m) =>
        val resident = spark.read.parquet(s"$path/vectors")
          .withColumn("__bn",
            regexp_extract(col("__batch"), "^b(\\d+)$", 1).cast("long"))
          .filter(col("__bn") <= m)
          .select("id", "vec")
        KnnGraph.insertExact(spark.read.parquet(s"$path/edges/v=$m"),
          resident, delta, "id", "vec", k)
    }
    // overwrite, not the default ErrorIfExists: a failed/crashed write
    // leaves v=N WITHOUT _SUCCESS (uncommitted to readers), and the
    // retry / restart replay must be able to rewrite that directory —
    // ErrorIfExists would wedge the stream on its own leftovers
    next.write.mode("overwrite").parquet(s"$path/edges/v=$batchId")
    val root = new Path(s"$path/edges")
    val f = fs(spark, root)
    vers.foreach(v => f.delete(new Path(root, s"v=$v"), true))
  }

  /** Start the checkpointed streaming maintenance.
    *
    * `checkpointDir` and `path` (the state dir) form ONE durable unit:
    * delete both or neither. A reset checkpoint against a surviving
    * state dir restarts batchIds at 0 below the committed state version,
    * so [[applyBatch]] skips every batch (indistinguishable from an
    * at-least-once redelivery, which MUST skip) — it logs a loud warning
    * per skipped batch naming this failure mode.
    */
  def start(stream: DataFrame, idCol: String, vecCol: String, k: Int,
            path: String, checkpointDir: String,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          applyBatch(batch.sparkSession, batch, idCol, vecCol, k, path,
            batchId)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** The current committed edge state `(id, nbr, dot)`. */
  def currentEdges(spark: SparkSession, path: String): DataFrame = {
    val vers = versions(spark, path)
    require(vers.nonEmpty, s"no committed edge state under $path/edges")
    spark.read.parquet(s"$path/edges/v=${vers.last}")
  }
}
