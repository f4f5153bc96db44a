package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for `__batch=b<id>/`-partitioned PARTIAL logs — the
  * idempotent per-micro-batch persistence pattern used by
  * [[MaterializedAgg]] (additive partials) and [[StreamingProfile]]
  * (mergeable sketch partials): each batch overwrites exactly its own
  * partition (redelivery-safe), reads merge all partitions associatively,
  * and a manifest-arbitrated compaction folds history back to one
  * partition without ever losing or double-counting a batch through a
  * crash (see [[MaterializedAgg]]'s scaladoc for the full argument; the
  * semantics and crash windows are identical here by construction).
  */
private[streaming] object PartialLog {

  def stagingPath(targetDir: String): Path = new Path(targetDir + "__agg_staging")

  /** Re-play an interrupted compaction from its staging manifest. */
  def recover(fs: FileSystem, targetDir: String): Unit = {
    val staging = stagingPath(targetDir)
    if (!fs.exists(staging)) return
    if (fs.exists(new Path(staging, "_SUCCESS"))) {
      val sources = {
        val in = fs.open(new Path(staging, "_SOURCES"))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      sources.foreach(s => fs.delete(new Path(targetDir, s), true))
      fs.listStatus(staging).map(_.getPath.getName)
        .find(_.startsWith("__batch=")).foreach { t =>
          val dest = new Path(targetDir, t)
          if (!fs.exists(dest)) fs.rename(new Path(staging, t), dest)
        }
    }
    fs.delete(staging, true)
  }

  /** Highest batch id already folded into a compacted (`c`-tagged)
    * partition, or -1; batches at or below it are inside the fold.
    */
  def compactedMax(fs: FileSystem, targetDir: String): Long = {
    val dir = new Path(targetDir)
    if (!fs.exists(dir)) return -1L
    val ids = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("__batch=c")).map(_.stripPrefix("__batch=c"))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
    if (ids.isEmpty) -1L else ids.max
  }

  /** Guard + overwrite for one batch's partial: recovers any interrupted
    * compaction first, skips batches already inside a fold, then
    * overwrites the batch's own partition with `partial` (one file —
    * partials are tiny by contract).
    *
    * The streaming checkpoint dir and `targetDir` are ONE durable unit:
    * delete both or neither. A reset checkpoint restarts batchIds at 0,
    * and every id at or below the surviving fold's `c<max>` tag is
    * (correctly, for the at-least-once redelivery case) skipped — which
    * for a reset means new data is silently dropped until batchIds grow
    * past the old fold. Indistinguishable from a redelivery at this
    * call, so the skip stays and the suspicious shape logs loudly (the
    * [[StreamingKnn.applyBatch]] convention).
    */
  def upsertBatch(spark: SparkSession, targetDir: String, batchId: Long,
                  partial: => DataFrame): Unit = {
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, targetDir)
    val cm = compactedMax(fs, targetDir)
    if (batchId <= cm) {
      System.err.println(
        s"[PartialLog] WARNING: skipping batchId $batchId at or below " +
          s"compacted fold c$cm at $targetDir. Legitimate only as an " +
          "at-least-once redelivery; if the streaming checkpoint was " +
          "deleted/reset while this state dir survived, new batches " +
          "will be dropped until batchIds pass the old fold — delete " +
          "the state dir and checkpoint dir together.")
      return
    }
    partial.coalesce(1)
      .write.mode("overwrite").parquet(s"$targetDir/__batch=b$batchId")
  }

  /** Read the partial log after replaying any interrupted compaction.
    * Read-only consumers MUST come through here rather than
    * `spark.read.parquet` directly: a crash mid-compaction can leave the
    * source partitions deleted with the staged fold still waiting in
    * `__agg_staging/` (rename pending, `_SUCCESS` present), and a raw read
    * of that window silently undercounts until the next writer runs
    * recovery.
    */
  def readRecovered(spark: SparkSession, targetDir: String): DataFrame = {
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, targetDir)
    spark.read.parquet(targetDir)
  }

  /** Fold every batch partition into one via the caller's associative
    * `fold` of the merged view; manifest-arbitrated (crash-recoverable).
    */
  def compact(spark: SparkSession, targetDir: String)
             (fold: => DataFrame): Unit = {
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, targetDir)
    if (!fs.exists(new Path(targetDir))) return
    val parts = fs.listStatus(new Path(targetDir))
      .map(_.getPath.getName).filter(_.startsWith("__batch=")).sorted
    if (parts.length <= 1) return

    val tag = "__batch=c" + parts.map(_.filter(_.isDigit))
      .filter(_.nonEmpty).map(BigInt(_)).max
    val staging = stagingPath(targetDir)
    fold.coalesce(1)
      .write.mode("overwrite").parquet(new Path(staging, tag).toString)
    val src = fs.create(new Path(staging, "_SOURCES"), true)
    try src.write(parts.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally src.close()
    fs.createNewFile(new Path(staging, "_SUCCESS"))

    parts.foreach(p => fs.delete(new Path(targetDir, p), true))
    fs.rename(new Path(staging, tag), new Path(targetDir, tag))
    fs.delete(staging, true)
  }
}
