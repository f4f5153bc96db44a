package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for append-only bucket tables (the streaming-dedup
  * fingerprint index, the LSH postings/shingle stores): every micro-batch
  * appends a file per touched bucket, so a long-running stream accretes
  * thousands of tiny files per bucket — the classic small-file problem that
  * kills scan throughput at scale.
  *
  * [[compactBuckets]] rewrites each oversized `__bucket=N/` dir into one
  * file. Crash-safety leans on the READ semantics of these tables: their
  * consumers are duplicate-tolerant (fingerprint anti-joins and candidate
  * probes give the same answer with duplicate rows), so compaction can
  * write the merged file INTO the bucket first and delete the old files
  * after — a crash between the two leaves harmless duplicates, never loss.
  * This is NOT safe for latest-wins MERGE targets (duplicates there change
  * answers); those tables rewrite whole buckets per batch anyway and don't
  * accrete appends.
  *
  * Run it from a maintenance loop (e.g. every N batches inside
  * `foreachBatch`, or a side cron) — the work per call is O(oversized
  * buckets), driver touches only file NAMES.
  */
object Compaction {

  /** Compact every bucket dir under `dir` holding more than
    * `maxFilesPerBucket` parquet files. Returns the bucket ids compacted.
    */
  def compactBuckets(spark: SparkSession, dir: String,
                     maxFilesPerBucket: Int = 8): Seq[Int] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty

    val oversized = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__bucket="))
      .map { s =>
        val files = fs.listStatus(s.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        (s.getPath, files.map(_.getPath))
      }
      .filter(_._2.length > maxFilesPerBucket)

    oversized.flatMap { case (bucketDir, oldFiles) =>
      // 1. write the merged replacement INTO the bucket (readers may briefly
      //    see rows twice — harmless by the table's duplicate-tolerant
      //    contract); 2. delete the superseded files ONLY once the merged
      //    file is durably in place. The destination keeps the staging
      //    part-file's name (globally unique), so two compactions in the
      //    same millisecond can't collide; a failed rename (local/HDFS
      //    return false rather than throw on an existing destination)
      //    aborts the bucket with the old files intact — the table's
      //    contract is "duplicates, never loss".
      val staging = new Path(bucketDir.getParent,
        s".compact_${bucketDir.getName}")
      spark.read.parquet(oldFiles.toIndexedSeq.map(_.toString): _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging)
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      val renamed = fs.rename(part, new Path(bucketDir, part.getName))
      fs.delete(staging, true)
      if (renamed) {
        oldFiles.foreach(f => fs.delete(f, false))
        Some(bucketDir.getName.stripPrefix("__bucket=").toInt)
      } else None
    }.sorted
  }
}
