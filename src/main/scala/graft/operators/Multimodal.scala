package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages shaped for a 100 TB training-data pipeline.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — this environment ships no image/audio libraries — behind
  * [[fakeDecodeMeta]], a deterministic stand-in with the same schema,
  * partitioning behavior, and batch shape a real decoder would have. The
  * Spark-side plumbing (binary columns, metadata struct, per-row offsets,
  * no shuffle in the decode stage) is real and tested.
  */
object Multimodal {

  /** Typed metadata a decoder would emit. */
  val MetaCols: Seq[String] = Seq("n_bytes", "fake_format", "fake_width", "fake_height")

  /** Deterministic fake "decode": header-ish fields derived from the byte
    * length. A real implementation parses the container header per row —
    * same shape: scalar projection over a binary column, fully parallel,
    * no shuffle. STUB — replace with a real codec binding.
    */
  def fakeDecodeMeta(content: Column): Seq[Column] = {
    val nBytes = length(content).cast("long")
    Seq(
      nBytes.as("n_bytes"),
      when(nBytes % 3 === 0, "img").when(nBytes % 3 === 1, "audio")
        .otherwise("video").as("fake_format"),
      ((nBytes % 64) * 16).as("fake_width"),
      ((nBytes % 48) * 16).as("fake_height"))
  }

  /** Evenly-spaced frame/sample offsets into the payload — the frame-sample
    * stage of a video pipeline (the byte ranges a real reader would seek).
    */
  def frameOffsets(content: Column, frames: Int): Column =
    transform(sequence(lit(0), lit(frames - 1)),
      i => i * (length(content).cast("long") / lit(frames)).cast("long"))

  /** Attach decoded metadata + sampled frame offsets to a binary-content
    * DataFrame. Pure projection: scales with scan throughput.
    */
  def withMeta(df: DataFrame, contentCol: String, frames: Int = 5): DataFrame =
    df.select(df.columns.map(col) ++ fakeDecodeMeta(col(contentCol)) :+
      frameOffsets(col(contentCol), frames).as("frame_offsets"): _*)

  /** Frame extraction: slice `frames` equal byte ranges out of the payload
    * and fingerprint each (the dedup / integrity key a video pipeline
    * computes per sampled frame). The SLICING and hashing are real binary
    * ops (`substring` on `binary`, md5); only the interpretation of a slice
    * as a decoded frame is the stub. One row per (doc, frame), produced by
    * a single explode — no shuffle, scan-speed.
    */
  def frameSlices(df: DataFrame, idCol: String, contentCol: String,
                  frames: Int = 5): DataFrame = {
    val flen = (length(col(contentCol)).cast("long") / lit(frames)).cast("int")
    df.select(col(idCol), col(contentCol).as("__c"), flen.as("__flen"))
      .select(col(idCol), col("__flen"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => i.cast("int") * col("__flen"))).as(Seq("frame_no", "off")),
        col("__c"))
      .select(col(idCol), col("frame_no"), col("off").cast("long").as("off"),
        col("__flen").cast("long").as("frame_len"),
        md5(expr(s"substring(__c, off + 1, __flen)")).as("frame_md5"))
  }
}
