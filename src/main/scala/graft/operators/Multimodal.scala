package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages shaped for a 100 TB training-data pipeline.
  *
  * Header METADATA extraction is real: [[headerMeta]] sniffs magic bytes
  * and parses pixel dimensions for PNG/JPEG/BMP/GIF in pure JVM
  * ([[graft.functions.MediaHeaderKernel]]). Pixel DECODE (inflate, DCT,
  * resampling) is the part that needs a codec library this environment
  * doesn't ship — a real binding drops in as another scalar projection
  * with the same shape: per-row, fully parallel, no shuffle.
  */
object Multimodal {

  /** Typed metadata the header pass emits. */
  val MetaCols: Seq[String] = Seq("n_bytes", "format", "width", "height")

  /** Container-header metadata of a binary payload: byte size, sniffed
    * format, parsed pixel dimensions (null when the format is unknown).
    * One codegen'd projection — scales with scan throughput.
    */
  def headerMeta(content: Column): Seq[Column] = {
    val hdr = graft.functions.media_header(content)
    Seq(length(content).cast("long").as("n_bytes"),
      hdr.getField("format").as("format"),
      hdr.getField("width").as("width"),
      hdr.getField("height").as("height"))
  }

  /** Evenly-spaced frame/sample offsets into the payload — the frame-sample
    * stage of a video pipeline (the byte ranges a real reader would seek).
    */
  def frameOffsets(content: Column, frames: Int): Column =
    transform(sequence(lit(0), lit(frames - 1)),
      i => i * (length(content).cast("long") / lit(frames)).cast("long"))

  /** Attach header metadata + sampled frame offsets to a binary-content
    * DataFrame. Pure projection: scales with scan throughput.
    */
  def withMeta(df: DataFrame, contentCol: String, frames: Int = 5): DataFrame =
    df.select(df.columns.toIndexedSeq.map(col) ++ headerMeta(col(contentCol)) :+
      frameOffsets(col(contentCol), frames).as("frame_offsets"): _*)

  /** Frame extraction: slice `frames` equal byte ranges out of the payload
    * and fingerprint each (the dedup / integrity key a video pipeline
    * computes per sampled frame). The SLICING and hashing are real binary
    * ops (`substring` on `binary`, md5); only the interpretation of a slice
    * as a decoded frame is the stub. One row per (doc, frame), produced by
    * a single explode — no shuffle, scan-speed.
    */
  /** The decode → resize → patchify feature pipeline: decode the payload
    * to `w·h` gray pixels through the pluggable codec seam
    * ([[graft.functions.GrayDecoder]]; the shipped [[graft.functions.TileDecoder]]
    * derives pixels deterministically from the payload bytes), resample
    * nearest-neighbor to `outW·outH`, and emit one row per `p`×`p` patch
    * with brightness mean/std — the ViT-preprocessing shape. Every stage
    * is a per-row codegen'd projection: no shuffle until the caller
    * aggregates, scan-speed at any corpus size, and a real codec binding
    * swaps in behind the one-method trait without touching the plan.
    */
  def patchFeatures(df: DataFrame, idCol: String, contentCol: String,
                    w: Int, h: Int, outW: Int, outH: Int, p: Int,
                    decoder: graft.functions.GrayDecoder =
                      graft.functions.TileDecoder): DataFrame = {
    import graft.functions.{gray_decode, gray_patch_stats, gray_resize}
    df.select(col(idCol),
        gray_resize(outW, outH,
          gray_decode(decoder, col(contentCol), lit(w), lit(h)),
          lit(w), lit(h)).as("__px"))
      .select(col(idCol),
        explode(gray_patch_stats(p, col("__px"), lit(outW), lit(outH)))
          .as("__s"))
      .select(col(idCol), col("__s.py").as("py"), col("__s.px").as("px"),
        col("__s.mean").as("mean"), col("__s.std").as("std"))
  }

  /** Interleaved multimodal example packing — the VLM pretraining input
    * shape: per document, ONE id stream
    * `[IMG_BEGIN] patch-tokens… [IMG_END] text-ids…` carved into
    * exact-`seqLen` examples by [[Curation.packSequencesIds]] (same hash
    * order, carve stage, and `doc_starts` attention-reset semantics as
    * the text pipeline — a document boundary is also the image boundary).
    *
    * Id layout: text ids hash into `[0, textVocab)`
    * (`pmod(md5_lower64(token), textVocab)`), `IMG_BEGIN = textVocab`,
    * `IMG_END = textVocab+1`, and each `p`×`p` patch of the
    * decode→resize pipeline contributes `textVocab + 2 + ⌊mean⌋`
    * (256 brightness-bucket image tokens, row-major patch order — the
    * discrete stand-in for a learned visual codebook, swapped the same
    * way a real codec swaps in behind [[graft.functions.GrayDecoder]]).
    *
    * Scale shape: the whole per-document assembly (decode, patchify,
    * hash, concat) is a zero-shuffle codegen'd projection — the document
    * row never explodes; the only shuffles are [[Curation.packSequencesIds]]'s
    * slice-granular example carve. Token conservation
    * (Σ example `n_tokens` = Σ per-doc `2 + patches + text tokens`) is
    * asserted at 1 M docs in ScaleSmoke.
    */
  def packInterleaved(df: DataFrame, idCol: String, contentCol: String,
                      textCol: String, w: Int, h: Int, outW: Int, outH: Int,
                      p: Int, textVocab: Int, seqLen: Int,
                      decoder: graft.functions.GrayDecoder =
                        graft.functions.TileDecoder): DataFrame = {
    import graft.functions.{gray_decode, gray_patch_stats, gray_resize, md5_lower64}
    val px = gray_resize(outW, outH,
      gray_decode(decoder, col(contentCol), lit(w), lit(h)), lit(w), lit(h))
    val patchToks = transform(gray_patch_stats(p, px, lit(outW), lit(outH)),
      s => floor(s.getField("mean")).cast("int") + lit(textVocab + 2))
    val textIds = transform(TextOps.tokens(col(textCol)),
      t => pmod(md5_lower64(t), lit(textVocab.toLong)).cast("int"))
    val ids = concat(
      array(lit(textVocab)), patchToks,
      array(lit(textVocab + 1)), textIds)
    Curation.packSequencesIds(
      df.select(col(idCol), ids.as("ids")), idCol, "ids", seqLen)
  }

  /** Audio feature extraction: decode the payload as little-endian signed
    * 16-bit PCM (the literal encoding of WAV data chunks — a REAL decode,
    * no codec library) and emit one row per `frameLen`-sample frame with
    * RMS energy, zero-crossing count, and peak amplitude — the classic
    * VAD/segmentation features. Per-row codegen'd kernel + one explode:
    * scan-speed, shuffle-free (see [[graft.functions.Pcm16Frames]]).
    */
  def audioFrames(df: DataFrame, idCol: String, contentCol: String,
                  frameLen: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.pcm16_frames(frameLen, col(contentCol)))
          .as("__f"))
      .select(col(idCol), col("__f.frame").as("frame"), col("__f.n").as("n"),
        col("__f.rms").as("rms"), col("__f.zcr").as("zcr"),
        col("__f.peak").as("peak"))

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
