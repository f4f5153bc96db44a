package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class GrayImageSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("TileDecoder tiles payload bytes; empty payload decodes to black") {
    assert(TileDecoder.decode(Array[Byte](1, 2, 3), 2, 2).toSeq
      === Seq[Byte](1, 2, 3, 1))
    assert(TileDecoder.decode(Array.empty[Byte], 3, 1).toSeq
      === Seq[Byte](0, 0, 0))
  }

  test("png_gray_encode emits a real PNG that round-trips pixel-exactly") {
    val px = Array.tabulate(48)(i => ((i * 37 + 11) % 256).toByte) // 8x6
    val df = Seq(Tuple1(px)).toDF("px")
    val png = png_gray_encode(col("px"), lit(8), lit(6))
    // a genuine container per the header sniffer, with intrinsic dims
    val hdr = df.select(media_header(png).as("h"))
      .select("h.format", "h.width", "h.height")
      .as[(String, Int, Int)].head()
    assert(hdr === (("png", 8, 6)))
    // raster-exact round-trip through the SHIPPED decoder at intrinsic dims
    val back = df.select(gray_decode(ImageIoDecoder, png, lit(8), lit(6)))
      .head().getAs[Array[Byte]](0)
    assert(back.toSeq === px.toSeq)
    // declared-dim mismatch resamples with GrayResize's exact convention
    val resampled = df.select(gray_decode(ImageIoDecoder, png, lit(4), lit(4)))
      .head().getAs[Array[Byte]](0)
    val want = df.select(gray_resize(4, 4, col("px"), lit(8), lit(6)))
      .head().getAs[Array[Byte]](0)
    assert(resampled.toSeq === want.toSeq)
    // degrade contract: short buffer / overflowing dims -> empty, no throw
    assert(df.select(png_gray_encode(col("px"), lit(9), lit(6)))
      .head().getAs[Array[Byte]](0).isEmpty)
    assert(df.select(png_gray_encode(col("px"), lit(50000), lit(50000)))
      .head().getAs[Array[Byte]](0).isEmpty)
  }

  test("decoders degrade on overflowing declared dims instead of throwing") {
    // 50000*50000 overflows the Int product negative — the r17 ADVICE
    // NegativeArraySizeException path; the never-throw contract wins
    assert(TileDecoder.decode(Array[Byte](1, 2), 50000, 50000).isEmpty)
    assert(ImageIoDecoder.decode(Array[Byte](1, 2), 50000, 50000).isEmpty)
  }

  test("gray_resize nearest-neighbor mapping is (y*h)/outH, (x*w)/outW") {
    // 4x2 -> 2x1: out(0,0)=in(0,0)=10, out(1,0)=in(0,2)=30
    val df = Seq(Tuple1(Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)))
      .toDF("px")
    val got = df.select(gray_resize(2, 1, col("px"), lit(4), lit(2)))
      .head().getAs[Array[Byte]](0)
    assert(got.toSeq === Seq[Byte](10, 30))
    // identity resize returns the buffer unchanged
    val same = df.select(gray_resize(4, 2, col("px"), lit(4), lit(2)))
      .head().getAs[Array[Byte]](0)
    assert(same.toSeq === (10 to 80 by 10).map(_.toByte))
  }

  test("gray_patch_stats: hand-computed mean/std, unsigned pixels") {
    // 4x2 image, 2x2 patches -> 2 patches
    // patch(0,0) = {0, 255, 10, 20}; patch(0,1) = {1, 2, 3, 4}
    val px = Array[Byte](0, 255.toByte, 1, 2, 10, 20, 3, 4)
    val got = Seq(Tuple1(px)).toDF("px")
      .select(explode(gray_patch_stats(2, col("px"), lit(4), lit(2))).as("s"))
      .select("s.py", "s.px", "s.mean", "s.std")
      .as[(Int, Int, Double, Double)].collect().toSeq
    def stats(vs: Seq[Int]) = {
      val mean = vs.sum / 4.0
      (r6(mean), r6(math.sqrt(vs.map(v => v.toLong * v).sum / 4.0 - mean * mean)))
    }
    val (m0, s0) = stats(Seq(0, 255, 10, 20))
    val (m1, s1) = stats(Seq(1, 2, 3, 4))
    assert(got === Seq((0, 0, m0, s0), (0, 1, m1, s1)))
  }

  test("patchFeatures end-to-end: decode -> resize -> patchify golden") {
    // payload [100, 200]: tiled over 2x2 -> [100, 200, 100, 200];
    // resize 2x2 -> 2x2 identity; one 2x2 patch
    val df = Seq((7L, Array[Byte](100, 200.toByte))).toDF("doc_id", "content")
    val got = Multimodal.patchFeatures(df, "doc_id", "content",
        w = 2, h = 2, outW = 2, outH = 2, p = 2)
      .as[(Long, Int, Int, Double, Double)].collect().toSeq
    val mean = (100 + 200 + 100 + 200) / 4.0
    val std = r6(math.sqrt((100L * 100 * 2 + 200L * 200 * 2) / 4.0 - mean * mean))
    assert(got === Seq((7L, 0, 0, r6(mean), std)))
  }

  test("pcm16_frames: LE signed decode, framing, rms/zcr/peak golden") {
    // samples: 100, -200, 7, 0, 5 (odd trailing byte ignored)
    def le(v: Int): Seq[Byte] = {
      val u = v & 0xFFFF
      Seq((u % 256).toByte, (u / 256).toByte)
    }
    val bytes = (le(100) ++ le(-200) ++ le(7) ++ le(0) ++ le(5) :+ 0x7F.toByte)
      .toArray
    val got = Seq(Tuple1(bytes)).toDF("c")
      .select(explode(pcm16_frames(2, col("c"))).as("f"))
      .select("f.frame", "f.n", "f.rms", "f.zcr", "f.peak")
      .as[(Int, Int, Double, Int, Int)].collect().toSeq
    val rms0 = r6(math.sqrt((100.0 * 100 + 200.0 * 200) / 2))
    val rms1 = r6(math.sqrt(49.0 / 2))
    assert(got === Seq(
      (0, 2, rms0, 1, 200),   // 100 -> -200 crosses zero
      (1, 2, rms1, 0, 7),     // 7 -> 0: product 0, no strict crossing
      (2, 1, 5.0, 0, 5)))     // trailing partial frame
  }

  // ---- ImageIoDecoder: real encoded images through the JDK codec ----

  /** Deterministic w×h gray pixel grid (unsigned values 0–255). */
  private def grid(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)

  /** Encode a gray pixel grid as a REAL image container via ImageIO. */
  private def encodeGray(px: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JRE lacks $fmt writer")
    bos.toByteArray
  }

  test("ImageIoDecoder: pixel-exact golden decode of real PNG and BMP") {
    val (w, h) = (8, 6)
    val px = grid(w, h)
    for (fmt <- Seq("png", "bmp")) {
      val bytes = encodeGray(px, w, h, fmt)
      // sanity: these are REAL containers, not our arithmetic stand-in
      assert(MediaHeaderKernel.parse(bytes).getUTF8String(0).toString === fmt,
        s"fixture is not a recognizable $fmt")
      assert(ImageIoDecoder.decode(bytes, w, h).toSeq === px.toSeq,
        s"$fmt decode not pixel-exact")
    }
  }

  test("ImageIoDecoder: BT.601 integer luma on an RGB PNG") {
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // pure red
    img.setRGB(1, 0, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = ImageIoDecoder.decode(bos.toByteArray, 2, 1)
    def luma(r: Int, g: Int, b: Int) = (299 * r + 587 * g + 114 * b + 500) / 1000
    assert((got(0) & 0xFF) === luma(0xFF, 0, 0))
    assert((got(1) & 0xFF) === luma(0x33, 0x66, 0x99))
  }

  test("ImageIoDecoder: declared-dim mismatch resamples with the gray_resize convention") {
    val (iw, ih) = (8, 6)
    val px = grid(iw, ih)
    val bytes = encodeGray(px, iw, ih, "png")
    val (w, h) = (4, 3)
    val got = ImageIoDecoder.decode(bytes, w, h)
    val want = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      px((y * ih / h) * iw + (x * iw / w))
    }
    assert(got.toSeq === want.toSeq)
  }

  test("ImageIoDecoder: corrupt payloads yield black, never throw") {
    val cases = Seq[Array[Byte]](
      Array.empty[Byte],
      null,
      Array.fill[Byte](64)(0x5A), // garbage, no magic
      // a real PNG truncated mid-stream: magic parses, decode must degrade
      encodeGray(grid(8, 6), 8, 6, "png").take(24),
      "not an image at all".getBytes("UTF-8"))
    cases.foreach { c =>
      assert(ImageIoDecoder.decode(c, 3, 2).toSeq === Seq[Byte](0, 0, 0, 0, 0, 0))
    }
    assert(ImageIoDecoder.decode(grid(2, 2), 0, 2).toSeq === Seq.empty)
  }

  test("ImageIoDecoder drops in behind the seam: patchFeatures over real PNGs") {
    val (w, h) = (4, 4)
    val px = grid(w, h)
    val df = Seq((1L, encodeGray(px, w, h, "png"))).toDF("doc_id", "content")
    val got = Multimodal.patchFeatures(df, "doc_id", "content",
        w, h, outW = w, outH = h, p = 4, decoder = ImageIoDecoder)
      .as[(Long, Int, Int, Double, Double)].collect().toSeq
    val vs = px.map(_ & 0xFF)
    val mean = vs.sum / 16.0
    val std = r6(math.sqrt(vs.map(v => v.toLong * v).sum / 16.0 - mean * mean))
    assert(got === Seq((1L, 0, 0, r6(mean), std)))
  }

  test("a custom decoder drops in behind the seam") {
    object Inverter extends GrayDecoder {
      override def decode(c: Array[Byte], w: Int, h: Int): Array[Byte] =
        Array.tabulate(w * h)(i =>
          (255 - (c(i % c.length) & 0xFF)).toByte)
    }
    val df = Seq((1L, Array[Byte](0))).toDF("doc_id", "content")
    val got = Multimodal.patchFeatures(df, "doc_id", "content",
        2, 2, 2, 2, 2, decoder = Inverter)
      .as[(Long, Int, Int, Double, Double)].collect().head
    assert(got._4 === 255.0 && got._5 === 0.0)
  }
}
