package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Container-header sniffing ([[graft.functions.MediaHeaderKernel]]):
  * golden headers per format, endianness, and the corrupt-input contract
  * (unknown, never an exception).
  */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(rows: Seq[(Long, String)]): Map[Long, (String, Any, Any)] = {
    val df = rows.map { case (id, hx) => (id, hexToBytes(hx)) }
      .toDF("id", "content")
      .select(col("id"), graft.functions.media_header(col("content")).as("h"))
      .select(col("id"), col("h.format"), col("h.width"), col("h.height"))
    df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), if (r.isNullAt(2)) null else r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3)))).toMap
  }

  test("golden headers: png/jpeg/bmp/gif dimensions and endianness") {
    val got = parse(Seq(
      // PNG 800x600: sig + IHDR len + "IHDR" + BE u32 dims
      1L -> ("89504E470D0A1A0A0000000D49484452" + "00000320" + "00000258"),
      // JPEG 320x240: SOI, APP0 (len 4), SOF0 (len 11): precision, BE h, BE w
      2L -> ("FFD8FFE000040000FFC0000B08" + "00F0" + "0140" + "01011100"),
      // JPEG with a larger leading segment before SOF2 (progressive, C2)
      3L -> ("FFD8FFE10008000000000000FFC2000B08" + "0002" + "0001" + "01011100"),
      // BMP 100x50: "BM" + 16 filler + LE i32 dims
      4L -> ("424D" + "00" * 16 + "64000000" + "32000000"),
      // BMP with NEGATIVE height (-50, top-down) -> absolute value
      5L -> ("424D" + "00" * 16 + "64000000" + "CEFFFFFF"),
      // GIF89a 7x9: LE u16 dims
      6L -> ("474946383961" + "0700" + "0900"),
      // GIF87a also accepted
      7L -> ("474946383761" + "FF00" + "0101")))
    assert(got(1L) == (("png", 800, 600)))
    assert(got(2L) == (("jpeg", 320, 240)))
    assert(got(3L) == (("jpeg", 1, 2)))
    assert(got(4L) == (("bmp", 100, 50)))
    assert(got(5L) == (("bmp", 100, 50)))
    assert(got(6L) == (("gif", 7, 9)))
    assert(got(7L) == (("gif", 255, 257)))
  }

  test("fuzz: no byte sequence throws (seeded, 20k arrays incl. magic prefixes)") {
    val rnd = new scala.util.Random(42)
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
      Array[Byte]('B', 'M'),
      "GIF89a".getBytes, "GIF87a".getBytes, Array.empty[Byte])
    (0 until 20000).foreach { i =>
      val body = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(body)
      val bytes = magics(i % magics.size) ++ body
      val row = graft.functions.MediaHeaderKernel.parse(bytes)
      assert(row.getUTF8String(0) != null) // format always present
    }
  }

  test("corrupt or truncated payloads are data, not errors") {
    val got = parse(Seq(
      1L -> "",                                   // empty
      2L -> "89504E47",                           // truncated PNG sig
      3L -> ("89504E470D0A1A0A0000000D49484453" + "00000320" + "00000258"), // IHDS: wrong chunk tag
      4L -> "FFD8FF",                              // SOI only, no SOF
      5L -> "FFD8FFE000040000",                    // segments end before SOF
      6L -> "FFD8FF00FFC0000B080001000101011100",  // broken marker stream
      7L -> "424D0000",                            // BMP too short
      8L -> "47494638",                            // GIF too short
      9L -> "DEADBEEF" * 8))                       // noise
      .view.mapValues(_._1).toMap
    assert(got.values.forall(_ == "unknown"), got.toString)
  }
}
