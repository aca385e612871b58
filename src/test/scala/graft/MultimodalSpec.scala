package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The multimodal decode contract: a REAL PNG header parser (signature +
  * IHDR big-endian dims), JPEG SOI sniffing, honest NULLs on everything
  * undecodable, and payload-column prunability.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Byte-exact PNG prefix per the spec: 8-byte signature, IHDR length
    * (13), "IHDR", then big-endian width and height — built by hand so
    * the parser is tested against REAL bytes, not its own synthesis.
    */
  private def pngHeader(width: Int, height: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdr = "IHDR".getBytes("US-ASCII")
    def be32(v: Int) = Array(v >>> 24, (v >>> 16) & 0xFF, (v >>> 8) & 0xFF, v & 0xFF).map(_.toByte)
    sig ++ ihdrLen ++ ihdr ++ be32(width) ++ be32(height) ++ Array[Byte](8, 6, 0, 0, 0)
  }

  private def decodeOne(payload: Array[Byte]): (Option[Int], Option[Int], String) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("payload BINARY")
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(payload)).asJava, schema)
    val r = df.select(Multimodal.decodeImageMeta(col("payload")).as("m"))
      .select("m.width", "m.height", "m.format").head()
    (Option(r.get(0)).map(_.asInstanceOf[Int]),
      Option(r.get(1)).map(_.asInstanceOf[Int]), r.getString(2))
  }

  test("PNG IHDR dims parse from real header bytes") {
    assert(decodeOne(pngHeader(640, 480)) === ((Some(640), Some(480), "png")))
    assert(decodeOne(pngHeader(1, 1)) === ((Some(1), Some(1), "png")))
    // dims that need every byte of the big-endian u32 lanes
    assert(decodeOne(pngHeader(65537, 16777216 + 42)) ===
      ((Some(65537), Some(16777216 + 42), "png")))
  }

  test("truncated/corrupt PNG keeps format but yields NULL dims") {
    // signature only — no IHDR to parse
    assert(decodeOne(pngHeader(9, 9).take(8)) === ((None, None, "png")))
    // signature + garbage where IHDR should be
    val corrupt = pngHeader(9, 9).take(8) ++ Array.fill[Byte](16)(0x41)
    assert(decodeOne(corrupt) === ((None, None, "png")))
  }

  test("JPEG SOI sniff and unknown fallback") {
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10).map(_.toByte)
    assert(decodeOne(jpeg) === ((None, None, "jpeg")))
    assert(decodeOne("plain text".getBytes("UTF-8")) === ((None, None, "unknown")))
    assert(decodeOne(Array.emptyByteArray) === ((None, None, "unknown")))
  }

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** SOI + standard 16-byte APP0/JFIF + 3-component SOF0 — dims sit behind
    * a variable-length segment, so fixed offsets cannot reach them.
    */
  private def jpegHeader(width: Int, height: Int): Array[Byte] =
    hexBytes("FFD8" + "FFE000104A46494600010100000100010000" +
      "FFC0001108" + f"$height%04X" + f"$width%04X" + "03012200021101031101")

  test("JPEG SOF dims parse through the marker-segment walk") {
    assert(decodeOne(jpegHeader(640, 480)) === ((Some(640), Some(480), "jpeg")))
    assert(decodeOne(jpegHeader(1, 65535)) === ((Some(1), Some(65535), "jpeg")))
    // fill bytes (repeated FF), a standalone TEM and an RST marker before
    // the SOF are all stepped over per the spec's marker grammar
    val filled = hexBytes("FFD8" + "FFFFFF01" + "FFD0" +
      "FFC0001108" + "01E0" + "0280" + "03012200021101031101")
    assert(decodeOne(filled) === ((Some(640), Some(480), "jpeg")))
    // SOS reached with no SOF: entropy data follows, dims stay NULL
    assert(decodeOne(hexBytes("FFD8" + "FFDA0004AABB")) === ((None, None, "jpeg")))
    // payload truncated mid-SOF: no garbage parse
    assert(decodeOne(jpegHeader(640, 480).take(24)) === ((None, None, "jpeg")))
  }

  test("JpegDims interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val vectors = Seq(jpegHeader(123, 45), jpegHeader(1920, 1080),
      hexBytes("FFD8FFDA0004AABB"), "not a jpeg".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val interp = graft.functions.JpegDims(Literal(bytes, BinaryType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.ImageOps.jpegDims(lit(bytes)).as("d"))
        .head().get(0)
      assert(interp === codegen, s"parity broke on ${bytes.take(4).mkString(",")}")
    }
  }

  test("GIF logical-screen dims parse little-endian from real header bytes") {
    def gif(sig: String, w: Int, h: Int) = sig.getBytes("US-ASCII") ++
      hexBytes(f"${((w & 0xFF) << 8) | (w >>> 8)}%04X" +
        f"${((h & 0xFF) << 8) | (h >>> 8)}%04X" + "F7000000")
    assert(decodeOne(gif("GIF89a", 640, 480)) === ((Some(640), Some(480), "gif")))
    assert(decodeOne(gif("GIF87a", 1, 65535)) === ((Some(1), Some(65535), "gif")))
    // signature alone: container recognized, no dims to read
    assert(decodeOne("GIF89a".getBytes("US-ASCII")) === ((None, None, "gif")))
    // GIF9 is not a signature version
    assert(decodeOne(gif("GIF99a", 9, 9)) === ((None, None, "unknown")))
  }

  private def le(v: Long, bytes: Int): String =
    (0 until bytes).map(i => f"${(v >> (8 * i)) & 0xFF}%02X").mkString

  test("WebP VP8X / lossy VP8 / VP8L dims parse from real chunk bytes") {
    val riff = "52494646" + "24000000" + "57454250"
    // VP8X: flags+reserved, then (value-1) 24-bit LE canvas dims
    val vp8x = hexBytes(riff + "56503858" + "0A000000" + "00000000" +
      le(1919, 3) + le(1079, 3))
    assert(decodeOne(vp8x) === ((Some(1920), Some(1080), "webp")))
    // lossy VP8: 3-byte frame tag, 9D012A sync, then 14-bit LE dims
    val vp8 = hexBytes(riff + "56503820" + "10000000" + "503412" + "9D012A" +
      le(320, 2) + le(240, 2))
    assert(decodeOne(vp8) === ((Some(320), Some(240), "webp")))
    // lossy VP8 without the sync code: recognized container, NULL dims
    val noSync = hexBytes(riff + "56503820" + "10000000" + "503412" + "AABBCC" +
      le(320, 2) + le(240, 2))
    assert(decodeOne(noSync) === ((None, None, "webp")))
    // VP8L: 2F signature, then width-1 | height-1<<14 in a LE u32
    val vp8l = hexBytes(riff + "5650384C" + "05000000" + "2F" +
      le(799L | (599L << 14), 4))
    assert(decodeOne(vp8l) === ((Some(800), Some(600), "webp")))
    // VP8L corrupt high byte (version bits set): dims masked, no wrap
    val vp8lAlpha = hexBytes(riff + "5650384C" + "05000000" + "2F" +
      le((799L | (599L << 14)) + (1L << 28), 4)) // alpha-hint bit
    assert(decodeOne(vp8lAlpha) === ((Some(800), Some(600), "webp")))
    // truncated mid-dims: NULL dims, container kept
    assert(decodeOne(vp8x.take(26)) === ((None, None, "webp")))
    // RIFF but not WEBP
    val wav = hexBytes("52494646" + "24000000" + "57415645")
    assert(decodeOne(wav) === ((None, None, "unknown")))
  }

  test("q39 round-trips synthesized headers through the parser") {
    val rows = Multimodal.q39PngMeta(spark, TestSpark.Sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      (id % 7) match {
        case 0 => assert(r.getString(3) === "jpeg" && r.isNullAt(1))
        case 1 => assert(r.getString(3) === "unknown" && r.isNullAt(1))
        case 2 => assert(r.getString(3) === "png" && r.isNullAt(1) && r.isNullAt(2))
        case 3 | 4 | 5 =>
          assert(r.getString(3) === Map(3L -> "jpeg", 4L -> "gif", 5L -> "webp")(id % 7))
          assert(r.getInt(1) === (id % 1920 + 1).toInt)
          assert(r.getInt(2) === (id % 1080 + 1).toInt)
        case _ =>
          assert(r.getString(3) === "png")
          assert(r.getInt(1) === (id % 1920 + 1).toInt)
          assert(r.getInt(2) === (id % 1080 + 1).toInt)
      }
    }
  }

  // ---- audio/video decode (decodeAvMeta + the Mp4Dims box walk) ----

  private def decodeAvOne(payload: Array[Byte])
    : (String, Option[Int], Option[Int], Option[Int], Option[Int], Option[Int]) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("payload BINARY")
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(payload)).asJava, schema)
    val r = df.select(Multimodal.decodeAvMeta(col("payload")).as("m"))
      .select("m.format", "m.sample_rate", "m.channels", "m.bits",
        "m.width", "m.height").head()
    def o(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Int])
    (r.getString(0), o(1), o(2), o(3), o(4), o(5))
  }

  private def wavBytes(ch: Int, rate: Int, bits: Int): Array[Byte] =
    hexBytes("52494646" + le(28, 4) + "57415645" + "666D7420" + le(16, 4) +
      le(1, 2) + le(ch, 2) + le(rate, 4) +
      le(rate.toLong * ch * bits / 8, 4) + le(ch * bits / 8, 2) + le(bits, 2))

  private def be32b(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def boxB(typ: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
  private val matrix36 = hexBytes(
    "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000")
  /** Byte-exact tkhd FullBox, version 0 (32-bit times) or 1 (64-bit). */
  private def tkhdB(w: Int, h: Int, version: Int = 0): Array[Byte] = {
    val t = if (version == 1) 8 else 4
    boxB("tkhd",
      Array[Byte](version.toByte, 0, 0, 7) ++
        Array.fill[Byte](2 * t)(0) ++ // creation + modification times
        hexBytes("0000000100000000") ++ // track id + reserved
        Array.fill[Byte](t)(0) ++ // duration
        Array.fill[Byte](16)(0) ++ // reserved + layer/alt/volume/reserved
        matrix36 ++ be32b(w.toLong << 16) ++ be32b(h.toLong << 16))
  }
  private def mp4B(prefix: Array[Byte], traks: Array[Byte]*): Array[Byte] =
    boxB("ftyp", hexBytes("69736F6D00000000")) ++ prefix ++
      boxB("moov", traks.flatten.toArray)

  test("WAV fmt parameters parse through the RIFF chunk walk") {
    assert(decodeAvOne(wavBytes(2, 44100, 16)) ===
      (("wav", Some(44100), Some(2), Some(16), None, None)))
    assert(decodeAvOne(wavBytes(1, 8000, 8)) ===
      (("wav", Some(8000), Some(1), Some(8), None, None)))
    // non-canonical WAV: LIST (odd-sized, so WORD-padded) and JUNK chunks
    // before fmt — the walk steps over them; fixed offsets cannot
    val prefixed = hexBytes("52494646" + le(54, 4) + "57415645" +
      "4C495354" + le(5, 4) + "494E464F00" + "00" + // LIST(5) + pad byte
      "4A554E4B" + le(4, 4) + "00000000") ++ // JUNK(4)
      wavBytes(2, 22050, 16).drop(12)
    assert(decodeAvOne(prefixed) === (("wav", Some(22050), Some(2), Some(16), None, None)))
    // RIFF/WAVE with no fmt at all: container kept, NULL params
    val noFmt = hexBytes("52494646" + le(16, 4) + "57415645" +
      "4C495354" + le(4, 4) + "494E464F")
    assert(decodeAvOne(noFmt) === (("wav", None, None, None, None, None)))
    // truncated mid-fmt: no garbage parse
    assert(decodeAvOne(wavBytes(2, 44100, 16).take(30)) ===
      (("wav", None, None, None, None, None)))
  }

  test("WavFmt interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val vectors = Seq(wavBytes(2, 44100, 16), wavBytes(1, 8000, 8),
      wavBytes(2, 44100, 16).take(30), "not a wav".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val interp = graft.functions.WavFmt(Literal(bytes, BinaryType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.AudioOps.wavFmt(lit(bytes)).as("d"))
        .head().get(0)
      assert(interp === codegen, s"parity broke on ${bytes.take(8).mkString(",")}")
    }
  }

  test("MP4 tkhd dims parse through the box walk, not fixed offsets") {
    // moov behind a variable-size free box; an AUDIO trak (width 0) sits
    // before the video trak — the walk must step over both obstacles
    val m = mp4B(boxB("free", Array.fill[Byte](5)(0)),
      boxB("trak", tkhdB(0, 0)), boxB("trak", tkhdB(1920, 1080)))
    assert(decodeAvOne(m) === (("mp4", None, None, None, Some(1920), Some(1080))))
    // version-1 tkhd (64-bit times): dims shift 12 bytes deeper
    val v1 = mp4B(Array.emptyByteArray, boxB("trak", tkhdB(640, 480, version = 1)))
    assert(decodeAvOne(v1) === (("mp4", None, None, None, Some(640), Some(480))))
    // 64-bit largesize box before moov walks correctly
    val large = boxB("ftyp", hexBytes("69736F6D00000000")) ++
      be32b(1L) ++ "free".getBytes("US-ASCII") ++ be32b(0L) ++ be32b(24L) ++
      Array.fill[Byte](8)(0) ++
      boxB("moov", boxB("trak", tkhdB(320, 240)))
    assert(decodeAvOne(large) === (("mp4", None, None, None, Some(320), Some(240))))
    // no video trak: container kept, NULL dims
    val audioOnly = mp4B(Array.emptyByteArray, boxB("trak", tkhdB(0, 0)))
    assert(decodeAvOne(audioOnly) === (("mp4", None, None, None, None, None)))
    // a box whose size runs past the payload: malformed, NULL dims
    val truncated = mp4B(Array.emptyByteArray,
      boxB("trak", tkhdB(1920, 1080))).dropRight(20)
    assert(decodeAvOne(truncated) === (("mp4", None, None, None, None, None)))
    // not a container at all
    assert(decodeAvOne("plain text".getBytes("UTF-8")) ===
      (("unknown", None, None, None, None, None)))
  }

  test("Mp4Dims interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val vectors = Seq(
      mp4B(boxB("free", Array.fill[Byte](3)(0)), boxB("trak", tkhdB(123, 45))),
      mp4B(Array.emptyByteArray, boxB("trak", tkhdB(0, 0))),
      mp4B(Array.emptyByteArray, boxB("trak", tkhdB(7, 9, version = 1))),
      "not an mp4".getBytes("UTF-8"),
      Array.emptyByteArray)
    vectors.foreach { bytes =>
      val interp = graft.functions.Mp4Dims(Literal(bytes, BinaryType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.ImageOps.mp4Dims(lit(bytes)).as("d"))
        .head().get(0)
      assert(interp === codegen, s"parity broke on ${bytes.take(8).mkString(",")}")
    }
  }

  test("q56 round-trips synthesized WAV/MP4 headers through the parser") {
    val rows = Multimodal.q56AvMeta(spark, TestSpark.Sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      (id % 3) match {
        case 0 =>
          assert(r.getString(1) === "wav")
          assert(r.getInt(2) === (8000 + (id % 8) * 4000).toInt)
          assert(r.getInt(3) === (id % 2 + 1).toInt)
          assert(r.getInt(4) === ((id % 2 + 1) * 8).toInt)
          assert(r.isNullAt(5) && r.isNullAt(6))
        case 1 =>
          assert(r.getString(1) === "mp4")
          assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
          assert(r.getInt(5) === (id % 1920 + 1).toInt)
          assert(r.getInt(6) === (id % 1080 + 1).toInt)
        case _ =>
          assert(r.getString(1) === "unknown")
          (2 to 6).foreach(i => assert(r.isNullAt(i)))
      }
    }
  }

  test("resizeDims scales the longer edge, preserves aspect, never upscales") {
    import spark.implicits._
    val rows = Seq(
      (1920, 1080), // downscale, landscape
      (1080, 1920), // downscale, portrait
      (512, 512),   // exactly at budget: pass through
      (100, 50)     // under budget: never upscale
    ).toDF("w", "h")
      .select(Multimodal.resizeDims(col("w"), col("h"), 512).as("r"))
      .select("r.width", "r.height").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) === ((512, 288)))
    assert(rows(1) === ((288, 512)))
    assert(rows(2) === ((512, 512)))
    assert(rows(3) === ((100, 50)))
    // NULL dims (undecodable payload) flow through untouched
    val n = Seq((None: Option[Int], None: Option[Int])).toDF("w", "h")
      .select(Multimodal.resizeDims(col("w"), col("h"), 512).as("r"))
      .select("r.width", "r.height").head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  /** Hand-built BI_RGB BMP (54-byte header + BGR(A) pixel rows padded to
    * 4 bytes), independent of the operator's hex synthesis so the kernel
    * is tested against REAL bytes. `px(x, r)` gives (B, G, R) for file-
    * order row r, column x.
    */
  private def bmpBytes(w: Int, h: Int, bpp: Int,
                       px: (Int, Int) => (Int, Int, Int),
                       topDown: Boolean = false): Array[Byte] = {
    val bytesPp = bpp / 8
    val rowSize = (bytesPp * w + 3) & ~3
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    out.write('B'); out.write('M')
    w32(54L + rowSize.toLong * h); w32(0); w32(54)
    w32(40); w32(w); w32(if (topDown) (-h).toLong & 0xFFFFFFFFL else h.toLong)
    w16(1); w16(bpp); w32(0); w32(0); w32(0); w32(0); w32(0); w32(0)
    for (r <- 0 until h) {
      for (x <- 0 until w) {
        val (b, g, rr) = px(x, r)
        out.write(b); out.write(g); out.write(rr)
        if (bpp == 32) out.write(0xFF)
      }
      out.write(new Array[Byte](rowSize - bytesPp * w))
    }
    out.toByteArray
  }

  private def lumaStats(payload: Array[Byte]): Option[(Long, Int, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.ImageOps.bmpLuma(lit(payload)).as("p"))
      .select(expr("p >> 16").as("sum"), expr("(p >> 8) & 255").as("max"),
        expr("p & 255").as("min")).head()
    if (r.isNullAt(0)) None
    else Some((r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt))
  }

  test("BMP pixel luma folds sum/max/min through padding, depth and row order") {
    // channel-asymmetric pixels: a BGR/RGB order slip changes the stats
    val px = (x: Int, r: Int) => (x * 10, r * 20, x + r)
    def expected(w: Int, h: Int) = {
      val ls = for (r <- 0 until h; x <- 0 until w) yield {
        val (b, g, rr) = px(x, r); (299 * rr + 587 * g + 114 * b) / 1000
      }
      (ls.map(_.toLong).sum, ls.max, ls.min)
    }
    // w=3 at 24bpp → 9 pixel bytes + 3 pad bytes per row: a walk that
    // ignores the stride reads pad zeros as pixels
    assert(lumaStats(bmpBytes(3, 2, 24, px)) === Some(expected(3, 2)))
    // 32bpp top-down, same pixel function: stats are row-order-independent
    // and the alpha byte must be skipped
    assert(lumaStats(bmpBytes(3, 2, 32, px, topDown = true)) ===
      Some(expected(3, 2)))
    // 4-aligned width (no padding) exercises the other stride branch
    assert(lumaStats(bmpBytes(4, 3, 24, px)) === Some(expected(4, 3)))
    // extremes: a white and a black pixel hit both clamps
    val bw = (x: Int, _: Int) => if (x == 0) (255, 255, 255) else (0, 0, 0)
    assert(lumaStats(bmpBytes(2, 1, 24, bw)) === Some((255L, 255, 0)))
  }

  test("BMP refusals: truncation, compression, depth, non-BMP") {
    val px = (x: Int, r: Int) => (x, r, x + r)
    val good = bmpBytes(4, 4, 24, px)
    // header promises 4 rows, payload delivers 2: no stats over garbage
    assert(lumaStats(good.dropRight(2 * 12)) === None)
    // BI_RLE8 compression (byte 30): the kernel only decodes BI_RGB
    val rle = good.clone(); rle(30) = 1
    assert(lumaStats(rle) === None)
    // 16bpp is outside the 24/32 contract
    val b16 = good.clone(); b16(28) = 16
    assert(lumaStats(b16) === None)
    // zero/negative width
    val w0 = good.clone(); w0(18) = 0
    assert(lumaStats(w0) === None)
    // 'BM'-prefixed text is not a BMP
    assert(lumaStats(("BM" + "W motorcycles are built in Berlin" * 3)
      .getBytes("UTF-8")) === None)
    assert(lumaStats(Array.emptyByteArray) === None)
  }

  private def resizeOne(p: Array[Byte], maxEdge: Int): Option[Array[Byte]] = {
    val r = spark.range(1)
      .select(graft.functions.ImageOps.bmpResize(lit(p), lit(maxEdge)).as("r"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))
  }

  /** JVM-side reader for a canonical 24bpp bottom-up BMP: image-coord
    * pixel (x, y) with y=0 at the TOP — independent of the kernel's walk.
    */
  private def px24(bmp: Array[Byte], x: Int, y: Int): (Int, Int, Int) = {
    def le32(o: Int): Int = (bmp(o) & 0xFF) | ((bmp(o + 1) & 0xFF) << 8) |
      ((bmp(o + 2) & 0xFF) << 16) | ((bmp(o + 3) & 0xFF) << 24)
    val w = le32(18); val h = le32(22)
    val rowSize = (3 * w + 3) & ~3
    val p = 54 + (h - 1 - y) * rowSize + x * 3
    (bmp(p) & 0xFF, bmp(p + 1) & 0xFF, bmp(p + 2) & 0xFF)
  }

  test("BmpResize: pass-through under budget, floor-mapped NN downscale") {
    // distinct per-pixel channels so any mapping slip shows up
    val src = (x: Int, r: Int) => (x * 16 + r, 100 + x, 200 - r)
    val small = bmpBytes(4, 3, 24, src)
    // within budget: byte-identical pass-through, never upscaled
    assert(resizeOne(small, 8).get.toSeq === small.toSeq)
    // 8x4 -> maxEdge 4 gives 4x2; output image pixel (x', y') must be
    // source image pixel (x'*2, y'*2); source is bottom-up, so source
    // IMAGE row y maps to file row h-1-y
    val big = bmpBytes(8, 4, 24, src)
    val out = resizeOne(big, 4).get
    for (xo <- 0 until 4; yo <- 0 until 2) {
      val (sx, sy) = (xo * 2, yo * 2)
      assert(px24(out, xo, yo) === src(sx, 4 - 1 - sy),
        s"output ($xo,$yo) should be source image ($sx,$sy)")
    }
    // aspect-preserving half-up rounding: 9x18 -> 4x8 (round(4.0), 8)
    val tall = resizeOne(bmpBytes(9, 18, 24, src), 8).get
    def le32(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    assert((le32(tall, 18), le32(tall, 22)) === ((4, 8)))
  }

  test("BmpResize normalizes 32bpp top-down input to 24bpp bottom-up") {
    val src = (x: Int, r: Int) => (x * 20, r * 30, x + r)
    // top-down input: file row r IS image row y
    val out = resizeOne(bmpBytes(8, 4, 32, src, topDown = true), 4).get
    // canonical output header: 24bpp, positive (bottom-up) height
    def le32(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    assert(((out(28) & 0xFF), le32(out, 18), le32(out, 22)) === ((24, 4, 2)))
    for (xo <- 0 until 4; yo <- 0 until 2)
      assert(px24(out, xo, yo) === src(xo * 2, yo * 2), // image row == file row
        s"top-down source mis-mapped at ($xo,$yo)")
    // refusals: text and truncated pixel arrays resample to NULL
    assert(resizeOne("not a bmp at all, but long enough to have a header"
      .getBytes("UTF-8"), 4) === None)
    assert(resizeOne(bmpBytes(8, 4, 24, src).dropRight(10), 4) === None)
  }

  test("BmpResize interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    val src = (x: Int, r: Int) => (x, r, x + r)
    val vectors = Seq(
      bmpBytes(8, 4, 24, src),
      bmpBytes(3, 2, 24, src),
      bmpBytes(6, 6, 32, src, topDown = true),
      "text".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val interp = graft.functions.BmpResize(
        Literal(bytes, BinaryType), Literal(4, IntegerType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.ImageOps.bmpResize(lit(bytes), lit(4))).head().get(0)
      val iSeq = Option(interp).map(_.asInstanceOf[Array[Byte]].toSeq)
      val cSeq = Option(codegen).map(_.asInstanceOf[Array[Byte]].toSeq)
      assert(iSeq === cSeq, s"parity broke on ${bytes.take(8).mkString(",")}")
    }
  }

  test("BmpLuma interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val px = (x: Int, r: Int) => (x * 3, r * 7, 255 - x)
    val vectors = Seq(
      bmpBytes(3, 2, 24, px),
      bmpBytes(2, 2, 32, px, topDown = true),
      bmpBytes(3, 2, 24, px).dropRight(5),
      "not a bmp".getBytes("UTF-8"),
      Array.emptyByteArray)
    vectors.foreach { bytes =>
      val interp = graft.functions.BmpLuma(Literal(bytes, BinaryType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.ImageOps.bmpLuma(lit(bytes)).as("d"))
        .head().get(0)
      assert(interp === codegen, s"parity broke on ${bytes.take(8).mkString(",")}")
    }
  }

  test("BMP header meta parses dims, reports top-down magnitude, sniffs strictly") {
    def metaOne(payload: Array[Byte]): (Option[Int], Option[Int], String) = {
      val r = spark.range(1)
        .select(Multimodal.decodeBmpMeta(lit(payload)).as("m"))
        .select("m.width", "m.height", "m.format").head()
      (Option(r.get(0)).map(_.asInstanceOf[Int]),
        Option(r.get(1)).map(_.asInstanceOf[Int]), r.getString(2))
    }
    val px = (x: Int, r: Int) => (x, r, 0)
    assert(metaOne(bmpBytes(640, 2, 24, px)) === ((Some(640), Some(2), "bmp")))
    // top-down height is stored negative; meta reports the magnitude
    assert(metaOne(bmpBytes(3, 5, 32, px, topDown = true)) ===
      ((Some(3), Some(5), "bmp")))
    // truncated PIXEL array: header meta is still intact (independence of
    // meta and pixel stats — the q59 class-2 contract)
    assert(metaOne(bmpBytes(4, 4, 24, px).dropRight(20)) ===
      ((Some(4), Some(4), "bmp")))
    // compressed: format kept, dims refused (out of the decode contract)
    val rle = bmpBytes(4, 4, 24, px); rle(30) = 1
    assert(metaOne(rle) === ((None, None, "bmp")))
    // 'BM' text fails the reserved-bytes corroboration: NOT sniffed as bmp
    assert(metaOne(("BM" + "W motorcycles are built in Berlin" * 3)
      .getBytes("UTF-8")) === ((None, None, "unknown")))
  }

  /** Hand-built Y4M stream, independent of the operator's synthesis:
    * stream params in ANY order, per-frame params when `frameParams`,
    * 4:2:0 chroma planes filled with a poison byte.
    */
  private def y4mBytes(w: Int, h: Int, frames: Int,
                       yOf: (Int, Int) => Int,
                       mono: Boolean = false,
                       frameParams: Boolean = false,
                       chroma: Byte = 0xAB.toByte): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 F25:1 W$w Ip H$h A1:1 C${if (mono) "mono" else "420"}\n"
      .getBytes("US-ASCII"))
    for (k <- 0 until frames) {
      out.write((if (frameParams) "FRAME Xy4mtest\n" else "FRAME\n")
        .getBytes("US-ASCII"))
      for (i <- 0 until w * h) out.write(yOf(k, i))
      if (!mono) for (_ <- 0 until w * h / 2) out.write(chroma)
    }
    out.toByteArray
  }

  private def y4mMetaOf(p: Array[Byte]): Option[(Int, Int, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.VideoOps.y4mMeta(lit(p)).as("m"))
      .select(expr("m >> 40"), expr("(m >> 20) & 1048575"),
        expr("m & 1048575")).head()
    if (r.isNullAt(0)) None
    else Some((r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt))
  }

  private def y4mLumaOf(p: Array[Byte], k: Int): Option[(Long, Int, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.VideoOps.y4mFrameLuma(lit(p), lit(k)).as("s"))
      .select(expr("s >> 16"), expr("(s >> 8) & 255"), expr("s & 255")).head()
    if (r.isNullAt(0)) None
    else Some((r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt))
  }

  test("Y4M meta walks stream params in any order and counts real frames") {
    val y = (k: Int, i: Int) => (i + 5 * k) % 256
    assert(y4mMetaOf(y4mBytes(4, 2, 3, y)) === Some((4, 2, 3)))
    // per-frame params change every frame's offset — the walk must read
    // them; a constant-stride division would miscount
    assert(y4mMetaOf(y4mBytes(4, 2, 3, y, frameParams = true)) === Some((4, 2, 3)))
    assert(y4mMetaOf(y4mBytes(6, 4, 1, y, mono = true)) === Some((6, 4, 1)))
    // truncated tail: a half-written file is NULL, never a shorter video
    assert(y4mMetaOf(y4mBytes(4, 2, 3, y).dropRight(1)) === None)
    // 4:2:0 with odd dims is ill-formed
    assert(y4mMetaOf(y4mBytes(3, 2, 1, y)) === None)
    // unsupported chroma token
    assert(y4mMetaOf("YUV4MPEG2 W4 H2 C444\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](24)(0)) === None)
    assert(y4mMetaOf("not a stream".getBytes("UTF-8")) === None)
  }

  test("Y4M frame luma folds exactly the Y plane of the addressed frame") {
    val y = (k: Int, i: Int) => (10 + 7 * k + i) % 256
    def expected(w: Int, h: Int, k: Int) = {
      val ys = (0 until w * h).map(i => y(k, i))
      (ys.map(_.toLong).sum, ys.max, ys.min)
    }
    val p = y4mBytes(4, 2, 3, y, frameParams = true)
    // each frame addressed through the param'd headers
    (0 until 3).foreach(k => assert(y4mLumaOf(p, k) === Some(expected(4, 2, k))))
    // chroma poison: if the fold overran the Y plane, 0xAB (171) bytes
    // would lift the max/mean of a low-valued frame
    val low = y4mBytes(4, 2, 1, (_, _) => 3)
    assert(y4mLumaOf(low, 0) === Some((24L, 3, 3)))
    // mono: the whole frame IS the luma plane
    assert(y4mLumaOf(y4mBytes(4, 2, 2, y, mono = true), 1) ===
      Some(expected(4, 2, 1)))
    // out-of-range / truncated frames are NULL
    assert(y4mLumaOf(p, 3) === None)
    assert(y4mLumaOf(p.dropRight(1), 2) === None)
    assert(y4mLumaOf("nope".getBytes("UTF-8"), 0) === None)
  }

  test("Y4M kernels: interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    val y = (k: Int, i: Int) => (i * 3 + k) % 256
    val vectors = Seq(
      y4mBytes(4, 2, 2, y),
      y4mBytes(4, 2, 2, y, frameParams = true),
      y4mBytes(2, 2, 1, y, mono = true),
      y4mBytes(4, 2, 2, y).dropRight(3),
      "text".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val mi = graft.functions.Y4mMeta(Literal(bytes, BinaryType)).eval(null)
      val mc = spark.range(1)
        .select(graft.functions.VideoOps.y4mMeta(lit(bytes))).head().get(0)
      assert(mi === mc, s"meta parity broke on ${bytes.take(12).mkString(",")}")
      val li = graft.functions.Y4mFrameLuma(
        Literal(bytes, BinaryType), Literal(1, IntegerType)).eval(null)
      val lc = spark.range(1)
        .select(graft.functions.VideoOps.y4mFrameLuma(lit(bytes), lit(1)))
        .head().get(0)
      assert(li === lc, s"luma parity broke on ${bytes.take(12).mkString(",")}")
    }
  }

  /** Hand-built raw-gray MP4, independent of the operator's synthesis:
    * moov before OR after mdat (sample offsets address the FILE, so both
    * layouts must resolve), fixed or table stsz, arbitrary chunking,
    * stco or co64, and deliberately broken variants (unsupported codec,
    * wrong depth, per-sample size mismatch, a sample table declaring
    * frames the stream never carried).
    */
  private def mp4Bytes(w: Int, h: Int, frames: Int, yOf: (Int, Int) => Int,
                       moovFirst: Boolean = false,
                       tableStsz: Boolean = false,
                       samplesPerChunk: Int = Int.MaxValue,
                       co64: Boolean = false,
                       format: String = "raw ",
                       depth: Int = 8,
                       declaredFrames: Int = -1,
                       stszSizeDelta: Int = 0,
                       audioTrakFirst: Boolean = false): Array[Byte] = {
    val fs = w * h
    val nDecl = if (declaredFrames >= 0) declaredFrames else frames
    val spc = math.min(samplesPerChunk, math.max(nDecl, 1))
    val nFull = nDecl / spc
    val rem = nDecl % spc
    val nChunks = nFull + (if (rem > 0) 1 else 0)
    val ec = 1 + (if (rem > 0) 1 else 0)
    val stsdSize = 102
    val stszSize = 20 + (if (tableStsz) 4 * nDecl else 0)
    val stscSize = 16 + 12 * ec
    val stcoSize = 16 + (if (co64) 8 else 4) * nChunks
    def trakSize(s: Int) = 8 + 92 + (8 + (8 + (8 + s)))
    val videoTrak = trakSize(stsdSize + stszSize + stscSize + stcoSize)
    // the decoy audio trak reuses the same geometry, single chunk, stco
    val audioTrak = if (audioTrakFirst)
      trakSize(stsdSize + 20 + (16 + 12) + (16 + 4)) else 0
    val moovSize = 8 + audioTrak + videoTrak
    val mdatStart = 16 + (if (moovFirst) moovSize else 0) + 8
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    def tag(s: String): Unit = dos.write(s.getBytes("US-ASCII"))
    def zeros(n: Int): Unit = dos.write(new Array[Byte](n))
    def writeTrak(fmt: String, dep: Int, table: Boolean, chunks: Int,
                  entries: Int, wide: Boolean): Unit = {
      val ssz = 20 + (if (table) 4 * nDecl else 0)
      val ssc = 16 + 12 * entries
      val sco = 16 + (if (wide) 8 else 4) * chunks
      dos.writeInt(trakSize(stsdSize + ssz + ssc + sco)); tag("trak")
      dos.writeInt(92); tag("tkhd"); dos.writeInt(7)
      dos.writeInt(0); dos.writeInt(0); dos.writeInt(1); dos.writeInt(0)
      dos.writeInt(0); zeros(8); dos.writeInt(0); dos.writeInt(0)
      dos.writeInt(0x00010000); dos.writeInt(0); dos.writeInt(0)
      dos.writeInt(0); dos.writeInt(0x00010000); dos.writeInt(0)
      dos.writeInt(0); dos.writeInt(0); dos.writeInt(0x40000000)
      dos.writeInt(w << 16); dos.writeInt(h << 16)
      dos.writeInt(8 + 8 + 8 + stsdSize + ssz + ssc + sco); tag("mdia")
      dos.writeInt(8 + 8 + stsdSize + ssz + ssc + sco); tag("minf")
      dos.writeInt(8 + stsdSize + ssz + ssc + sco); tag("stbl")
      dos.writeInt(stsdSize); tag("stsd"); dos.writeInt(0); dos.writeInt(1)
      dos.writeInt(86); tag(fmt); zeros(6); dos.writeShort(1)
      dos.writeShort(0); dos.writeShort(0); zeros(12)
      dos.writeShort(w); dos.writeShort(h)
      dos.writeInt(0x00480000); dos.writeInt(0x00480000); dos.writeInt(0)
      dos.writeShort(1); zeros(32); dos.writeShort(dep); dos.writeShort(-1)
      if (table) {
        dos.writeInt(ssz); tag("stsz"); dos.writeInt(0); dos.writeInt(0)
        dos.writeInt(nDecl)
        for (_ <- 0 until nDecl) dos.writeInt(fs + stszSizeDelta)
      } else {
        dos.writeInt(20); tag("stsz"); dos.writeInt(0)
        dos.writeInt(fs + stszSizeDelta); dos.writeInt(nDecl)
      }
      dos.writeInt(ssc); tag("stsc"); dos.writeInt(0); dos.writeInt(entries)
      dos.writeInt(1); dos.writeInt(spc); dos.writeInt(1)
      if (entries > 1) { dos.writeInt(nFull + 1); dos.writeInt(rem); dos.writeInt(1) }
      if (wide) {
        dos.writeInt(sco); tag("co64"); dos.writeInt(0); dos.writeInt(chunks)
        for (c <- 0 until chunks) dos.writeLong(mdatStart.toLong + c.toLong * spc * fs)
      } else {
        dos.writeInt(sco); tag("stco"); dos.writeInt(0); dos.writeInt(chunks)
        for (c <- 0 until chunks) dos.writeInt(mdatStart + c * spc * fs)
      }
    }
    def writeMoov(): Unit = {
      dos.writeInt(moovSize); tag("moov")
      // decoy FIRST: an unsupported-codec trak with complete tables that
      // must never pair with the video trak's stsd (the reset-on-trak
      // contract) — its single chunk points at the same mdat bytes
      if (audioTrakFirst) writeTrak("mp4a", 16, table = false, 1, 1, wide = false)
      writeTrak(format, depth, tableStsz, nChunks, ec, co64)
    }
    def writeMdat(): Unit = {
      dos.writeInt(8 + frames * fs); tag("mdat")
      for (k <- 0 until frames; i <- 0 until fs) dos.write(yOf(k, i))
    }
    dos.writeInt(16); tag("ftyp"); tag("isom"); dos.writeInt(0)
    if (moovFirst) { writeMoov(); writeMdat() } else { writeMdat(); writeMoov() }
    out.toByteArray
  }

  private def mp4InfoOf(p: Array[Byte]): Option[(Int, Int, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.VideoOps.mp4SampleInfo(lit(p)).as("m"))
      .select(expr("m >> 40"), expr("(m >> 20) & 1048575"),
        expr("m & 1048575")).head()
    if (r.isNullAt(0)) None
    else Some((r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt))
  }

  private def mp4LumaOf(p: Array[Byte], k: Int): Option[(Long, Int, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.VideoOps.mp4FrameLuma(lit(p), lit(k)).as("s"))
      .select(expr("s >> 16"), expr("(s >> 8) & 255"), expr("s & 255")).head()
    if (r.isNullAt(0)) None
    else Some((r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt))
  }

  test("MP4 sample-table meta resolves every layout and refuses every break") {
    val y = (k: Int, i: Int) => (i + 5 * k) % 256
    assert(mp4InfoOf(mp4Bytes(4, 2, 3, y)) === Some((4, 2, 3)))
    // table stsz + 2-sample chunks with a partial tail
    assert(mp4InfoOf(mp4Bytes(4, 2, 5, y, tableStsz = true,
      samplesPerChunk = 2)) === Some((4, 2, 5)))
    // moov BEFORE mdat — chunk offsets address the file, not "after moov"
    assert(mp4InfoOf(mp4Bytes(4, 2, 3, y, moovFirst = true)) === Some((4, 2, 3)))
    assert(mp4InfoOf(mp4Bytes(4, 2, 3, y, moovFirst = true,
      tableStsz = true, samplesPerChunk = 2)) === Some((4, 2, 3)))
    // 64-bit chunk offsets
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, co64 = true)) === Some((4, 2, 2)))
    // a decoy audio trak's complete tables must not leak into the video
    // trak (reset-on-trak); the video trak still resolves
    assert(mp4InfoOf(mp4Bytes(4, 2, 3, y, audioTrakFirst = true)) ===
      Some((4, 2, 3)))
    // unsupported codec / depth: no garbage parse, NULL
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, format = "avc1")) === None)
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, depth = 24)) === None)
    // the half-written file: table declares 5 samples, stream carries 2 —
    // some sample's resolved range runs past the payload
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, moovFirst = true,
      declaredFrames = 5)) === None)
    // per-sample size that is not w*h refuses the trak (both stsz modes)
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, stszSizeDelta = 1)) === None)
    assert(mp4InfoOf(mp4Bytes(4, 2, 2, y, tableStsz = true,
      stszSizeDelta = -1)) === None)
    assert(mp4InfoOf("not a video".getBytes("UTF-8")) === None)
  }

  test("MP4 frame luma folds the addressed sample across chunk geometry") {
    val y = (k: Int, i: Int) => (10 + 7 * k + i) % 256
    def expected(w: Int, h: Int, k: Int) = {
      val ys = (0 until w * h).map(i => y(k, i))
      (ys.map(_.toLong).sum, ys.max, ys.min)
    }
    // 5 frames in 2-sample chunks (partial tail): every frame crosses the
    // chunk resolution, frames 4 lives alone in chunk 2
    val p = mp4Bytes(4, 2, 5, y, tableStsz = true, samplesPerChunk = 2)
    (0 until 5).foreach(k => assert(mp4LumaOf(p, k) === Some(expected(4, 2, k))))
    // moov-first: file offsets shift by the whole moov, stats identical
    val pf = mp4Bytes(4, 2, 5, y, moovFirst = true, samplesPerChunk = 2)
    (0 until 5).foreach(k => assert(mp4LumaOf(pf, k) === Some(expected(4, 2, k))))
    // constant frame: sum/min/max pin the exact byte range (any off-by-one
    // drags in a non-3 byte)
    val low = mp4Bytes(4, 2, 1, (_, _) => 3)
    assert(mp4LumaOf(low, 0) === Some((24L, 3, 3)))
    // out-of-range sample index
    assert(mp4LumaOf(p, 5) === None)
    assert(mp4LumaOf("nope".getBytes("UTF-8"), 0) === None)
  }

  test("MP4 kernels: interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    val y = (k: Int, i: Int) => (i * 3 + k) % 256
    val vectors = Seq(
      mp4Bytes(4, 2, 3, y),
      mp4Bytes(4, 2, 5, y, tableStsz = true, samplesPerChunk = 2),
      mp4Bytes(4, 2, 3, y, moovFirst = true, co64 = true),
      mp4Bytes(4, 2, 2, y, moovFirst = true, declaredFrames = 5),
      "text".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val mi = graft.functions.Mp4SampleInfo(Literal(bytes, BinaryType)).eval(null)
      val mc = spark.range(1)
        .select(graft.functions.VideoOps.mp4SampleInfo(lit(bytes))).head().get(0)
      assert(mi === mc, s"info parity broke on ${bytes.take(12).mkString(",")}")
      val li = graft.functions.Mp4FrameLuma(
        Literal(bytes, BinaryType), Literal(1, IntegerType)).eval(null)
      val lc = spark.range(1)
        .select(graft.functions.VideoOps.mp4FrameLuma(lit(bytes), lit(1)))
        .head().get(0)
      assert(li === lc, s"luma parity broke on ${bytes.take(12).mkString(",")}")
    }
  }

  test("q90 statistics match an independent per-pixel replay") {
    // replay the synthesis residues imperatively (no Spark expressions in
    // the expectation) for every sampled frame of the first 40 doc_ids
    val rows = Multimodal.q90Mp4Frames(spark, TestSpark.Sf0001)
      .filter(col("doc_id") < 40)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(5), r.getInt(6), r.getLong(7)))
      .toMap
    val ids = Tables.load(spark, TestSpark.Sf0001, "documents")
      .filter(col("doc_id") < 40).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expected = (for {
      id <- ids
      if id % 4 == 0 || id % 4 == 1
      w = (id % 5 + 1).toInt; h = (id % 4 + 1).toInt; n = (id % 12 + 1).toInt
      stride = math.ceil(n / 4.0).toInt
      k <- 0 until n by stride
    } yield {
      val ys = (0 until w * h).map(i => ((id * 2 + i * 5 + k * 7) % 256).toInt)
      (id, k) -> (w, h, n, ys.min, ys.max, ys.map(_.toLong).sum * 100 / (w * h))
    }).toMap
    assert(rows === expected)
  }
  private def wavPcmBytes(bits: Int, samples: Seq[Int],
                          junked: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    val dataBytes = samples.length * (bits / 8)
    out.write("RIFF".getBytes); w32(36L + (if (junked) 12 else 0) + dataBytes)
    out.write("WAVE".getBytes)
    if (junked) { out.write("JUNK".getBytes); w32(4); w32(0) }
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(1); w32(8000); w32(8000L * bits / 8); w16(bits / 8); w16(bits)
    out.write("data".getBytes); w32(dataBytes.toLong)
    samples.foreach(s => if (bits == 16) w16(s & 0xFFFF) else out.write(s & 0xFF))
    out.toByteArray
  }

  private def pcmOne(p: Array[Byte]): Option[(Long, Int)] = {
    val r = spark.range(1)
      .select(graft.functions.AudioOps.wavPcmStats(lit(p)).as("s"))
      .select(expr("s >> 17"), expr("s & 131071")).head()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1).toInt))
  }

  test("WAV PCM fold: 16-bit signed magnitudes, 8-bit centering, refusals") {
    // 16-bit: signs and the -32768 edge (|{-32768}| = 32768 — the value
    // that needs the 17-bit peak lane)
    assert(pcmOne(wavPcmBytes(16, Seq(100, -200, 32767, -32768))) ===
      Some((100L + 200 + 32767 + 32768, 32768)))
    // 8-bit: unsigned bytes centered at 128
    assert(pcmOne(wavPcmBytes(8, Seq(128, 0, 255, 130))) ===
      Some((0L + 128 + 127 + 2, 128)))
    // data behind a JUNK chunk: the walk reaches it
    assert(pcmOne(wavPcmBytes(16, Seq(7, -7), junked = true)) === Some((14L, 7)))
    // empty data chunk: zero sum, zero peak — a silent but valid file
    assert(pcmOne(wavPcmBytes(16, Seq.empty)) === Some((0L, 0)))
    // FINAL odd-sized 8-bit chunk without its spec-mandated pad byte:
    // accepted (the walk stops at the last needed chunk; files in the
    // wild routinely omit the trailing pad)
    assert(pcmOne(wavPcmBytes(8, Seq(138, 118, 128))) === Some((20L, 10)))
    // truncated data (declared size runs past the payload): refused
    assert(pcmOne(wavPcmBytes(16, Seq(1, 2, 3)).dropRight(2)) === None)
    // non-PCM format code: refused
    val nonPcm = wavPcmBytes(16, Seq(1)); nonPcm(20) = 3 // IEEE float
    assert(pcmOne(nonPcm) === None)
    // 24-bit depth outside the contract: refused
    val b24 = wavPcmBytes(16, Seq(1)); b24(34) = 24
    assert(pcmOne(b24) === None)
    assert(pcmOne("not audio".getBytes("UTF-8")) === None)
  }

  test("WavPcmStats interpreted eval agrees with the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val vectors = Seq(
      wavPcmBytes(16, Seq(5, -6, 32767)),
      wavPcmBytes(8, Seq(0, 255), junked = true),
      wavPcmBytes(16, Seq(1, 2)).dropRight(1),
      "text".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val interp = graft.functions.WavPcmStats(Literal(bytes, BinaryType)).eval(null)
      val codegen = spark.range(1)
        .select(graft.functions.AudioOps.wavPcmStats(lit(bytes))).head().get(0)
      assert(interp === codegen, s"parity broke on ${bytes.take(8).mkString(",")}")
    }
  }

  test("q58 manifest round-trips every container class") {
    val out = Multimodal.q58MediaManifest(spark, TestSpark.Sf0001)
      .filter(col("media_id") < 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 10)
    def s(id: Long, f: String) = out(id).getAs[Any](f)
    // class 0/1: png/jpeg with dims and a resize plan
    assert(s(0, "media_type") === "png" && s(0, "width") === 1)
    assert(s(1, "media_type") === "jpeg" && s(1, "width") === 2)
    assert(s(6, "media_type") === "png" && s(6, "target_width") === 7)
    // class 2: wav parameters AND real decoded sample stats, no dims
    // (id 2: 8-bit JUNK-prefixed PCM, 3 samples u = (2*7 + i*11) % 256 =
    // 14, 25, 36 → |u-128| = 114, 103, 92 → sum 309, peak 114)
    assert(s(2, "media_type") === "wav" && s(2, "sample_rate") === 8000 &&
      s(2, "channels") === 1 && s(2, "bits") === 8 && s(2, "width") == null)
    assert(s(2, "peak_abs") === 114 && s(2, "sum_abs") === 309L)
    // class 3: mp4 dims + bounded frame plan from CALLER metadata
    // (id 3 → 4 frames, stride 1)
    assert(s(3, "media_type") === "mp4" &&
      s(3, "frame_plan") === "0,1,2,3")
    // class 4: bmp with REAL pixel stats present
    assert(s(4, "media_type") === "bmp" && s(4, "width") === 5 &&
      s(4, "mean_luma_x100") != null && s(4, "min_luma") != null)
    // class 5: y4m — dims AND the frame plan come from the PARSED bytes
    // (id 5 → 4x6, 6 real frames, stride 1), no caller metadata supplied
    assert(s(5, "media_type") === "y4m" && s(5, "width") === 4 &&
      s(5, "height") === 6 && s(5, "frame_plan") === "0,1,2,3,4,5")
  }

  test("metadata survives payload pruning (heavy column dropped downstream)") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val pruned = Multimodal.withDecodedMeta(docs, "payload", 4)
      .drop("payload")
      .groupBy(col("media_meta.format").as("format"))
      .count()
    val byFormat = pruned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // utf-8 text payloads can never carry a PNG/JPEG magic
    assert(byFormat.keySet === Set("unknown"))
    assert(byFormat.values.sum === 500L)
  }

  /** Hand-built BMPs for the aHash drills — real bytes, not the
    * operator's own synthesis. `img(y)(x) = (r, g, b)` in IMAGE space.
    */
  private def bmp24BottomUp(img: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = img.length; val w = img(0).length
    val pad = (4 - (w * 3) % 4) % 4
    val out = java.nio.ByteBuffer.allocate(54 + (w * 3 + pad) * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + (w * 3 + pad) * h)
      .putInt(0).putInt(54).putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(0)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    for (fy <- 0 until h; iy = h - 1 - fy) {
      for (x <- 0 until w) {
        val (r, g, b) = img(iy)(x)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (0 until pad).foreach(_ => out.put(0.toByte))
    }
    out.array()
  }

  private def bmp32TopDown(img: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = img.length; val w = img(0).length
    val out = java.nio.ByteBuffer.allocate(54 + w * 4 * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + w * 4 * h)
      .putInt(0).putInt(54).putInt(40).putInt(w).putInt(-h)
      .putShort(1).putShort(32).putInt(0).putInt(0)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    for (iy <- 0 until h; x <- 0 until w) {
      val (r, g, b) = img(iy)(x)
      out.put(b.toByte).put(g.toByte).put(r.toByte).put(0xFF.toByte)
    }
    out.array()
  }

  test("aHash: container-invariant on the same picture, flip-sensitive") {
    import graft.functions.BmpHashEval
    val white = (255, 255, 255); val black = (0, 0, 0)
    val img = Array(Array(white, black), Array(black, black))
    val a24 = BmpHashEval.aHash(bmp24BottomUp(img))
    val a32 = BmpHashEval.aHash(bmp32TopDown(img))
    assert(a24 != null && a24 === a32,
      "the same picture must hash identically in both containers")
    // vertically flipped picture: a kernel sampling FILE rows instead of
    // IMAGE rows would return a24 here and break cross-container dedup
    val flipped = img.reverse
    assert(BmpHashEval.aHash(bmp24BottomUp(flipped)) !== a24)
    // undecodable inputs refuse
    assert(BmpHashEval.aHash("not a bmp".getBytes("UTF-8")) === null)
    assert(BmpHashEval.aHash(bmp24BottomUp(img).take(60)) === null)
  }

  test("aHash: interpreted eval agrees with the codegen'd column path") {
    import graft.functions.{BmpHashEval, ImageOps}
    val img = Array(
      Array((10, 200, 30), (250, 250, 250)),
      Array((0, 0, 0), (128, 64, 32)))
    val vectors = Seq(bmp24BottomUp(img), bmp32TopDown(img),
      "junk".getBytes("UTF-8"))
    vectors.foreach { bytes =>
      val di = Option(BmpHashEval.aHash(bytes)).map(_.longValue())
      val dc = spark.range(1)
        .select(ImageOps.bmpAHash(lit(bytes)).as("h"))
        .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      assert(di === dc, "ahash parity")
    }
  }

  test("q101: cross-container re-encodes collide; truncated rows stay out") {
    val rows = Multimodal.q101ImageDedup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 5 re-encodes doc 4's picture (24bpp -> 32bpp): different
    // bytes, same image, same hash, grouped under the lower id
    val orig = rows(4L); val copy = rows(5L)
    assert(orig.getAs[String]("container") === "bmp24")
    assert(copy.getAs[String]("container") === "bmp32")
    assert(copy.getAs[Long]("ahash") === orig.getAs[Long]("ahash"))
    assert(copy.getAs[Long]("rep") === 4L && copy.getAs[Int]("is_dup") === 1)
    assert(orig.getAs[Int]("is_dup") === 0)
    // every truncated row refuses with NULLs
    rows.values.filter(_.getAs[String]("container") == "truncated").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("ahash")) && r.isNullAt(r.fieldIndex("rep")))
    }
    // copy classes exist beyond the single drilled pair
    val dups = rows.values.count(r => !r.isNullAt(r.fieldIndex("is_dup")) &&
      r.getAs[Int]("is_dup") == 1)
    assert(dups > 10, s"expected a dup population, got $dups")
  }

  test("q102: exact re-encodes arrive at Hamming 0; brightness edits at > 0") {
    val pairs = Multimodal.q102ImageNearDup(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // every %7==5 re-encode pair (both sides decodable) is the SAME
    // image -> same hash -> all four bands collide -> Hamming 0
    val exactPairs = (1L until 500L).filter(id => id % 7 == 5 &&
      id % 11 != 3 && (id - 1) % 11 != 3).map(id => (id - 1, id))
    assert(exactPairs.nonEmpty)
    exactPairs.foreach { p =>
      assert(pairs.get(p) === Some(0), s"re-encode pair $p not at Hamming 0")
    }
    // the %7==3 brightness-edit class: pairs whose green shift CLIPPED
    // somewhere land at a small positive Hamming — at least some must
    // exist (an aHash near-dup stage that only ever sees distance 0 is
    // an exact-dedup in disguise)
    val editPairs = (1L until 500L).filter(id => id % 7 == 3 &&
      id % 11 != 3 && (id - 1) % 11 != 3).map(id => (id - 1, id))
    val found = editPairs.flatMap(pairs.get)
    assert(found.nonEmpty)
    assert(found.exists(_ > 0), "no edit pair with positive Hamming")
    assert(found.forall(h => h >= 0 && h <= 10))
  }
}
