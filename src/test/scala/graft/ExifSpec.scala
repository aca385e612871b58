package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ExifEval, JpegPixelEval}

/** The EXIF orientation kernel, pinned the JpegPixelSpec way: the APP1
  * builder and the tag parser live in the same file, so the parser is
  * held against HAND-SPELLED APP1 byte vectors (both TIFF byte orders,
  * spelled marker by marker from the EXIF/TIFF layout) that the builder
  * never produced, plus malformed blocks that must refuse to 0. The
  * normalization property — a sideways camera file and its baked
  * upright re-encode hash identically — is asserted against an
  * INDEPENDENT replay of the upright picture's aHash from the residue
  * formula, never from bytes.
  */
class ExifSpec extends AnyFunSuite {

  private val NoHash = java.lang.Long.MIN_VALUE

  private def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Splice a raw APP1 (or any segment) right after SOI of a JPEG. */
  private def splice(jpeg: Array[Byte], seg: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ seg ++ jpeg.drop(2)

  private def baseJpeg(seed: Long = 5L): Array[Byte] =
    JpegPixelEval.synthAny(seed, 2, 2, 0, 0)

  // hand-spelled Exif APP1, little-endian TIFF, orientation 6:
  // segLen 0x0022 = 2 + "Exif\0\0"(6) + header(8) + count(2) + entry(12)
  // + next-IFD(4); tag 274 = 0x0112 -> LE "12 01"; SHORT value inline at
  // the FRONT of the 4-byte field
  private val app1LeO6 = bs(
    0xFF, 0xE1, 0x00, 0x22,
    'E', 'x', 'i', 'f', 0x00, 0x00,
    'I', 'I', 0x2A, 0x00, 0x08, 0x00, 0x00, 0x00,
    0x01, 0x00,
    0x12, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00, 0x06, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00)

  // the same block big-endian, orientation 8
  private val app1BeO8 = bs(
    0xFF, 0xE1, 0x00, 0x22,
    'E', 'x', 'i', 'f', 0x00, 0x00,
    'M', 'M', 0x00, 0x2A, 0x00, 0x00, 0x00, 0x08,
    0x00, 0x01,
    0x01, 0x12, 0x00, 0x03, 0x00, 0x00, 0x00, 0x01, 0x00, 0x08, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00)

  test("hand-spelled APP1 fixtures parse under both byte orders") {
    assert(ExifEval.orientation(splice(baseJpeg(), app1LeO6)) === 6)
    assert(ExifEval.orientation(splice(baseJpeg(), app1BeO8)) === 8)
    // no APP1 at all
    assert(ExifEval.orientation(baseJpeg()) === 0)
    // not a JPEG / null
    assert(ExifEval.orientation("plain text".getBytes("UTF-8")) === 0)
    assert(ExifEval.orientation(null) === 0)
  }

  test("an XMP APP1 is walked over; a later Exif APP1 still wins") {
    val xmp = {
      val body = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
      bs(0xFF, 0xE1, (body.length + 2) >> 8, (body.length + 2) & 0xFF) ++ body
    }
    assert(ExifEval.orientation(splice(baseJpeg(), xmp)) === 0)
    assert(ExifEval.orientation(splice(baseJpeg(), xmp ++ app1LeO6)) === 6)
  }

  test("malformed EXIF blocks refuse to 0, never to garbage") {
    def mut(base: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = base.clone(); f(c); c
    }
    // TIFF magic not 42
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(12) = 0x2B.toByte))) === 0)
    // type LONG instead of SHORT
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(22) = 0x04.toByte))) === 0)
    // count 2
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(24) = 0x02.toByte))) === 0)
    // value 9 (out of 1..8)
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(28) = 0x09.toByte))) === 0)
    // value 0
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(28) = 0x00.toByte))) === 0)
    // IFD offset points past the segment's own extent (may not borrow
    // bytes from the rest of the file)
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(14) = 0x7F.toByte))) === 0)
    // a different tag only (275), no orientation entry
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(20) = 0x13.toByte))) === 0)
    // entry table truncated: count says 2 entries but only 1 fits
    assert(ExifEval.orientation(splice(baseJpeg(),
      mut(app1LeO6)(a => a(18) = 0x02.toByte))) === 0)
  }

  /** Independent replay of the upright picture's normalized hash from
    * the residue formula alone (the q131 oracle's arithmetic).
    */
  private def uprightHash(sid: Long, bwU: Int, bhU: Int): Long = {
    val cells = for (gy <- 0 until 8; gx <- 0 until 8) yield {
      val k = ((gy * bhU) / 8) * bwU + (gx * bwU) / 8
      JpegPixelEval.blockDc(sid, k) + 128
    }
    val mean = cells.map(_.toLong).sum / 64
    cells.zipWithIndex.foldLeft(0L) { case (h, (l, i)) =>
      if (l > mean) h | (1L << i) else h
    }
  }

  test("every orientation normalizes to the upright hash, both orders") {
    for {
      seed <- 0L to 6L
      o <- 0 to 8
      le <- Seq(true, false)
    } {
      val bwU = (seed % 3 + 2).toInt
      val bhU = (seed % 2 + 6).toInt
      val params = bwU.toLong | (bhU.toLong << 8) | (o.toLong << 16) |
        ((if (le) 1L else 0L) << 24)
      val jpeg = ExifEval.synth(seed, params)
      assert(ExifEval.orientation(jpeg) === o,
        s"seed=$seed o=$o le=$le: tag")
      assert(ExifEval.normAHash(jpeg) === uprightHash(seed, bwU, bhU),
        s"seed=$seed o=$o le=$le: hash")
    }
  }

  test("rotated camera file and baked re-encode collide; stored hashes differ") {
    // orientation 6 with a non-square grid: the stored raster is the
    // upright picture's 90-degree rotation — a stored-pixel hash (the
    // q101 contract on these bytes) must NOT equal the baked file's,
    // while the normalized hash MUST
    val camera = ExifEval.synth(11L, 3L | (7L << 8) | (6L << 16))
    val baked = ExifEval.synth(11L, 3L | (7L << 8)) // o=0: upright, no APP1
    assert(ExifEval.normAHash(camera) === ExifEval.normAHash(baked))
    assert(ExifEval.normAHash(camera) === uprightHash(11L, 3, 7))
    // the stored rasters really are different pictures (swapped dims)
    val pc = JpegPixelEval.lumaPlane(camera)
    val pb = JpegPixelEval.lumaPlane(baked)
    assert(pc.w == pb.h && pc.h == pb.w && pc.w != pc.h,
      "camera stores sideways, baked stores upright")
  }

  test("truncated stream: tag and dims survive, the hash refuses") {
    val t = ExifEval.synth(4L, 2L | (6L << 8) | (3L << 16) | (1L << 25))
    assert(ExifEval.orientation(t) === 3)
    assert(ExifEval.normAHash(t) === NoHash)
    assert(JpegPixelEval.lumaStats(t) === NoHash) // same refusal upstream
  }

  test("q131 camera/baked partners carry identical nhash end to end") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val df = graft.operators.Multimodal
      .q131ExifIntake(spark, TestSpark.Sf0001)
      .cache()
    val cam = df.where(col("cls") === "camera")
      .select(col("doc_id").as("cid"), col("nhash").as("ch"),
        col("width").as("cw"), col("height").as("chh"))
    val bak = df.where(col("cls") === "baked")
      .select((col("doc_id") - 1).as("cid"), col("nhash").as("bh"),
        col("width").as("bw"), col("height").as("bhh"))
    val joined = cam.join(bak, "cid")
    val n = joined.count()
    assert(n > 0, "no camera/baked pairs in the corpus")
    assert(joined.where(col("ch") =!= col("bh") ||
      col("cw") =!= col("bw") || col("chh") =!= col("bhh")).count() === 0,
      "a rotated pair failed to collide")
    // truncated rows: orientation present, hash NULL
    val tr = df.where(col("cls") === "truncated")
    assert(tr.where(col("nhash").isNotNull).count() === 0)
    assert(tr.where(col("orientation") < 1 || col("orientation") > 8)
      .count() === 0)
    df.unpersist()
  }
}
