package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PngPixelEval

/** The PNG pixel kernel, gated the q118 way: the synthesizer and decoder
  * live in the same file, so a shared misunderstanding of RFC 2083 could
  * cancel in q121's round-trip — these fixtures hand-spell the FILTERED
  * scanline bytes (and wrap them in stored-mode deflate blocks, so no
  * compressor sits between the test and the stream) and pin the decoder
  * against rasters the synthesizer never produced. Chunk CRCs and the
  * zlib adler32 are sealed with java.util.zip (they frame the stream;
  * the logic under test is the chunk walk + filter algebra + fold).
  */
class PngPixelSpec extends AnyFunSuite {

  private val NoStats = java.lang.Long.MIN_VALUE

  private def packed(min: Int, max: Int, sum: Long): Long =
    min.toLong | (max.toLong << 8) | (sum << 16)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    b32(data.length)
    out.write(tag.getBytes("US-ASCII"), 0, 4)
    out.write(data, 0, data.length)
    val c = new java.util.zip.CRC32
    c.update(tag.getBytes("US-ASCII")); c.update(data)
    b32(c.getValue)
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, colorType: Int, depth: Int = 8,
                   interlace: Int = 0): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = (w >> 24).toByte; d(1) = (w >> 16).toByte
    d(2) = (w >> 8).toByte; d(3) = w.toByte
    d(4) = (h >> 24).toByte; d(5) = (h >> 16).toByte
    d(6) = (h >> 8).toByte; d(7) = h.toByte
    d(8) = depth.toByte; d(9) = colorType.toByte; d(12) = interlace.toByte
    chunk("IHDR", d)
  }

  /** zlib stream holding `raw` in a single STORED deflate block — the
    * scanline bytes appear verbatim, no compressor in the loop. */
  private def storedZlib(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01) // zlib header, 32K window, check ok
    out.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    out.write(raw.length & 0xFF); out.write((raw.length >> 8) & 0xFF)
    out.write(~raw.length & 0xFF); out.write((~raw.length >> 8) & 0xFF)
    out.write(raw, 0, raw.length)
    val a = new java.util.zip.Adler32
    a.update(raw)
    val v = a.getValue
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    out.toByteArray
  }

  private val sig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val iend = chunk("IEND", Array.emptyByteArray)

  private def png(ih: Array[Byte], raw: Array[Byte]): Array[Byte] =
    sig ++ ih ++ chunk("IDAT", storedZlib(raw)) ++ iend

  test("hand-spelled gray raster inverts Sub and Average filters") {
    // 2x2 gray, pixels row0=[10,20] row1=[30,40];
    // row0 Sub -> [1, 10, 10]; row1 Average -> [3, 25, 15]
    val raw = Array[Byte](1, 10, 10, 3, 25, 15)
    assert(PngPixelEval.lumaStats(png(ihdr(2, 2, 0), raw)) ===
      packed(10, 40, 100L))
  }

  test("hand-spelled RGB raster inverts the Paeth predictor") {
    // 2x2 RGB, row0=(10,20,30),(40,50,60) ft=None;
    // row1=(15,25,35),(45,55,65) ft=Paeth -> all filtered bytes = 5
    // (first pixel predicts from above; second picks above via pb<pa,pc)
    val raw = Array[Byte](0, 10, 20, 30, 40, 50, 60,
      4, 5, 5, 5, 5, 5, 5)
    // Rec.601 lumas: 18, 48, 23, 53
    assert(PngPixelEval.lumaStats(png(ihdr(2, 2, 2), raw)) ===
      packed(18, 53, 18L + 48 + 23 + 53))
  }

  test("IDAT split across chunks decodes as ONE zlib stream") {
    val raw = Array[Byte](1, 10, 10, 3, 25, 15)
    val z = storedZlib(raw)
    val (z1, z2) = z.splitAt(5)
    val b = sig ++ ihdr(2, 2, 0) ++ chunk("IDAT", z1) ++ chunk("IDAT", z2) ++ iend
    assert(PngPixelEval.lumaStats(b) === packed(10, 40, 100L))
  }

  test("structural refusals") {
    val raw = Array[Byte](1, 10, 10, 3, 25, 15)
    val good = png(ihdr(2, 2, 0), raw)
    // flip one pixel byte WITHOUT resealing the chunk CRC
    val badCrc = good.clone()
    badCrc(sig.length + ihdr(2, 2, 0).length + 8 + 10) =
      (badCrc(sig.length + ihdr(2, 2, 0).length + 8 + 10) ^ 0x01).toByte
    assert(PngPixelEval.lumaStats(badCrc) === NoStats)
    // unknown interlace method, gray+alpha color type, 16-bit depth:
    // out of scope (Adam7 and palette are SUPPORTED — own fixtures)
    assert(PngPixelEval.lumaStats(png(ihdr(2, 2, 0, interlace = 2), raw)) === NoStats)
    assert(PngPixelEval.lumaStats(png(ihdr(2, 2, 4), raw)) === NoStats)
    assert(PngPixelEval.lumaStats(png(ihdr(2, 2, 0, depth = 16), raw)) === NoStats)
    // filter byte past 4
    assert(PngPixelEval.lumaStats(
      png(ihdr(2, 2, 0), Array[Byte](5, 10, 10, 0, 25, 15))) === NoStats)
    // header promises 3 rows, raster carries 2
    assert(PngPixelEval.lumaStats(png(ihdr(2, 3, 0), raw)) === NoStats)
    // raster longer than h*(1+stride)
    assert(PngPixelEval.lumaStats(
      png(ihdr(2, 2, 0), raw :+ 0.toByte)) === NoStats)
    // truncated file (IEND cut off mid-IDAT)
    assert(PngPixelEval.lumaStats(good.dropRight(20)) === NoStats)
    // a second IDAT run after a break chunk is non-consecutive
    val z = storedZlib(raw)
    val (z1, z2) = z.splitAt(5)
    val broken = sig ++ ihdr(2, 2, 0) ++ chunk("IDAT", z1) ++
      chunk("tEXt", "k\u0000v".getBytes("US-ASCII")) ++ chunk("IDAT", z2) ++ iend
    assert(PngPixelEval.lumaStats(broken) === NoStats)
    // not a PNG / null
    assert(PngPixelEval.lumaStats("plain text".getBytes("UTF-8")) === NoStats)
    assert(PngPixelEval.lumaStats(null) === NoStats)
  }

  test("ancillary chunks before and after the IDAT run are walked over") {
    val raw = Array[Byte](1, 10, 10, 3, 25, 15)
    val b = sig ++ ihdr(2, 2, 0) ++
      chunk("gAMA", Array[Byte](0, 1, (134 >> 0).toByte, 160.toByte)) ++
      chunk("IDAT", storedZlib(raw)) ++
      chunk("tEXt", "comment\u0000hi".getBytes("US-ASCII")) ++ iend
    assert(PngPixelEval.lumaStats(b) === packed(10, 40, 100L))
  }

  test("synth -> decode round-trips the residue formula across shapes") {
    // the q121 property: decoded stats equal the FORMULA's prediction
    // (computed here from the channel maps, never from bytes); every
    // (seed, h) pair with h >= 5 exercises all five row filters, and
    // modes 3/4 drive the palette map and the Adam7 pass geometry
    def r601(rr: Int, g: Int, b: Int): Int = (299 * rr + 587 * g + 114 * b) / 1000
    for {
      seed <- 0L to 24L
      (w, h) <- Seq((1, 1), (3, 5), (6, 4), (2, 7), (9, 10))
      mode <- 0 to 4
    } {
      val b = PngPixelEval.synth(seed, w, h, mode)
      val lumas = for { r <- 0 until h; x <- 0 until w } yield {
        if (mode == 3) {
          val j = (((seed + x * 3 + r * 5) % 32 + 32) % 32).toInt
          r601((((seed * 2 + j) % 256 + 256) % 256).toInt,
            (((seed * 3 + j * 5) % 256 + 256) % 256).toInt,
            (((seed + j * 7) % 256 + 256) % 256).toInt)
        } else {
          val rr = (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
          val g = (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
          val bb = (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt
          if (mode == 0) g else r601(rr, g, bb)
        }
      }
      val want = packed(lumas.min, lumas.max, lumas.map(_.toLong).sum)
      val got = PngPixelEval.lumaStats(b)
      assert(got === want, s"seed=$seed w=$w h=$h mode=$mode")
    }
  }

  test("hand-spelled palette raster maps indices through PLTE") {
    // 2x2 type-3, palette [(255,0,0),(0,255,0),(0,0,255)] -> lumas
    // 76/149/29; indices row0=[0,1] ft=None, row1=[2,0] ft=Up
    // (filtered [2, 255])
    val plte = chunk("PLTE", Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte))
    val raw = Array[Byte](0, 0, 1, 2, 2, -1)
    val b = sig ++ ihdr(2, 2, 3) ++ plte ++ chunk("IDAT", storedZlib(raw)) ++ iend
    assert(PngPixelEval.lumaStats(b) === packed(29, 149, 76L + 149 + 29 + 76))
    // an index past the 3-entry table refuses
    val rawBad = Array[Byte](0, 0, 3, 0, 0, 0)
    val bb = sig ++ ihdr(2, 2, 3) ++ plte ++ chunk("IDAT", storedZlib(rawBad)) ++ iend
    assert(PngPixelEval.lumaStats(bb) === NoStats)
    // type 3 with no PLTE at all refuses
    val noPlte = sig ++ ihdr(2, 2, 3) ++ chunk("IDAT", storedZlib(raw)) ++ iend
    assert(PngPixelEval.lumaStats(noPlte) === NoStats)
  }

  test("hand-spelled Adam7 stream walks the seven-pass geometry") {
    // 2x2 interlaced gray: only passes 1 (pixel (0,0)), 6 ((1,0)), and
    // 7 ((0,1),(1,1)) are non-empty; values 10/20/30/40 spelled with
    // Sub, Up, and Paeth filters per pass — a decoder that treats the
    // raster as one full-frame image reads the filter bytes as pixels
    val raw = Array[Byte](1, 10, 2, 20, 4, 30, 10)
    val b = sig ++ ihdr(2, 2, 0, interlace = 1) ++
      chunk("IDAT", storedZlib(raw)) ++ iend
    assert(PngPixelEval.lumaStats(b) === packed(10, 40, 100L))
  }

  test("16-bit gray folds the HIGH byte; the Sub offset widens to 2") {
    // 2x1, depth 16, type 0: samples 0x1234 and 0x5678 spelled with a
    // Sub filter — bpp is 2 BYTES, so Sub subtracts the PREVIOUS
    // SAMPLE's bytes (0x56-0x12=0x44, 0x78-0x34=0x44), not the
    // adjacent byte: an 8-bit-minded offset decodes garbage
    val raw = Array[Byte](1, 0x12, 0x34, 0x44, 0x44)
    val b = png(ihdr(2, 1, 0, depth = 16), raw)
    assert(PngPixelEval.lumaStats(b) === packed(0x12, 0x56, 0x68L))
  }

  test("hand-spelled gray+alpha: alpha is filtered but never folded") {
    // 2x1, type 4 depth 8: (gray, alpha) = (50, 200), (90, 10) under
    // an Up filter on row 0 (prev row is zeros -> identity)
    val raw = Array[Byte](2, 50, 200.toByte, 90, 10)
    val b = png(ihdr(2, 1, 4), raw)
    assert(PngPixelEval.lumaStats(b) === packed(50, 90, 140L))
  }

  test("16-bit palette is illegal per spec and refuses") {
    val raw = Array[Byte](0, 0)
    val plte = chunk("PLTE", Array[Byte](10, 20, 30))
    val b = sig ++ ihdr(1, 1, 3, depth = 16) ++ plte ++
      chunk("IDAT", storedZlib(raw)) ++ iend
    assert(PngPixelEval.lumaStats(b) === NoStats)
  }

  test("synth 16-bit and gray+alpha classes equal their 8-bit stats") {
    for (seed <- Seq(5L, 42L, 99L); w <- Seq(3, 6); h <- Seq(2, 4)) {
      val gray = PngPixelEval.lumaStats(PngPixelEval.synth(seed, w, h, 0))
      val rgb = PngPixelEval.lumaStats(PngPixelEval.synth(seed, w, h, 1))
      val ga = PngPixelEval.lumaStats(PngPixelEval.synth(seed, w, h, 5))
      val rgb16 = PngPixelEval.lumaStats(PngPixelEval.synth(seed, w, h, 6))
      val ga16 = PngPixelEval.lumaStats(PngPixelEval.synth(seed, w, h, 7))
      assert(ga === gray, s"gray+alpha != gray at seed=$seed $w x $h")
      assert(rgb16 === rgb, s"16-bit RGB != RGB at seed=$seed $w x $h")
      assert(ga16 === gray, s"16-bit G+A != gray at seed=$seed $w x $h")
    }
  }

  test("total-pixel cap refuses zlib-bomb-scale rasters at the header") {
    // 2^15 x 2^15 = 2^30 px: each edge is inside MaxEdge (2^20) but the
    // product is past MaxPixels (2^28) — a ~1032:1 deflate bomb could
    // otherwise drive a GB-scale decode whose luma sum overflows the
    // sum<<16 packing. The guard must refuse on the IHDR alone, before
    // any IDAT byte is inflated.
    val big = sig ++ ihdr(1 << 15, 1 << 15, 0) ++
      chunk("IDAT", storedZlib(Array[Byte](0, 0))) ++ iend
    assert(PngPixelEval.lumaStats(big) === NoStats)
  }
}
