package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GifPixelEval

/** The GIF pixel kernel, gated the q118/q121 way: the synthesizer only
  * emits literal-code LZW, so these fixtures hand-pack REAL
  * dictionary-compressed code streams (bit by bit, LSB-first) to pin the
  * decoder's dictionary growth, width promotion, and KwKwK handling
  * against data the synthesizer never produces.
  */
class GifPixelSpec extends AnyFunSuite {

  private val NoStats = java.lang.Long.MIN_VALUE

  private def packed(min: Int, max: Int, sum: Long): Long =
    min.toLong | (max.toLong << 8) | (sum << 16)

  private def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // GIF89a header + 2x2 (or WxH) LSD with a 4-entry GCT:
  // entry0 = (0,0,0) luma 0, entry1 = (10,20,30) luma 18, 2/3 = (99,..)
  private def head(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      bs(w, 0, h, 0, 0x81, 0x00, 0x00) ++
      bs(0, 0, 0, 10, 20, 30, 99, 99, 99, 99, 99, 99)
  private def desc(w: Int, h: Int, minCode: Int): Array[Byte] =
    bs(0x2C, 0, 0, 0, 0, w, 0, h, 0, 0x00, minCode)

  test("hand-packed LZW with a dictionary chain and a KwKwK code") {
    // 2x2, all pixels index 1: codes clear(4),1,6(KwKwK->[1,1]),1,eoi(5)
    // packed LSB-first at width 3 -> bytes 8C 53
    val b = head(2, 2) ++ desc(2, 2, 2) ++ bs(0x02, 0x8C, 0x53, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(b) === packed(18, 18, 4L * 18))
  }

  test("hand-packed LZW promotes the code width mid-stream") {
    // 3x2, pixels [0,1,0,1,0,1]: codes clear,0,1,6,6,eoi — the second 6
    // is read at width 4 (dict hit 2^3 after the first), and both 6s
    // walk dictionary entries; bytes 44 6C 05
    val b = head(3, 2) ++ desc(3, 2, 2) ++ bs(0x03, 0x44, 0x6C, 0x05, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(b) === packed(0, 18, 3L * 18))
  }

  test("structural refusals") {
    // a code beyond the defined dictionary (7 right after the first
    // literal, when dictSize is 6): clear(4),1,7,... width 3
    // bits: 001 100 111 -> byte0 = 0,0,1,1,0,0,1,1 LSB-first = 0xCC,
    // then eoi(5) 101 -> byte1 = 1,0,1 -> 0x05
    val bad = head(2, 2) ++ desc(2, 2, 2) ++ bs(0x02, 0xCC, 0x05, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(bad) === NoStats)
    // pixel count mismatch: the 2x2 frame fed a 1-pixel stream
    // clear(4),1,eoi(5): bits 001 100 101 LSB-first ->
    // byte0 = [0,0,1,1,0,0,1,0] = 4+8+64 = 0x4C, byte1 = [1] = 0x01
    val short = head(2, 2) ++ desc(2, 2, 2) ++ bs(0x02, 0x4C, 0x01, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(short) === NoStats)
    // truncated mid-sub-block
    val good = head(2, 2) ++ desc(2, 2, 2) ++ bs(0x02, 0x8C, 0x53, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(good.dropRight(3)) === NoStats)
    // no color table anywhere (GCT flag off, no LCT)
    val noTab = "GIF89a".getBytes("US-ASCII") ++
      bs(2, 0, 2, 0, 0x01, 0x00, 0x00) ++ desc(2, 2, 2) ++
      bs(0x02, 0x8C, 0x53, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(noTab) === NoStats)
    // literal index past the palette: minCode 3 (roots 0..7) over a
    // 4-entry table — clear(8),5,eoi(9) at width 4:
    // bits 0001 1010 1001 -> byte0 = 0,0,0,1,1,0,1,0 = 0x58? spell:
    // LSB-first: b0..b3 = 8 -> 0001 reversed? 8 = 1000: LSB emission
    // bit0=0,bit1=0,bit2=0,bit3=1; 5 = 0101: 1,0,1,0; 9 = 1001: 1,0,0,1
    // byte0 = [0,0,0,1,1,0,1,0] -> 8+16+64 = 88 = 0x58
    // byte1 = [1,0,0,1] -> 1+8 = 0x09
    val oob = head(1, 1) ++ desc(1, 1, 3) ++ bs(0x02, 0x58, 0x09, 0x00, 0x3B)
    assert(GifPixelEval.lumaStats(oob) === NoStats)
    // not a GIF / null
    assert(GifPixelEval.lumaStats("plain".getBytes("UTF-8")) === NoStats)
    assert(GifPixelEval.lumaStats(null) === NoStats)
  }

  test("synth -> decode round-trips the residue formula across variants") {
    def r601(rr: Int, g: Int, b: Int): Int = (299 * rr + 587 * g + 114 * b) / 1000
    for {
      seed <- 0L to 24L
      (w, h) <- Seq((1, 1), (3, 5), (6, 4), (9, 10))
      variant <- 0 to 2
    } {
      val b = GifPixelEval.synth(seed, w, h, variant)
      val lumas = for { r <- 0 until h; x <- 0 until w } yield {
        val j = (((seed + x * 3 + r * 5) % 32 + 32) % 32).toInt
        r601((((seed * 2 + j) % 256 + 256) % 256).toInt,
          (((seed * 3 + j * 5) % 256 + 256) % 256).toInt,
          (((seed + j * 7) % 256 + 256) % 256).toInt)
      }
      val want = packed(lumas.min, lumas.max, lumas.map(_.toLong).sum)
      assert(GifPixelEval.lumaStats(b) === want,
        s"seed=$seed w=$w h=$h variant=$variant")
    }
  }

  test("a large frame crosses sub-block and width-promotion boundaries") {
    // 40x40 = 1600 literal codes: the dictionary crosses 2^6..2^10, the
    // packed stream crosses several 255-byte sub-blocks — the synth
    // mirrors the decoder's growth rule or every code after the first
    // promotion misparses
    val b = GifPixelEval.synth(11L, 40, 40, 0)
    def r601(rr: Int, g: Int, bb: Int): Int = (299 * rr + 587 * g + 114 * bb) / 1000
    val lumas = for { r <- 0 until 40; x <- 0 until 40 } yield {
      val j = ((11 + x * 3 + r * 5) % 32).toInt
      r601(((11 * 2 + j) % 256).toInt, ((11 * 3 + j * 5) % 256).toInt,
        ((11 + j * 7) % 256).toInt)
    }
    assert(GifPixelEval.lumaStats(b) ===
      packed(lumas.min, lumas.max, lumas.map(_.toLong).sum))
  }
}
