package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WebpPixelEval

/** The VP8L pixel kernel, gated the JpegPixelSpec way: the synthesizer
  * and decoder live in one file, so the decoder is held against
  * HAND-PACKED bitstreams — spelled field by field with this spec's own
  * bit-writer straight from the lossless-WebP layout — covering forms
  * the synthesizer never emits (RLE-coded code lengths, a 2-symbol
  * simple code, refusal paths), plus the residue-formula replay for
  * every synthesis class.
  */
class WebpPixelSpec extends AnyFunSuite {

  private val NoStats = java.lang.Long.MIN_VALUE

  private def packed(min: Int, max: Int, sum: Long): Long =
    min.toLong | (max.toLong << 8) | (sum << 16)

  // residue channel maps (the shared q59 algebra, re-spelled)
  private def chR(seed: Long, x: Int, r: Int): Int =
    (((seed * 2 + x + r * 11) % 256 + 256) % 256).toInt
  private def chG(seed: Long, x: Int, r: Int): Int =
    (((seed * 3 + x * 5 + r) % 256 + 256) % 256).toInt
  private def chB(seed: Long, x: Int, r: Int): Int =
    (((seed + x * 7 + r * 13) % 256 + 256) % 256).toInt

  private def luma(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  private def statsOf(ls: Seq[Int]): Long =
    packed(ls.min, ls.max, ls.map(_.toLong).sum)

  /** The spec's own LSB-first writer — independent of the kernel's. */
  private final class HandBits {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def putCodeMsb(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      val tail = if (n > 0) Array((cur & 0xFF).toByte) else Array.empty[Byte]
      out.toArray ++ tail
    }
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    def w32(v: Int): Unit =
      (0 until 4).foreach(i => out += ((v >> (8 * i)) & 0xFF).toByte)
    "RIFF".foreach(c => out += c.toByte)
    val padded = payload.length + (payload.length & 1)
    w32(4 + 8 + padded)
    "WEBP".foreach(c => out += c.toByte)
    "VP8L".foreach(c => out += c.toByte)
    w32(payload.length)
    out ++= payload
    if ((payload.length & 1) == 1) out += 0
    out.toArray
  }

  /** One simple single-symbol prefix code, 8-bit spelling. */
  private def simple1(hb: HandBits, sym: Int): Unit = {
    hb.put(1, 1); hb.put(0, 1); hb.put(1, 1); hb.put(sym, 8)
  }

  test("hand-packed 1x1: all five codes in the simple single form") {
    val hb = new HandBits
    hb.put(0, 14); hb.put(0, 14) // 1x1
    hb.put(0, 1); hb.put(0, 3) // alpha, version
    hb.put(0, 1) // no transforms
    hb.put(0, 1) // no color cache
    hb.put(0, 1) // no meta prefix
    simple1(hb, 100) // green
    simple1(hb, 200) // red
    simple1(hb, 50) // blue
    simple1(hb, 255) // alpha
    simple1(hb, 0) // distance
    // zero data bits: every code is zero-length
    val img = riff(Array(0x2F.toByte) ++ hb.bytes)
    val l = luma(200, 100, 50)
    assert(WebpPixelEval.lumaStats(img) === packed(l, l, l.toLong))
  }

  test("hand-packed 2x1: two-symbol simple code keeps WRITE order") {
    val hb = new HandBits
    hb.put(1, 14); hb.put(0, 14) // 2x1
    hb.put(0, 1); hb.put(0, 3)
    hb.put(0, 1); hb.put(0, 1); hb.put(0, 1)
    // green: simple, TWO symbols, 8-bit first: 30 -> code 0, 10 -> code 1
    // (write order, NOT sorted order — the trap this fixture pins)
    hb.put(1, 1); hb.put(1, 1); hb.put(1, 1)
    hb.put(30, 8); hb.put(10, 8)
    simple1(hb, 0) // red
    simple1(hb, 0) // blue
    simple1(hb, 255) // alpha
    simple1(hb, 0) // distance
    hb.put(0, 1) // pixel 0: green code 0 -> symbol 30
    hb.put(1, 1) // pixel 1: green code 1 -> symbol 10
    val img = riff(Array(0x2F.toByte) ++ hb.bytes)
    assert(WebpPixelEval.lumaStats(img) ===
      statsOf(Seq(luma(0, 30, 0), luma(0, 10, 0))))
  }

  test("hand-packed 2x1: full code-length form with RLE 17/18 zeros") {
    val hb = new HandBits
    hb.put(1, 14); hb.put(0, 14)
    hb.put(0, 1); hb.put(0, 3)
    hb.put(0, 1); hb.put(0, 1); hb.put(0, 1)
    // green over 280 symbols: lengths 1 at symbols 5 and 6, zero rest,
    // written as 17(run 5), 1, 1, 18(run 138), 18(run 135)
    hb.put(0, 1) // full form
    hb.put(0, 4) // num_code_lengths = 4: order positions 17,18,0,1
    hb.put(2, 3) // len(17) = 2
    hb.put(1, 3) // len(18) = 1
    hb.put(0, 3) // len(0) = 0
    hb.put(2, 3) // len(1) = 2
    hb.put(0, 1) // no max_symbol budget
    // canonical CL codes: 18 -> '0' (len 1); 1 -> '10', 17 -> '11'
    hb.putCodeMsb(3, 2); hb.put(5 - 3, 3) // 17, run 5
    hb.putCodeMsb(2, 2) // symbol 5: length 1
    hb.putCodeMsb(2, 2) // symbol 6: length 1
    hb.putCodeMsb(0, 1); hb.put(138 - 11, 7) // 18, run 138
    hb.putCodeMsb(0, 1); hb.put(135 - 11, 7) // 18, run 135
    simple1(hb, 7) // red
    simple1(hb, 9) // blue
    simple1(hb, 255) // alpha
    simple1(hb, 0) // distance
    // green canonical: symbol 5 -> '0', symbol 6 -> '1'
    hb.put(0, 1)
    hb.put(1, 1)
    val img = riff(Array(0x2F.toByte) ++ hb.bytes)
    assert(WebpPixelEval.lumaStats(img) ===
      statsOf(Seq(luma(7, 5, 9), luma(7, 6, 9))))
  }

  test("refusals: bundled palette, predictor, lossy, truncation") {
    val okBase = WebpPixelEval.synth(3L, 2L | (2L << 8) | (2L << 16))
    assert(WebpPixelEval.lumaStats(okBase) !== NoStats)
    // predictor transform: type bits 00 right after a present bit
    val hb2 = new HandBits
    hb2.put(0, 14); hb2.put(0, 14)
    hb2.put(0, 1); hb2.put(0, 3)
    hb2.put(1, 1); hb2.put(0, 2) // transform present, PREDICTOR
    assert(WebpPixelEval.lumaStats(
      riff(Array(0x2F.toByte) ++ hb2.bytes)) === NoStats)
    // bundled palette (size 4 <= 16)
    val hb3 = new HandBits
    hb3.put(0, 14); hb3.put(0, 14)
    hb3.put(0, 1); hb3.put(0, 3)
    hb3.put(1, 1); hb3.put(3, 2); hb3.put(3, 8) // COLOR_INDEXING, psize 4
    assert(WebpPixelEval.lumaStats(
      riff(Array(0x2F.toByte) ++ hb3.bytes)) === NoStats)
    // lossy VP8 refuses outright
    assert(WebpPixelEval.lumaStats(
      WebpPixelEval.synth(1L, 3L | (2L << 8) | (5L << 16))) === NoStats)
    // truncation refuses (bit reader runs dry)
    assert(WebpPixelEval.lumaStats(okBase.dropRight(3)) === NoStats)
    // not a RIFF / null
    assert(WebpPixelEval.lumaStats("plain text".getBytes("UTF-8")) === NoStats)
    assert(WebpPixelEval.lumaStats(null) === NoStats)
  }

  test("neighbor-map distances refuse instead of guessing the table") {
    // structure a real 2x2 stream by hand: row 0 literal pixels, then a
    // back-reference whose distance VALUE lands at 1 (<= 120)
    val hb = new HandBits
    hb.put(1, 14); hb.put(1, 14) // 2x2
    hb.put(0, 1); hb.put(0, 3)
    hb.put(0, 1); hb.put(0, 1); hb.put(0, 1)
    // green: full form, symbols 8 (literal) and 257 (length code 1 ->
    // copy length 2) at length 1 each
    hb.put(0, 1)
    hb.put(0, 4)
    hb.put(2, 3); hb.put(1, 3); hb.put(0, 3); hb.put(2, 3)
    hb.put(0, 1)
    hb.putCodeMsb(3, 2); hb.put(8 - 3, 3) // 17, run 8 zeros
    hb.putCodeMsb(2, 2) // symbol 8: len 1
    hb.putCodeMsb(0, 1); hb.put(138 - 11, 7) // 18, 138 zeros (9..146)
    hb.putCodeMsb(0, 1); hb.put(110 - 11, 7) // 18, 110 zeros (147..256)
    hb.putCodeMsb(2, 2) // symbol 257: len 1
    // 8+1+138+110+1 = 258 symbols; the remaining 22 are zero via 18
    hb.putCodeMsb(0, 1); hb.put(22 - 11, 7)
    simple1(hb, 0); simple1(hb, 0); simple1(hb, 255)
    simple1(hb, 0) // distance: single symbol code 0 -> VALUE 1 (map!)
    // pixels: two literals (codes 0), then the reference (code 1)
    hb.put(0, 1); hb.put(0, 1)
    hb.put(1, 1) // length code 1 -> copy length 2, zero extra bits
    // distance symbol consumes zero bits (single form) -> value 1
    val img = riff(Array(0x2F.toByte) ++ hb.bytes)
    assert(WebpPixelEval.lumaStats(img) === NoStats,
      "map-region distance must refuse, not guess")
  }

  test("synth -> decode round-trips the residue formulas across classes") {
    for {
      seed <- 0L to 9L
      (w, h) <- Seq((1, 2), (3, 2), (7, 4), (14, 8))
      cls <- 0 to 4
    } {
      val img = WebpPixelEval.synth(seed,
        w.toLong | (h.toLong << 8) | (cls.toLong << 16))
      val psize = 17 + (seed % 8).toInt
      val lumas = for (r <- 0 until h; x <- 0 until w) yield cls match {
        case 2 => luma(chR(seed, x, 0), chG(seed, x, 0), chB(seed, x, 0))
        case 3 => luma(chR(seed, 0, 0), chG(seed, 0, 0), chB(seed, 0, 0))
        case 4 =>
          val j = (x + r * 3) % psize
          luma(chR(seed, j, 0), chG(seed, j, 0), chB(seed, j, 0))
        case _ => luma(chR(seed, x, r), chG(seed, x, r), chB(seed, x, r))
      }
      assert(WebpPixelEval.lumaStats(img) === statsOf(lumas),
        s"seed=$seed w=$w h=$h cls=$cls")
    }
  }
}
