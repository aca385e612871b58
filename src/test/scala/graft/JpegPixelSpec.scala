package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JpegPixelEval

/** The baseline-JPEG pixel kernel, gated the q59 way but with HAND-BUILT
  * byte vectors: the synthesizer and decoder live in the same file, so a
  * shared misunderstanding of T.81 could cancel in q118's round-trip —
  * these fixtures are spelled from the spec by hand (marker by marker,
  * bit by bit) and pin the decoder against streams the synthesizer never
  * produced.
  */
class JpegPixelSpec extends AnyFunSuite {

  private def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // shared prologue pieces (spelled out, not generated)
  private val dqt8 = bs(0xFF, 0xDB, 0x00, 0x43, 0x00) ++
    Array.fill(64)(8.toByte)
  // DHT: Annex K luminance DC spec + a minimal 1-code AC table (EOB='0')
  private val dht = bs(0xFF, 0xC4, 0x00, 0x31,
    0x00, // DC table 0
    0x00, 0x01, 0x05, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0x0A, 0x0B,
    0x10, // AC table 0
    0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00,
    0x00)
  private def sof0(w: Int, h: Int) = bs(0xFF, 0xC0, 0x00, 0x0B, 0x08,
    h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x01, 0x01, 0x11, 0x00)
  private val sosGray = bs(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
    0x00, 0x3F, 0x00)

  private def packed(min: Int, max: Int, sum: Long): Long =
    min.toLong | (max.toLong << 8) | (sum << 16)

  test("hand-built 8x8 DC-only stream decodes to the exact flat block") {
    // DC diff +5: category 3 -> DC code '100', amplitude '101', EOB '0'
    // = 1001010, padded with one 1-bit to 0x95. All-8 quant: pixel 133.
    val jpeg = bs(0xFF, 0xD8) ++ dqt8 ++ sof0(8, 8) ++ dht ++ sosGray ++
      bs(0x95, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(jpeg) === packed(133, 133, 64L * 133))
  }

  test("hand-built restart-marker stream resets the DC predictor") {
    // 16x8, DRI=1. MCU0 diff -3: cat 2 '011' + amp '00' + EOB '0'
    // = 011000, padded to 0x63. RST0. MCU1: predictor RESET, diff +7:
    // cat 3 '100' + amp '111' + EOB '0' = 1001110, padded to 0x9D.
    // Pixels: block0 = 125, block1 = 135 — a decoder that carries the
    // predictor across the restart lands on 132 and fails the max.
    val jpeg = bs(0xFF, 0xD8) ++ dqt8 ++ sof0(16, 8) ++
      bs(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x01) ++ dht ++ sosGray ++
      bs(0x63, 0xFF, 0xD0, 0x9D, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(jpeg) ===
      packed(125, 135, 64L * (125 + 135)))
  }

  test("refusals: truncation, arithmetic coding, wrong restart index, non-JPEG") {
    val NoStats = java.lang.Long.MIN_VALUE
    val base = bs(0xFF, 0xD8) ++ dqt8 ++ sof0(8, 8) ++ dht ++ sosGray ++
      bs(0x95, 0xFF, 0xD9)
    // entropy data cut mid-stream
    assert(JpegPixelEval.lumaStats(base.dropRight(3)) === NoStats)
    // SOF9 arithmetic coding is out of stated scope
    val arith = base.clone()
    arith(dqt8.length + 3) = 0xC9.toByte // the SOF marker byte
    assert(JpegPixelEval.lumaStats(arith) === NoStats)
    // a full-band Ss=0..Se=63 scan under SOF2 is not a legal progressive
    // scan (DC and AC may never share one) — refuse, don't guess
    val progBad = base.clone()
    progBad(dqt8.length + 3) = 0xC2.toByte
    assert(JpegPixelEval.lumaStats(progBad) === NoStats)
    // restart marker with the WRONG modulo index (RST3 where RST0 is due)
    val badRst = bs(0xFF, 0xD8) ++ dqt8 ++ sof0(16, 8) ++
      bs(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x01) ++ dht ++ sosGray ++
      bs(0x63, 0xFF, 0xD3, 0x9D, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(badRst) === NoStats)
    // not a JPEG at all
    assert(JpegPixelEval.lumaStats("plain text".getBytes("UTF-8")) === NoStats)
    assert(JpegPixelEval.lumaStats(null) === NoStats)
  }

  test("synth -> decode round-trips the residue formula across shapes") {
    // the q118 property: for every (seed, MCUs, dri, mode) the decoded
    // stats equal the FORMULA's prediction (computed here from blockDc,
    // never from bytes); modes 2/3 put FOUR/TWO luma blocks in each MCU,
    // modes 4/5 go through the PROGRESSIVE multi-scan path (DC
    // successive approximation + EOBRUN AC scans + chroma scan skips)
    for {
      seed <- 0L to 24L
      (bw, bh) <- Seq((1, 1), (3, 2), (2, 1))
      (dri, mode) <- Seq((0, 0), (2, 0), (0, 1), (1, 1), (0, 2), (2, 2),
        (0, 3), (1, 3), (0, 4), (0, 5))
    } {
      val lumaPerMcu = mode match { case 2 | 5 => 4; case 3 => 2; case _ => 1 }
      val jpeg = JpegPixelEval.synthAny(seed, bw, bh, dri, mode)
      val pix = (0 until bw * bh * lumaPerMcu)
        .map(k => JpegPixelEval.blockDc(seed, k) + 128)
      val want = packed(pix.min, pix.max, 64L * pix.sum)
      val got = JpegPixelEval.lumaStats(jpeg)
      assert(got === want,
        s"seed=$seed bw=$bw bh=$bh dri=$dri mode=$mode: got $got want $want")
    }
  }

  // 4:2:0 prologue pieces (3 components, luma 2x2, chroma 1x1, all on
  // quant/Huffman table 0)
  private val sof420 = bs(0xFF, 0xC0, 0x00, 0x11, 0x08,
    0x00, 0x10, 0x00, 0x10, 0x03,
    0x01, 0x22, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
  private val sosColor = bs(0xFF, 0xDA, 0x00, 0x0C, 0x03,
    0x01, 0x00, 0x02, 0x00, 0x03, 0x00, 0x00, 0x3F, 0x00)

  test("hand-built 4:2:0 stream folds all four luma blocks of the MCU") {
    // One 16x16 MCU. Luma DCs 10, 20, -10, 0 (diffs +10/+10/-30/+10:
    // cat4 '101'+_1010, cat4 again, cat5 '110'+_00001, cat4), each block
    // closed by EOB '0'; then Cb DC 0 ('00' + EOB) and Cr DC +5
    // (cat3 '100'+_101 + EOB). 43 bits, padded with five 1s:
    // B4 B4 C1 5A 09 5F. Quant all-8s -> pixels dc+128 =
    // 138, 148, 118, 128 — a decoder that replicates block 0 across the
    // MCU (or drops the other three) misses min 118 / max 148.
    val jpeg = bs(0xFF, 0xD8) ++ dqt8 ++ sof420 ++ dht ++ sosColor ++
      bs(0xB4, 0xB4, 0xC1, 0x5A, 0x09, 0x5F, 0xFF, 0xD9)
    val pix = Seq(138, 148, 118, 128)
    assert(JpegPixelEval.lumaStats(jpeg) ===
      packed(pix.min, pix.max, 64L * pix.sum))
  }

  test("sampling refusals: subsampled luma, multi-factor grayscale") {
    val NoStats = java.lang.Long.MIN_VALUE
    // chroma sampling exceeding luma's (luma 1x1, Cb 2x1) — luma would
    // be the subsampled component; out of stated scope
    val sofChromaUp = bs(0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x00, 0x10, 0x00, 0x10, 0x03,
      0x01, 0x11, 0x00, 0x02, 0x21, 0x00, 0x03, 0x11, 0x00)
    val a = bs(0xFF, 0xD8) ++ dqt8 ++ sofChromaUp ++ dht ++ sosColor ++
      bs(0xB4, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(a) === NoStats)
    // single-component frame declaring 2x2 factors: T.81 A.2 makes that
    // scan non-interleaved — refuse rather than guess the geometry
    val sofGray22 = bs(0xFF, 0xC0, 0x00, 0x0B, 0x08,
      0x00, 0x10, 0x00, 0x10, 0x01, 0x01, 0x22, 0x00)
    val g = bs(0xFF, 0xD8) ++ dqt8 ++ sofGray22 ++ dht ++ sosGray ++
      bs(0xB4, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(g) === NoStats)
    // luma factors beyond 2 (4x1) are out of stated scope
    val sof41 = bs(0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x00, 0x10, 0x00, 0x20, 0x03,
      0x01, 0x41, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    val f = bs(0xFF, 0xD8) ++ dqt8 ++ sof41 ++ dht ++ sosColor ++
      bs(0xB4, 0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(f) === NoStats)
  }

  test("hand-built progressive stream: AC coefficients across scan generations") {
    // 8x8 grayscale SOF2, quant all-8s, four scans spelled bit by bit:
    //   1. DC first Al=1: value 8 -> point-transformed 4, cat 3 -> 0x93
    //   2. DC refine Ah=1: low bit 0 -> 0x7F
    //   3. AC first Ss=1..63 Al=1: coefficient +1 at k=1 (-> stored 2),
    //      then EOB -> 0x67
    //   4. AC refine Ah=1: a NEW +-1 born at k=3 (run 1 skips the zero
    //      at k=2), whose walk hands k=1 its correction bit (2 -> 3),
    //      then EOB -> 0xB3
    // Final block: c[0]=64, c[1]=24, c[16]=8 after dequant — the
    // expected stats come from an INDEPENDENT IDCT replay below, so a
    // refinement slip (lost correction bit, misplaced birth) cannot
    // cancel against the decoder's own IDCT.
    val dhtProg = bs(0xFF, 0xC4, 0x00, 0x33,
      0x00, // DC table 0 (Annex K)
      0x00, 0x01, 0x05, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00,
      0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0x0A, 0x0B,
      0x10, // AC table 0: three 2-bit codes for 0x00, 0x01, 0x11
      0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00,
      0x00, 0x01, 0x11)
    val sof2 = bs(0xFF, 0xC2, 0x00, 0x0B, 0x08,
      0x00, 0x08, 0x00, 0x08, 0x01, 0x01, 0x11, 0x00)
    def sos(ss: Int, se: Int, ah: Int, al: Int) =
      bs(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, ss, se, (ah << 4) | al)
    val jpeg = bs(0xFF, 0xD8) ++ dqt8 ++ sof2 ++ dhtProg ++
      sos(0, 0, 0, 1) ++ bs(0x93) ++
      sos(0, 0, 1, 0) ++ bs(0x7F) ++
      sos(1, 63, 0, 1) ++ bs(0x67) ++
      sos(1, 63, 1, 0) ++ bs(0xB3) ++
      bs(0xFF, 0xD9)
    // independent IDCT replay (the spec's own math, not the kernel's)
    val coef = new Array[Int](64)
    coef(0) = 64; coef(1) = 24; coef(16) = 8
    val inv = 1.0 / math.sqrt(2.0)
    val px = for (y <- 0 until 8; x <- 0 until 8) yield {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val c = coef(v * 8 + u)
        if (c != 0)
          s += c * (if (u == 0) inv else 1.0) * (if (v == 0) inv else 1.0) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      math.max(0, math.min(255, math.round(s / 4.0).toInt + 128))
    }
    assert(JpegPixelEval.lumaStats(jpeg) ===
      packed(px.min, px.max, px.map(_.toLong).sum))
    // scans out of successive-approximation order refuse: repeat the
    // refinement without its first scan
    val outOfOrder = bs(0xFF, 0xD8) ++ dqt8 ++ sof2 ++ dhtProg ++
      sos(0, 0, 1, 0) ++ bs(0x7F) ++ bs(0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(outOfOrder) === java.lang.Long.MIN_VALUE)
    // an AC scan before the component's DC refuses (G.1.1.1.1)
    val acFirst = bs(0xFF, 0xD8) ++ dqt8 ++ sof2 ++ dhtProg ++
      sos(1, 63, 0, 1) ++ bs(0x67) ++ bs(0xFF, 0xD9)
    assert(JpegPixelEval.lumaStats(acFirst) === java.lang.Long.MIN_VALUE)
  }

  test("synthesized streams carry parseable SOF dims and survive byte stuffing") {
    // a DC amplitude pattern that forces an 0xFF entropy byte must be
    // stuffed (FF 00) or the decoder would read a phantom marker; scan
    // many seeds so at least some streams hit the case, and every one
    // must still round-trip (covered above) and parse dims here
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val df = spark.range(0, 200).select(
      graft.functions.ImageOps.jpegDims(
        graft.functions.JpegPixelOps.jpegSynth(col("id"),
          lit(3L + 2 * 256))).as("d"))
    assert(df.where(col("d").isNull).count() === 0)
    assert(df.where(shiftright(col("d"), 32) =!= 24).count() === 0)
  }

  test("EOBRUN chains past T.81's 32767-block single-run cap") {
    // 255x255 grayscale progressive MCUs = 65025 luma blocks > 2^15-1:
    // one EOBRUN cannot express the run (acCodes has no r=15 entry and
    // T.81 G.1.2.2 caps a run at 32767), so the synthesizer must emit a
    // CHAIN of maximal tokens — previously a Map.apply crash. 2040x2040
    // = 4.16 Mpx sits inside MaxProgressivePixels, so the decoder must
    // also CONSUME the chained runs and round-trip the residue formula.
    val jpeg = JpegPixelEval.synthAny(7L, 255, 255, 0, 4)
    val pix = (0 until 255 * 255).map(k => JpegPixelEval.blockDc(7L, k) + 128)
    assert(JpegPixelEval.lumaStats(jpeg) ===
      packed(pix.min, pix.max, 64L * pix.sum))
  }

  test("oversized progressive shapes synthesize without crashing, decode refuses") {
    // 4:2:0 at 255x255 MCUs is 4080x4080 = 16.6 Mpx: past the 4 Mpx
    // coefficient-grid guard, so the decode REFUSES (NoStats) — but the
    // encoder must still produce bytes (260100 luma blocks needs eight
    // chained EOBRUN tokens, not a thrown NoSuchElementException).
    val NoStats = java.lang.Long.MIN_VALUE
    val jpeg = JpegPixelEval.synthAny(3L, 255, 255, 0, 5)
    assert(jpeg.length > 0)
    assert(JpegPixelEval.lumaStats(jpeg) === NoStats)
  }
}
