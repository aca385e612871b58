package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FlacEval

/** The FLAC block walk, pinned against HAND-SPELLED headers the
  * synthesizer never produces (no independent FLAC writer exists in
  * this container — the WebP stance): a SEEKTABLE-bearing layout, a
  * hand-packed STREAMINFO whose fields are written digit-by-digit
  * from the spec's bit widths, Vorbis comments with case-insensitive
  * keys and a multi-comment walk, and every refusal path.
  */
class FlacSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Hand-packed STREAMINFO tail for 22050 Hz, 2ch, 16-bit, 123456789
    * samples: rate<<44 | (ch-1)<<41 | (bits-1)<<36 | total.
    * 22050 = 0x5622 -> top 20 bits; (2-1)=1 -> 3 bits; (16-1)=15 -> 5
    * bits; 123456789 = 0x75BCD15 -> 36 bits. Packed 64-bit value:
    * 0x5622 << 44 = 0x5622_0000_0000_000, | 1<<41 | 15<<36 |
    * 0x75BCD15 = 0x56223F075BCD15... spelled out byte-by-byte below.
    */
  private def handStreamInfo(): Array[Byte] = {
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10 // blocksizes 4096
    val v = (22050L << 44) | (1L << 41) | (15L << 36) | 123456789L
    for (i <- 0 until 8) si(10 + i) = ((v >>> ((7 - i) * 8)) & 0xFF).toByte
    si
  }

  private def hdr(btype: Int, len: Int, last: Boolean): Array[Byte] =
    bytes((if (last) 0x80 else 0) | btype, (len >> 16) & 0xFF,
      (len >> 8) & 0xFF, len & 0xFF)

  test("hand header: SEEKTABLE skipped, STREAMINFO fields unpack") {
    val seektable = new Array[Byte](18) // one dummy seek point
    val flac = "fLaC".getBytes ++
      hdr(0, 34, last = false) ++ handStreamInfo() ++
      hdr(3, 18, last = true) ++ seektable
    val m = FlacEval.parse(flac)
    assert(m != null)
    assert(m.nBlocks === 2)
    assert(m.rate === 22050)
    assert(m.channels === 2)
    assert(m.bits === 16)
    assert(m.totalSamples === 123456789L)
    assert(FlacEval.durationMs(flac) === 123456789L * 1000 / 22050)
    assert(m.title === null)
  }

  test("vorbis comment: LE lengths, case-insensitive key, first TITLE wins") {
    def le(v: Int) = bytes(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
      (v >> 24) & 0xFF)
    val vendor = "hand".getBytes
    val c1 = "Title=first".getBytes // mixed case key
    val c2 = "TITLE=second".getBytes
    val c3 = "album=x".getBytes
    val vc = le(vendor.length) ++ vendor ++ le(3) ++
      le(c1.length) ++ c1 ++ le(c2.length) ++ c2 ++ le(c3.length) ++ c3
    val flac = "fLaC".getBytes ++
      hdr(0, 34, last = false) ++ handStreamInfo() ++
      hdr(4, vc.length, last = true) ++ vc
    val m = FlacEval.parse(flac)
    assert(m != null && m.title === "first")
  }

  test("refusals: not-first STREAMINFO, wrong length, zero rate, truncation") {
    val si = handStreamInfo()
    // PADDING first: STREAMINFO must be block 0
    val padFirst = "fLaC".getBytes ++ hdr(1, 2, last = false) ++ bytes(0, 0) ++
      hdr(0, 34, last = true) ++ si
    assert(FlacEval.parse(padFirst) === null)
    // a 33-byte STREAMINFO is not a STREAMINFO
    val short = "fLaC".getBytes ++ hdr(0, 33, last = true) ++ si.take(33)
    assert(FlacEval.parse(short) === null)
    // zero sample rate: duration would divide by zero
    val zsi = si.clone(); zsi(10) = 0; zsi(11) = 0; zsi(12) = (zsi(12) & 0x0F).toByte
    val zero = "fLaC".getBytes ++ hdr(0, 34, last = true) ++ zsi
    assert(FlacEval.parse(zero) === null)
    // declared length past EOF
    val trunc = "fLaC".getBytes ++ hdr(0, 34, last = true) ++ si.take(20)
    assert(FlacEval.parse(trunc) === null)
    assert(FlacEval.isFlac(trunc), "the magic verdict survives truncation")
    assert(!FlacEval.isFlac("the fast key".getBytes))
  }

  test("a comment block lying about its internal lengths refuses") {
    // vendor length claims 200 inside a 12-byte block
    val vc = bytes(200, 0, 0, 0) ++ "lies".getBytes ++ bytes(0, 0, 0, 0)
    val flac = "fLaC".getBytes ++
      hdr(0, 34, last = false) ++ handStreamInfo() ++
      hdr(4, vc.length, last = true) ++ vc
    assert(FlacEval.parse(flac) === null)
  }

  test("synth round-trips every mode against an independent replay") {
    val o = 123L
    val id = 7L
    // mode 0: rate table by id%3=1 -> 48000, channels id%2+1=2
    val m0 = FlacEval.parse(FlacEval.synth(o, id))
    assert(m0.nBlocks === 1 && m0.rate === 48000 && m0.channels === 2 &&
      m0.bits === 16 && m0.totalSamples === o * 1000 + id % 997)
    // mode 1: title behind padding + comment
    val m1 = FlacEval.parse(FlacEval.synth(o, id | (1L << 40)))
    assert(m1.nBlocks === 3 && m1.title === s"doc $id title")
    // mode 2: the 36-bit wide shape
    val m2 = FlacEval.parse(FlacEval.synth(o, id | (2L << 40)))
    assert(m2.rate === 96000 && m2.channels === 8 && m2.bits === 24 &&
      m2.totalSamples === (1L << 33) + o,
      "a u32 total reader would have truncated this")
    // mode 3: truncated mid-STREAMINFO
    val t = FlacEval.synth(o, id | (3L << 40))
    assert(FlacEval.parse(t) === null && FlacEval.isFlac(t))
  }
}
