package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZstdEval

/** The zstd frame walk, pinned against HAND-SPELLED byte vectors
  * (RFC 8878 §3.1) the synthesizer never produces: every FCS field
  * width with the 2-byte form's +256 offset, the single-segment
  * window elision, the RLE one-byte rule, reserved-bit and
  * reserved-block refusals, and the skippable-frame mask.
  */
class ZstdSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // magic 28 B5 2F FD little-endian
  private val Magic = bytes(0x28, 0xB5, 0x2F, 0xFD)

  test("hand frame: single-segment, 1-byte FCS, one raw block") {
    // FHD 0x20: fcsFlag 0 + single-segment (1-byte FCS), no checksum
    // FCS = 3; block header: last=1, raw, size 3 -> 0x19 00 00
    val f = Magic ++ bytes(0x20, 0x03, 0x19, 0x00, 0x00, 'a', 'b', 'c')
    val r = ZstdEval.parse(f)
    assert(r.isZstd === 1 && r.nFrames === 1 && r.truncated === 0)
    assert(r.contentSize === 3L)
    assert(r.windowLog === -1) // single-segment: no window descriptor
  }

  test("2-byte FCS carries the +256 offset") {
    // FHD 0x60: fcsFlag 1 + single-segment; stored FCS 0x0000 -> 256
    // one RLE block declaring 256 repeats: header (256<<3)|3 = 0x803
    val f = Magic ++ bytes(0x60, 0x00, 0x00, 0x03, 0x08, 0x00, 'z')
    val r = ZstdEval.parse(f)
    assert(r.nFrames === 1 && r.contentSize === 256L && r.truncated === 0)
  }

  test("RLE block content is ONE byte, not the declared size") {
    // non-single frame: FHD 0x00 (fcsFlag 0, window descriptor), wd
    // 0x10 (exp 2 -> windowLog 12), RLE block of 4096 repeats
    // (header (4096<<3)|2|1 = 0x8003), content 1 byte, END of buffer:
    // a size-advancing walker would demand 4096 bytes and refuse
    val f = Magic ++ bytes(0x00, 0x10, 0x03, 0x80, 0x00, 'q')
    val r = ZstdEval.parse(f)
    assert(r.nFrames === 1 && r.truncated === 0)
    assert(r.windowLog === 12)
    assert(r.contentSize === -1L) // no FCS declared -> unknown
  }

  test("8-byte FCS and 4-byte dictionary id parse at full width") {
    // FHD: fcsFlag 3 (8 bytes) | single 0x20 | dictFlag 3 (4 bytes)
    val fhd = 0xC0 | 0x20 | 0x03
    val f = Magic ++ bytes(fhd) ++
      bytes(0x78, 0x56, 0x34, 0x12) ++ // dict id 0x12345678
      bytes(0x05, 0, 0, 0, 0, 0, 0, 0) ++ // FCS = 5
      bytes(0x29, 0x00, 0x00) ++ "hello".getBytes("US-ASCII")
    val r = ZstdEval.parse(f)
    assert(r.contentSize === 5L && r.dictId === 0x12345678L)
  }

  test("reserved FHD bit refuses the rest of the stream") {
    val f = Magic ++ bytes(0x28, 0x03, 0x19, 0x00, 0x00, 'a', 'b', 'c')
    val r = ZstdEval.parse(f)
    assert(r.isZstd === 1 && r.nFrames === 0 && r.truncated === 1)
  }

  test("reserved block type refuses; frames before it serve") {
    val good = Magic ++ bytes(0x20, 0x01, 0x09, 0x00, 0x00, 'x')
    // block header type 3: (1<<3)|6|1 = 0x0F
    val bad = Magic ++ bytes(0x20, 0x01, 0x0F, 0x00, 0x00, 'x')
    val r = ZstdEval.parse(good ++ bad)
    assert(r.nFrames === 1 && r.truncated === 1 && r.contentSize === 1L)
  }

  test("skippable frames advance by their size and count separately") {
    val skip = bytes(0x5E, 0x2A, 0x4D, 0x18) ++ // 0x184D2A5E LE
      bytes(0x04, 0x00, 0x00, 0x00) ++ "meta".getBytes("US-ASCII")
    val frame = Magic ++ bytes(0x20, 0x02, 0x11, 0x00, 0x00, 'h', 'i')
    val r = ZstdEval.parse(skip ++ frame ++ skip)
    assert(r.nFrames === 1 && r.nSkippable === 2 && r.truncated === 0)
    assert(r.contentSize === 2L)
  }

  test("multi-block frame walks every header to the last-block bit") {
    // two raw blocks: 2 bytes (not last: 0x10 00 00) + 3 bytes (last)
    val f = Magic ++ bytes(0x20, 0x05) ++
      bytes(0x10, 0x00, 0x00) ++ "ab".getBytes("US-ASCII") ++
      bytes(0x19, 0x00, 0x00) ++ "cde".getBytes("US-ASCII")
    val r = ZstdEval.parse(f)
    assert(r.nFrames === 1 && r.contentSize === 5L && r.truncated === 0)
  }

  test("checksum flag consumes 4 tail bytes; cutting them truncates") {
    // FHD 0x24: single + checksum; FCS 1; one raw block
    val whole = Magic ++ bytes(0x24, 0x01, 0x09, 0x00, 0x00, 'x') ++
      bytes(1, 2, 3, 4)
    assert(ZstdEval.parse(whole).truncated === 0)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 2)
    val r = ZstdEval.parse(cut)
    assert(r.nFrames === 0 && r.truncated === 1)
  }

  test("plain text and a bare magic are handled") {
    assert(ZstdEval.parse("not zstd at all".getBytes("UTF-8")).isZstd === 0)
    assert(ZstdEval.parse(Magic).truncated === 1) // magic then nothing
  }

  test("synthesized classes round-trip through the walk") {
    val text = "alpha beta gamma delta".getBytes("UTF-8")
    val r0 = ZstdEval.parse(ZstdEval.synth(text, 42L))
    assert(r0.nFrames === 1 && r0.hasChecksum === 1 &&
      r0.contentSize === "alpha beta#42".length.toLong)
    val r1 = ZstdEval.parse(ZstdEval.synth(text, 42L + (1L << 40)))
    assert(r1.nFrames === 1 && r1.nSkippable === 1 &&
      r1.windowLog === 10 + 42 % 8 && r1.dictId === 1042L &&
      r1.contentSize === (340 + 42 % 7 + 42 % 5).toLong)
    val r2 = ZstdEval.parse(ZstdEval.synth(text, 42L + (2L << 40)))
    assert(r2.nFrames === 2 && r2.windowLog === -1 &&
      r2.contentSize === 2L * "alpha beta#42".length)
    val r3 = ZstdEval.parse(ZstdEval.synth(text, 42L + (3L << 40)))
    assert(r3.nFrames === 0 && r3.truncated === 1)
  }
}
