package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OggEval

/** The OGG walk, pinned against HAND-SPELLED pages the synthesizer
  * never produces: lacing runs, multi-value segment tables, the
  * 64-bit granule, codec clocks, and refusal discipline.
  */
class OggSpec extends AnyFunSuite {

  /** Hand-build one page (CRC zeroed — out of stated scope). */
  private def page(headerType: Int, granule: Long, lacing: Seq[Int],
                   payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII")); out.write(0)
    out.write(headerType)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xFF).toInt))
    (0 until 12).foreach(_ => out.write(0)) // serial, seq, crc
    out.write(lacing.length); lacing.foreach(out.write)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def vorbisIdent(ch: Int, rate: Int): Array[Byte] = {
    val p = new java.io.ByteArrayOutputStream()
    p.write(0x01); p.write("vorbis".getBytes("US-ASCII"))
    (0 until 4).foreach(_ => p.write(0))
    p.write(ch)
    (0 until 4).foreach(i => p.write((rate >> (8 * i)) & 0xFF))
    (0 until 13).foreach(_ => p.write(0))
    p.write(0x01)
    p.toByteArray
  }

  test("hand stream: ident fields, pages, granule, duration") {
    val ident = vorbisIdent(2, 44100)
    val data = Array.fill[Byte](30)(0x55)
    val b = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, 441000L, Seq(30), data)
    val m = OggEval.parse(b)
    assert(m.codec === "vorbis")
    assert(m.channels === 2 && m.rate === 44100)
    assert(m.pages === 2 && m.packets === 2)
    assert(m.granule === 441000L)
    assert(m.durationMs === 10000L, "441000 samples at 44.1 kHz = 10 s")
  }

  test("a 510-byte packet laces as 255,255,0 — one packet, not three") {
    val ident = vorbisIdent(1, 8000)
    val big = Array.fill[Byte](510)(0x11)
    val b = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, 8000L, Seq(255, 255, 0), big)
    val m = OggEval.parse(b)
    assert(m.packets === 2, "ident + ONE reassembled 510-byte packet")
  }

  test("three packets on one page count by terminator, not entries") {
    val ident = vorbisIdent(1, 8000)
    val data = Array.fill[Byte](255 + 10 + 20)(0x22)
    // 255,0 is one packet; 10 one; 20 one
    val b = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, 16000L, Seq(255, 0, 10, 20), data)
    assert(OggEval.parse(b).packets === 4)
  }

  test("granule is u64: a value past 2^32 survives") {
    val ident = vorbisIdent(1, 48000)
    val g = (1L << 33) + 12345L
    val b = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, g, Seq(5), Array.fill[Byte](5)(0))
    val m = OggEval.parse(b)
    assert(m.granule === g)
    assert(m.durationMs === g * 1000L / 48000L)
  }

  test("opus duration uses the 48 kHz clock, not the reported rate") {
    val p = new java.io.ByteArrayOutputStream()
    p.write("OpusHead".getBytes("US-ASCII")); p.write(1); p.write(2)
    p.write(0); p.write(0)
    // input rate 16000
    p.write(0x80); p.write(0x3E); p.write(0); p.write(0)
    p.write(0); p.write(0); p.write(0)
    val ident = p.toByteArray
    val b = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, 96000L, Seq(5), Array.fill[Byte](5)(0))
    val m = OggEval.parse(b)
    assert(m.codec === "opus" && m.rate === 16000 && m.channels === 2)
    assert(m.durationMs === 2000L, "96000 granules at 48 kHz = 2 s")
  }

  test("refusals: truncated page, lost sync, unknown first packet, not ogg") {
    val ident = vorbisIdent(1, 8000)
    val good = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x04, 100L, Seq(20), Array.fill[Byte](20)(0))
    assert(OggEval.parse(good.dropRight(5)) === null)
    val junk = good.clone(); junk(good.length - 48) = 'X' // corrupt 2nd magic
    // (second page header starts 48 bytes from the end: 27+1+20)
    assert(OggEval.parse(junk) === null)
    assert(OggEval.parse(
      page(0x02, 0L, Seq(10), Array.fill[Byte](10)(0x7F))) === null)
    assert(OggEval.parse("plain text".getBytes("UTF-8")) === null)
  }

  test("synth classes land on their contract shapes") {
    val m0 = OggEval.parse(OggEval.synth(21L))
    assert(m0.codec === "vorbis" && m0.pages === 2 && m0.packets === 2)
    assert(m0.rate === 22050 && m0.channels === 2) // 21%4=1, 1+21%2
    assert(m0.granule === 4294967296L + 21L * 960L)
    val m1 = OggEval.parse(OggEval.synth(21L | (1L << 40)))
    assert(m1.codec === "opus")
    assert(m1.durationMs === m1.granule * 1000L / 48000L)
    val m2 = OggEval.parse(OggEval.synth(21L | (2L << 40)))
    assert(m2.packets === 3, "255,0 + 20 is TWO data packets")
    assert(OggEval.parse(OggEval.synth(21L | (3L << 40))) === null)
    val m4 = OggEval.parse(OggEval.synth(21L | (4L << 40)))
    assert(m4 != null && m4.pages === 3)
    assert(m4.packets === 3, "the split packet must count ONCE")
  }

  test("a packet split across pages reassembles; the flag must agree") {
    val ident = vorbisIdent(1, 8000)
    // page 2 ends OPEN (lacing 255, 255); page 3 carries the
    // continuation flag and terminates it, plus one more packet
    val good = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x00, -1L, Seq(255, 255), Array.fill[Byte](510)(0x11)) ++
      page(0x05, 80000L, Seq(12, 7), Array.fill[Byte](19)(0x22))
    val m = OggEval.parse(good)
    assert(m != null && m.pages === 3)
    assert(m.packets === 3, "ident + split + fresh = 3, counted at ends")
    assert(m.durationMs === 80000L * 1000 / 8000)
    // continuation flag SET with nothing open: a spliced stream, refuse
    val badFlag = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x05, 80000L, Seq(12), Array.fill[Byte](12)(0x22))
    val withFlag = badFlag.clone()
    // second page's header_type byte sits at pageLen(ident)+5
    val p2 = 27 + 1 + ident.length
    assert((withFlag(p2 + 5) & 0x01) === 1) // 0x05 carries the flag
    assert(OggEval.parse(withFlag) === null)
    // flag CLEAR with a packet open: also a splice, refuse
    val noFlag = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x00, -1L, Seq(255, 255), Array.fill[Byte](510)(0x11)) ++
      page(0x04, 80000L, Seq(12, 7), Array.fill[Byte](19)(0x22))
    assert(OggEval.parse(noFlag) === null)
    // a stream ENDING with an open packet is a truncation, refuse
    val endsOpen = page(0x02, 0L, Seq(ident.length), ident) ++
      page(0x00, -1L, Seq(255, 255), Array.fill[Byte](510)(0x11))
    assert(OggEval.parse(endsOpen) === null)
  }
}
