package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CborEval

/** The CBOR walk, pinned on HAND-SPELLED wire vectors (RFC 8949 §3's
  * own head grammar): argument-width escapes, indefinite chunking,
  * tag transparency, last-wins duplicates, and the no-resync
  * refusals.
  */
class CborSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def txt(s: String): Array[Byte] = {
    val u = s.getBytes("UTF-8")
    require(u.length < 24)
    (0x60 + u.length).toByte +: u
  }

  test("hand map: immediate, u8, u16 and u32 argument widths") {
    // {"id": 500 (u16), "delta": -300 (u16 negint), "text": "hi",
    //  "tags": [1, 25 (u8), 70000 (u32)]}
    val b = bytes(0xA4) ++
      txt("id") ++ bytes(0x19, 0x01, 0xF4) ++
      txt("delta") ++ bytes(0x39, 0x01, 0x2B) ++ // -1 - 299 = -300
      txt("text") ++ txt("hi") ++
      txt("tags") ++ bytes(0x83, 0x01, 0x18, 0x19) ++
      bytes(0x1A, 0x00, 0x01, 0x11, 0x70)
    val r = CborEval.parse(b)
    assert(r.ok === 1)
    assert(r.id === 500L)
    assert(r.delta === -300L)
    assert(new String(r.text, "UTF-8") === "hi")
    assert(r.nTags === 3 && r.sumTags === 1L + 25L + 70000L)
  }

  test("indefinite text chunks concatenate; a definite-only reader dies") {
    val b = bytes(0xA1) ++ txt("text") ++
      bytes(0x7F) ++ txt("ab") ++ txt("cde") ++ bytes(0xFF)
    val r = CborEval.parse(b)
    assert(r.ok === 1 && new String(r.text, "UTF-8") === "abcde")
  }

  test("tags wrap transparently, even nested") {
    // {"id": tag(2, tag(3, 7))}
    val b = bytes(0xA1) ++ txt("id") ++ bytes(0xC2, 0xC3, 0x07)
    assert(CborEval.parse(b).id === 7L)
  }

  test("duplicate keys keep the LAST value") {
    val b = bytes(0xA2) ++ txt("id") ++ bytes(0x05) ++
      txt("id") ++ bytes(0x09)
    assert(CborEval.parse(b).id === 9L)
  }

  test("unknown keys skip by grammar: nested maps, floats, simples") {
    val b = bytes(0xA4) ++
      txt("x") ++ bytes(0xA2) ++ txt("a") ++ bytes(0x01) ++
      txt("b") ++ bytes(0x81, 0x02) ++ // nested map w/ array value
      txt("f") ++ bytes(0xFB, 0x3F, 0xF0, 0, 0, 0, 0, 0, 0) ++ // f64 1.0
      txt("s") ++ bytes(0xF6) ++ // null
      txt("id") ++ bytes(0x04)
    assert(CborEval.parse(b).id === 4L)
  }

  test("no resync: trailing bytes, truncation, reserved info refuse") {
    val good = bytes(0xA1) ++ txt("id") ++ bytes(0x05)
    assert(CborEval.parse(good).ok === 1)
    assert(CborEval.parse(good ++ bytes(0x00)).ok === 0) // trailing
    assert(CborEval.parse(good.dropRight(1)).ok === 0) // truncated
    val reserved = bytes(0xA1) ++ txt("id") ++ bytes(0x1C) // info 28
    assert(CborEval.parse(reserved).ok === 0)
  }

  test("synthesized classes round-trip; duplicate decoy loses") {
    val text = "alpha beta gamma".getBytes("UTF-8")
    val r0 = CborEval.parse(CborEval.synth(text, 42L))
    assert(r0.ok === 1 && r0.id === 42007L && r0.delta === -47L)
    assert(new String(r0.text, "UTF-8") === "alpha beta#42")
    val r1 = CborEval.parse(CborEval.synth(text, 42L + (1L << 40)))
    assert(r1.id === r0.id && r1.sumTags === r0.sumTags &&
      new String(r1.text, "UTF-8") === "alpha beta#42")
    val r2 = CborEval.parse(CborEval.synth(text, 42L + (2L << 40)))
    assert(r2.id === 42L + (1L << 33))
    assert(new String(r2.text, "UTF-8") === "alpha beta#42") // decoy lost
    assert(CborEval.parse(CborEval.synth(text, 42L + (3L << 40))).ok === 0)
  }
}
