package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TfExampleEval

/** The protobuf wire walk, pinned against HAND-SPELLED byte vectors
  * the synthesizer never produces (no independent protobuf writer
  * exists in-container — the FLAC/WebP stance): every tag, length,
  * and varint below is written digit-by-digit from the wire spec, so
  * the walk cannot share an encoding misunderstanding with
  * [[TfExampleEval.synth]]. Drills the 10-byte negative varint,
  * packed/unpacked equivalence, unknown-field skipping by wire type,
  * map last-wins, and no-resync truncation refusals.
  */
class TfExampleSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // Example{features{feature{key:"text" value{bytes_list{value:"hi"}}}}}
  // spelled byte-by-byte:
  //   0A 14            Example.features (len 20)
  //     0A 12          Features.feature map entry (len 18)
  //       0A 04 t e x t    key
  //       12 0A        value Feature (len 10... check below)
  //         0A 08      Feature.bytes_list? no: bytes_list is field 1
  //         -> Feature.bytes_list (field 1, wire 2), BytesList(len 4)
  //            0A 02 h i   BytesList.value "hi"
  private val handText: Array[Byte] = b(
    0x0A, 0x10, // features, len 16
    0x0A, 0x0E, // map entry, len 14
    0x0A, 0x04, 't', 'e', 'x', 't', // key "text"
    0x12, 0x06, // value Feature, len 6
    0x0A, 0x04, // bytes_list, len 4
    0x0A, 0x02, 'h', 'i') // value "hi"

  test("hand-spelled Example parses: key, bytes value, exact consumption") {
    val r = TfExampleEval.parse(handText)
    assert(r.ok === 1)
    assert(r.nFeatures === 1)
    assert(new String(r.text, "UTF-8") === "hi")
    // one trailing byte: exact consumption is part of validity
    assert(TfExampleEval.parse(handText :+ 0x00.toByte).ok === 0)
  }

  test("negative int64 is a 10-byte varint; 32-bit readers would die") {
    // tokens: [-1] unpacked. -1 as varint = FF FF FF FF FF FF FF FF FF 01
    val neg = b(
      0x0A, 0x1D, // features, len 29
      0x0A, 0x1B, // map entry, len 27
      0x0A, 0x06, 't', 'o', 'k', 'e', 'n', 's',
      0x12, 0x11, // Feature, len 17
      0x1A, 0x0F, // int64_list (field 3), len 15
      0x08, // value field 1, wire 0
      0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x01,
      0x08, 0x05, // and a second value: 5
      0x08, 0x00) // and a third: 0
    val r = TfExampleEval.parse(neg)
    assert(r.ok === 1)
    assert(r.nInts === 3)
    assert(r.sumInts === 4L) // -1 + 5 + 0
    // an 11-byte varint refuses
    val over = neg.clone()
    over(26) = 0xFF.toByte // the 10th varint byte keeps its MSB
    assert(TfExampleEval.parse(over).ok === 0)
  }

  test("packed and unpacked int64 lists read identically") {
    // packed [1, 200]: 1 = 0x01; 200 = 0xC8 0x01
    val packed = b(
      0x0A, 0x13, 0x0A, 0x11,
      0x0A, 0x06, 't', 'o', 'k', 'e', 'n', 's',
      0x12, 0x07,
      0x1A, 0x05, // int64_list, len 5
      0x0A, 0x03, // packed values blob, len 3
      0x01, 0xC8, 0x01)
    val unpacked = b(
      0x0A, 0x15, 0x0A, 0x13,
      0x0A, 0x06, 't', 'o', 'k', 'e', 'n', 's',
      0x12, 0x09,
      0x1A, 0x07,
      0x08, 0x01, // value 1
      0x08, 0xC8, 0x01, // value 200
      0x08, 0x00) // value 0 (same length on purpose)
    val rp = TfExampleEval.parse(packed)
    val ru = TfExampleEval.parse(unpacked)
    assert(rp.ok === 1 && ru.ok === 1)
    assert(rp.nInts === 2 && rp.sumInts === 201L)
    assert(ru.nInts === 3 && ru.sumInts === 201L)
  }

  test("unknown fields skip by wire type at every level") {
    // Example-level: field 9 wire 0 (varint), field 8 wire 1 (8 bytes),
    // field 7 wire 5 (4 bytes), then the real features
    val o = new java.io.ByteArrayOutputStream()
    val u1 = b(0x48, 0xAC, 0x02) // field 9 varint 300
    val u2 = b(0x41, 1, 2, 3, 4, 5, 6, 7, 8) // field 8, 8 bytes
    val u3 = b(0x3D, 9, 9, 9, 9) // field 7, 4 bytes
    o.write(u1, 0, u1.length)
    o.write(u2, 0, u2.length)
    o.write(u3, 0, u3.length)
    o.write(handText, 0, handText.length)
    val r = TfExampleEval.parse(o.toByteArray)
    assert(r.ok === 1 && r.nFeatures === 1)
    assert(new String(r.text, "UTF-8") === "hi")
    // group wire types are structural refusals
    val g = b(0x4B) ++ handText // field 9 wire 3 (start group)
    assert(TfExampleEval.parse(g).ok === 0)
  }

  test("duplicate map keys: last wins") {
    def entry(v: String): Array[Byte] = {
      val inner = b(0x0A, 0x04, 't', 'e', 'x', 't', 0x12,
        (v.length + 4), 0x0A, (v.length + 2), 0x0A, v.length) ++
        v.getBytes("UTF-8")
      b(0x0A, inner.length) ++ inner
    }
    val feats = entry("old") ++ entry("newer")
    val ex = b(0x0A, feats.length) ++ feats
    val r = TfExampleEval.parse(ex)
    assert(r.ok === 1)
    assert(r.nFeatures === 1, "a map, not a list")
    assert(new String(r.text, "UTF-8") === "newer")
  }

  test("truncation refuses whole at every cut") {
    (1 until handText.length).foreach { keep =>
      assert(TfExampleEval.parse(handText.take(keep)).ok === 0,
        s"cut at $keep must refuse")
    }
    assert(TfExampleEval.parse("plain words, no protobuf".getBytes).ok === 0)
    assert(TfExampleEval.parse(Array.emptyByteArray).ok === 0)
    assert(TfExampleEval.parse(null).ok === 0)
  }

  test("synth modes parse to the oracle's numbers") {
    val text = "one two three four five six".getBytes("UTF-8")
    val m0 = TfExampleEval.parse(TfExampleEval.synth(text, 42L))
    assert(m0.ok === 1 && m0.nFeatures === 3)
    assert(new String(m0.text, "UTF-8") === "one two")
    assert(m0.nInts === 3)
    assert(m0.sumInts === (42L % 128) + (300 + 42 % 1000) + 7)
    assert(m0.hasScore && m0.scoreMicros === (42 % 8) * 250000L + 1500000L)
    val m1 = TfExampleEval.parse(TfExampleEval.synth(text, 42L | (1L << 40)))
    assert(m1.ok === 1 && m1.nFeatures === 2)
    assert(m1.sumInts === (42L % 128) - (42 % 50 + 1) + 16500L)
    assert(!m1.hasScore)
    val m2 = TfExampleEval.parse(TfExampleEval.synth(text, 42L | (2L << 40)))
    assert(m2.ok === 1 && m2.nFeatures === 3)
    assert(new String(m2.text, "UTF-8") === "two three four",
      "the duplicate key's LAST value wins")
    assert(m2.scoreMicros === (42 % 4) * 250000L)
    val m3 = TfExampleEval.parse(TfExampleEval.synth(text, 42L | (3L << 40)))
    assert(m3.ok === 0, "truncated protobuf refuses whole")
  }
}
