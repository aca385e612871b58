package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Id3Eval

/** The ID3v2 walk, pinned against HAND-PACKED tags the synthesizer
  * never produces: synchsafe arithmetic on known vectors, the
  * version split on a >127-byte frame, NUL terminators, padding
  * stop, and refusal discipline.
  */
class Id3Spec extends AnyFunSuite {

  private def synchsafe(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)

  private def u32be(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def frame(major: Int, id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++
      (if (major == 4) synchsafe(body.length) else u32be(body.length)) ++
      Array[Byte](0, 0) ++ body

  private def tag(major: Int, frames: Array[Byte],
                  audio: Boolean = true): Array[Byte] =
    "ID3".getBytes("US-ASCII") ++ Array(major.toByte, 0.toByte, 0.toByte) ++
      synchsafe(frames.length) ++ frames ++
      (if (audio) Array(0xFF.toByte, 0xFB.toByte) else Array.empty[Byte])

  test("synchsafe size: 0x0100 means 128, not 256") {
    // a hand vector: bytes 00 00 01 00 -> 7-bit groups -> 128
    val t = tag(3, frame(3, "TIT2", Array[Byte](0) ++
      ("a" * 117).getBytes("US-ASCII")))
    // frames: 10 + 1 + 117 = 128 -> header size bytes 00 00 01 00
    assert(t(6) === 0.toByte && t(7) === 0.toByte &&
      t(8) === 1.toByte && t(9) === 0.toByte)
    assert(Id3Eval.parse(t).tagSize === 128)
  }

  test("the version split: one byte stream, two frame-size readings") {
    val body = Array[Byte](0) ++ ("b" * 199).getBytes("US-ASCII") // 200 bytes
    // v2.4 spells 200 synchsafe as 0x01 0x48; a v2.3 read of those
    // bytes yields 0x0148 = 328 and runs PAST the tag end -> refuse
    val v4 = tag(4, frame(4, "TIT2", body))
    assert(Id3Eval.parse(v4).title === "b" * 199)
    val corrupted = v4.clone()
    corrupted(3) = 3 // lie about the version: same bytes, v2.3 rules
    assert(Id3Eval.parse(corrupted) === null,
      "plain-u32 reading of a synchsafe size must run out of the tag")
  }

  test("NUL terminators cut; latin1 0xE9 is é; UTF-16 both orders") {
    val latin = frame(3, "TIT2",
      Array[Byte](0) ++ Array(0x63, 0x61, 0x66, 0xE9, 0x00).map(_.toByte))
    assert(Id3Eval.parse(tag(3, latin)).title === "café")
    def utf16(be: Boolean): Array[Byte] = {
      val bom = if (be) Array(0xFE, 0xFF) else Array(0xFF, 0xFE)
      val txt = "ok".getBytes(
        if (be) "UTF-16BE" else "UTF-16LE")
      frame(3, "TPE1", Array[Byte](1) ++ bom.map(_.toByte) ++ txt)
    }
    assert(Id3Eval.parse(tag(3, utf16(be = true))).artist === "ok")
    assert(Id3Eval.parse(tag(3, utf16(be = false))).artist === "ok")
  }

  test("padding stops the walk; unknown frames count and skip") {
    val frames = frame(3, "PRIV", "x".getBytes("US-ASCII")) ++
      frame(3, "TLEN", Array[Byte](0) ++ "90000".getBytes("US-ASCII")) ++
      new Array[Byte](40)
    val t = Id3Eval.parse(tag(3, frames))
    assert(t.frames === 2)
    assert(t.lenMs === 90000L)
  }

  test("refusals: truncated tag, frame past end, v2.2, not ID3") {
    val good = tag(3, frame(3, "TIT2", Array[Byte](0) ++
      "hello".getBytes("US-ASCII")))
    assert(Id3Eval.parse(good.dropRight(8)) === null)
    // a frame whose declared size exceeds the tag
    val lying = tag(3, frame(3, "TIT2", Array[Byte](0)))
    lying(14) = 0x7F // inflate the frame size
    assert(Id3Eval.parse(lying) === null)
    val v22 = good.clone(); v22(3) = 2
    assert(Id3Eval.parse(v22) === null, "v2.2 is stated out of scope")
    assert(Id3Eval.parse("plain text".getBytes("UTF-8")) === null)
  }

  test("audio-follows reads the sync pair after the tag") {
    val withAudio = tag(3, frame(3, "TLEN",
      Array[Byte](0) ++ "1".getBytes("US-ASCII")), audio = true)
    val without = tag(3, frame(3, "TLEN",
      Array[Byte](0) ++ "1".getBytes("US-ASCII")), audio = false)
    assert(Id3Eval.parse(withAudio).audioFollows === 1)
    assert(Id3Eval.parse(without).audioFollows === 0)
  }

  test("synth classes land on their contract shapes") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet").getBytes("UTF-8")
    val t0 = Id3Eval.parse(Id3Eval.synth(text, 21L))
    assert(t0.version === 3 && t0.frames === 3)
    assert(t0.title === "café alpha bravo")
    assert(t0.artist === "charlie delta")
    assert(t0.lenMs === 60000L + 21 * 1000L)
    assert(t0.audioFollows === 1)
    val t1 = Id3Eval.parse(Id3Eval.synth(text, 21L | (1L << 40)))
    assert(t1.version === 4)
    assert(t1.title === "café alpha bravo " + ("x" * 80))
    val t1e = Id3Eval.parse(Id3Eval.synth(text, 20L | (1L << 40)))
    assert(t1e.title === "café alpha bravo " + ("x" * 80),
      "both BOM orders decode")
    val t2 = Id3Eval.parse(Id3Eval.synth(text, 21L | (2L << 40)))
    assert(t2.frames === 4, "PRIV counts")
    assert(Id3Eval.parse(Id3Eval.synth(text, 21L | (3L << 40))) === null)
  }
}
