package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AviEval

/** The RIFF tree walk, pinned against HAND-SPELLED containers the
  * synthesizer never produces: list recursion, the movi decoy, word
  * alignment on odd chunks, the u32-crossing duration, and refusals.
  */
class AviSpec extends AnyFunSuite {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++ pad
  }

  private def list(lt: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", lt.getBytes("US-ASCII") ++ body)

  private def avih(uspf: Long, frames: Long, w: Long, h: Long): Array[Byte] =
    le32(uspf) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ le32(frames) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++ new Array[Byte](16)

  private def strh(t: String): Array[Byte] =
    chunk("strh", t.getBytes("US-ASCII") ++ new Array[Byte](52))

  private def riff(payload: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32((payload.length + 4).toLong) ++
      "AVI ".getBytes("US-ASCII") ++ payload

  test("hand AVI: header fields, stream counts, long duration") {
    val body = list("hdrl", chunk("avih", avih(33333L, 200000L, 640, 480)) ++
      list("strl", strh("vids")) ++ list("strl", strh("auds"))) ++
      list("movi", "frame bytes".getBytes("US-ASCII"))
    val m = AviEval.parse(riff(body))
    assert(m.width === 640 && m.height === 480)
    assert(m.vids === 1 && m.auds === 1)
    assert(m.frames === 200000L)
    // 200000 * 33333 = 6.6666e9 — past the u32 line
    assert(AviEval.durationMs(riff(body)) === 200000L * 33333L / 1000L)
  }

  test("the movi decoy: an avih spelled in frame data is never read") {
    val real = chunk("avih", avih(40000L, 1000L, 320, 240))
    val decoyBytes = "avih".getBytes("US-ASCII") ++ le32(56) ++
      avih(1L, 9L, 1, 1) // a lying header INSIDE movi payload
    val body = list("hdrl", real ++ list("strl", strh("vids"))) ++
      list("movi", decoyBytes)
    val m = AviEval.parse(riff(body))
    assert(m.width === 320 && m.frames === 1000L,
      "the tree walk must not descend into movi")
  }

  test("odd-sized JUNK keeps the walk aligned") {
    val body = chunk("JUNK", new Array[Byte](13)) ++
      list("hdrl", chunk("avih", avih(40000L, 10L, 160, 120)) ++
        list("strl", strh("vids")))
    val m = AviEval.parse(riff(body))
    assert(m.width === 160 && m.vids === 1)
  }

  test("refusals: truncation, missing avih, not RIFF") {
    val body = list("hdrl", chunk("avih", avih(40000L, 10L, 160, 120)))
    val whole = riff(body)
    assert(AviEval.parse(whole.dropRight(10)) === null)
    assert(AviEval.parse(riff(list("hdrl", list("strl", strh("vids"))))) === null,
      "no avih -> refuse")
    assert(AviEval.parse("plain text here".getBytes("UTF-8")) === null)
    // a WAV is RIFF but not AVI
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4) ++ "WAVE".getBytes("US-ASCII")
    assert(AviEval.parse(wav) === null)
  }

  test("synth classes land on their contract shapes") {
    val m0 = AviEval.parse(AviEval.synth(21L))
    assert(m0.width === 160 + (21 % 4) * 80)
    assert(m0.height === 120 + (21 % 3) * 60)
    assert(m0.vids === 1 && m0.auds === 0)
    assert(m0.frames === 200021L && m0.usPerFrame === 40000L)
    val m1 = AviEval.parse(AviEval.synth(20L | (1L << 40)))
    assert(m1.auds === 1 && m1.usPerFrame === 33333L)
    val m2 = AviEval.parse(AviEval.synth(21L | (2L << 40)))
    assert(m2.width === m0.width, "odd JUNK must not derail the walk")
    assert(AviEval.parse(AviEval.synth(21L | (3L << 40))) === null)
  }
}
