package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.IcoEval

/** The ICO directory walk: the doubled-DIB-height cross-check, the
  * 0-means-256 rule, cursor refusal, and the per-entry vs whole
  * refusal split.
  */
class IcoSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def le32(v: Long): Array[Byte] =
    (0 until 4).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  private def entry(w: Int, h: Int, bpp: Int, size: Int,
                    off: Int): Array[Byte] =
    Array(w.toByte, h.toByte, 0.toByte, 0.toByte) ++ le16(1) ++ le16(bpp) ++
      le32(size.toLong) ++ le32(off.toLong)

  private def dib(w: Int, dibH: Int): Array[Byte] =
    le32(40L) ++ le32(w.toLong) ++ le32(dibH.toLong) ++ le16(1) ++ le16(8) ++
      le32(0L) ++ new Array[Byte](20) ++ Array.fill(16)(0x11.toByte)

  test("a DIB whose height is NOT doubled fails its entry") {
    val good = dib(16, 32) // doubled: valid
    val bad = dib(16, 16) // literal height: the classic reader bug
    val header = le16(0) ++ le16(1) ++ le16(2) ++
      entry(16, 16, 8, good.length, 6 + 32) ++
      entry(16, 16, 8, bad.length, 6 + 32 + good.length)
    val b = header ++ good ++ bad
    val r = IcoEval.parse(b)
    assert(r.n === 2 && r.nValid === 1)
  }

  test("cursor files (type 2) are out of stated scope") {
    val b = le16(0) ++ le16(2) ++ le16(1) ++ entry(16, 16, 8, 40, 22)
    assert(IcoEval.parse(b) === null)
  }

  test("width byte 0 means 256") {
    val png = graft.functions.PngPixelEval.synth(7L, 2, 2, 0)
    val b = le16(0) ++ le16(1) ++ le16(1) ++
      entry(0, 0, 32, png.length, 22) ++ png
    val r = IcoEval.parse(b)
    assert(r.maxW === 256 && r.hasPng === 1 && r.nValid === 1)
  }

  test("a cut directory refuses whole; a lying offset refuses one entry") {
    val cut = le16(0) ++ le16(1) ++ le16(2) ++ entry(16, 16, 8, 40, 38)
    assert(IcoEval.parse(cut).nValid === -1)
    val d = dib(16, 32)
    val liar = le16(0) ++ le16(1) ++ le16(2) ++
      entry(16, 16, 8, d.length, 6 + 32) ++
      entry(32, 32, 8, 4096, 1 << 20) ++ d
    val r = IcoEval.parse(liar)
    assert(r.n === 2 && r.nValid === 1)
  }

  test("synthesized classes round-trip") {
    val r0 = IcoEval.parse(IcoEval.synth(42L))
    assert(r0.n === 2 && r0.nValid === 2 && r0.maxW === 32 &&
      r0.maxBpp === 32 && r0.hasPng === 0)
    val r1 = IcoEval.parse(IcoEval.synth(42L + (1L << 40)))
    assert(r1.maxW === 256 && r1.hasPng === 1)
    val r2 = IcoEval.parse(IcoEval.synth(42L + (2L << 40)))
    assert(r2.n === 3 && r2.nValid === 2 && r2.maxW === 48)
    assert(IcoEval.parse(IcoEval.synth(42L + (3L << 40))).nValid === -1)
    assert(IcoEval.parse("just text".getBytes("UTF-8")) === null)
  }
}
