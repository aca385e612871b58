package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.G711Eval

/** The G.711 expansion, pinned against the PUBLISHED table extremes
  * (µ-law spans 0..32124, A-law 8..32256 — constants every codec
  * reference states) plus the storage-inversion drills and the
  * container walk's refusal split.
  */
class G711Spec extends AnyFunSuite {

  test("µ-law extremes match the published table") {
    // encoded 0xFF is digital silence (magnitude 0)
    assert(G711Eval.ulawMag(0xFF) === 0)
    // encoded 0x80 is the negative full-scale: |linear| = 32124
    assert(G711Eval.ulawMag(0x80) === 32124)
    assert(G711Eval.ulawMag(0x00) === 32124) // positive full-scale
    // a reader skipping the complement would map silence to full-scale
    assert(G711Eval.ulawMag(0xFF) !== G711Eval.ulawMag(0x00))
  }

  test("A-law extremes match the published table") {
    // A-law magnitude range is 8..32256 (no zero — segment 0 bias 8)
    val mags = (0 until 256).map(G711Eval.alawMag)
    assert(mags.min === 8)
    assert(mags.max === 32256)
  }

  test("A-law segment 1 is unshifted (the seg-0/1 rule)") {
    // seg 0 and seg 1 differ by the +0x100 base, not a shift: check
    // monotone growth across the boundary for the same mantissa
    // (after the XOR 0x55 storage inversion)
    def encMag(seg: Int, mant: Int): Int =
      G711Eval.alawMag(((seg << 4) | mant) ^ 0x55)
    assert(encMag(0, 15) === 15 * 16 + 8)
    assert(encMag(1, 0) === 0x108)
    assert(encMag(2, 0) === 0x108 << 1)
    assert(encMag(7, 15) === (240 + 0x108) << 6)
  }

  test("synthesized classes round-trip through the walk") {
    // mode 0: µ-law, even n
    val id = 42L
    val m0 = G711Eval.meta(G711Eval.synth(id))
    assert(m0 >> 36 === 1L)
    val n0 = m0 & ((1L << 36) - 1)
    assert(n0 === (40 + 42 % 17) / 2 * 2)
    val s0 = G711Eval.stats(G711Eval.synth(id))
    // independent fold over the same ramp
    val expect = (0 until n0.toInt)
      .map(k => G711Eval.ulawMag(((42 * 7 + k * 13) % 256).toInt))
    assert(s0 >> 17 === expect.sum.toLong)
    assert((s0 & 0x1FFFF) === expect.max.toLong)
    // mode 2: A-law, JUNK chunk, odd unpadded data
    val m2 = G711Eval.meta(G711Eval.synth(id + (2L << 40)))
    assert(m2 >> 36 === 2L)
    assert((m2 & ((1L << 36) - 1)) % 2 === 1L)
    // mode 3: fmt 7 at 16 bits refuses
    assert(G711Eval.meta(G711Eval.synth(id + (3L << 40))) === -1L)
    assert(G711Eval.stats(G711Eval.synth(id + (3L << 40))) === -1L)
  }

  test("linear-PCM WAVs refuse (codes 6/7 only) and text is not RIFF") {
    assert(G711Eval.meta("not riff at all".getBytes("UTF-8")) === -1L)
  }
}
