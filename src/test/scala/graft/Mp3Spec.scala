package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Mp3Eval

/** The MP3 meta kernel against hand-spelled headers the synthesizer
  * never produces: sync-window and version/layer refusals, synchsafe
  * arithmetic, and the published table rows.
  */
class Mp3Spec extends AnyFunSuite {

  private val NoMeta = java.lang.Long.MIN_VALUE
  private def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def kbps(m: Long): Int = ((m >> 40) & 0x1FF).toInt
  private def sr(m: Long): Int = ((m >> 20) & 0xFFFFF).toInt
  private def ms(m: Long): Long = m & 0xFFFFF
  private def vbr(m: Long): Int = ((m >> 49) & 1).toInt

  test("hand-spelled header decodes the table rows and CBR estimate") {
    // FF FB: MPEG-1 Layer III; 0x94 = bitrate idx 9 (128), rate idx 1
    // (48000); 96 junk bytes -> (100 * 8) / 128 = 6 ms
    val b = bs(0xFF, 0xFB, 0x94, 0x00) ++ Array.fill(96)(0x41.toByte)
    val m = Mp3Eval.meta(b)
    assert(kbps(m) === 128 && sr(m) === 48000 && ms(m) === 6L)
  }

  test("ID3v2 synchsafe size is honored and excluded from the duration") {
    // tag payload 200 = synchsafe 00 00 01 48
    val tag = bs('I', 'D', '3', 4, 0, 0, 0x00, 0x00, 0x01, 0x48) ++
      Array.fill(200)(0x20.toByte)
    val frame = bs(0xFF, 0xFB, 0x94, 0x00) ++ Array.fill(1596)(0x55.toByte)
    val m = Mp3Eval.meta(tag ++ frame)
    // audio bytes = 1600 -> (1600*8)/128 = 100 ms — tag NOT counted
    assert(ms(m) === 100L && kbps(m) === 128)
    // a non-synchsafe size byte (>= 0x80) refuses
    val badTag = (tag.clone()); badTag(6) = 0x80.toByte
    assert(Mp3Eval.meta(badTag ++ frame) === NoMeta)
  }

  test("refusals: sync window, version/layer, free/bad indexes") {
    val junk = Array.fill(64)(0x30.toByte)
    // sync only past the 16-byte window
    assert(Mp3Eval.meta(junk ++ bs(0xFF, 0xFB, 0x94, 0x00)) === NoMeta)
    // MPEG-2 (version bits 10): FF F3
    assert(Mp3Eval.meta(bs(0xFF, 0xF3, 0x94, 0x00) ++ junk) === NoMeta)
    // Layer I (bits 11): FF FF
    assert(Mp3Eval.meta(bs(0xFF, 0xFF, 0x94, 0x00) ++ junk) === NoMeta)
    // free (0) and bad (15) bitrate, reserved sample rate (idx 3)
    assert(Mp3Eval.meta(bs(0xFF, 0xFB, 0x04, 0x00) ++ junk) === NoMeta)
    assert(Mp3Eval.meta(bs(0xFF, 0xFB, 0xF4, 0x00) ++ junk) === NoMeta)
    assert(Mp3Eval.meta(bs(0xFF, 0xFB, 0x9C, 0x00) ++ junk) === NoMeta)
    assert(Mp3Eval.meta("plain text".getBytes("UTF-8")) === NoMeta)
    assert(Mp3Eval.meta(null) === NoMeta)
  }

  test("synth -> meta round-trips the tables") {
    for (br <- 1 to 14; sri <- 0 to 2) {
      val m = Mp3Eval.meta(Mp3Eval.synth(br, sri, 50, 400, 7L))
      val wantK = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)(br)
      val wantS = Array(44100, 48000, 32000)(sri)
      assert(kbps(m) === wantK && sr(m) === wantS, s"br=$br sri=$sri")
      assert(ms(m) === (404L * 8) / wantK)
      assert(vbr(m) === 0)
    }
  }

  test("a Xing frame count beats the CBR estimate (the VBR class)") {
    // stereo: Xing at 4 + 32
    val m = Mp3Eval.meta(Mp3Eval.synth(9, 1, 0, 400, 7L, vbrKind = 1,
      frames = 1000))
    assert(vbr(m) === 1)
    assert(ms(m) === 1000L * 1152 * 1000 / 48000) // 24000 ms
    // the CBR estimate over these bytes would be ~28 ms — provably
    // wrong; the header exists precisely to correct it
    assert(ms(m) !== (404L * 8) / 128)
  }

  test("MONO moves the Xing header to 4 + 17 (the mode-bits bug)") {
    val m = Mp3Eval.meta(Mp3Eval.synth(9, 0, 0, 300, 7L, vbrKind = 3,
      frames = 441))
    assert(vbr(m) === 1)
    assert(ms(m) === 441L * 1152 * 1000 / 44100) // 11520 ms
    // a stereo-offset reader looking at 4+32 would find junk there:
    // hand-build a MONO stream with "Xing" ONLY at the stereo offset —
    // it must NOT bind (wrong offset for this mode)
    val b = bs(0xFF, 0xFB, 0x94, 0xC0) ++ Array.fill(32)(0x00.toByte) ++
      "Xing".getBytes("US-ASCII") ++ bs(0, 0, 0, 1) ++ bs(0, 0, 3, 0xE8) ++
      Array.fill(64)(0x41.toByte)
    val m2 = Mp3Eval.meta(b)
    assert(vbr(m2) === 0) // CBR fallback: the mono offset held zeros
  }

  test("Info is the CBR spelling of the same header — count still wins") {
    val base = Mp3Eval.synth(9, 1, 0, 400, 7L, vbrKind = 1, frames = 250)
    val info = base.clone()
    // rewrite the magic Xing -> Info in place
    val at = 4 + 32
    info(at) = 'I'; info(at + 1) = 'n'; info(at + 2) = 'f'; info(at + 3) = 'o'
    val m = Mp3Eval.meta(info)
    assert(vbr(m) === 1 && ms(m) === 250L * 1152 * 1000 / 48000)
  }

  test("VBRI sits at the FIXED 4 + 32 and its frame count wins") {
    val m = Mp3Eval.meta(Mp3Eval.synth(9, 2, 0, 350, 7L, vbrKind = 2,
      frames = 800))
    assert(vbr(m) === 1)
    assert(ms(m) === 800L * 1152 * 1000 / 32000) // 28800 ms
  }

  test("a declared VBR header cut before its frame count refuses") {
    val whole = Mp3Eval.synth(9, 1, 0, 0, 7L, vbrKind = 1, frames = 1000)
    // cut inside the frames field: "Xing" + flags survive, count doesn't
    val cut = java.util.Arrays.copyOfRange(whole, 0, 4 + 32 + 4 + 4 + 2)
    assert(Mp3Eval.meta(cut) === NoMeta)
  }

  test("Xing flags without the frame-count bit falls back to CBR") {
    val whole = Mp3Eval.synth(9, 1, 0, 400, 7L, vbrKind = 1, frames = 1000)
    val noBit = whole.clone()
    // zero the flags u32 (bytes 4+32+4 .. +8)
    var k = 4 + 32 + 4
    while (k < 4 + 32 + 8) { noBit(k) = 0; k += 1 }
    val m = Mp3Eval.meta(noBit)
    assert(vbr(m) === 0) // no count declared: the CBR estimate stands
  }
}
