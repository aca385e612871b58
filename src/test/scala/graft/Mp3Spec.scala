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
  private def kbps(m: Long): Int = (m >> 40).toInt
  private def sr(m: Long): Int = ((m >> 20) & 0xFFFFF).toInt
  private def ms(m: Long): Long = m & 0xFFFFF

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
    }
  }
}
