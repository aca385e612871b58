package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TiffEval

/** The TIFF meta kernel, gated the hand-fixture way: byte-spelled IFDs
  * the synthesizer never produces — misordered tags, an IFD placed past
  * padding, value-type refusals — pin the entry scan and the SHORT-in-
  * field endianness rule.
  */
class TiffSpec extends AnyFunSuite {

  private val NoDims = java.lang.Long.MIN_VALUE
  private def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def packed(w: Long, h: Long): Long = (w << 32) | h

  test("hand-spelled big-endian IFD with SHORT width reads the field front") {
    // MM header, IFD at 8, two entries: 256 SHORT 7 (value bytes are the
    // FIRST two of the field: 00 07 00 00), 257 LONG 9
    val b = bs('M', 'M', 0, 42, 0, 0, 0, 8,
      0, 2,
      1, 0, 0, 3, 0, 0, 0, 1, 0, 7, 0, 0,
      1, 1, 0, 4, 0, 0, 0, 1, 0, 0, 0, 9,
      0, 0, 0, 0)
    assert(TiffEval.dims(b) === packed(7, 9))
  }

  test("IFD offset past padding and tag order reversed still parse") {
    // II header pointing at offset 16; height entry BEFORE width
    val b = bs('I', 'I', 42, 0, 16, 0, 0, 0,
      0xDE, 0xAD, 0xBE, 0xEF, 0xDE, 0xAD, 0xBE, 0xEF, // padding
      2, 0,
      1, 1, 4, 0, 1, 0, 0, 0, 11, 0, 0, 0,
      0, 1, 3, 0, 1, 0, 0, 0, 5, 0, 0, 0,
      0, 0, 0, 0)
    assert(TiffEval.dims(b) === packed(5, 11))
  }

  test("refusals: wrong magic, bad type, multi-count, truncation, missing tag") {
    val good = TiffEval.synth(9, 12, littleEndian = true, shortW = true)
    assert(TiffEval.dims(good) === packed(9, 12))
    // magic says 43
    val badMagic = good.clone(); badMagic(2) = 43
    assert(TiffEval.dims(badMagic) === NoDims)
    // RATIONAL (type 5) width
    val rat = bs('I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0,
      0, 1, 5, 0, 1, 0, 0, 0, 7, 0, 0, 0,
      0, 0, 0, 0)
    assert(TiffEval.dims(rat) === NoDims)
    // count 2 dims
    val multi = bs('I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0,
      0, 1, 3, 0, 2, 0, 0, 0, 7, 0, 0, 0,
      0, 0, 0, 0)
    assert(TiffEval.dims(multi) === NoDims)
    // entry table truncated mid-entry; width-only IFD
    assert(TiffEval.dims(good.dropRight(10)) === NoDims)
    val widthOnly = bs('I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0,
      0, 1, 3, 0, 1, 0, 0, 0, 7, 0, 0, 0,
      0, 0, 0, 0)
    assert(TiffEval.dims(widthOnly) === NoDims)
    assert(TiffEval.dims("not tiff".getBytes("UTF-8")) === NoDims)
    assert(TiffEval.dims(null) === NoDims)
    // magic recognition survives what value parsing refuses
    assert(TiffEval.isTiff(good.dropRight(10)))
    assert(!TiffEval.isTiff("MMxx".getBytes("UTF-8")))
  }

  test("synth -> dims round-trips across orders and value types") {
    for {
      w <- Seq(1, 7, 300, 65535)
      h <- Seq(1, 12, 40000)
      le <- Seq(true, false)
      sw <- Seq(true, false)
    } assert(TiffEval.dims(TiffEval.synth(w, h, le, sw)) === packed(w, h),
      s"w=$w h=$h le=$le shortW=$sw")
  }
}
