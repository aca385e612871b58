package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OrcEval

/** The ORC tail walk: the two-byte magic tag, packed vs unpacked
  * subtype counting, the stripe-sum cross-check, scope refusal, and
  * the backward-read refusal split.
  */
class OrcSpec extends AnyFunSuite {

  test("synthesized classes round-trip") {
    val x0 = OrcEval.parse(OrcEval.synth(42L))
    assert(x0 != null && x0.compression === 0 && x0.nStripes === 2)
    assert(x0.nColumns === (42 % 6 + 2))
    assert(x0.numRows === (100 + 42 % 900) + (100 + 43 % 900).toLong)
    assert(x0.numRows === x0.sumStripeRows)
    // packed subtypes count the same columns; the lying footer shows
    val x1 = OrcEval.parse(OrcEval.synth(42L + (1L << 40)))
    assert(x1.nStripes === 3 && x1.nColumns === (42 % 6 + 2))
    assert(x1.numRows === x1.sumStripeRows + 7)
    // zlib: kind reported, row facts refuse (stated scope)
    val x2 = OrcEval.parse(OrcEval.synth(42L + (2L << 40)))
    assert(x2.compression === 1 && x2.numRows === -1L && x2.ok === 1)
    // past-EOF postscript: magic survives, fields refuse
    val x3 = OrcEval.parse(OrcEval.synth(42L + (3L << 40)))
    assert(x3 != null && x3.ok === 0)
  }

  test("a postscript without the ORC magic field refuses") {
    val good = OrcEval.synth(7L)
    // corrupt one magic byte inside the postscript (3rd-from-last of
    // the ps body: ... 'O' 'R' 'C' <lenByte>)
    val bad = good.clone()
    bad(bad.length - 2) = 'X'
    assert(OrcEval.parse(bad).ok === 0)
  }

  test("plain text is not ORC; a short buffer is not ORC") {
    assert(OrcEval.parse("definitely not orc data".getBytes) === null)
    assert(OrcEval.parse("ORC".getBytes) === null)
  }

  test("verified flag: equal sums pass, the +7 lie fails") {
    val ok = OrcEval.meta(OrcEval.synth(9L))
    assert(((ok >> 46) & 1L) === 1L)
    val lie = OrcEval.meta(OrcEval.synth(9L + (1L << 40)))
    assert(((lie >> 46) & 1L) === 0L)
  }
}
