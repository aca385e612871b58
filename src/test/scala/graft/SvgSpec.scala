package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SvgEval

/** The SVG read, pinned against HAND-SPELLED documents the
  * synthesizer never produces: attribute precedence, unit handling,
  * viewBox grammars, comment immunity, and refusals.
  */
class SvgSpec extends AnyFunSuite {

  private def parse(s: String) = SvgEval.parse(s.getBytes("UTF-8"))

  test("explicit attributes beat the viewBox; px strips") {
    val v = parse(
      """<svg width="640px" height="480" viewBox="0 0 16 16"></svg>""")
    assert(v.width === 640 && v.height === 480)
  }

  test("viewBox fallback fills only the MISSING dimension") {
    val v = parse("""<svg height="32" viewBox="0 0 64 48"></svg>""")
    assert(v.width === 64, "width from viewBox")
    assert(v.height === 32, "height stays explicit")
    // comma-separated viewBox is legal
    val c = parse("""<svg viewBox="0,0,100,50"></svg>""")
    assert(c.width === 100 && c.height === 50)
  }

  test("non-px units refuse the field, never convert") {
    val v = parse("""<svg width="10cm" viewBox="0 0 200 100"></svg>""")
    assert(v.width === 200, "10cm refuses; the viewBox answers instead")
  }

  test("comments hide shapes; script flags; nested defs still count") {
    val v = parse(
      "<svg viewBox=\"0 0 9 9\"><!-- <rect/> <path/> -->" +
        "<defs><circle r=\"1\"/></defs><script>x()</script>" +
        "<polyline points=\"0,0 1,1\"/></svg>")
    assert(v.shapes === 2, "the circle in defs and the polyline")
    assert(v.script === 1)
  }

  test("refusals: no close tag, no svg at all") {
    assert(parse("""<svg width="9" height="9"><rect/>""") === null)
    assert(parse("plain corpus words") === null)
  }

  test("a quoted > inside an attribute does not end the open tag") {
    val v = parse(
      """<svg data-t="a>b" width="11" height="12"></svg>""")
    assert(v.width === 11 && v.height === 12)
  }

  test("synth classes land on their contract shapes") {
    val s0 = SvgEval.parse(SvgEval.synth(21L))
    assert(s0.width === 100 + (21 % 10) * 10)
    assert(s0.height === 50 + (21 % 5) * 20)
    assert(s0.shapes === 3 && s0.script === 0)
    val s1 = SvgEval.parse(SvgEval.synth(21L | (1L << 40)))
    assert(s1.width === s0.width && s1.height === s0.height,
      "viewBox fallback must agree with class 0's dims")
    assert(s1.shapes === 2)
    val s2 = SvgEval.parse(SvgEval.synth(21L | (2L << 40)))
    assert(s2.shapes === 4, "commented decoys must not count")
    assert(s2.script === 1)
    assert(SvgEval.parse(SvgEval.synth(21L | (3L << 40))) === null)
  }
}
