package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RtfEval

/** The RTF walk, pinned against HAND-SPELLED documents the
  * synthesizer never produces: the delimiter-space rule, hex and
  * unicode escapes with fallback consumption, destination drops,
  * nested groups, and refusal discipline.
  */
class RtfSpec extends AnyFunSuite {

  private def text(s: String): String = {
    val r = RtfEval.parse(s.getBytes("UTF-8"))
    if (r == null) null else r.text
  }

  test("hand document: formatting words vanish, prose survives") {
    val t = text(
      "{\\rtf1\\ansi{\\fonttbl{\\f0 Courier;}}" +
        "Hello {\\b bold} and {\\i italic} world.\\par " +
        "Second paragraph here.\\par}")
    assert(t === "Hello bold and italic world.\nSecond paragraph here.")
  }

  test("the delimiter space belongs to the control word") {
    assert(text("{\\rtf1 a\\fs24 b}") === "ab",
      "the space after fs24 is the DELIMITER, never text — writers " +
        "wanting 'a b' must emit 'a \\fs24 b'")
    assert(text("{\\rtf1 a \\fs24 b}") === "a b")
    assert(text("{\\rtf1 a\\fs24  b}") === "a b",
      "only ONE space is the delimiter; the second is text")
    assert(text("{\\rtf1 one\\parTwo}") === "one",
      "\\parTwo is ONE (unknown) control word, not \\par + text")
  }

  test("hex escapes decode cp1252, case-insensitive; \\uN consumes fallback") {
    assert(text("{\\rtf1 caf\\'e9 caf\\'E9}") === "café café")
    assert(text("{\\rtf1 na\\u239?ve}") === "naïve",
      "the ? fallback must be consumed")
    assert(text("{\\rtf1 x\\u233\\par y}") === "xé\ny",
      "a control-word fallback boundary is not consumed")
  }

  test("destinations drop wholesale; starred groups too; nesting honored") {
    val t = text(
      "{\\rtf1{\\info{\\title secret}}{\\*\\generator Tool 9.9;}" +
        "{\\stylesheet{\\s0 Normal;}}visible}")
    assert(t === "visible")
    assert(!t.contains("secret") && !t.contains("Tool"))
  }

  test("escaped braces and backslash are text; raw newlines are not") {
    assert(text("{\\rtf1 a\\{b\\}c\\\\d}") === "a{b}c\\d")
    assert(text("{\\rtf1 one\ntwo}") === "onetwo",
      "raw newlines are RTF formatting, never prose")
  }

  test("negative parameters parse; not-RTF refuses") {
    assert(text("{\\rtf1 a \\li-720 b}") === "a b")
    assert(RtfEval.parse("plain words".getBytes("UTF-8")) === null)
    assert(RtfEval.parse("{\\pict junk}".getBytes("UTF-8")) === null)
  }

  test("synth: all four markup classes spell identical prose") {
    val words = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet").getBytes("UTF-8")
    val outs = (0 to 3).map { m =>
      RtfEval.parse(RtfEval.synth(words, 21L | (m.toLong << 40)))
    }
    assert(outs.forall(_.pars === 2))
    assert(outs.map(_.text).distinct.size === 1, "markup-invariance drill")
    assert(outs.head.text ===
      "alpha bravo charlie delta\ncafé naïve echo foxtrot golf " +
        "hotel india juliet")
    assert(!outs(3).text.contains("secret"), "the info title must not leak")
  }
}
