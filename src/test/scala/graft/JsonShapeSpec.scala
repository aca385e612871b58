package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonShapeEval

/** The JSON shape walk, pinned against HAND-SPELLED documents the
  * synthesizer never produces: escape handling, nesting depth scope,
  * set semantics, strictness (trailing bytes, bare words), and every
  * type tag.
  */
class JsonShapeSpec extends AnyFunSuite {

  private def shape(s: String) = JsonShapeEval.shape(s.getBytes("UTF-8"))

  test("hand record: every type tag lands on its path") {
    val s = shape(
      """{"a": 1, "b": "x", "c": [1, "y"], "d": {"e": null}, "f": true}""")
    assert(s ===
      Seq("$.a|number", "$.b|string", "$.c[]|number", "$.c[]|string",
        "$.c|array", "$.d.e|null", "$.d|object", "$.f|boolean",
        "$|object").mkString("\n"))
  }

  test("set semantics: a repeated type reports once per path") {
    assert(shape("""{"t": ["a", "b", "c"]}""") ===
      "$.t[]|string\n$.t|array\n$|object")
  }

  test("escaped quotes cannot end a string; escaped keys keep identity") {
    assert(shape("""{"k": "a \" b", "m": 2}""") ===
      "$.k|string\n$.m|number\n$|object")
  }

  test("depth scope: two field levels get paths, deeper only validates") {
    val s = shape("""{"a": {"b": {"c": 1}}}""")
    assert(s === "$.a.b|object\n$.a|object\n$|object",
      "c is validated but pathless (stated scope)")
    // malformed DEEP content still refuses the whole document
    assert(shape("""{"a": {"b": {"c": }}}""") === "$invalid|invalid")
  }

  test("strictness: trailing bytes, bare words, broken containers refuse") {
    assert(shape("""{"a": 1} extra""") === "$invalid|invalid")
    assert(shape("plain corpus words here") === "$invalid|invalid")
    assert(shape("""{"a": [1, 2""") === "$invalid|invalid")
    assert(shape("""{"a": tru}""") === "$invalid|invalid")
    assert(shape("""{"a": "unterminated""") === "$invalid|invalid")
  }

  test("numbers: signs and exponents type as number, value never read") {
    assert(shape("""{"n": -1.5e+10}""") === "$.n|number\n$|object")
  }

  test("synth drift classes produce their designed shapes") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet").getBytes("UTF-8")
    val s0 = JsonShapeEval.shape(JsonShapeEval.synth(text, 21L))
    assert(s0.contains("$.meta.score|number"))
    assert(s0.contains("$.tags|array") && s0.contains("$.tags[]|string"))
    val s1 = JsonShapeEval.shape(JsonShapeEval.synth(text, 21L | (1L << 40)))
    assert(s1.contains("$.meta.score|string"), "number->string drift")
    val s2 = JsonShapeEval.shape(JsonShapeEval.synth(text, 21L | (2L << 40)))
    assert(s2.contains("$.tags|string") && s2.contains("$.extra|boolean"))
    assert(!s2.contains("$.tags[]"), "scalar tags has no element path")
    val s3 = JsonShapeEval.shape(JsonShapeEval.synth(text, 21L | (3L << 40)))
    assert(s3.contains("$.title|null"))
  }
}
