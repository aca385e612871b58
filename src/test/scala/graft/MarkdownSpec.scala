package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MarkdownEval

/** The markdown strip, pinned against HAND-SPELLED README-style
  * fixtures the synthesizer never produces: fence-length close rules,
  * the `#hashtag` prose trap, marker-without-space lines, and the
  * code-exclusion guarantee that is the operator's reason to exist.
  */
class MarkdownSpec extends AnyFunSuite {

  private def parse(s: String) = MarkdownEval.parse(s.getBytes("UTF-8"))

  test("hand README: headings, fences excluded, links counted") {
    val md =
      """# Project title
        |
        |A **bold** claim with a [link](https://example.com) and `code`.
        |
        |```scala
        |val secret = "must never reach prose"
        |```
        |
        |## Usage ##
        |
        |- first item
        |+ second item
        |12) ordered item
        |> quoted wisdom
        |""".stripMargin
    val m = parse(md)
    assert(m.headings === 2)
    assert(m.codeBlocks === 1)
    assert(m.lang === "scala")
    assert(m.links === 1)
    assert(m.text ===
      "Project title\nA bold claim with a link and code.\nUsage\n" +
        "first item\nsecond item\nordered item\nquoted wisdom")
    assert(!m.text.contains("secret"), "fenced code must never reach prose")
  }

  test("the #hashtag trap and marker-without-space lines stay prose") {
    val m = parse("#nope\n## yes\n-nodash\n*nostar\n1.noorder\n")
    assert(m.headings === 1)
    assert(m.text === "#nope\nyes\n-nodash\n*nostar\n1.noorder")
  }

  test("heading closing sequence strips only when space-preceded") {
    assert(parse("## a b ##\n").text === "a b")
    assert(parse("## a b##\n").text === "a b##", "no space: the #s are text")
  }

  test("fence close needs same char and at least the same run length") {
    // a shorter close run does NOT close; a longer one does
    val m1 = parse("````\ncode\n```\nstill code\n`````\nprose\n")
    assert(m1.codeBlocks === 1 && m1.text === "prose")
    // tildes are not closed by backticks
    val m2 = parse("~~~\ncode\n```\nmore\n~~~\nafter\n")
    assert(m2.codeBlocks === 1 && m2.text === "after")
    // unclosed runs to EOF: still counted, content still excluded
    val m3 = parse("before\n```python\nx = 1\ny = 2\n")
    assert(m3.codeBlocks === 1 && m3.lang === "python" && m3.text === "before")
  }

  test("images vanish and do not count as links") {
    val m = parse("an ![alt text](https://img) here [kept](https://x)\n")
    assert(m.links === 1)
    assert(m.text === "an  here kept")
  }

  test("synth: classes 0 and 1 produce identical prose under different markup") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    val m0 = MarkdownEval.parse(MarkdownEval.synth(text, 21L))
    val m1 = MarkdownEval.parse(MarkdownEval.synth(text, 21L | (1L << 40)))
    assert(m0.text === m1.text, "markup-invariance drill")
    assert(m0.text ===
      "alpha bravo charlie\ndelta echo foxtrot golf hotel\nindia\njuliet\n" +
        "alpha\nbravo charlie\nkilo lima")
    assert(m0.headings === 1 && m0.codeBlocks === 1 && m0.links === 1)
    assert(m0.lang === "python") // 21 % 3 = 0
    // class 2: the trap line joins the prose; tilde fence
    val m2 = MarkdownEval.parse(MarkdownEval.synth(text, 21L | (2L << 40)))
    assert(m2.text.startsWith("alpha bravo charlie\n#alphatag\n"))
    assert(m2.headings === 1, "#alphatag must not count")
    // class 3: unclosed fence — same prose, code still excluded
    val m3 = MarkdownEval.parse(MarkdownEval.synth(text, 21L | (3L << 40)))
    assert(m3.text === m0.text)
    assert(m3.codeBlocks === 1)
    assert(!m3.text.contains("india juliet"), "fence content stays out")
  }
}
