package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.LatexEval

/** The LaTeX strip, pinned against HAND-SPELLED paper fixtures the
  * synthesizer never produces: comment/escape interplay, math
  * exclusion (inline, display env, unclosed-to-EOF), verbatim
  * immunity, balanced-brace cite args, accent composition, and the
  * title capture that must stay out of prose.
  */
class LatexSpec extends AnyFunSuite {

  private def parse(s: String) = LatexEval.parse(s.getBytes("UTF-8"))

  test("hand paper: sections, math excluded, cites vanish, title captured") {
    // plain concatenation: a triple-quoted \u... (\usepackage) trips
    // Scala's unicode-escape pass even inside raw strings
    val tex = Seq(
      "\\documentclass[a4paper,12pt]{article}",
      "\\usepackage[utf8]{inputenc}",
      "\\title{On Spark Engines}",
      "\\begin{document}",
      "\\maketitle",
      "\\section{Introduction}",
      "Prior work \\cite{codd70,stonebraker86} shows 95\\% coverage.",
      "The identity $e^{i\\pi} + 1 = 0$ is classic.",
      "\\subsection{Method}",
      "We use \\textbf{bold} and \\emph{careful} analysis.",
      "\\end{document}",
      "").mkString("\n")
    val t = parse(tex)
    assert(t.title === "On Spark Engines")
    assert(t.sections === 2)
    assert(t.math === 1)
    assert(t.cites === 1)
    assert(t.text ===
      "Introduction\nPrior work shows 95% coverage.\n" +
        "The identity is classic.\nMethod\n" +
        "We use bold and careful analysis.")
    assert(!t.text.contains("pi"), "math content must never reach prose")
  }

  test("comment kills to EOL but \\% is a literal percent") {
    val t = parse("a 50\\% rise % but this vanishes 99%\nnext line\n")
    assert(t.text === "a 50% rise\nnext line")
  }

  test("verbatim content is immune: $, %, macros inside count nothing") {
    val t = parse(
      "before\n\\begin{verbatim}\n$x$ % \\cite{a} \\section{b}\n" +
        "\\end{verbatim}\nafter\n")
    assert(t.math === 0 && t.cites === 0 && t.sections === 0)
    assert(t.text === "before\nafter")
  }

  test("unclosed math runs to EOF, still counted") {
    val t = parse("prose here\n$a + b\nnever closed\n")
    assert(t.math === 1)
    assert(t.text === "prose here")
  }

  test("display-math environments count and exclude") {
    val t = parse(
      "x\n\\begin{equation}\nE = mc^2\n\\end{equation}\n" +
        "\\begin{align}\na &= b\n\\end{align}\ny\n")
    assert(t.math === 2)
    assert(t.text === "x\ny")
  }

  test("cite with optional args and multi-key braces vanishes whole") {
    val t = parse("see \\cite[p.~7]{a,b,c} and \\ref{fig:x} here\n")
    assert(t.cites === 1)
    assert(t.text === "see and here")
  }

  test("accents compose; unknown pairs keep the letter") {
    assert(parse("caf\\'e na\\\"ive \\`a \\'zed\n").text ===
      "caf\u00e9 na\u00efve \u00e0 zed")
  }

  test("escapes, tie, and double-backslash line break") {
    val t = parse("AT\\&T pays 5\\$ \\#1~always\\\\second line\n")
    assert(t.text === "AT&T pays 5$ #1 always\nsecond line")
  }

  test("starred sections count; unknown macros drop name, keep braces content") {
    val t = parse("\\section*{Results}\n\\unknowncmd{kept words}\n")
    assert(t.sections === 1)
    assert(t.text === "Results\nkept words")
  }

  test("synth: classes 0 and 1 produce identical prose under different markup") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    val t0 = LatexEval.parse(LatexEval.synth(text, 21L))
    val t1 = LatexEval.parse(LatexEval.synth(text, 21L | (1L << 40)))
    assert(t0.text === t1.text, "markup-invariance drill")
    assert(t0.text ===
      "charlie delta\necho foxtrot 100% golf\nhotel\nindia\njuliet\n" +
        "caf\u00e9 kilo lima")
    assert(t0.title === "alpha bravo" && t1.title === "alpha bravo")
    assert(t0.sections === 2 && t1.sections === 2)
    assert(t0.math === 1 && t1.math === 1)
    assert(t0.cites === 1 && t1.cites === 1)
    // class 2: verbatim block confuses nothing
    val t2 = LatexEval.parse(LatexEval.synth(text, 21L | (2L << 40)))
    assert(t2.text === t0.text)
    assert(t2.math === 1 && t2.cites === 1 && t2.sections === 2)
    // class 3: the equation env adds one math region, same prose
    val t3 = LatexEval.parse(LatexEval.synth(text, 21L | (3L << 40)))
    assert(t3.text === t0.text)
    assert(t3.math === 2)
  }

  test("plain text passes through unchanged with zero counts") {
    val t = parse("the fast key order sort table\n")
    assert(t.text === "the fast key order sort table")
    assert(t.title === null)
    assert(t.sections === 0 && t.math === 0 && t.cites === 0)
  }
}
