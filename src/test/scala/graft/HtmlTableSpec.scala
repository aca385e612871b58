package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlTableEval

/** The table walk, pinned against HAND-SPELLED HTML the synthesizer
  * never produces: every omissible close tag, quote-protected `>`,
  * colspan widths, caption/stray text immunity, and the EOF close.
  */
class HtmlTableSpec extends AnyFunSuite {

  private def parse(s: String) = HtmlTableEval.parse(s.getBytes("UTF-8"))

  test("hand page: closed and unclosed spellings agree cell for cell") {
    val closed = parse(
      "<table><tr><th>a</th><th>b</th></tr>" +
        "<tr><td>c</td><td>d</td></tr></table>")
    val omitted = parse(
      "<TABLE border=1>\n<TR><TH>a<TH>b\n<TR><TD>c<TD>d\n</TABLE>")
    assert(closed.firstCells === "a\tb\nc\td")
    assert(omitted.firstCells === closed.firstCells)
    assert(closed.firstRows === 2 && closed.firstCols === 2)
    assert(omitted.firstRows === 2 && omitted.firstCols === 2)
  }

  test("a > inside a quoted attribute does not end the tag") {
    val t = parse("<table><tr><td title=\"x>y\">cell</td></tr></table>")
    assert(t.firstCells === "cell")
  }

  test("colspan widens the row; width is the max across rows") {
    val t = parse(
      "<table><tr><th colspan='3'>head</th></tr>" +
        "<tr><td>a</td><td>b</td></tr></table>")
    assert(t.firstCols === 3)
    assert(t.firstRows === 2)
  }

  test("caption and inter-cell whitespace contribute nothing") {
    val t = parse(
      "<table>\n  <caption>ignored words</caption>\n" +
        "  <tr>\n    <td>only</td>\n  </tr>\n</table>")
    assert(t.firstCells === "only")
    assert(t.rows === 1)
  }

  test("inline tags strip, entities decode inside cells") {
    val t = parse(
      "<table><tr><td><a href=\"u\">AT&amp;T</a> <b>now</b></td></tr></table>")
    assert(t.firstCells === "AT&T now")
  }

  test("EOF closes an unclosed table (truncation-tolerant)") {
    val t = parse("<table><tr><td>partial</td><td>row")
    assert(t.tables === 1 && t.rows === 1)
    assert(t.firstCells === "partial\trow")
  }

  test("two tables: totals aggregate, firsts stay first") {
    val t = parse(
      "<table><tr><td>a</td></tr></table>" +
        "<table><tr><td>x</td><td>y</td></tr>" +
        "<tr><td>z</td><td>w</td></tr></table>")
    assert(t.tables === 2 && t.rows === 3)
    assert(t.firstRows === 1 && t.firstCols === 1)
    assert(t.firstCells === "a")
  }

  test("no table: zero counts, null firsts") {
    val t = parse("<p>just prose with a less-than 1 < 2</p>")
    assert(t.tables === 0 && t.rows === 0)
    assert(HtmlTableEval.firstCells("plain".getBytes("UTF-8")) === null)
  }

  test("synth: classes 0 and 1 produce identical outputs") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    val t0 = HtmlTableEval.parse(HtmlTableEval.synth(text, 21L))
    val t1 = HtmlTableEval.parse(HtmlTableEval.synth(text, 21L | (1L << 40)))
    assert(t0 === t1, "omissibility drill")
    assert(t0.tables === 1 && t0.rows === 3)
    assert(t0.firstCells === "alpha\tbravo\ncharlie\tdelta\necho\tfoxtrot")
    val t2 = HtmlTableEval.parse(HtmlTableEval.synth(text, 21L | (2L << 40)))
    assert(t2.firstCols === 2 && t2.firstRows === 2)
    assert(t2.firstCells === "alpha & bravo\ncharlie\tdelta")
    val t3 = HtmlTableEval.parse(HtmlTableEval.synth(text, 21L | (3L << 40)))
    assert(t3.tables === 2 && t3.rows === 4)
    assert(t3.firstCells === t0.firstCells)
  }
}
