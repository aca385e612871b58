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

  test("rowspan carries the cell DOWN; later cells flow around it") {
    val t = parse(
      "<table><tr><td rowspan=\"2\">a</td><td>b</td></tr>" +
        "<tr><td>c</td></tr>" +
        "<tr><td>d</td><td colspan=\"2\">e</td></tr></table>")
    assert(t.firstRows === 3 && t.firstCols === 3)
    // row 1 re-emits 'a' at column 0 (pandas carry-down); row 2 is free
    assert(t.firstCells === "a\tb\na\tc\nd\te")
  }

  test("a mid-row rowspan occupies its own column in later rows") {
    // the spanner sits at column 1; the next row's two cells must land
    // at columns 0 and 2 around it
    val t = parse(
      "<table><tr><td>a</td><td rowspan=\"2\">m</td><td>b</td></tr>" +
        "<tr><td>c</td><td>d</td></tr></table>")
    assert(t.firstCols === 3 && t.firstRows === 2)
    assert(t.firstCells === "a\tm\tb\nc\tm\td")
  }

  test("rowspan + colspan together occupy a BLOCK of the grid") {
    val t = parse(
      "<table><tr><td rowspan=\"2\" colspan=\"2\">big</td><td>x</td></tr>" +
        "<tr><td>y</td></tr></table>")
    assert(t.firstCols === 3)
    assert(t.firstCells === "big\tx\nbig\ty")
  }

  test("rowspan survives the omitted-close spelling") {
    val t = parse(
      "<TABLE><TR><TD ROWSPAN=2>a<TD>b\n<TR><TD>c</TABLE>")
    assert(t.firstCells === "a\tb\na\tc")
  }

  test("a nested table parses separately; the outer cell keeps only " +
    "its own prose") {
    val t = parse(
      "<table><tr><td>a</td><td>pre <table><tr><td>n1</td>" +
        "<td>n2</td></tr></table> post</td></tr>" +
        "<tr><td>b</td><td>c</td></tr></table>")
    assert(t.tables === 2)
    assert(t.rows === 3) // 2 outer + 1 inner
    assert(t.firstRows === 2 && t.firstCols === 2)
    assert(t.firstCells === "a\tpre post\nb\tc")
  }

  test("a nested table inside the FIRST table of two keeps first-table " +
    "identity on the outermost") {
    val t = parse(
      "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr>" +
        "</table><table><tr><td>second</td></tr></table>")
    assert(t.tables === 3 && t.rows === 3)
    assert(t.firstRows === 1 && t.firstCells === "")
  }

  test("synth rowspan and nested classes round-trip") {
    val text = "alpha bravo charlie delta echo fox golf hotel india julia"
      .getBytes("UTF-8")
    val t4 = HtmlTableEval.parse(HtmlTableEval.synth(text, 9L | (4L << 40)))
    assert(t4.tables === 1 && t4.firstRows === 3 && t4.firstCols === 3)
    assert(t4.firstCells ===
      "alpha\tbravo\nalpha\tcharlie\ndelta\techo")
    val t5 = HtmlTableEval.parse(HtmlTableEval.synth(text, 9L | (5L << 40)))
    assert(t5.tables === 2 && t5.rows === 3)
    assert(t5.firstRows === 2 && t5.firstCols === 2)
    assert(t5.firstCells === "alpha\tbefore after\ncharlie\tdelta")
  }

  test("hostile spans: 11+-digit and 2-billion values clamp instead of " +
    "throwing or looping") {
    // 11-digit colspan used to throw NumberFormatException in toInt;
    // colspan="2000000000" used to drive a ~2e9-iteration occupied-set
    // fill. Both now clamp (colspan to the HTML-spec 1000).
    val t0 = System.nanoTime()
    val t = parse(
      "<table><tr><td colspan=\"99999999999\" rowspan=\"88888888888\">a" +
        "</td><td>b</td></tr><tr><td colspan=\"2000000000\">c</td></tr>" +
        "</table>")
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 5.0, f"hostile span walk took $secs%.1f s")
    assert(t.tables === 1 && t.firstRows === 2)
    assert(t.firstCells.startsWith("a"))
    // sane spans still mean what they say
    val ok = parse(
      "<table><tr><td colspan=\"2\">w</td><td>x</td></tr>" +
        "<tr><td>p</td><td>q</td><td>r</td></tr></table>")
    assert(ok.firstCols === 3)
  }
}
