package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BibtexEval

/** The BibTeX grammar, pinned against HAND-SPELLED `.bib` fixtures
  * the synthesizer never produces: macro expansion order, comment
  * immunity, nested protective braces, the ` and ` split belonging
  * to the author field only, and year parsing discipline.
  */
class BibtexSpec extends AnyFunSuite {

  private def parse(s: String) = BibtexEval.parse(s.getBytes("UTF-8"))

  test("hand bibliography: entries, macros, concat, case-insensitive") {
    val bib =
      """@string{PUB = "ACM "}
        |@ARTICLE{codd1970relational,
        |  Author = {Edgar F. Codd},
        |  TITLE = {A Relational Model of Data for Large Shared Data Banks},
        |  journal = PUB # "Communications",
        |  Year = "1970"
        |}
        |@inproceedings{dean2004mapreduce,
        |  author = {Jeffrey Dean and Sanjay Ghemawat},
        |  title = {MapReduce: Simplified Data Processing},
        |  year = {2004},
        |}
        |""".stripMargin
    val b = parse(bib)
    assert(b.entries === 2)
    assert(b.articles === 1)
    assert(b.firstKey === "codd1970relational")
    assert(b.authors === 3)
    assert(b.yearMax === 2004)
    assert(b.titles ===
      "A Relational Model of Data for Large Shared Data Banks\n" +
        "MapReduce: Simplified Data Processing")
  }

  test("@comment is not an entry, even when it spells fields") {
    val b = parse(
      "@comment{looks like author = {A and B} but is not}\n" +
        "@misc{only, title = {Real}, year = 1999}\n")
    assert(b.entries === 1 && b.authors === 0 && b.yearMax === 1999)
  }

  test("protective nested braces strip; ' and ' in a title is prose") {
    val b = parse(
      "@article{k, author = {A One and B Two}, " +
        "title = {Pride {and} Prejudice {of} Systems}, year = {2011}}\n")
    assert(b.authors === 2)
    assert(b.titles === "Pride and Prejudice of Systems")
  }

  test("bare-number year, trailing comma, missing author") {
    val b = parse("@article{k, title = {T}, year = 1997,}\n" +
      "@misc{m, title = {U}, year = 2024}\n")
    assert(b.entries === 2 && b.authors === 0)
    assert(b.yearMax === 2024)
  }

  test("non-numeric and oversized years are ignored, not guessed") {
    val b = parse("@misc{k, title = {T}, year = {MMXX}}\n" +
      "@misc{j, title = {U}, year = {20244}}\n")
    assert(b.yearMax === -1, "no parseable year -> none reported")
  }

  test("plain text has zero entries and null key/titles") {
    val b = parse("the fast key order sort table\n")
    assert(b.entries === 0 && b.articles === 0 && b.authors === 0)
    assert(b.firstKey === null)
    assert(BibtexEval.titles("plain".getBytes("UTF-8")) === null)
  }

  test("synth: classes 0 and 1 agree on every output (grammar invariance)") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima").getBytes("UTF-8")
    val b0 = BibtexEval.parse(BibtexEval.synth(text, 21L))
    val b1 = BibtexEval.parse(BibtexEval.synth(text, 21L | (1L << 40)))
    assert(b0 === b1, "macro/case/concat spelling must not change the record")
    assert(b0.entries === 2 && b0.articles === 1)
    assert(b0.firstKey === "doc21a")
    assert(b0.authors === 4 && b0.yearMax === 2021)
    assert(b0.titles === "echo foxtrot golf\non alpha and bravo")
    // class 2: comment not counted, nested brace strips
    val b2 = BibtexEval.parse(BibtexEval.synth(text, 21L | (2L << 40)))
    assert(b2.entries === 2)
    assert(b2.titles === "echo Spark golf\non alpha and bravo")
    // class 3: two authors only, bare year 2024 wins
    val b3 = BibtexEval.parse(BibtexEval.synth(text, 21L | (3L << 40)))
    assert(b3.authors === 2 && b3.yearMax === 2024)
    assert(b3.titles === "echo foxtrot golf\nhotel india")
  }
}
