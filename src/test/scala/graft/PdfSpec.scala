package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PdfEval, PdfSynthEval}

/** The PDF extractor, gated the q118/q121/q124 way: hand-built documents
  * the synthesizer never produces — permuted Kids order, `endobj` bytes
  * hiding inside stream data, octal escapes and continuations — plus the
  * structural-lie refusals (lying /Length, Kids/Count mismatch, unknown
  * filter, graph holes).
  */
class PdfSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def doc(objects: String*): Array[Byte] =
    bytes("%PDF-1.4\n" + objects.mkString("\n") +
      "\ntrailer << /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF")

  private def contentObj(num: Int, content: String): String =
    s"$num 0 obj << /Length ${content.length} >> stream\n" +
      content + "\nendstream endobj"

  test("Kids order wins over object numbering") {
    // page objects are numbered 4 then 3, but /Kids lists 3 before 4 —
    // the extractor must emit page(3)'s text first
    val b = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj",
      "4 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj",
      contentObj(5, "BT 0 -14 Td (first) Tj ET"),
      contentObj(6, "BT 0 -14 Td (second) Tj ET"))
    assert(PdfEval.extract(b) === "first\nsecond")
    assert(PdfEval.pageCount(b) === 2)
  }

  test("stream bytes that spell endobj do not break the object walk") {
    // a RAW content stream whose literal contains " endobj " and
    // " obj " — /Length is what delimits the data, never the keywords
    val tricky = "BT 0 -14 Td (x endobj 7 0 obj y) Tj ET"
    val b = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      contentObj(4, tricky))
    assert(PdfEval.extract(b) === "x endobj 7 0 obj y")
  }

  test("octal escapes, continuations, nested parens, hex odd-digit") {
    val content = "BT 0 -14 Td (oct \\101\\102 nest (in) done) Tj " +
      "T* (cont\\\ninued) Tj T* <4869216> Tj ET" // odd hex: low nibble 0
    val b = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      contentObj(4, content))
    assert(PdfEval.extract(b) ===
      "oct AB nest (in) done\ncontinued\nHi!" + 0x60.toChar)
  }

  test("structural refusals") {
    def page(contentNum: Int) = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      s"3 0 obj << /Type /Page /Parent 2 0 R /Contents $contentNum 0 R >> endobj")
    // /Length lies (too short: a non-whitespace gap before endstream)
    val lie = doc(page(4) :+
      ("4 0 obj << /Length 5 >> stream\nBT (a) Tj ET\nendstream endobj"): _*)
    assert(PdfEval.extract(lie) === null)
    // Kids/Count mismatch
    val mism = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 2 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      contentObj(4, "BT (a) Tj ET"))
    assert(PdfEval.extract(mism) === null)
    assert(PdfEval.pageCount(mism) === -1)
    // unknown filter
    val lzw = doc(page(4) :+
      ("4 0 obj << /Length 3 /Filter /LZWDecode >> stream\nabc\nendstream endobj"): _*)
    assert(PdfEval.extract(lzw) === null)
    // dangling /Contents reference
    val hole = doc(page(9): _*)
    assert(PdfEval.extract(hole) === null)
    // unterminated literal / unclosed BT
    val unterm = doc(page(4) :+ contentObj(4, "BT (never closed Tj ET"): _*)
    assert(PdfEval.extract(unterm) === null)
    val unclosed = doc(page(4) :+ contentObj(4, "BT (a) Tj"): _*)
    assert(PdfEval.extract(unclosed) === null)
    // missing %%EOF / not a PDF / null
    val good = doc(page(4) :+ contentObj(4, "BT (a) Tj ET"): _*)
    assert(PdfEval.extract(good) === "a") // sanity: the skeleton works
    assert(PdfEval.extract(good.dropRight(6)) === null)
    assert(PdfEval.extract(bytes("plain text")) === null)
    assert(PdfEval.extract(null) === null)
  }

  test("synth -> extract round-trips the wrap arithmetic across modes") {
    for {
      n <- Seq(0, 1, 7, 8, 9, 39, 40, 41, 93)
      mode <- 0 to 3
    } {
      val words = (0 until n).map(i => s"w${i % 23}").toArray
      var lines = words.grouped(8).map(_.mkString(" ")).toVector
      if (mode == 3) lines = lines :+ PdfSynthEval.EscLine
      val want = lines.mkString("\n")
      val b = PdfSynthEval.synth(words, mode)
      assert(PdfEval.extract(b) === want, s"n=$n mode=$mode")
      val wantPages = math.max(1, math.ceil(lines.length / 5.0).toInt)
      assert(PdfEval.pageCount(b) === wantPages, s"pages n=$n mode=$mode")
    }
  }

  test("a Pages dict missing /Count never borrows a later object's") {
    // the Pages dict has /Kids but NO /Count; object 4 (unrelated)
    // carries "/Count 1" — an unbounded suffix search would find it and
    // wrongly pass the Kids/Count cross-check. The lookup must stay
    // inside the Pages object's own extent and refuse.
    val b = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj",
      "4 0 obj << /Count 1 >> endobj",
      contentObj(5, "BT (a) Tj ET"))
    assert(PdfEval.pageCount(b) === -1)
  }
}
