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

  // ── composite fonts (ToUnicode CMap) ──

  private def compositeDoc(cmap: String, content: String): Array[Byte] = doc(
    "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
    "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
    "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F9 5 0 R >> >> >> endobj",
    contentObj(4, content),
    "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
    contentObj(6, cmap))

  private val BaseCMap =
    "begincmap 2 beginbfchar <0001> <0041> <0002> <00E9> endbfchar " +
      "1 beginbfrange <0010> <0012> <0061> endbfrange endcmap"

  test("composite font: bfchar and bfrange map 2-byte codes") {
    val b = compositeDoc(BaseCMap,
      "BT /F9 12 Tf 0 -14 Td <000100020010 00110012> Tj ET")
    assert(PdfEval.extract(b) === "Aéabc")
  }

  test("a bfrange spanning a surrogate increments the LOW surrogate") {
    val cm = "begincmap 1 beginbfrange " +
      "<0020> <0022> <D835DCA2> endbfrange endcmap"
    val b = compositeDoc(cm, "BT /F9 1 Tf 0 -14 Td <002000210022> Tj ET")
    assert(PdfEval.extract(b) === "𝒢𝒣𝒤")
  }

  test("the bfrange ARRAY form lists one destination per code") {
    val cm = "begincmap 1 beginbfrange " +
      "<0005> <0007> [<0058> <0059> <005A>] endbfrange endcmap"
    val b = compositeDoc(cm, "BT /F9 1 Tf 0 -14 Td <000500060007> Tj ET")
    assert(PdfEval.extract(b) === "XYZ")
  }

  test("composite refusals: no ToUnicode, unmapped code, odd bytes, " +
    "overflowing range") {
    // /Type0 WITHOUT ToUnicode: unextractable, refuse
    val noTU = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F9 5 0 R >> >> >> endobj",
      contentObj(4, "BT /F9 1 Tf (xy) Tj ET"),
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /X >> endobj")
    assert(PdfEval.extract(noTU) === null)
    // a shown code the CMap does not carry
    val unmapped = compositeDoc(BaseCMap,
      "BT /F9 1 Tf 0 -14 Td <0099> Tj ET")
    assert(PdfEval.extract(unmapped) === null)
    // an odd byte count cannot be 2-byte codes
    val odd = compositeDoc(BaseCMap, "BT /F9 1 Tf 0 -14 Td <000102> Tj ET")
    assert(PdfEval.extract(odd) === null)
    // a single-destination range whose span overflows the final code
    // unit is malformed
    val over = compositeDoc(
      "begincmap 1 beginbfrange <0001> <0003> <FFFE> endbfrange endcmap",
      "BT /F9 1 Tf 0 -14 Td <0001> Tj ET")
    assert(PdfEval.extract(over) === null)
  }

  test("a simple font beside a composite one keeps Latin-1 per Tf") {
    val b = doc(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 7 0 R /F9 5 0 R >> >> >> endobj",
      contentObj(4, "BT /F1 12 Tf 0 -14 Td (plain ) Tj " +
        "/F9 12 Tf <0001> Tj /F1 12 Tf ( tail) Tj ET"),
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /X " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
      contentObj(6, BaseCMap),
      "7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj")
    assert(PdfEval.extract(b) === "plain A tail")
  }

  test("synth mode 4 (composite) round-trips with the drill line") {
    val words = Array("alpha", "beta", "gamma", "delta")
    val b = PdfSynthEval.synth(words, 4)
    val t = PdfEval.extract(b)
    assert(t === "alpha beta gamma delta\n" + PdfSynthEval.CompositeLine)
    assert(PdfEval.pageCount(b) === 1)
  }
}
