package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DocxEval, ZipEval}

/** The DOCX extractor, pinned against a package a DIFFERENT writer
  * produced: the fixture below is a hand-written document.xml zipped by
  * CPython's `zipfile` (honest locals, its own compression), so the
  * extractor cannot share a packaging or markup misunderstanding with
  * [[DocxEval.synth]]. The XML itself drills shapes the synthesizer
  * never emits: `w:tab`, decimal/hex character references, a
  * self-closing `w:t`, an empty paragraph, and un-preserved edge
  * whitespace that MUST strip.
  */
class DocxSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val cpython = unhex(
    "504B0304140000000000AD640F5DC71C173C080000000800000013000000" +
    "5B436F6E74656E745F54797065735D2E786D6C3C54797065732F3E504B03" +
    "04140000000800AD640F5DDF1DBD6ED7000000B701000011000000776F72" +
    "642F646F63756D656E742E786D6C8591DD6EC3200C855F055189CB3AABB6" +
    "5EE4876A7B13277849A4002ED0A67BFB81B4A95B1769171C1B1FEBB305ED" +
    "E9661771A51067EF3AF9B4AFE449B76B6DFC70B1E492C8B68BF5DAC92925" +
    "AE01E23091C5B8F74C2E7BEF3E584CF91A46587D301CFC4031CE6EB40B1C" +
    "AAEA081667270BB2F7E6A3442E128A248D0B4FD842498B86BB5506D79171" +
    "A04E72A048E14A528B9ED2EF7EF802FEA426EC3799D8C36349C7E4F95FE0" +
    "ABDA1D5F1AB5BB3D1F9A37A1D072A396D4A8319FF3C56745F6B1D9E6C003" +
    "EDEF0E42301A4346880D027CBF1CDC7F457F02504B010214031400000000" +
    "00AD640F5DC71C173C080000000800000013000000000000000000000080" +
    "01000000005B436F6E74656E745F54797065735D2E786D6C504B01021403" +
    "140000000800AD640F5DDF1DBD6ED7000000B70100001100000000000000" +
    "00000000800139000000776F72642F646F63756D656E742E786D6C504B05" +
    "060000000002000200800000003F0100000000")

  test("CPython-packaged hand XML: tabs, char refs, preserve, empties") {
    // paragraphs: "alpha"+" beta" (preserved space); "tab" <w:tab/>
    // "stop"; decimal+hex refs and the five named entities; an empty
    // <w:p/>; a self-closing w:t plus "  padded  " WITHOUT preserve
    // (edges must strip)
    assert(DocxEval.extract(cpython) ===
      "alpha beta\ntab\tstop\nAABB &<>\"'\n\npadded")
    assert(DocxEval.paragraphCount(cpython) === 5)
  }

  test("refusals: missing part, corrupt member, malformed XML, bad entity") {
    // a zip with no word/document.xml
    val noPart = ZipEval.synth("body".getBytes("UTF-8"), 1L)
    assert(DocxEval.extract(noPart) === null)
    assert(DocxEval.paragraphCount(noPart) === -1)
    // flip a byte inside document.xml's deflate stream: the ZIP layer's
    // CRC verdict must carry through
    val flip = cpython.clone()
    flip(120) = (flip(120) ^ 0x20).toByte
    assert(DocxEval.extract(flip) === null)
    // truncation
    assert(DocxEval.extract(cpython.dropRight(40)) === null)
    assert(DocxEval.extract(null) === null)
    // malformed XML / strict entities, packaged honestly
    def pack(xml: String): Array[Byte] = {
      val doc = xml.getBytes("UTF-8")
      ZipEval.buildArchive(
        Array(("word/document.xml", doc, 8)),
        lyingLocals = false, Array.emptyByteArray, badCrcIdx = -1)
    }
    assert(DocxEval.extract(pack("<w:body><w:p><w:r><w:t>open")) === null,
      "unterminated w:t must refuse")
    assert(DocxEval.extract(pack(
      "<w:p><w:r><w:instrText> PAGE </w:r></w:p>")) === null,
      "unterminated instrText must refuse")
    assert(DocxEval.extract(pack(
      "<w:p><w:r><w:t>bad &nbsp; here</w:t></w:r></w:p>")) === null,
      "HTML-only entity is fatal in XML")
    assert(DocxEval.extract(pack(
      "<w:p><w:r><w:t>bad &#xZZ; ref</w:t></w:r></w:p>")) === null)
  }

  test("field codes contribute nothing; runs join without separators") {
    val doc = ("<w:body><w:p>" +
      "<w:r><w:fldChar w:fldCharType=\"begin\"/></w:r>" +
      "<w:r><w:instrText xml:space=\"preserve\"> DATE </w:instrText></w:r>" +
      "<w:r><w:fldChar w:fldCharType=\"end\"/></w:r>" +
      "<w:r><w:t>spl</w:t></w:r><w:r><w:t>it</w:t></w:r>" +
      "</w:p></w:body>").getBytes("UTF-8")
    val z = ZipEval.buildArchive(
      Array(("word/document.xml", doc, 8)),
      lyingLocals = false, Array.emptyByteArray, badCrcIdx = -1)
    assert(DocxEval.extract(z) === "split",
      "instrText excluded; adjacent runs concatenate bare")
  }

  test("synth -> extract round-trips the paragraph arithmetic per mode") {
    val ws = ("the quick brown fox jumps over a lazy dog near " +
      "the riverbank today").split(" ")
    def para(xs: Array[String]) = xs.mkString(" ")
    val base = ws.grouped(8).map(para).toVector
    // mode 0: plain
    assert(DocxEval.extract(DocxEval.synth(ws, 0)) === base.mkString("\n"))
    assert(DocxEval.paragraphCount(DocxEval.synth(ws, 0)) === base.length)
    // mode 1: entity paragraph appended, decoded form expected
    assert(DocxEval.extract(DocxEval.synth(ws, 1)) ===
      (base :+ DocxEval.EntityLine).mkString("\n"))
    // mode 2: the field paragraph contributes ONLY its real run
    assert(DocxEval.extract(DocxEval.synth(ws, 2)) ===
      (base :+ DocxEval.FieldLine).mkString("\n"))
    // mode 3: a br splits paragraph 0 between its runs
    val split0 = ws.take(3).mkString(" ") + "\n " + ws.slice(3, 8).mkString(" ")
    assert(DocxEval.extract(DocxEval.synth(ws, 3)) ===
      (split0 +: base.tail).mkString("\n"))
    // empty document
    assert(DocxEval.extract(DocxEval.synth(Array.empty[String], 0)) === "")
    assert(DocxEval.paragraphCount(DocxEval.synth(Array.empty[String], 0)) === 0)
  }
}
