package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DOCX text extraction (q133) — the office-document rung that
  * completes the format family q125's PDF started: a .docx is a ZIP
  * package ([[ZipEval]]'s verified central-directory walk) whose text
  * lives in `word/document.xml`, addressed BY NAME, never by position.
  * What makes extraction a real parse rather than a tag strip:
  *
  *  - text is carried ONLY by `<w:t>` leaves; sibling markup (`w:rPr`
  *    run properties, `w:proofErr` spell-check anchors) contributes
  *    nothing, and runs concatenate with NO separator — Word splits
  *    runs mid-sentence at formatting boundaries, so a reader that
  *    joins runs with spaces corrupts every split word;
  *  - `<w:instrText>` is the field-code channel (PAGE, TOC): its
  *    content LOOKS like text and must be excluded — the classic
  *    all-leaves-scraper failure;
  *  - OOXML whitespace: a `w:t` without `xml:space="preserve"` has
  *    insignificant edge whitespace (stripped); with the attribute it
  *    is significant and kept verbatim (ECMA-376 §17.3.3.31 adopts
  *    XML 1.0 xml:space);
  *  - `<w:p>` paragraphs join with newlines; `<w:br/>` is an explicit
  *    line break INSIDE a paragraph;
  *  - XML character entities are STRICT: the five predefined names and
  *    numeric references decode, anything else is a fatal error in XML
  *    1.0 — the whole extraction refuses rather than guessing.
  *
  * Stop-don't-guess: a missing/corrupt `word/document.xml` member
  * (the ZIP layer's CRC verdict), an unterminated `w:t`/`w:instrText`,
  * or a malformed entity refuses NULL. Reference scope: scholar-stream
  * ingests JSON metadata only (reference ingestion/openalex_client.py)
  * — office documents are a north-star extension of the source family.
  */
object DocxEval {

  private final val DocPart = "word/document.xml"

  /** Extracted document text, or null on refusal. */
  def extract(zip: Array[Byte]): String = {
    val idx = ZipEval.memberIndex(zip, DocPart)
    if (idx < 0) return null
    val xmlBytes = ZipEval.member(zip, idx)
    if (xmlBytes == null) return null
    val xml = new String(xmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(xml.length / 4)
    var firstPara = true
    var inPara = false
    var i = 0
    val n = xml.length
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) return null // unterminated tag
        val tag = xml.substring(lt + 1, gt)
        if (tagIs(tag, "w:p")) {
          if (!firstPara) sb.append('\n')
          firstPara = false
          inPara = true
          i = gt + 1
        } else if (tagIs(tag, "/w:p")) {
          inPara = false
          i = gt + 1
        } else if (tagIs(tag, "w:br") || tagIs(tag, "w:cr")) {
          if (inPara) sb.append('\n')
          i = gt + 1
        } else if (tagIs(tag, "w:tab")) {
          if (inPara) sb.append('\t')
          i = gt + 1
        } else if (tagIs(tag, "w:instrText")) {
          // field-code content: skip to the closing tag, contribute
          // nothing (self-closing contributes nothing anyway)
          if (tag.endsWith("/")) i = gt + 1
          else {
            val close = xml.indexOf("</w:instrText>", gt + 1)
            if (close < 0) return null
            i = close + "</w:instrText>".length
          }
        } else if (tagIs(tag, "w:t")) {
          if (tag.endsWith("/")) { i = gt + 1 } // empty run text
          else {
            val close = xml.indexOf("</w:t>", gt + 1)
            if (close < 0) return null
            val raw = xml.substring(gt + 1, close)
            val dec = xmlDecode(raw)
            if (dec == null) return null
            val preserve = tag.contains("xml:space=\"preserve\"")
            sb.append(if (preserve) dec else dec.trim)
            i = close + "</w:t>".length
          }
        } else {
          i = gt + 1
        }
      }
    }
    sb.toString
  }

  /** Count of `<w:p>` paragraph elements in the verified document part,
    * or -1 — the meta read (q125's pdfPages discipline: independent of
    * the text walk, so the two cannot share a slip).
    */
  def paragraphCount(zip: Array[Byte]): Int = {
    val idx = ZipEval.memberIndex(zip, DocPart)
    if (idx < 0) return -1
    val xmlBytes = ZipEval.member(zip, idx)
    if (xmlBytes == null) return -1
    val xml = new String(xmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    var cnt = 0
    var i = xml.indexOf("<w:p")
    while (i >= 0) {
      // a real w:p start tag, not w:pPr / w:proofErr / w:pgSz
      val c = if (i + 4 < xml.length) xml.charAt(i + 4) else ' '
      if (c == '>' || c == ' ' || c == '/') cnt += 1
      i = xml.indexOf("<w:p", i + 4)
    }
    cnt
  }

  /** `name`, `name ...attrs`, `name/`, `name ...attrs/` all match. */
  private def tagIs(tag: String, name: String): Boolean =
    tag.startsWith(name) && {
      val rest = tag.substring(name.length)
      rest.isEmpty || rest == "/" || rest.startsWith(" ")
    }

  /** STRICT XML 1.0 character-reference decode: `&amp; &lt; &gt;
    * &quot; &apos;` and `&#n;`/`&#xh;` only — any other `&` use is
    * malformed and refuses (null). HTML's named-entity zoo
    * ([[HtmlEntityEval]]) does not apply inside XML.
    */
  private def xmlDecode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) return null
        val body = s.substring(i + 1, semi)
        body match {
          case "amp" => sb.append('&')
          case "lt" => sb.append('<')
          case "gt" => sb.append('>')
          case "quot" => sb.append('"')
          case "apos" => sb.append('\'')
          case _ =>
            if (body.length < 2 || body.charAt(0) != '#') return null
            val cp =
              try {
                if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                  Integer.parseInt(body.substring(2), 16)
                else Integer.parseInt(body.substring(1))
              } catch { case _: NumberFormatException => return null }
            if (cp <= 0 || cp > 0x10FFFF) return null
            sb.appendCodePoint(cp)
        }
        i = semi + 1
      }
    }
    sb.toString
  }

  // -------------------------------------------------------------- synth

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** The class-1 entity drill, decoded form — exposed so the spec and
    * oracle spell the same constant.
    */
  final val EntityLine = "AT&T says 1 < 2 && x > y"

  /** The class-2 field paragraph's REAL text (its `w:instrText` sibling
    * carries " PAGE " and must contribute nothing).
    */
  final val FieldLine = "page field here"

  /** Synthesize a .docx package: paragraphs of 8 corpus words, each
    * split into a plain first run (3 words) and an
    * `xml:space="preserve"` second run carrying its LEADING SPACE —
    * so a reader that ignores the attribute loses the space and one
    * that joins runs with its own separator doubles it. `w:rPr` and
    * `w:proofErr` noise sits between runs. Params pack
    * `mode` (0 plain, 1 entity-drill paragraph appended, 2 field-code
    * paragraph appended, 3 a `<w:br/>` between paragraph 0's runs).
    * Members: `[Content_Types].xml` (stored), `word/document.xml` and
    * `word/styles.xml` (deflated) — honest locals, the way desktop
    * writers emit packages.
    */
  def synth(ws: Array[String], mode: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    sb.append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">")
    sb.append("<w:body>")
    val nPara = (ws.length + 7) / 8
    var p = 0
    while (p < nPara) {
      val para = ws.slice(p * 8, math.min(p * 8 + 8, ws.length))
      sb.append("<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>")
      val head = para.take(3).mkString(" ")
      val tail = para.drop(3).mkString(" ")
      sb.append("<w:proofErr w:type=\"spellStart\"/>")
      sb.append("<w:r><w:rPr><w:b/></w:rPr><w:t>")
      sb.append(xmlEscape(head))
      sb.append("</w:t></w:r>")
      if (tail.nonEmpty) {
        if (mode == 3 && p == 0) sb.append("<w:r><w:br/></w:r>")
        sb.append("<w:proofErr w:type=\"spellEnd\"/>")
        sb.append("<w:r><w:t xml:space=\"preserve\"> ")
        sb.append(xmlEscape(tail))
        sb.append("</w:t></w:r>")
      }
      sb.append("</w:p>")
      p += 1
    }
    if (mode == 1) {
      sb.append("<w:p><w:r><w:t>")
      sb.append(xmlEscape(EntityLine))
      sb.append("</w:t></w:r></w:p>")
    }
    if (mode == 2) {
      sb.append("<w:p><w:r><w:fldChar w:fldCharType=\"begin\"/></w:r>")
      sb.append("<w:r><w:instrText xml:space=\"preserve\"> PAGE </w:instrText></w:r>")
      sb.append("<w:r><w:fldChar w:fldCharType=\"end\"/></w:r>")
      sb.append("<w:r><w:t>")
      sb.append(FieldLine)
      sb.append("</w:t></w:r></w:p>")
    }
    sb.append("<w:sectPr><w:pgSz w:w=\"11906\" w:h=\"16838\"/></w:sectPr>")
    sb.append("</w:body></w:document>")
    val doc = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val types = ("<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
      "openxmlformats.org/package/2006/content-types\"><Default " +
      "Extension=\"xml\" ContentType=\"application/xml\"/></Types>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val styles = ("<?xml version=\"1.0\"?><w:styles xmlns:w=\"http://" +
      "schemas.openxmlformats.org/wordprocessingml/2006/main\"/>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ZipEval.buildArchive(
      Array(("[Content_Types].xml", types, 0),
        (DocPart, doc, 8),
        ("word/styles.xml", styles, 8)),
      lyingLocals = false, Array.emptyByteArray, badCrcIdx = -1)
  }
}

/** `binary -> string`: DOCX text via [[DocxEval.extract]]. */
case class DocxText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_docx_text"

  override protected def nullSafeEval(input: Any): Any = {
    val r = DocxEval.extract(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("docxText")
      s"""
         |String $res = graft.functions.DocxEval.extract($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DocxText =
    copy(child = newChild)
}

/** `binary -> int`: verified paragraph count via
  * [[DocxEval.paragraphCount]].
  */
case class DocxParas(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_docx_paras"

  override protected def nullSafeEval(input: Any): Any = {
    val r = DocxEval.paragraphCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("docxParas")
      s"""
         |int $res = graft.functions.DocxEval.paragraphCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DocxParas =
    copy(child = newChild)
}

/** `(array<string> words, long mode) -> binary`: q133's synthesis. */
case class DocxSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_docx_synth"

  override protected def nullSafeEval(ws: Any, mode: Any): Any = {
    val arr = ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val words = new Array[String](arr.numElements())
    var i = 0
    while (i < words.length) {
      words(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    DocxEval.synth(words, mode.asInstanceOf[Long].toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, mode) => {
      val words = ctx.freshName("docxWords")
      val idx = ctx.freshName("i")
      s"""
         |String[] $words = new String[$ws.numElements()];
         |for (int $idx = 0; $idx < $words.length; $idx++) {
         |  $words[$idx] = $ws.isNullAt($idx) ? "" :
         |    $ws.getUTF8String($idx).toString();
         |}
         |${ev.value} = graft.functions.DocxEval.synth($words, (int) $mode);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DocxSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the DOCX kernels. */
object DocxOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def docxText(bin: Column): Column =
    ColumnBridge.column(DocxText(ColumnBridge.expression(bin.cast("binary"))))

  def docxParas(bin: Column): Column =
    ColumnBridge.column(DocxParas(ColumnBridge.expression(bin.cast("binary"))))

  def docxSynth(ws: Column, mode: Column): Column =
    ColumnBridge.column(DocxSynth(
      ColumnBridge.expression(ws),
      ColumnBridge.expression(mode.cast("long"))))
}
