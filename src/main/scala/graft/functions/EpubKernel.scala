package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EPUB text extraction (q142) — the third document-format rung
  * closing the family PDF (q125) started and DOCX (q133) continued:
  * public-domain book corpora ship as EPUB, and a correct reader is
  * an OCF/OPF GRAPH walk, never a zip-order scrape:
  *
  *  - the container is q132's verified ZIP walk ([[ZipEval]]); OCF
  *    requires the FIRST member to be `mimetype`, STORED, spelling
  *    `application/epub+zip` — a renamed zip is not an EPUB;
  *  - `META-INF/container.xml` names the OPF by `full-path` (never
  *    assume `OEBPS/content.opf`);
  *  - reading order is the OPF SPINE's idref order, resolved through
  *    the MANIFEST's id→href map, hrefs RELATIVE to the OPF's own
  *    directory — the archive stores chapters in a DIFFERENT order
  *    and the manifest lists them scrambled, so a zip-order or
  *    manifest-order reader produces the wrong book;
  *  - a spine idref with no manifest item, or a manifest href with no
  *    member, is a broken package: refuse WHOLE (q125's stance —
  *    partial books are quarantine rows, never shorter corpora);
  *  - chapter XHTML: paragraphs are `<p>` elements' inner text with
  *    inline tags stripped and XML entities decoded one level
  *    (q133's strict five + numeric); everything outside `<body>` is
  *    structure, not prose.
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — EPUB is a north-star extension of
  * the document family (q125/q133).
  */
object EpubEval {

  final case class Book(title: String, chapters: Int, paragraphs: Int,
                        text: String)

  // ------------------------------------------------------- XML helpers

  private def xmlDecode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ref = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val dec = ref match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case r if r != null && r.startsWith("#x") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(2), 16)))
            catch { case _: Exception => null }
          case r if r != null && r.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (dec != null) { sb.append(dec); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def attr(tag: String, name: String): String = {
    val p = java.util.regex.Pattern.compile(name + "\\s*=\\s*\"([^\"]*)\"")
    val m = p.matcher(tag)
    if (m.find()) m.group(1) else null
  }

  /** All `<name ...>`/`<name .../>` tag strings in document order. */
  private def tags(s: String, name: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var at = 0
    var done = false
    while (!done) {
      val open = s.indexOf("<" + name, at)
      if (open < 0) done = true
      else {
        val after = open + name.length + 1
        // the name must END here (not a prefix of a longer tag name)
        if (after < s.length &&
          (s.charAt(after) == ' ' || s.charAt(after) == '>' ||
            s.charAt(after) == '/' || s.charAt(after) == '\t' ||
            s.charAt(after) == '\n')) {
          val end = s.indexOf('>', open)
          if (end < 0) return null
          out += s.substring(open, end + 1)
          at = end + 1
        } else at = after
      }
    }
    out.toArray
  }

  private def elementText(s: String, tag: String): String = {
    val open = s.indexOf("<" + tag)
    if (open < 0) return null
    val oend = s.indexOf('>', open)
    if (oend < 0) return null
    val close = s.indexOf("</" + tag + ">", oend)
    if (close < 0) return null
    xmlDecode(s.substring(oend + 1, close))
  }

  /** `<p>` inner texts, inline tags stripped, entities decoded. */
  private def paragraphs(xhtml: String): Array[String] = {
    val bodyAt = xhtml.indexOf("<body")
    if (bodyAt < 0) return Array.empty
    val bodyEnd = xhtml.indexOf("</body>", bodyAt)
    val body = xhtml.substring(xhtml.indexOf('>', bodyAt) + 1,
      if (bodyEnd < 0) xhtml.length else bodyEnd)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var at = 0
    var done = false
    while (!done) {
      val open = body.indexOf("<p", at)
      val openOk = open >= 0 && open + 2 < body.length &&
        (body.charAt(open + 2) == '>' || body.charAt(open + 2) == ' ')
      if (open < 0) done = true
      else if (!openOk) at = open + 2
      else {
        val oend = body.indexOf('>', open)
        val close = body.indexOf("</p>", oend)
        if (oend < 0 || close < 0) return null // unterminated paragraph
        val inner = body.substring(oend + 1, close)
        out += xmlDecode(inner.replaceAll("<[^>]*>", ""))
        at = close + 4
      }
    }
    out.toArray
  }

  // -------------------------------------------------------------- parse

  def parse(b: Array[Byte]): Book = {
    if (b == null) return null
    // OCF gate: member 0 IS `mimetype` and spells the EPUB type
    if (ZipEval.memberName(b, 0) != "mimetype") return null
    val mt = ZipEval.member(b, 0)
    if (mt == null || new String(mt,
      java.nio.charset.StandardCharsets.US_ASCII) != "application/epub+zip")
      return null
    val containerIdx = ZipEval.memberIndex(b, "META-INF/container.xml")
    if (containerIdx < 0) return null
    val container = ZipEval.member(b, containerIdx)
    if (container == null) return null
    val cxml = new String(container, java.nio.charset.StandardCharsets.UTF_8)
    val rootfiles = tags(cxml, "rootfile")
    if (rootfiles == null || rootfiles.isEmpty) return null
    val opfPath = attr(rootfiles(0), "full-path")
    if (opfPath == null) return null
    val opfIdx = ZipEval.memberIndex(b, opfPath)
    if (opfIdx < 0) return null
    val opfBytes = ZipEval.member(b, opfIdx)
    if (opfBytes == null) return null
    val opf = new String(opfBytes, java.nio.charset.StandardCharsets.UTF_8)
    val opfDir = {
      val slash = opfPath.lastIndexOf('/')
      if (slash < 0) "" else opfPath.substring(0, slash + 1)
    }
    val title = elementText(opf, "dc:title")
    // manifest: id -> href
    val items = tags(opf, "item")
    if (items == null) return null
    val manifest = scala.collection.mutable.Map[String, String]()
    for (t <- items) {
      val id = attr(t, "id"); val href = attr(t, "href")
      if (id != null && href != null) manifest(id) = href
    }
    // spine: ordered idrefs — THE reading order
    val refs = tags(opf, "itemref")
    if (refs == null || refs.isEmpty) return null
    val chapterTexts = scala.collection.mutable.ArrayBuffer[Array[String]]()
    for (r <- refs) {
      val idref = attr(r, "idref")
      if (idref == null) return null
      val href = manifest.getOrElse(idref, null)
      if (href == null) return null // dangling idref: broken package
      val memIdx = ZipEval.memberIndex(b, opfDir + href)
      if (memIdx < 0) return null
      val ch = ZipEval.member(b, memIdx)
      if (ch == null) return null
      val ps = paragraphs(new String(ch, java.nio.charset.StandardCharsets.UTF_8))
      if (ps == null) return null
      chapterTexts += ps
    }
    val all = chapterTexts.flatten
    Book(title, chapterTexts.length, all.length, all.mkString("\n"))
  }

  def title(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.title
  }

  def chapters(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.chapters
  }

  def paragraphCount(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.paragraphs
  }

  def text(b: Array[Byte]): Array[Byte] = {
    val r = parse(b)
    if (r == null) null
    else r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def xhtml(paras: Array[String], entityPara0: Boolean): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    sb.append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n")
    sb.append("<head><title>never prose</title></head>\n<body>\n")
    var i = 0
    while (i < paras.length) {
      val ws = paras(i).split(" ")
      sb.append("<p class=\"g\">")
      // one word wears an inline tag: the strip drill
      var k = 0
      while (k < ws.length) {
        if (k > 0) sb.append(" ")
        if (k == 1 && ws.length > 1) sb.append("<em>").append(ws(k)).append("</em>")
        else sb.append(ws(k))
        k += 1
      }
      if (entityPara0 && i == 0) sb.append(" &amp; co")
      sb.append("</p>\n")
      i += 1
    }
    sb.append("</body>\n</html>\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Synthesize a q142 EPUB from corpus words: two chapters (first
    * half / rest), paragraphs of 8 words, chapter A's paragraph 0
    * carrying an `&amp;` entity, the ARCHIVE storing chapters in the
    * OPPOSITE of spine order and the manifest scrambled. `params`
    * packs `doc_id | mode<<40`: 0 → stored members; 1 → deflated
    * members behind q132's lying local headers; 2 → wrong mimetype
    * content (refuses: a renamed zip is not an EPUB); 3 → the spine
    * references an id the manifest lacks (broken package, refuses).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val half = (ws.length + 1) / 2
    def paras(w: Array[String]): Array[String] =
      w.grouped(8).map(_.mkString(" ")).toArray
    val chA = xhtml(paras(ws.take(half)), entityPara0 = true)
    val chB = xhtml(paras(ws.drop(half)), entityPara0 = false)
    val opf = (s"""<?xml version="1.0"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
      |<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
      |<dc:title>doc $id &amp; friends</dc:title>
      |</metadata>
      |<manifest>
      |<item id="cB" href="chapB.xhtml" media-type="application/xhtml+xml"/>
      |<item id="cA" href="chapA.xhtml" media-type="application/xhtml+xml"/>
      |</manifest>
      |<spine>
      |<itemref idref="${if (mode == 3) "missing" else "cA"}"/>
      |<itemref idref="cB"/>
      |</spine>
      |</package>
      |""").stripMargin.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val container = ("""<?xml version="1.0"?>
      |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
      |<rootfiles>
      |<rootfile full-path="OPS/book.opf" media-type="application/oebps-package+xml"/>
      |</rootfiles>
      |</container>
      |""").stripMargin.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val mimetype = (if (mode == 2) "application/zip" else "application/epub+zip")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val method = if (mode == 1) 8 else 0
    // archive order deliberately NOT the spine order
    val members = Array(
      ("mimetype", mimetype, 0), // OCF: always stored
      ("META-INF/container.xml", container, method),
      ("OPS/chapB.xhtml", chB, method),
      ("OPS/book.opf", opf, method),
      ("OPS/chapA.xhtml", chA, method))
    ZipEval.buildArchive(members, lyingLocals = mode == 1,
      Array.emptyByteArray, badCrcIdx = -1)
  }
}

/** `binary -> string`: the OPF dc:title, NULL on refusal. */
case class EpubTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_epub_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EpubEval.title(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("et")
      s"""
         |String $res = graft.functions.EpubEval.title($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EpubTitle =
    copy(child = newChild)
}

/** `binary -> int`: spine length. */
case class EpubChapters(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_epub_chapters"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EpubEval.chapters(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ec")
      s"""
         |int $res = graft.functions.EpubEval.chapters($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EpubChapters =
    copy(child = newChild)
}

/** `binary -> int`: paragraph count across the spine. */
case class EpubParagraphs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_epub_paras"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EpubEval.paragraphCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ep")
      s"""
         |int $res = graft.functions.EpubEval.paragraphCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EpubParagraphs =
    copy(child = newChild)
}

/** `binary -> binary`: spine-ordered LF-joined paragraph text. */
case class EpubText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_epub_text"

  override protected def nullSafeEval(input: Any): Any =
    EpubEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ex")
      s"""
         |byte[] $res = graft.functions.EpubEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EpubText =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q142's synthesis. */
case class EpubSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_epub_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    EpubEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.EpubEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): EpubSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the EPUB kernels. */
object EpubOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def epubTitle(b: Column): Column = ColumnBridge.column(EpubTitle(bin(b)))
  def epubChapters(b: Column): Column = ColumnBridge.column(EpubChapters(bin(b)))
  def epubParagraphs(b: Column): Column =
    ColumnBridge.column(EpubParagraphs(bin(b)))
  def epubText(b: Column): Column = ColumnBridge.column(EpubText(bin(b)))

  def epubSynth(text: Column, params: Column): Column =
    ColumnBridge.column(EpubSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
