package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MediaWiki dump intake (q194) — the single most-used public text
  * corpus source there is: Wikipedia ships as `pages-articles.xml.bz2`,
  * and a training pipeline reads it as (title, namespace, cleaned
  * text), not as XML-wrapped wikitext. The walk, stated scope:
  *
  *  - the PAGE walk over the dump XML: `<page>` extents, `<title>`,
  *    `<ns>`, the self-closing `<redirect .../>` marker, and the
  *    latest revision's `<text ...>` (attributes tolerated);
  *    XML's five entities decode ONE level (the text is XML-escaped
  *    wikitext — `&lt;ref&gt;` must become `<ref>` BEFORE the
  *    cleaner sees it);
  *  - the corpus read takes the first NAMESPACE-0 page: talk/meta
  *    namespaces carry process chatter, not prose (the ns filter is
  *    the single highest-leverage quality gate on a raw dump), and
  *    `#REDIRECT` pages carry no text at all;
  *  - WIKITEXT cleanup, each rule bounded and stated:
  *    `{{templates}}` drop whole with nested-brace matching (an
  *    unbalanced open template drops to the end — evidence of a cut
  *    dump), `<ref>...</ref>` and self-closed `<ref/>` drop,
  *    `[[target|label]]` keeps the label, `[[target]]` keeps the
  *    target, `[http://url label]` keeps the label, bold/italic
  *    quote runs (`'''`/`''`) strip, heading `=` fences strip to the
  *    heading text, whitespace collapses per line and empty lines
  *    drop.
  *
  * Composes the compression family: the dump arrives bzip2-compressed
  * and decodes through [[Bzip2Eval]] (whose own synthesis side is a
  * real compressor), so q194 is the full wiki-ingest chain —
  * `.xml.bz2` → BWT stack → page walk → wikitext clean — in one
  * narrow map. Refusals: not a dump (no `<mediawiki`), truncated
  * pages keep earlier pages (q82's stance).
  */
object WikiDumpEval {

  final case class Page(title: String, ns: Int, redirect: Boolean,
                        text: String)

  private def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        if (s.startsWith("&lt;", i)) { sb.append('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { sb.append('>'); i += 4 }
        else if (s.startsWith("&amp;", i)) { sb.append('&'); i += 5 }
        else if (s.startsWith("&quot;", i)) { sb.append('"'); i += 6 }
        else if (s.startsWith("&apos;", i)) { sb.append('\''); i += 6 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One tag's inner text inside [from, to), or null. */
  private def inner(s: String, tag: String, from: Int, to: Int): String = {
    val open = s.indexOf("<" + tag, from)
    if (open < 0 || open >= to) return null
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= to) return null
    if (s.charAt(gt - 1) == '/') return "" // self-closing
    val close = s.indexOf("</" + tag + ">", gt)
    if (close < 0 || close >= to) return null
    s.substring(gt + 1, close)
  }

  def pages(b: Array[Byte]): Array[Page] = {
    if (b == null) return null
    val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    if (!s.contains("<mediawiki")) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Page]
    var i = 0
    var go = true
    while (go) {
      val open = s.indexOf("<page>", i)
      if (open < 0) go = false
      else {
        val close = s.indexOf("</page>", open)
        if (close < 0) go = false // truncated: earlier pages serve
        else {
          val title = inner(s, "title", open, close)
          val nsS = inner(s, "ns", open, close)
          val redirect = {
            val r = s.indexOf("<redirect", open)
            r >= 0 && r < close
          }
          val text = inner(s, "text", open, close)
          if (title != null && nsS != null) {
            val ns = try nsS.trim.toInt catch { case _: Exception => -1 }
            out += Page(xmlUnescape(title), ns, redirect,
              if (text == null) null else xmlUnescape(text))
          }
          i = close + 7
        }
      }
    }
    out.toArray
  }

  /** The wikitext cleaner (scope in the object doc). */
  def clean(w: String): String = {
    if (w == null) return null
    // 1. templates: nested {{...}} drop (unbalanced opens to the end)
    val noTmpl = {
      val sb = new java.lang.StringBuilder(w.length)
      var depth = 0
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w.charAt(i) == '{' && w.charAt(i + 1) == '{') {
          depth += 1; i += 2
        } else if (depth > 0 && i + 1 < w.length && w.charAt(i) == '}' &&
          w.charAt(i + 1) == '}') {
          depth -= 1; i += 2
        } else {
          if (depth == 0) sb.append(w.charAt(i))
          i += 1
        }
      }
      sb.toString
    }
    // 2. <ref ...>...</ref> and <ref ... /> drop
    val noRef = noTmpl
      .replaceAll("(?is)<ref[^>/]*/\\s*>", "")
      .replaceAll("(?is)<ref[^>]*>.*?</ref\\s*>", "")
    // 3. [[target|label]] -> label; [[target]] -> target
    val noLinks = noRef
      .replaceAll("\\[\\[(?:[^\\[\\]|]*)\\|([^\\[\\]]*)\\]\\]", "$1")
      .replaceAll("\\[\\[([^\\[\\]|]*)\\]\\]", "$1")
    // 4. [proto://url label] -> label
    val noExt = noLinks
      .replaceAll("\\[[a-z]+://\\S*\\s+([^\\]]*)\\]", "$1")
    // 5. bold/italic quote runs
    val noQuotes = noExt.replaceAll("'{2,}", "")
    // 6. headings + per-line whitespace collapse, empty lines drop
    val lines = noQuotes.split("\n").iterator
      .map { l0 =>
        val l = l0.trim
        val h = l.replaceAll("^=+\\s*", "").replaceAll("\\s*=+$", "")
        (if (l.startsWith("=")) h else l).replaceAll("[ \\t]+", " ").trim
      }
      .filter(_.nonEmpty)
    lines.mkString("\n")
  }

  /** First namespace-0 page's facts. */
  private def firstArticle(b: Array[Byte]): Page = {
    val ps = pages(b)
    if (ps == null) return null
    var i = 0
    while (i < ps.length) {
      if (ps(i).ns == 0) return ps(i)
      i += 1
    }
    null
  }

  /** Packed: 1<<48 | nPages<<32 | hasArticle<<17 | isRedirect<<16 |
    * ns(16, of the first article; 0xFFFF when none); -1 if not a dump. */
  def meta(b: Array[Byte]): Long = {
    val ps = pages(b)
    if (ps == null) return -1L
    val art = firstArticle(b)
    (1L << 48) | (math.min(ps.length, 0xFFFF).toLong << 32) |
      ((if (art != null) 1L else 0L) << 17) |
      ((if (art != null && art.redirect) 1L else 0L) << 16) |
      (if (art != null) (art.ns & 0xFFFF).toLong else 0xFFFFL)
  }

  def title(b: Array[Byte]): String = {
    val art = firstArticle(b)
    if (art == null) null else art.title
  }

  /** Cleaned corpus text of the first article; null for redirects,
    * missing articles, or non-dumps. */
  def text(b: Array[Byte]): String = {
    val art = firstArticle(b)
    if (art == null || art.redirect || art.text == null) null
    else clean(art.text)
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Synthesize a q194 dump (bzip2-compressed — the wire format).
    * `params` packs `doc_id | mode<<40`; w0..w8 from the corpus text.
    * 0 -> an article (bold lead, piped + bare links, a heading) + a
    *      TALK-page decoy (ns 1) that must not leak into the text;
    * 1 -> class 0's article wearing an {{infobox|..{{nested|..}}..}}
    *      and an inline <ref>…</ref> (spelled `&lt;ref&gt;` — the
    *      XML unescape must run first) — the CLEANED text must equal
    *      class 0's exactly;
    * 2 -> a #REDIRECT page (marker element present, text refuses);
    * 3 -> a talk-only dump (no ns-0 page at all).
    */
  def synth(textBytes: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws0 = words(textBytes)
    def w(i: Int, fb: String): String = if (i < ws0.length) ws0(i) else fb
    val w0 = w(0, "alpha"); val w1 = w(1, "beta"); val w2 = w(2, "gamma")
    val w3 = w(3, "delta"); val w4 = w(4, "epsilon"); val w5 = w(5, "zeta")
    val w6 = w(6, "eta"); val w7 = w(7, "theta"); val w8 = w(8, "iota")
    val title = w0 + " " + (id % 89)
    val articleBody =
      (if (mode == 1) "{{Infobox thing|a=" + w7 + "|b={{nested|" + w8 + "}}}}\n"
      else "") +
        "'''" + w0 + "''' is a " + w1 + ". See [[" + w2 + "|" + w3 +
        "]] and [[" + w4 + "]].\n" +
        "== History ==\n" +
        w5 + " began" +
        (if (mode == 1) "<ref>cite " + w8 + "</ref>" else "") +
        " " + w6 + "#" + (id % 50) + ".\n"
    def page(t: String, ns: Int, redirect: Boolean, body: String): String =
      "<page><title>" + esc(t) + "</title><ns>" + ns + "</ns>" +
        (if (redirect) "<redirect title=\"" + esc(w1) + "\" />" else "") +
        "<revision><id>" + (id % 1000) + "</id>" +
        "<text xml:space=\"preserve\">" + esc(body) + "</text>" +
        "</revision></page>"
    val talk = page("Talk:" + title, 1, redirect = false,
      "process chatter " + w7 + " never corpus text")
    val xml = "<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.11/\">" +
      (mode match {
        case 2 => page(title, 0, redirect = true,
          "#REDIRECT [[" + w1 + "]]") + talk
        case 3 => talk
        case _ => page(title, 0, redirect = false, articleBody) + talk
      }) +
      "</mediawiki>"
    Bzip2Eval.compress(
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8), 9)
  }
}

/** `binary -> long`: packed dump facts (over the DECOMPRESSED xml);
  * NULL when not a dump. */
case class WikiMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wiki_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = WikiDumpEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("wm")
      s"""
         |long $res = graft.functions.WikiDumpEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WikiMeta =
    copy(child = newChild)
}

/** `binary -> string`: the first article's title; NULL when absent. */
case class WikiTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wiki_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = WikiDumpEval.title(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("wt")
      s"""
         |String $res = graft.functions.WikiDumpEval.title($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WikiTitle =
    copy(child = newChild)
}

/** `binary -> string`: the first article's CLEANED text; NULL for
  * redirects, article-less dumps, and non-dumps. */
case class WikiText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wiki_text"

  override protected def nullSafeEval(input: Any): Any = {
    val r = WikiDumpEval.text(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("wx")
      s"""
         |String $res = graft.functions.WikiDumpEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WikiText =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q194's synthesis (a bzip2'd dump). */
case class WikiSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wiki_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    WikiDumpEval.synth(text.asInstanceOf[Array[Byte]],
      params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.WikiDumpEval.synth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WikiSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the MediaWiki dump kernels. */
object WikiOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def wikiMeta(b: Column): Column = ColumnBridge.column(WikiMeta(bin(b)))
  def wikiTitle(b: Column): Column = ColumnBridge.column(WikiTitle(bin(b)))
  def wikiText(b: Column): Column = ColumnBridge.column(WikiText(bin(b)))

  def wikiSynth(text: Column, params: Column): Column =
    ColumnBridge.column(WikiSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
