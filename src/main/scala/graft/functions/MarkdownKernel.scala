package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Markdown structure extraction (q140) — README/docs corpora from
  * code hosting are the largest markdown source on the web, and the
  * training-text read has one hard requirement an all-text scraper
  * misses: FENCED CODE must be EXCLUDED from prose (code pollutes a
  * text corpus and is counted separately for the code-mixture
  * budget). Stated scope is a CommonMark-informed subset, strict
  * about the traps:
  *
  *  - ATX headings need a SPACE after the `#` run (`#hashtag` is
  *    prose, not a heading) and may carry a closing `#` sequence
  *    (stripped only when preceded by a space);
  *  - fences open with >= 3 backticks or tildes, the info string's
  *    first token is the language, the close must use the SAME
  *    character and at least the same run length, and an UNCLOSED
  *    fence runs to EOF (CommonMark) — content still excluded, the
  *    block still counted;
  *  - inline: images `![alt](url)` vanish entirely, links
  *    `[text](url)` keep only the text, code spans keep their
  *    content, `**`/`__`/`*`/`_` emphasis markers strip;
  *  - list markers (`-`/`*`/`+` + space, `N.`/`N)` + space) and one
  *    level of `>` blockquote strip to their text;
  *  - setext headings, thematic breaks, HTML blocks, reference links:
  *    out of stated scope — such lines pass through as prose
  *    (evidence preserved, never guessed at).
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — markdown is a north-star extension
  * of the text-intake family (q93/q106/q128/q133).
  */
object MarkdownEval {

  final case class Md(text: String, headings: Int, codeBlocks: Int,
                      lang: String, links: Int)

  private val Image = java.util.regex.Pattern.compile("!\\[[^\\]]*\\]\\([^)]*\\)")
  private val Link = java.util.regex.Pattern.compile("\\[([^\\]]*)\\]\\(([^)]*)\\)")
  private val Code = java.util.regex.Pattern.compile("`([^`]*)`")
  private val Bold = java.util.regex.Pattern.compile("\\*\\*([^*]+)\\*\\*")
  private val BoldU = java.util.regex.Pattern.compile("__([^_]+)__")
  private val Em = java.util.regex.Pattern.compile("\\*([^*]+)\\*")
  private val EmU = java.util.regex.Pattern.compile("_([^_]+)_")
  private val Ordered = java.util.regex.Pattern.compile("^\\d{1,9}[.)] (.*)$")

  private def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s); var n = 0
    while (m.find()) n += 1
    n
  }

  private def stripInline(line: String): String = {
    var s = Image.matcher(line).replaceAll("")
    s = Link.matcher(s).replaceAll("$1")
    s = Code.matcher(s).replaceAll("$1")
    s = Bold.matcher(s).replaceAll("$1")
    s = BoldU.matcher(s).replaceAll("$1")
    s = Em.matcher(s).replaceAll("$1")
    s = EmU.matcher(s).replaceAll("$1")
    s
  }

  /** Fence open: (char, runLength, infoFirstToken) or null. */
  private def fenceOpen(line: String): (Char, Int, String) = {
    val t = line
    if (t.isEmpty) return null
    val c = t.charAt(0)
    if (c != '`' && c != '~') return null
    var i = 0
    while (i < t.length && t.charAt(i) == c) i += 1
    if (i < 3) return null
    val info = t.substring(i).trim
    val lang = if (info.isEmpty) null else info.split("\\s+")(0)
    (c, i, lang)
  }

  private def fenceClose(line: String, c: Char, len: Int): Boolean = {
    val t = line.trim
    if (t.length < len) return false
    t.forall(_ == c)
  }

  def parse(b: Array[Byte]): Md = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val lines = s.split("\r?\n", -1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var headings = 0; var codeBlocks = 0; var links = 0
    var lang: String = null
    var fence: (Char, Int, String) = null
    for (ln <- lines) {
      if (fence != null) {
        if (fenceClose(ln, fence._1, fence._2)) fence = null
        // fenced content: EXCLUDED from prose
      } else {
        val fo = fenceOpen(ln)
        if (fo != null) {
          codeBlocks += 1
          if (lang == null && fo._3 != null) lang = fo._3
          fence = fo
        } else {
          // block-level strip
          var t = ln
          var isHeading = false
          if (t.startsWith("#")) {
            var h = 0
            while (h < t.length && t.charAt(h) == '#') h += 1
            if (h <= 6 && h < t.length && t.charAt(h) == ' ') {
              isHeading = true
              t = t.substring(h + 1)
              // closing sequence: a trailing # run preceded by a space
              val m = t.replaceAll("\\s+#+\\s*$", "")
              t = m
            } else if (h <= 6 && h == t.length) {
              // a bare `#` line: heading with empty text
              isHeading = true
              t = ""
            }
            // `#hashtag`: NOT a heading — falls through as prose
          }
          if (isHeading) headings += 1
          else {
            if ((t.startsWith("- ") || t.startsWith("* ") || t.startsWith("+ ")))
              t = t.substring(2)
            else {
              val om = Ordered.matcher(t)
              if (om.matches()) t = om.group(1)
              else if (t.startsWith("> ")) t = t.substring(2)
              else if (t == ">") t = ""
            }
          }
          links += countMatches(Link, Image.matcher(t).replaceAll(""))
          t = stripInline(t)
          if (t.trim.nonEmpty) out += t
        }
      }
    }
    Md(out.mkString("\n"), headings, codeBlocks, lang, links)
  }

  def text(b: Array[Byte]): Array[Byte] = {
    val m = parse(b)
    if (m == null) null
    else m.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def headings(b: Array[Byte]): Int = {
    val m = parse(b); if (m == null) -1 else m.headings
  }

  def codeBlocks(b: Array[Byte]): Int = {
    val m = parse(b); if (m == null) -1 else m.codeBlocks
  }

  def lang(b: Array[Byte]): String = {
    val m = parse(b); if (m == null) null else m.lang
  }

  def links(b: Array[Byte]): Int = {
    val m = parse(b); if (m == null) -1 else m.links
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q140 markdown document from corpus words (>= 10 by
    * corpus contract). Layout — heading, paragraph with inline
    * decorations, list, blockquote, tail paragraph, and the code
    * fence LAST (so the unclosed-fence mode excludes only code):
    * `params` packs `doc_id | mode<<40`: 0 → backtick fence, plain
    * decorations; 1 → same prose but an image line and a bold-inside-
    * link spelling (plain text IDENTICAL to mode 0 — markup-invariance
    * drill); 2 → closing-sequence heading, a `#hashtag` prose trap
    * line, tilde fence; 3 → fence never closed (runs to EOF).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val langTab = Array("python", "scala", "sql")
    val lang = langTab((id % 3).toInt)
    val sb = new StringBuilder
    if (mode == 2) sb.append("## ").append(ws.slice(0, 3).mkString(" "))
      .append(" ##\n")
    else sb.append("## ").append(ws.slice(0, 3).mkString(" ")).append("\n")
    if (mode == 2) sb.append("#").append(ws(0)).append("tag\n")
    sb.append("\n")
    // paragraph with inline decorations: plain text must come out as
    // `w3 w4 w5 w6 w7` in EVERY mode
    if (mode == 1) {
      sb.append("![").append(ws(3)).append("](https://img.example/doc")
        .append(id).append(".png)\n")
      sb.append(ws(3)).append(" **").append(ws(4)).append("** *")
        .append(ws(5)).append("* `").append(ws(6)).append("` [**")
        .append(ws(7)).append("**](https://ex.example/doc").append(id)
        .append(")\n\n")
    } else {
      sb.append(ws(3)).append(" __").append(ws(4)).append("__ _")
        .append(ws(5)).append("_ `").append(ws(6)).append("` [")
        .append(ws(7)).append("](https://ex.example/doc").append(id)
        .append(")\n\n")
    }
    sb.append("- ").append(ws(8)).append("\n")
    sb.append("* ").append(ws(9)).append("\n")
    sb.append("1. ").append(ws(0)).append("\n\n")
    sb.append("> ").append(ws(1)).append(" ").append(ws(2)).append("\n\n")
    if (ws.length > 10) sb.append(ws.drop(10).mkString(" ")).append("\n\n")
    val f = if (mode == 2) "~~~" else "```"
    sb.append(f).append(lang).append("\n")
    sb.append(ws(8)).append(" ").append(ws(9)).append("\n")
    if (mode != 3) sb.append(f).append("\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> binary`: fence-excluded prose text. */
case class MdText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_text"

  override protected def nullSafeEval(input: Any): Any =
    MarkdownEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mt")
      s"""
         |byte[] $res = graft.functions.MarkdownEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MdText =
    copy(child = newChild)
}

/** `binary -> int`: ATX heading count. */
case class MdHeadings(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_headings"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MarkdownEval.headings(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mh")
      s"""
         |int $res = graft.functions.MarkdownEval.headings($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MdHeadings =
    copy(child = newChild)
}

/** `binary -> int`: fenced code block count. */
case class MdCodeBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_fences"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MarkdownEval.codeBlocks(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mf")
      s"""
         |int $res = graft.functions.MarkdownEval.codeBlocks($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MdCodeBlocks =
    copy(child = newChild)
}

/** `binary -> string`: first fence's language, NULL when none. */
case class MdLang(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_lang"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MarkdownEval.lang(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ml")
      s"""
         |String $res = graft.functions.MarkdownEval.lang($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MdLang =
    copy(child = newChild)
}

/** `binary -> int`: inline link count (images excluded). */
case class MdLinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_links"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MarkdownEval.links(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mk")
      s"""
         |int $res = graft.functions.MarkdownEval.links($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MdLinks =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q140's synthesis. */
case class MdSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    MarkdownEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.MarkdownEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MdSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the markdown kernels. */
object MarkdownOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def mdText(b: Column): Column = ColumnBridge.column(MdText(bin(b)))
  def mdHeadings(b: Column): Column = ColumnBridge.column(MdHeadings(bin(b)))
  def mdCodeBlocks(b: Column): Column = ColumnBridge.column(MdCodeBlocks(bin(b)))
  def mdLang(b: Column): Column = ColumnBridge.column(MdLang(bin(b)))
  def mdLinks(b: Column): Column = ColumnBridge.column(MdLinks(bin(b)))

  def mdSynth(text: Column, params: Column): Column =
    ColumnBridge.column(MdSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
