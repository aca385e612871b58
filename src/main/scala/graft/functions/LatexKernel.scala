package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LaTeX text extraction (q144) — the native source format of the
  * scholarly corpus this engine is named for (arXiv distributes
  * author-uploaded `.tex`; the PDF rung q125 reads the RENDERED
  * artifact, this one reads the SOURCE, which is the higher-fidelity
  * text when available). Stated scope is a strict subset of TeX,
  * honest about where it stops:
  *
  *  - comments: an unescaped `%` kills the rest of the line (the
  *    newline itself is KEPT — stated divergence from TeX's
  *    line-joining, which only matters mid-paragraph); `\%` is a
  *    literal percent;
  *  - inline math `$...$` is EXCLUDED from prose and counted; an
  *    unclosed `$` runs to EOF, still counted (evidence preserved,
  *    never guessed at); `equation`/`align`/`displaymath`
  *    environments are excluded and counted as math;
  *  - `verbatim` content is excluded wholesale — the `$`/`%`/macro
  *    bytes inside it must confuse nothing (q140's fenced-code
  *    discipline);
  *  - argument-keeping macros (`\textbf`, `\emph`, `\textit`,
  *    `\section`, ...) drop the name and keep the braces content;
  *    sectioning macros (starred or not) are counted; reference
  *    machinery (`\cite`, `\ref`, `\label`, `\usepackage`,
  *    `\documentclass`, `\bibliography*`) vanishes WITH its balanced
  *    argument (plus any `[...]` options); `\cite` is counted;
  *  - `\title{...}` is captured as the title and kept OUT of prose
  *    (`\maketitle` renders it; the manifest reports it separately);
  *  - escapes `\% \& \_ \$ \# \{ \}` spell their literal; `\\` is a
  *    line break; `~` a space; accents `\'x \"x` \u0060x compose via a
  *    small table (`caf\'e` reads caf\u00e9 — the scholar-corpus
  *    umlaut/acute reality);
  *  - unknown macros drop their NAME only; braces are transparent —
  *    content is evidence and survives;
  *  - per line, whitespace runs collapse to one space, blanks drop.
  *
  * Reference scope: scholar-stream ingests OpenAlex JSON metadata
  * (reference ingestion/openalex_client.py) and never touches the
  * papers' bodies — source-text extraction is the north-star rung the
  * document family (q125 PDF, q133 DOCX, q142 EPUB) exists for.
  */
object LatexEval {

  final case class Tex(text: String, title: String, sections: Int,
                       math: Int, cites: Int)

  private val MathEnvs = Set("equation", "align", "displaymath", "eqnarray")
  private val SectionNames = Set("section", "subsection", "subsubsection")
  private val EatArgNames = Set("cite", "ref", "label", "usepackage",
    "documentclass", "pagestyle", "bibliography", "bibliographystyle")

  /** Accent composition table: (mark, base letter) -> composed char. */
  private def accent(mark: Char, base: Char): Char = (mark, base) match {
    case ('\'', 'e') => '\u00e9'
    case ('\'', 'a') => '\u00e1'
    case ('\'', 'o') => '\u00f3'
    case ('"', 'o') => '\u00f6'
    case ('"', 'u') => '\u00fc'
    case ('"', 'a') => '\u00e4'
    case ('"', 'i') => '\u00ef'
    case ('`', 'a') => '\u00e0'
    case ('`', 'e') => '\u00e8'
    case (_, b) => b // unknown pair: keep the letter, drop the mark
  }

  /** Index just past the balanced `{...}` group starting at `i` (which
    * must point at `{`), or -1 when unbalanced to EOF.
    */
  private def skipGroup(s: String, i: Int): Int = {
    var depth = 0
    var j = i
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '{') depth += 1
      else if (c == '}') {
        depth -= 1
        if (depth == 0) return j + 1
      }
      j += 1
    }
    -1
  }

  def parse(b: Array[Byte]): Tex = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }

    val out = new StringBuilder
    var title: String = null
    var sections = 0; var math = 0; var cites = 0
    var inMath = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inMath) {
        if (c == '\\' && i + 1 < s.length) i += 2 // \$ inside math stays math
        else {
          if (c == '$') inMath = false
          i += 1
        }
      } else c match {
        case '%' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1 // newline kept
        case '$' =>
          math += 1; inMath = true; i += 1
        case '~' =>
          out.append(' '); i += 1
        case '{' | '}' =>
          i += 1 // transparent
        case '\\' if i + 1 < s.length =>
          val n = s.charAt(i + 1)
          if (n.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val name = s.substring(i + 1, j)
            if (j < s.length && s.charAt(j) == '*') { j += 1 } // starred form
            i = j
            if (name == "begin" || name == "end") {
              // read the {env} name
              if (i < s.length && s.charAt(i) == '{') {
                val close = s.indexOf('}', i)
                if (close < 0) { i = s.length }
                else {
                  val env = s.substring(i + 1, close)
                  i = close + 1
                  if (name == "begin" && env == "verbatim") {
                    val stop = s.indexOf("\\end{verbatim}", i)
                    i = if (stop < 0) s.length else stop + "\\end{verbatim}".length
                  } else if (name == "begin" && MathEnvs.contains(env)) {
                    math += 1
                    val marker = "\\end{" + env + "}"
                    val stop = s.indexOf(marker, i)
                    i = if (stop < 0) s.length else stop + marker.length
                  }
                  // any other env: the token vanishes, content flows on
                }
              }
            } else if (name == "title") {
              // capture, keep out of prose
              if (i < s.length && s.charAt(i) == '{') {
                val end = skipGroup(s, i)
                if (end < 0) { title = s.substring(i + 1); i = s.length }
                else { title = s.substring(i + 1, end - 1); i = end }
              }
            } else if (EatArgNames.contains(name)) {
              if (name == "cite") cites += 1
              // optional [...] groups, then one balanced {...}
              while (i < s.length && s.charAt(i) == '[') {
                val cb = s.indexOf(']', i)
                i = if (cb < 0) s.length else cb + 1
              }
              if (i < s.length && s.charAt(i) == '{') {
                val end = skipGroup(s, i)
                i = if (end < 0) s.length else end
              }
            } else {
              if (SectionNames.contains(name)) sections += 1
              // name dropped; braces transparent — content survives
            }
          } else {
            // control symbol
            n match {
              case '%' | '&' | '_' | '$' | '#' | '{' | '}' => out.append(n)
              case '\\' => out.append('\n')
              case '\'' | '"' | '`' if i + 2 < s.length && s.charAt(i + 2).isLetter =>
                out.append(accent(n, s.charAt(i + 2)))
                i += 1 // extra advance past the base letter
              case _ => out.append(n)
            }
            i += 2
          }
        case other =>
          out.append(other); i += 1
      }
    }

    val lines = out.toString.split("\n", -1).iterator
      .map(_.replaceAll("[ \t]+", " ").trim)
      .filter(_.nonEmpty)
      .toArray
    Tex(lines.mkString("\n"), title, sections, math, cites)
  }

  def text(b: Array[Byte]): Array[Byte] = {
    val t = parse(b)
    if (t == null) null
    else t.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def title(b: Array[Byte]): String = {
    val t = parse(b); if (t == null) null else t.title
  }

  def sections(b: Array[Byte]): Int = {
    val t = parse(b); if (t == null) -1 else t.sections
  }

  def math(b: Array[Byte]): Int = {
    val t = parse(b); if (t == null) -1 else t.math
  }

  def cites(b: Array[Byte]): Int = {
    val t = parse(b); if (t == null) -1 else t.cites
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q144 LaTeX paper from corpus words (>= 10 by corpus
    * contract). `params` packs `doc_id | mode<<40`:
    * 0 -> plain article; 1 -> SAME prose under different markup
    * (starred section, `\textit`/`\textbf` swap, whole-line and
    * trailing comments) — the markup-invariance drill; 2 -> a
    * `verbatim` block whose `$`/`%`/macro bytes must confuse nothing;
    * 3 -> an `equation` environment on top of the inline math.
    * Every mode's prose: section heading, one decorated paragraph
    * (`100\%` escape, `~` tie, a vanished `\cite`), the subsection
    * word, two items, then `caf\'e` + the word tail.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    sb.append("\\documentclass[11pt]{article}\n")
    sb.append("% generated article ").append(id).append(" — preamble note\n")
    sb.append("\\usepackage{amsmath}\n")
    sb.append("\\title{").append(ws(0)).append(' ').append(ws(1)).append("}\n")
    sb.append("\\begin{document}\n\\maketitle\n")
    if (mode == 1) {
      sb.append("% a whole-line comment that must vanish\n")
      sb.append("\\section*{").append(ws(2)).append(' ').append(ws(3))
        .append("}\n")
      sb.append(ws(4)).append(" \\textit{").append(ws(5)).append("} 100\\% ")
        .append("\\textbf{").append(ws(6)).append("} \\cite[p.~7]{b")
        .append(id).append("} % trailing note\n")
    } else {
      sb.append("\\section{").append(ws(2)).append(' ').append(ws(3))
        .append("}\n")
      sb.append(ws(4)).append(" \\textbf{").append(ws(5)).append("}~100\\% ")
        .append("\\emph{").append(ws(6)).append("} \\cite{doc").append(id)
        .append("}\n")
    }
    sb.append("$E = m c^2$\n")
    if (mode == 3)
      sb.append("\\begin{equation}\nx^2 + y^2 = z^2\n\\end{equation}\n")
    sb.append("\\subsection{").append(ws(7)).append("}\n")
    sb.append("\\begin{itemize}\n")
    sb.append("\\item ").append(ws(8)).append("\n")
    sb.append("\\item ").append(ws(9)).append("\n")
    sb.append("\\end{itemize}\n")
    if (mode == 2) {
      sb.append("\\begin{verbatim}\n")
      sb.append("$ % \\cite{x} \\section{no} 100\\ unescaped\n")
      sb.append("\\end{verbatim}\n")
    }
    sb.append("caf\\'e")
    if (ws.length > 10) sb.append(' ').append(ws.drop(10).mkString(" "))
    sb.append("\n\\end{document}\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> binary`: math/verbatim-excluded prose text. */
case class TexText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_text"

  override protected def nullSafeEval(input: Any): Any =
    LatexEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tx")
      s"""
         |byte[] $res = graft.functions.LatexEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TexText =
    copy(child = newChild)
}

/** `binary -> string`: the `\title` argument, NULL when absent. */
case class TexTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = LatexEval.title(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tt")
      s"""
         |String $res = graft.functions.LatexEval.title($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TexTitle =
    copy(child = newChild)
}

/** `binary -> int`: sectioning-macro count (starred included). */
case class TexSections(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_sections"

  override protected def nullSafeEval(input: Any): Any = {
    val r = LatexEval.sections(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ts")
      s"""
         |int $res = graft.functions.LatexEval.sections($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TexSections =
    copy(child = newChild)
}

/** `binary -> int`: math regions (inline `$` pairs + display envs). */
case class TexMath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_math"

  override protected def nullSafeEval(input: Any): Any = {
    val r = LatexEval.math(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tm")
      s"""
         |int $res = graft.functions.LatexEval.math($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TexMath =
    copy(child = newChild)
}

/** `binary -> int`: `\cite` count. */
case class TexCites(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_cites"

  override protected def nullSafeEval(input: Any): Any = {
    val r = LatexEval.cites(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tc")
      s"""
         |int $res = graft.functions.LatexEval.cites($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TexCites =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q144's synthesis. */
case class TexSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tex_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    LatexEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.LatexEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TexSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the LaTeX kernels. */
object LatexOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def texText(b: Column): Column = ColumnBridge.column(TexText(bin(b)))
  def texTitle(b: Column): Column = ColumnBridge.column(TexTitle(bin(b)))
  def texSections(b: Column): Column = ColumnBridge.column(TexSections(bin(b)))
  def texMath(b: Column): Column = ColumnBridge.column(TexMath(bin(b)))
  def texCites(b: Column): Column = ColumnBridge.column(TexCites(bin(b)))

  def texSynth(text: Column, params: Column): Column =
    ColumnBridge.column(TexSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
