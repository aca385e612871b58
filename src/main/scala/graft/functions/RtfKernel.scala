package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** RTF text extraction (q155) — the legacy office format beside DOCX
  * (q133): decades of .rtf exports still sit in document corpora, and
  * the format's grammar has three traps a regex stripper gets wrong:
  *
  *  - a control word (`\word` + optional signed number) CONSUMES one
  *    following space as its delimiter — `\b bold` reads `bold`, not
  *    ` bold`; a non-space delimiter (brace, backslash, punctuation)
  *    is NOT consumed;
  *  - `\'hh` spells one cp1252 BYTE (hex case-insensitive — the
  *    scholar corpus's accented reality), and `\uN?` one UTF-16 code
  *    unit whose single fallback char MUST be consumed (a reader
  *    that keeps the fallback duplicates every unicode char);
  *  - DESTINATION groups drop wholesale: the known table
  *    (`fonttbl`, `colortbl`, `stylesheet`, `info`) and every
  *    `{\*...}` starred destination — their text (font names,
  *    titles, generator stamps) must never reach prose; ordinary
  *    formatting groups are transparent (braces vanish, text stays).
  *
  * `\par` ends a paragraph; `\tab` is whitespace; `\\ \{ \}` spell
  * their literal. Per line: whitespace collapses, blanks drop
  * (q144's discipline). A payload not opening with `{\rtf` refuses.
  *
  * Reference scope: scholar-stream ingests API JSON (reference
  * ingestion/openalex_client.py) — RTF completes the document family
  * (q125 PDF, q133 DOCX, q142 EPUB, q144 LaTeX).
  */
object RtfEval {

  final case class Rtf(text: String, pars: Int)

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val Destinations = Set("fonttbl", "colortbl", "stylesheet", "info")

  def parse(b: Array[Byte]): Rtf = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    if (!s.startsWith("{\\rtf")) return null

    val out = new StringBuilder
    var pars = 0
    var skipDepth = 0 // > 0 while inside a dropped destination group
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          depth += 1
          if (skipDepth > 0) { i += 1 }
          else {
            // look ahead: {\*... or {\destword...
            var j = i + 1
            if (j < s.length && s.charAt(j) == '\\') {
              j += 1
              if (j < s.length && s.charAt(j) == '*') {
                skipDepth = depth
                i = j + 1
              } else {
                var k = j
                while (k < s.length && s.charAt(k).isLetter) k += 1
                val w = s.substring(j, k)
                if (Destinations.contains(w)) {
                  skipDepth = depth
                  i = k
                } else i += 1 // ordinary group: transparent
              }
            } else i += 1
          }
        case '}' =>
          if (skipDepth > 0 && depth == skipDepth) skipDepth = 0
          depth -= 1
          i += 1
        case '\\' if i + 1 < s.length =>
          val n = s.charAt(i + 1)
          if (n.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            // optional signed numeric parameter
            var k = j
            val neg = k < s.length && s.charAt(k) == '-'
            if (neg) k += 1
            val ds = k
            while (k < s.length && s.charAt(k).isDigit) k += 1
            val numVal =
              if (k > ds) {
                val v = s.substring(ds, k).toInt
                if (neg) -v else v
              } else 0
            // the delimiting space belongs to the control word
            var next = k
            if (next < s.length && s.charAt(next) == ' ') next += 1
            if (skipDepth == 0) {
              word match {
                case "par" => out.append('\n'); pars += 1
                case "tab" => out.append(' ')
                case "u" =>
                  var cp = numVal
                  if (cp < 0) cp += 65536
                  out.append(cp.toChar)
                  // consume the single fallback char (stated scope:
                  // a literal char, as this corpus's writers emit)
                  if (next < s.length && s.charAt(next) != '\\' &&
                    s.charAt(next) != '{' && s.charAt(next) != '}') next += 1
                case _ => () // formatting word: ignored
              }
            }
            i = next
          } else n match {
            case '\'' =>
              if (i + 3 < s.length) {
                val hex = s.substring(i + 2, i + 4)
                try {
                  val byteVal = Integer.parseInt(hex, 16)
                  if (skipDepth == 0)
                    out.append(Cp1252.decode(java.nio.ByteBuffer.wrap(
                      Array(byteVal.toByte))).toString)
                  i += 4
                } catch {
                  case _: NumberFormatException => i += 2 // malformed: drop
                }
              } else i = s.length
            case '\\' | '{' | '}' =>
              if (skipDepth == 0) out.append(n)
              i += 2
            case '*' => i += 2 // star outside a group-open: no-op
            case _ => i += 2 // unknown control symbol: dropped
          }
        case '\n' | '\r' =>
          i += 1 // raw newlines are formatting, not text
        case other =>
          if (skipDepth == 0) out.append(other)
          i += 1
      }
    }
    val lines = out.toString.split("\n", -1).iterator
      .map(_.replaceAll("[ \t]+", " ").trim)
      .filter(_.nonEmpty)
      .toArray
    Rtf(lines.mkString("\n"), pars)
  }

  def text(b: Array[Byte]): Array[Byte] = {
    val r = parse(b)
    if (r == null) null
    else r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def pars(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.pars
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q155 RTF document from corpus words (>= 10 by corpus
    * contract). `params` packs `doc_id | mode<<40`; classes 0-3 all
    * spell the SAME prose — "w0 w1 w2 w3" then the accented line —
    * through different markup: 0 -> `{\b}` group + lowercase hex;
    * 1 -> `{\i}` group + `\tab` + an inline `\fs24` whose delimiter
    * space must vanish; 2 -> UPPERCASE hex and a negative-parameter
    * word; 3 -> starred-destination + info-group decoys whose text
    * must never leak, and a doubly-nested formatting group.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\deff0")
    sb.append("{\\fonttbl{\\f0 Times New Roman;}}\n")
    if (mode == 3) {
      sb.append("{\\*\\generator graft synth 1.0;}")
      sb.append("{\\info{\\title secret title ").append(id).append("}}\n")
    }
    mode match {
      case 1 =>
        sb.append(ws(0)).append(" {\\i ").append(ws(1)).append("} ")
          .append("\\fs24 ").append(ws(2)).append("\\tab ").append(ws(3))
          .append("\\par\n")
      case 2 =>
        sb.append(ws(0)).append(" {\\b ").append(ws(1)).append("} ")
          .append(ws(2)).append(" \\li-720 ").append(ws(3)).append("\\par\n")
      case 3 =>
        sb.append(ws(0)).append(" {{\\b ").append(ws(1)).append("}} ")
          .append(ws(2)).append(' ').append(ws(3)).append("\\par\n")
      case _ =>
        sb.append(ws(0)).append(" {\\b ").append(ws(1)).append("} ")
          .append(ws(2)).append(' ').append(ws(3)).append("\\par\n")
    }
    if (mode == 2)
      sb.append("caf\\'E9 na\\u239?ve")
    else
      sb.append("caf\\'e9 na\\u239?ve")
    if (ws.length > 4) sb.append(' ').append(ws.drop(4).mkString(" "))
    sb.append("\\par\n}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> binary`: destination-dropped prose text. */
case class RtfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rtf_text"

  override protected def nullSafeEval(input: Any): Any =
    RtfEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("rt")
      s"""
         |byte[] $res = graft.functions.RtfEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RtfText =
    copy(child = newChild)
}

/** `binary -> int`: paragraph (`\par`) count. */
case class RtfPars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rtf_pars"

  override protected def nullSafeEval(input: Any): Any = {
    val r = RtfEval.pars(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("rp")
      s"""
         |int $res = graft.functions.RtfEval.pars($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RtfPars =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q155's synthesis. */
case class RtfSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rtf_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    RtfEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.RtfEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): RtfSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the RTF kernels. */
object RtfOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def rtfText(b: Column): Column = ColumnBridge.column(RtfText(bin(b)))
  def rtfPars(b: Column): Column = ColumnBridge.column(RtfPars(bin(b)))

  def rtfSynth(text: Column, params: Column): Column =
    ColumnBridge.column(RtfSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
