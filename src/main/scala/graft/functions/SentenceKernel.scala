package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sentence segmentation (q157) — the unit boundary every downstream
  * text op assumes (chunking q87 cuts at token counts; filtering and
  * dedup want SENTENCES), and the three traps a split-on-period
  * regex gets wrong:
  *
  *  - a terminator run `[.!?]+` is ONE boundary (`?!`, `...`), and it
  *    only bounds when followed by whitespace/EOF — which makes
  *    decimals (`3.14`) free: the char after the dot is a digit;
  *  - a SINGLE `.` whose preceding token (letters/dots, scanned back)
  *    is a known abbreviation (`dr`, `mr`, `e.g`, `i.e`, `etc`, ...)
  *    does NOT bound — and the stated, spec-pinned limitation is the
  *    flip side: an abbreviation at a TRUE sentence end joins two
  *    sentences (every abbreviation-list segmenter shares it);
  *  - closing quotes/brackets after the run attach to the SENTENCE
  *    (`."` bounds after the quote, never before).
  *
  * An unterminated tail is still a sentence (evidence preserved).
  *
  * Reference scope: scholar-stream stores abstracts whole (reference
  * ingestion/openalex_client.py) — segmentation is the north-star
  * prerequisite of the chunking family (q87) and per-sentence quality.
  */
object SentenceEval {

  private val Abbrev = Set("dr", "mr", "mrs", "ms", "prof", "fig", "eq",
    "vs", "etc", "e.g", "i.e", "al", "no", "st")

  def split(b: Array[Byte]): Array[String] = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }

    val out = scala.collection.mutable.ArrayBuffer[String]()
    val buf = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        val runStart = i
        while (i < s.length && (s.charAt(i) == '.' || s.charAt(i) == '!' ||
          s.charAt(i) == '?')) { buf.append(s.charAt(i)); i += 1 }
        val runLen = i - runStart
        // closing quotes/brackets attach to the sentence
        while (i < s.length && "\"')]".indexOf(s.charAt(i)) >= 0) {
          buf.append(s.charAt(i)); i += 1
        }
        val atEnd = i >= s.length || s.charAt(i).isWhitespace
        // single-dot abbreviation block: scan the token back over
        // letters and dots from just before the run
        val abbrevBlocked =
          runLen == 1 && s.charAt(runStart) == '.' && {
            var j = runStart - 1
            while (j >= 0 && (s.charAt(j).isLetter || s.charAt(j) == '.')) j -= 1
            val tok = s.substring(j + 1, runStart)
              .toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
            tok.nonEmpty && Abbrev.contains(tok)
          }
        if (atEnd && !abbrevBlocked) {
          val sent = buf.toString.trim
          if (sent.nonEmpty) out += sent
          buf.setLength(0)
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
        }
      } else {
        buf.append(c)
        i += 1
      }
    }
    val last = buf.toString.trim
    if (last.nonEmpty) out += last // unterminated tail: still a sentence
    out.toArray
  }

  def count(b: Array[Byte]): Int = {
    val r = split(b); if (r == null) -1 else r.length
  }

  /** Whitespace-token count across all sentences. */
  def tokens(b: Array[Byte]): Int = {
    val r = split(b)
    if (r == null) -1
    else r.map(_.split("\\s+").count(_.nonEmpty)).sum
  }

  /** Max whitespace-token count of any single sentence. */
  def longest(b: Array[Byte]): Int = {
    val r = split(b)
    if (r == null || r.isEmpty) -1
    else r.map(_.split("\\s+").count(_.nonEmpty)).max
  }

  /** Newline-joined sentences, null on refusal/empty. */
  def joined(b: Array[Byte]): String = {
    val r = split(b)
    if (r == null || r.isEmpty) null else r.mkString("\n")
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q157 punctuated passage from corpus words (>= 10 by
    * corpus contract). `params` packs `doc_id | mode<<40`:
    * 0 -> the trap gauntlet (plain sentence, `Dr.` + `3.14`, a
    * mid-sentence `e.g.`, a quoted question, an unterminated tail);
    * 1 -> multi-terminator runs (`?!`, `...`) and a terminated tail;
    * 2 -> the STATED limitation: `etc.` at a true sentence end joins
    * two sentences; 3 -> an unterminated tail after one plain
    * sentence. (Mode 4 is the operator's raw-text passthrough: one
    * unterminated sentence.)
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    mode match {
      case 1 =>
        sb.append(ws(0)).append(' ').append(ws(1)).append(' ').append(ws(2))
          .append("?! ")
        sb.append(ws(3)).append(' ').append(ws(4)).append("... ")
        sb.append(ws(5)).append(' ').append(ws(6)).append(". ")
        sb.append(ws.drop(7).mkString(" ")).append(".")
      case 2 =>
        sb.append(ws(0)).append(' ').append(ws(1)).append(" etc. ")
          .append(ws(2)).append(' ').append(ws(3)).append(' ').append(ws(4))
          .append(". ")
        sb.append(ws.drop(5).mkString(" ")).append("!")
      case 3 =>
        sb.append(ws(0)).append(' ').append(ws(1)).append(". ")
        sb.append(ws.drop(2).mkString(" "))
      case _ =>
        sb.append(ws(0)).append(' ').append(ws(1)).append(' ').append(ws(2))
          .append(". ")
        sb.append("Dr. ").append(ws(3)).append(" got 3.14 of ").append(ws(4))
          .append(". ")
        sb.append(ws(5)).append(" e.g. ").append(ws(6)).append("! ")
        sb.append('"').append(ws(7)).append(' ').append(ws(8)).append("?\" ")
        sb.append(ws.drop(9).mkString(" "))
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> int`: sentence count. */
case class SentCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sent_count"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SentenceEval.count(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sc")
      s"""
         |int $res = graft.functions.SentenceEval.count($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SentCount =
    copy(child = newChild)
}

/** `binary -> int`: whitespace tokens across sentences. */
case class SentTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sent_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SentenceEval.tokens(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("st")
      s"""
         |int $res = graft.functions.SentenceEval.tokens($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SentTokens =
    copy(child = newChild)
}

/** `binary -> int`: longest sentence in whitespace tokens. */
case class SentLongest(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sent_longest"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SentenceEval.longest(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sl")
      s"""
         |int $res = graft.functions.SentenceEval.longest($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SentLongest =
    copy(child = newChild)
}

/** `binary -> string`: newline-joined sentences. */
case class SentJoined(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sent_joined"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SentenceEval.joined(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sj")
      s"""
         |String $res = graft.functions.SentenceEval.joined($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SentJoined =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q157's synthesis. */
case class SentSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sent_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    SentenceEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.SentenceEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SentSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the sentence kernels. */
object SentenceOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def sentCount(b: Column): Column = ColumnBridge.column(SentCount(bin(b)))
  def sentTokens(b: Column): Column = ColumnBridge.column(SentTokens(bin(b)))
  def sentLongest(b: Column): Column = ColumnBridge.column(SentLongest(bin(b)))
  def sentJoined(b: Column): Column = ColumnBridge.column(SentJoined(bin(b)))

  def sentSynth(text: Column, params: Column): Column =
    ColumnBridge.column(SentSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
