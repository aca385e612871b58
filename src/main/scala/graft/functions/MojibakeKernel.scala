package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake detection and repair (q143) — the ftfy-class cleaning pass
  * a web corpus needs after charset sniffing (q114/q117/q126 decode
  * the BYTES right; this repairs text that was already CORRUPTED
  * upstream): UTF-8 bytes misread as Windows-1252 turn `é` into `Ã©`
  * and `—` into `â€”`, and the corruption COMPOSES (a twice-through
  * pipeline yields `ÃƒÂ©`).
  *
  * The repair is the inverse pipeline, applied only while EVERY gate
  * holds (never a guess):
  *
  *  1. the text must round-trip INTO cp1252 bytes (a char cp1252
  *     cannot spell — CJK, emoji — means the text never came through
  *     a cp1252 stage: stop);
  *  2. those bytes must decode as STRICT UTF-8 with at least one
  *     multi-byte sequence (real French `café` encodes to 0xE9 which
  *     is NOT valid UTF-8 — stays; the lone-`Â` trap `Â tricky`
  *     encodes to 0xC2 0x20 which is NOT valid UTF-8 — stays; a
  *     regex-based fixer mangles both);
  *  3. the decode must CHANGE the string (pure ASCII fixed-points
  *     stop the loop);
  *
  * iterated to a small cap (real pipelines corrupt once or twice;
  * the cap prevents pathological self-similar inputs from spinning).
  * The known residual risk is stated, not hidden: text whose INTENDED
  * content spells valid mojibake (a page ABOUT mojibake) repairs
  * "wrongly" — inherent to every heuristic fixer, ftfy included.
  *
  * Reference scope: scholar-stream normalizes API JSON (reference
  * ingestion/openalex_client.py) — mojibake repair is a north-star
  * extension of the text-cleaning family (q109/q114/q117/q126/q128).
  */
object MojibakeEval {

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private final val MaxRounds = 3

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  /** Strict cp1252 encode, or null when any char is unmappable. */
  private def toCp1252(s: String): Array[Byte] = {
    val enc = Cp1252.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** (repaired text, rounds applied). */
  def repair(s: String): (String, Int) = {
    if (s == null) return (null, 0)
    var cur = s
    var rounds = 0
    var go = true
    while (go && rounds < MaxRounds) {
      if (isAscii(cur)) go = false
      else {
        val enc = toCp1252(cur)
        if (enc == null) go = false
        else {
          val dec = strictUtf8(enc)
          if (dec == null || dec == cur) go = false
          else { cur = dec; rounds += 1 }
        }
      }
    }
    (cur, rounds)
  }

  def fixText(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val (r, n) = repair(str)
    if (n == 0) s else UTF8String.fromString(r)
  }

  def fixRounds(s: UTF8String): Int = {
    if (s == null) return -1
    repair(s.toString)._2
  }

  // -------------------------------------------------------------- synth

  /** One corruption stage: the string's UTF-8 bytes misread as
    * cp1252 (exactly what a mislabeled HTTP charset does).
    */
  def corrupt(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), Cp1252)

  /** Synthesize a q143 payload string: corpus text plus a class
    * suffix. `mode`: 0 → plain ASCII; 1 → REAL non-ASCII that must
    * survive untouched (` café — ok`); 2 → single mojibake of
    * ` café — naïve`; 3 → double mojibake of ` café naïve` (no
    * em-dash — its second stage hits cp1252's undefined 0x9D, as in
    * real pipelines, where double-corrupted curly punctuation often
    * arrives pre-replaced); 4 → the lone-`Â` trap (` Â tricky`).
    */
  def synth(text: UTF8String, mode: Int): UTF8String = {
    if (text == null) return null
    val base = text.toString
    val out = mode match {
      case 1 => base + " café — ok"
      case 2 => base + corrupt(" café — naïve")
      case 3 => base + corrupt(corrupt(" café naïve"))
      case 4 => base + " Â tricky"
      case _ => base
    }
    UTF8String.fromString(out)
  }
}

/** `string -> string`: mojibake-repaired text. */
case class MojibakeFix(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mojibake_fix"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeEval.fixText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeEval.fixText($c)")

  override protected def withNewChildInternal(newChild: Expression): MojibakeFix =
    copy(child = newChild)
}

/** `string -> int`: repair rounds applied (0 = clean). */
case class MojibakeRounds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mojibake_rounds"

  override protected def nullSafeEval(input: Any): Any = {
    val r = MojibakeEval.fixRounds(input.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val res = ctx.freshName("mr")
      s"""
         |int $res = graft.functions.MojibakeEval.fixRounds($s);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MojibakeRounds =
    copy(child = newChild)
}

/** `(string text, int mode) -> string`: q143's synthesis. */
case class MojibakeSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mojibake_synth"

  override protected def nullSafeEval(text: Any, mode: Any): Any =
    MojibakeEval.synth(text.asInstanceOf[UTF8String], mode.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, m) => s"graft.functions.MojibakeEval.synth($t, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MojibakeSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the mojibake kernels. */
object MojibakeOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def mojibakeFix(s: Column): Column =
    ColumnBridge.column(MojibakeFix(ColumnBridge.expression(s.cast("string"))))

  def mojibakeRounds(s: Column): Column =
    ColumnBridge.column(MojibakeRounds(ColumnBridge.expression(s.cast("string"))))

  def mojibakeSynth(text: Column, mode: Column): Column =
    ColumnBridge.column(MojibakeSynth(
      ColumnBridge.expression(text.cast("string")),
      ColumnBridge.expression(mode.cast("int"))))
}
