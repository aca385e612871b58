package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode script-mix analysis (q169) — the language-mix and
  * SPOOFING read of the text family: a multilingual corpus budget
  * needs per-script letter counts (q27/q110 identify LANGUAGES;
  * scripts are the orthogonal axis a mixing policy actually buckets
  * by), and a WORD that mixes scripts is the classic homoglyph
  * attack (`pаypаl` with Cyrillic а — UTS #39's mixed-script
  * confusable): in a crawl corpus it marks phishing text and
  * poisoning attempts, so the count is a first-class quality signal.
  *
  * Stated scope — five script buckets by EXPLICIT code-point range
  * (an engine-version-independent table, never `Character.getType`):
  * Latin (A-Z, a-z, U+00C0-U+024F), Cyrillic (U+0400-U+04FF), Greek
  * (U+0370-U+03FF), CJK (U+4E00-U+9FFF han + U+3040-U+30FF kana),
  * Arabic (U+0600-U+06FF). Everything else (digits, punctuation,
  * other scripts) is a word SEPARATOR for the mixed-word judgment
  * and counts nowhere. A mixed word is one containing letters from
  * >= 2 of the five buckets.
  */
object ScriptMixEval {

  private final val Latin = 0
  private final val Cyrillic = 1
  private final val Greek = 2
  private final val Cjk = 3
  private final val Arabic = 4

  /** Script bucket of a code point, or -1 (separator / out of scope). */
  def script(cp: Int): Int = {
    if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0xC0 && cp <= 0x24F)) Latin
    else if (cp >= 0x400 && cp <= 0x4FF) Cyrillic
    else if (cp >= 0x370 && cp <= 0x3FF) Greek
    else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
      (cp >= 0x3040 && cp <= 0x30FF)) Cjk
    else if (cp >= 0x600 && cp <= 0x6FF) Arabic
    else -1
  }

  final case class Mix(latin: Long, cyrillic: Long, greek: Long, cjk: Long,
                       arabic: Long, mixedWords: Int, nScripts: Int)

  def parse(s: String): Mix = {
    if (s == null) return null
    val counts = new Array[Long](5)
    var mixedWords = 0
    var wordMask = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val sc = script(cp)
      if (sc >= 0) {
        counts(sc) += 1
        wordMask |= 1 << sc
      } else {
        if (Integer.bitCount(wordMask) >= 2) mixedWords += 1
        wordMask = 0
      }
      i += Character.charCount(cp)
    }
    if (Integer.bitCount(wordMask) >= 2) mixedWords += 1
    var nScripts = 0
    var k = 0
    while (k < 5) { if (counts(k) > 0) nScripts += 1; k += 1 }
    Mix(counts(0), counts(1), counts(2), counts(3), counts(4),
      mixedWords, nScripts)
  }

  /** latin(24) | cyrillic(20) | greek(20), saturating. */
  def pack1(s: String): Long = {
    val m = parse(s)
    if (m == null) return -1L
    (math.min(m.latin, 0xFFFFFFL) << 40) |
      (math.min(m.cyrillic, 0xFFFFFL) << 20) | math.min(m.greek, 0xFFFFFL)
  }

  /** cjk(24) | arabic(20) | mixedWords(12) | nScripts(4), saturating. */
  def pack2(s: String): Long = {
    val m = parse(s)
    if (m == null) return -1L
    (math.min(m.cjk, 0xFFFFFFL) << 36) |
      (math.min(m.arabic, 0xFFFFFL) << 16) |
      (math.min(m.mixedWords.toLong, 0xFFFL) << 4) | m.nScripts.toLong
  }
}

/** `string -> long`: packed (latin, cyrillic, greek) letter counts. */
case class ScriptPack1(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_script_pack1"

  override protected def nullSafeEval(input: Any): Any =
    ScriptMixEval.pack1(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.ScriptMixEval.pack1($s.toString())")

  override protected def withNewChildInternal(newChild: Expression): ScriptPack1 =
    copy(child = newChild)
}

/** `string -> long`: packed (cjk, arabic, mixed-word, script) counts. */
case class ScriptPack2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_script_pack2"

  override protected def nullSafeEval(input: Any): Any =
    ScriptMixEval.pack2(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.ScriptMixEval.pack2($s.toString())")

  override protected def withNewChildInternal(newChild: Expression): ScriptPack2 =
    copy(child = newChild)
}

/** Column surface for the script-mix kernels. */
object ScriptMixOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def scriptPack1(s: Column): Column =
    ColumnBridge.column(ScriptPack1(ColumnBridge.expression(s.cast("string"))))
  def scriptPack2(s: Column): Column =
    ColumnBridge.column(ScriptPack2(ColumnBridge.expression(s.cast("string"))))
}
