package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Payment-card detection with Luhn validation (q182) — the
  * governance rung above q46's pattern-only PII scrub (a 16-digit
  * number is only a CARD if its ISO/IEC 7812 check digit closes; a
  * pattern-only scrubber both over-redacts order ids and under-flags
  * real leakage — the Luhn gate is what separates the two):
  *
  *  - candidates are 16-digit groups in 4-4-4-4 layout with optional
  *    `-`/space separators, guarded by DIGIT BOUNDARIES — a 16-digit
  *    window inside a 19-digit run is NOT a candidate (lookaround
  *    guards; a naive scanner redacts half of every long id);
  *  - validation is the real Luhn fold over the 16 digits (doubling
  *    every second digit from the right, 9-subtraction overflow);
  *  - redaction replaces VALID cards with `[CARD]` and leaves
  *    invalid candidates visible (evidence, not over-scrubbing —
  *    q128's stance).
  */
object CardEval {

  private val Candidate = java.util.regex.Pattern.compile(
    "(?<![0-9])([0-9]{4})[- ]?([0-9]{4})[- ]?([0-9]{4})[- ]?([0-9]{4})(?![0-9])")

  /** The ISO/IEC 7812 Luhn check over a 16-digit string. */
  def luhnValid(digits: String): Boolean = {
    if (digits.length != 16 || !digits.forall(_.isDigit)) return false
    var sum = 0
    var i = 0
    while (i < 16) {
      val d = digits.charAt(i) - '0'
      // positions counted from the right: even index from left of a
      // 16-digit number is an even position from the right -> doubled
      val v = if (i % 2 == 0) { val t = 2 * d; if (t > 9) t - 9 else t }
      else d
      sum += v
      i += 1
    }
    sum % 10 == 0
  }

  /** (candidates << 8) | valid. */
  def counts(s: String): Long = {
    if (s == null) return 0L
    val m = Candidate.matcher(s)
    var cand = 0L
    var valid = 0L
    while (m.find()) {
      cand += 1
      val digits = m.group(1) + m.group(2) + m.group(3) + m.group(4)
      if (luhnValid(digits)) valid += 1
    }
    (math.min(cand, 0xFFL) << 8) | math.min(valid, 0xFFL)
  }

  /** VALID cards replaced with `[CARD]`; invalid candidates stay. */
  def redact(s: String): String = {
    if (s == null) return null
    val m = Candidate.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      val digits = m.group(1) + m.group(2) + m.group(3) + m.group(4)
      if (luhnValid(digits)) {
        sb.append(s, last, m.start())
        sb.append("[CARD]")
        last = m.end()
      }
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}

/** `string -> long`: `(candidates << 8) | luhn_valid` counts. */
case class CardCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_card_counts"

  override protected def nullSafeEval(input: Any): Any =
    CardEval.counts(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.CardEval.counts($s.toString())")

  override protected def withNewChildInternal(newChild: Expression): CardCounts =
    copy(child = newChild)
}

/** `string -> string`: the text with valid cards redacted. */
case class CardRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_card_redact"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CardEval.redact(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.CardEval.redact($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CardRedact =
    copy(child = newChild)
}

/** Column surface for the card kernels. */
object CardOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def str(c: Column) = ColumnBridge.expression(c.cast("string"))

  def cardCounts(s: Column): Column = ColumnBridge.column(CardCounts(str(s)))
  def cardRedact(s: Column): Column = ColumnBridge.column(CardRedact(str(s)))
}
