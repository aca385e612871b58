package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a text
  * corpus runs before ANY byte-keyed operator can be trusted: "café"
  * spelled with a precomposed U+00E9 and with `e` + combining U+0301 are
  * the SAME text to a reader and DIFFERENT bytes to q21's md5, q30's
  * fingerprint, q67's line keys and every shingle hash. Normalizing to
  * NFC (the web's canonical form, what UTF-8 sources overwhelmingly
  * carry) makes equal-looking text equal-keyed.
  *
  * One shared eval body (the GzipEval discipline): the JDK's
  * `java.text.Normalizer` under both the interpreted and generated
  * paths. The `isNormalized` quick-check makes the overwhelmingly-common
  * already-NFC row (all ASCII in particular) a cheap scan that returns
  * the INPUT UTF8String untouched — no String round-trip, no allocation.
  */
object UnicodeEval {
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `string -> string`: NFC canonical composition via [[UnicodeEval.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeEval.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeEval.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
