package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the text-cleaning rung every
  * HTML→text pipeline runs after structure extraction (q106 pulls
  * content blocks; their text still spells `&amp;` and `&#8212;`):
  * named references from a stated CORE table (the everyday prose set —
  * punctuation, quotes, dashes, currency, Latin-1 letters; the full
  * WHATWG list is ~2k names and its long tail is out of stated scope),
  * and numeric references `&#D;` / `&#xH;` at any codepoint a String
  * can carry.
  *
  * Leniency is the SPEC here, not a shortcut: a `&` that does not
  * introduce a well-formed, KNOWN, `;`-terminated reference passes
  * through VERBATIM (HTML5 prose is full of bare ampersands and the
  * parser algorithm keeps them), and so do numeric references naming
  * surrogates or values past U+10FFFF (mangling them would destroy
  * evidence a quarantine query wants to see). Decoding is exactly ONE
  * level: `&amp;amp;` becomes `&amp;` — the classic double-encoding
  * pin.
  */
object HtmlEntityEval {

  /** The stated core table (name → codepoint). Boxed values on purpose:
    * a missing key must surface as null, never auto-unbox to 0 (NUL).
    */
  private val Named: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer]()
    val pairs = Seq(
      "amp" -> 38, "lt" -> 60, "gt" -> 62, "quot" -> 34, "apos" -> 39,
      "nbsp" -> 160, "mdash" -> 8212, "ndash" -> 8211, "hellip" -> 8230,
      "lsquo" -> 8216, "rsquo" -> 8217, "ldquo" -> 8220, "rdquo" -> 8221,
      "copy" -> 169, "reg" -> 174, "trade" -> 8482, "deg" -> 176,
      "middot" -> 183, "plusmn" -> 177, "times" -> 215, "divide" -> 247,
      "frac12" -> 189, "frac14" -> 188, "frac34" -> 190,
      "eacute" -> 233, "egrave" -> 232, "agrave" -> 224, "ccedil" -> 231,
      "uuml" -> 252, "ouml" -> 246, "auml" -> 228, "szlig" -> 223,
      "ntilde" -> 241, "pound" -> 163, "euro" -> 8364, "yen" -> 165,
      "cent" -> 162, "sect" -> 167, "para" -> 182, "laquo" -> 171,
      "raquo" -> 187, "bull" -> 8226, "dagger" -> 8224, "permil" -> 8240,
      "minus" -> 8722, "prime" -> 8242)
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Decoded codepoint of the reference body between `&` and `;`, or
    * -1 when it is not a well-formed, known, representable reference
    * (the verbatim pass-through cases).
    */
  private def refCodepoint(body: String): Int = {
    if (body.isEmpty) return -1
    if (body.charAt(0) == '#') {
      if (body.length < 2) return -1
      val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
      val digits = if (hex) body.substring(2) else body.substring(1)
      val radix = if (hex) 16 else 10
      if (digits.isEmpty || digits.length > 7 ||
        !digits.forall(Character.digit(_, radix) >= 0)) return -1
      val cp = java.lang.Integer.parseInt(digits, radix)
      // surrogates / beyond-Unicode pass through verbatim —
      // evidence-preserving, never U+FFFD
      if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) -1 else cp
    } else {
      val v = Named.get(body)
      if (v == null) -1 else v.intValue()
    }
  }

  def decode(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = s.indexOf('&')
    if (i < 0) return text // fast path: nothing to decode
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0) {
      val semi = s.indexOf(';', i + 1)
      // a reference is short by construction; a distant semicolon is
      // ordinary prose around a bare ampersand
      val cp =
        if (semi > i && semi - i <= 12) refCodepoint(s.substring(i + 1, semi))
        else -1
      if (cp >= 0) {
        sb.append(s, last, i)
        sb.appendCodePoint(cp)
        last = semi + 1
        i = s.indexOf('&', semi + 1)
      } else {
        // verbatim: keep the '&' and move on (ONE level of decoding —
        // the cp path above never rescans its own output)
        i = s.indexOf('&', i + 1)
      }
    }
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }
}

/** `string -> string`: one-level HTML character-reference decoding via
  * [[HtmlEntityEval.decode]].
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_unescape"

  override protected def nullSafeEval(input: Any): Any =
    HtmlEntityEval.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HtmlEntityEval.decode($t);")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}

/** Column surface for the entity decoder. */
object HtmlEntityOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def htmlUnescape(text: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(
      ColumnBridge.expression(text.cast("string"))))
}
