package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Punycode / IDN hostname decode (q167) — the internationalized
  * domains a crawl frontier meets as `xn--` ACE labels (RFC 3492
  * bootstring with the RFC 5890 IDNA parameters): a frontier that
  * cannot decode them treats `xn--mnchen-3ya.de` and the
  * Unicode-normalized `münchen.de` a different crawler discovered as
  * different hosts — politeness budgets split, dedup misses, and the
  * blocklist (q68) is trivially evaded by re-encoding.
  *
  * The decode is the full RFC 3492 §6.2 algorithm, not a table:
  * basic code points before the LAST delimiter, then generalized
  * variable-length integers under the adaptive bias — with the
  * spec's own traps honored:
  *
  *  - digit values are case-insensitive (`A-Z`/`a-z` → 0-25,
  *    `0-9` → 26-35; anything else refuses);
  *  - the bias ADAPTS after every insertion (damp 700 on the first,
  *    2 thereafter) — a fixed-threshold reader decodes only
  *    single-insertion labels;
  *  - overflow is checked at every accumulation step (RFC 3492 §6.4:
  *    "fail on overflow"), so a hostile `xn--zzz999999999a` label
  *    refuses instead of wrapping into a colliding host;
  *  - a decoded label must actually CONTAIN a non-ASCII code point —
  *    an `xn--` label that decodes to pure ASCII is a spoofing
  *    artifact and refuses (RFC 5891 §4.2.3.1's hyphen-minus rule
  *    family).
  *
  * One failing label refuses the WHOLE host (NULL — a frontier must
  * not half-normalize a name), while non-ACE labels pass through
  * verbatim.
  */
object PunycodeEval {

  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  private def adapt(deltaIn: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) deltaIn / Damp else deltaIn / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= (Base - TMin)
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Decode one punycode label body (after `xn--`); null on refusal. */
  def decodeLabel(s: String): String = {
    if (s.isEmpty) return null
    val out = new java.util.ArrayList[Integer]()
    val lastDelim = s.lastIndexOf('-')
    var idx = 0
    if (lastDelim >= 0) {
      var j = 0
      while (j < lastDelim) {
        val c = s.charAt(j)
        if (c >= 128) return null // basic part must be ASCII
        out.add(Integer.valueOf(c.toInt))
        j += 1
      }
      idx = lastDelim + 1
    }
    if (idx >= s.length && lastDelim >= 0) return null // nothing encoded
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (idx < s.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (idx >= s.length) return null // truncated integer
        val d = digit(s.charAt(idx))
        idx += 1
        if (d < 0) return null
        if (d > (Int.MaxValue - i) / w) return null // overflow
        i += d * w
        val t = if (k <= bias) TMin
        else if (k >= bias + TMax) TMax
        else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return null // overflow
          w *= Base - t
          k += Base
        }
      }
      val numPoints = out.size() + 1
      bias = adapt(i - oldi, numPoints, oldi == 0)
      if (i / numPoints > Int.MaxValue - n) return null // overflow
      n += i / numPoints
      i %= numPoints
      if (n < 0x80 || n > 0x10FFFF ||
        (n >= 0xD800 && n <= 0xDFFF)) return null
      out.add(i, Integer.valueOf(n))
      i += 1
    }
    // must contain at least one non-ASCII (it does by the n >= 0x80
    // rule above whenever anything was inserted; bare "xn--" handled)
    if (out.isEmpty) return null
    val sb = new java.lang.StringBuilder()
    var p = 0
    while (p < out.size()) { sb.appendCodePoint(out.get(p)); p += 1 }
    sb.toString
  }

  /** Decode every `xn--` label of a host; null when any refuses. */
  def host(hostIn: String): String = {
    if (hostIn == null || hostIn.isEmpty) return null
    val labels = hostIn.split("\\.", -1)
    val out = new Array[String](labels.length)
    var k = 0
    while (k < labels.length) {
      val l = labels(k)
      val lower = l.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("xn--")) {
        val dec = decodeLabel(lower.substring(4))
        if (dec == null) return null
        out(k) = dec
      } else out(k) = l
      k += 1
    }
    out.mkString(".")
  }
}

/** `string -> string`: the host with every ACE label decoded; NULL
  * when any `xn--` label refuses. */
case class PunyHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_puny_host"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PunycodeEval.host(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val res = ctx.freshName("ph")
      s"""
         |String $res = graft.functions.PunycodeEval.host($h.toString());
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PunyHost =
    copy(child = newChild)
}

/** Column surface for the punycode kernel. */
object PunycodeOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def punyHost(h: Column): Column =
    ColumnBridge.column(PunyHost(ColumnBridge.expression(h.cast("string"))))
}
