package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP cache freshness (q179, RFC 9111) — the recrawl-economics
  * judgment between q99's envelope and q113's revisit policy (a
  * crawler IS a shared cache: respecting server freshness saves the
  * fetch entirely, and mis-reading it either hammers servers or
  * serves stale corpora): parse the response headers and compute the
  * freshness lifetime under the spec's PRECEDENCE —
  *
  *  - `no-store` forbids caching outright (lifetime moot);
  *  - `s-maxage` OUTRANKS `max-age` for a shared cache (the
  *    distinction most naive readers miss);
  *  - else `max-age`; else `Expires − Date` (both IMF-fixdate,
  *    parsed by real civil-date arithmetic — [[FeedEval]]'s shared
  *    algebra); else the RFC's heuristic
  *    `(Date − Last-Modified) / 10`; else zero;
  *  - an INVALID delta-seconds value (`max-age=abc`) makes that
  *    directive fall through to the next rung, never zero;
  *  - `no-cache` keeps the response cacheable but forces
  *    revalidation (a separate bit — conflating it with no-store
  *    over-fetches);
  *  - header NAMES are case-insensitive; `X-Max-Age`-style
  *    lookalikes must not match.
  */
object CacheEval {

  final case class Cache(cacheable: Int, mustReval: Int, method: Int,
                         lifetime: Long, date: Long)

  /** method: 1 s-maxage, 2 max-age, 3 expires, 4 heuristic, 5 none. */
  /** RFC 9111 delta-seconds: ASCII digits ONLY (`isDigit` would admit
    * non-ASCII Unicode digits that `toLong` then rejects), and capped
    * at 18 digits so the parse can never throw — a header like
    * `max-age=99999999999999999999` saturates instead of crashing the
    * query (longer-than-Long values already exceed any plausible
    * lifetime and `meta` clamps to 2^40-1 regardless).
    * Long.MinValue = invalid, fall through to the next rung. */
  private def deltaSeconds(v: String): Long = {
    if (v == null || v.isEmpty) return Long.MinValue
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c < '0' || c > '9') return Long.MinValue
      i += 1
    }
    if (v.length > 18) (1L << 40) - 1 else v.toLong
  }

  def parse(s: String): Cache = {
    if (s == null) return null
    var date = Long.MinValue
    var expires = Long.MinValue
    var lastMod = Long.MinValue
    var cc: String = null
    s.split("\r?\n").foreach { line =>
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "date" => date = FeedEval.parseRfc822(value)
          case "expires" => expires = FeedEval.parseRfc822(value)
          case "last-modified" => lastMod = FeedEval.parseRfc822(value)
          case "cache-control" => cc = value
          case _ => ()
        }
      }
    }
    if (date == Long.MinValue) return null // Date is mandatory here
    var noStore = false
    var noCache = false
    var sMaxage = Long.MinValue
    var maxAge = Long.MinValue
    if (cc != null) {
      cc.split(',').foreach { d0 =>
        val d = d0.trim.toLowerCase(java.util.Locale.ROOT)
        val eq = d.indexOf('=')
        val (k, v) = if (eq < 0) (d, null)
        else (d.substring(0, eq).trim, d.substring(eq + 1).trim)
        k match {
          case "no-store" => noStore = true
          case "no-cache" => noCache = true
          case "s-maxage" =>
            val d = deltaSeconds(v) // invalid value: fall through
            if (d != Long.MinValue) sMaxage = d
          case "max-age" =>
            val d = deltaSeconds(v)
            if (d != Long.MinValue) maxAge = d
          case _ => ()
        }
      }
    }
    if (noStore) return Cache(0, 0, 0, 0L, date)
    val (method, lifetime) =
      if (sMaxage != Long.MinValue) (1, sMaxage)
      else if (maxAge != Long.MinValue) (2, maxAge)
      else if (expires != Long.MinValue) (3, math.max(expires - date, 0L))
      else if (lastMod != Long.MinValue) (4, math.max((date - lastMod) / 10, 0L))
      else (5, 0L)
    Cache(1, if (noCache) 1 else 0, method, lifetime, date)
  }

  /** lifetime(40) << 8 | method(3) << 5 | reval << 4 | cacheable << 3
    * | 1; -1 refusal (no parsable Date). */
  def meta(s: String): Long = {
    val c = parse(s)
    if (c == null) return -1L
    (math.min(c.lifetime, (1L << 40) - 1) << 8) | (c.method.toLong << 5) |
      (c.mustReval.toLong << 4) | (c.cacheable.toLong << 3) | 1L
  }

  def dateEpoch(s: String): Long = {
    val c = parse(s)
    if (c == null) Long.MinValue else c.date
  }

  // -------------------------------------------------------------- synth

  /** Synthesize q179 response headers. `params` packs
    * `doc_id | mode<<40`; base epoch = 1700000000 + (id%1000)*37.
    * 0 -> max-age; 1 -> s-maxage beats max-age; 2 -> Expires only;
    * 3 -> no-store beside a max-age that must NOT matter;
    * 4 -> heuristic from Last-Modified; 5 -> INVALID max-age falls
    * through to Expires, plus no-cache. Odd ids spell header names
    * in lowercase (case-fold drill); every class carries `Age` and
    * `X-Max-Age` decoys.
    */
  def synth(params: Long): String = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val date = 1700000000L + (id % 1000) * 37
    val lower = id % 2 == 1
    def h(name: String): String =
      if (lower) name.toLowerCase(java.util.Locale.ROOT) else name
    val sb = new StringBuilder
    sb.append(h("Date")).append(": ")
      .append(FeedEval.toRfc822(date).replace("+0000", "GMT")).append("\r\n")
    sb.append(h("Age")).append(": 5\r\n")
    sb.append("X-Max-Age: 999\r\n")
    mode match {
      case 1 =>
        sb.append(h("Cache-Control")).append(": public, s-maxage=")
          .append(120 + id % 300).append(", max-age=60\r\n")
      case 2 =>
        sb.append(h("Expires")).append(": ")
          .append(FeedEval.toRfc822(date + 3600 + id % 1800)
            .replace("+0000", "GMT")).append("\r\n")
      case 3 =>
        sb.append(h("Cache-Control")).append(": no-store, max-age=99\r\n")
      case 4 =>
        sb.append(h("Last-Modified")).append(": ")
          .append(FeedEval.toRfc822(date - 86400L * (1 + id % 10))
            .replace("+0000", "GMT")).append("\r\n")
      case 5 =>
        sb.append(h("Cache-Control"))
          .append(": max-age=abc, no-cache\r\n")
        sb.append(h("Expires")).append(": ")
          .append(FeedEval.toRfc822(date + 600 + id % 60)
            .replace("+0000", "GMT")).append("\r\n")
      case _ =>
        sb.append(h("Cache-Control")).append(": max-age=")
          .append(60 + id % 600).append("\r\n")
    }
    sb.append("Content-Type: text/html\r\n")
    sb.toString
  }
}

/** `string -> long`: packed freshness verdict; NULL without a Date. */
case class CacheMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cache_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CacheEval.meta(input.asInstanceOf[UTF8String].toString)
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val res = ctx.freshName("cm")
      s"""
         |long $res = graft.functions.CacheEval.meta($h.toString());
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CacheMeta =
    copy(child = newChild)
}

/** `string -> long`: the parsed Date epoch; NULL on refusal. */
case class CacheDate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cache_date"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CacheEval.dateEpoch(input.asInstanceOf[UTF8String].toString)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val res = ctx.freshName("cd")
      s"""
         |long $res = graft.functions.CacheEval.dateEpoch($h.toString());
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CacheDate =
    copy(child = newChild)
}

/** `long -> string`: q179's synthesized response headers. */
case class CacheSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cache_synth"

  override protected def nullSafeEval(params: Any): Any =
    UTF8String.fromString(CacheEval.synth(params.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      p => s"UTF8String.fromString(graft.functions.CacheEval.synth($p))")

  override protected def withNewChildInternal(newChild: Expression): CacheSynth =
    copy(child = newChild)
}

/** Column surface for the cache-freshness kernels. */
object CacheOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def str(c: Column) = ColumnBridge.expression(c.cast("string"))

  def cacheMeta(h: Column): Column = ColumnBridge.column(CacheMeta(str(h)))
  def cacheDate(h: Column): Column = ColumnBridge.column(CacheDate(str(h)))

  def cacheSynth(params: Column): Column =
    ColumnBridge.column(CacheSynth(ColumnBridge.expression(params.cast("long"))))
}
