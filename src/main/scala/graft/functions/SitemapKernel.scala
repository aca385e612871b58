package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** XML sitemap parsing (q146) — the crawl-seeding channel robots.txt
  * points at (q98 gates fetches; q141 reads feeds; this one reads the
  * site's own URL inventory, the highest-yield frontier seed a
  * crawler has). Scope per sitemaps.org, strict about the traps:
  *
  *  - the root is `<urlset>` (page sitemap) or `<sitemapindex>`
  *    (pointing at child sitemaps); a root that never CLOSES is a
  *    truncated download and refuses WHOLE (q141's stance);
  *  - `<url>`/`<sitemap>` blocks contribute only when they carry a
  *    `<loc>` — a loc-less block is skipped, not guessed at;
  *  - loc text is TRIMMED and XML-entity-decoded (the five named +
  *    numeric, one level): a legal sitemap MUST spell `&` as `&amp;`,
  *    so the decoded URL never equals the raw bytes;
  *  - `<lastmod>` speaks W3C datetime — full ISO 8601 or the
  *    DATE-ONLY form `yyyy-mm-dd` (midnight UTC), both normalized to
  *    epoch seconds through [[FeedEval.parseIso8601]]'s civil-date
  *    arithmetic; a missing or malformed lastmod drops out of the
  *    latest-read without poisoning the block's loc;
  *  - out of scope, stated: `<priority>`/`<changefreq>` (advisory,
  *    ignored by major engines), gzip transport (q95 owns that rung),
  *    recursive child-sitemap FETCHING (this is a parser — the
  *    frontier join happens in q94/q107's plans).
  *
  * Reference scope: scholar-stream discovers work through a
  * cursor-paged API (reference ingestion/openalex_client.py) —
  * sitemaps are the open-web spelling of the same discovery loop.
  */
object SitemapEval {

  final case class Sm(kind: String, urls: Int, lastmods: Int,
                      latest: Long, firstLoc: String)

  /** XML entity decode: the five named + `&#NN;`/`&#xNN;`, one level. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(name.substring(2), 16).toChar)
              catch { case _: Exception => null }
            case _ if name.startsWith("#") =>
              try String.valueOf(Integer.parseInt(name.substring(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  /** W3C datetime: full ISO 8601, or date-only = midnight UTC. */
  private def lastmodEpoch(s0: String): Long = {
    val s = s0.trim
    if (s.length == 10 && s.charAt(4) == '-' && s.charAt(7) == '-')
      FeedEval.parseIso8601(s + "T00:00:00Z")
    else FeedEval.parseIso8601(s)
  }

  /** Inner text of the first `<tag>...</tag>` inside [from, to), or
    * null; returns (text, index past the close tag).
    */
  private def childText(s: String, tag: String, from: Int, to: Int): (String, Int) = {
    val open = "<" + tag + ">"
    val close = "</" + tag + ">"
    val a = s.indexOf(open, from)
    if (a < 0 || a >= to) return null
    val b = s.indexOf(close, a + open.length)
    if (b < 0 || b >= to) return null
    (s.substring(a + open.length, b), b + close.length)
  }

  def parse(b: Array[Byte]): Sm = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }

    val (kind, blockTag) =
      if (s.contains("<urlset")) ("urlset", "url")
      else if (s.contains("<sitemapindex")) ("index", "sitemap")
      else return null
    val rootClose = "</" + (if (kind == "urlset") "urlset" else "sitemapindex") + ">"
    val end = s.indexOf(rootClose)
    if (end < 0) return null // truncated download: refuse whole

    var urls = 0; var lastmods = 0; var latest = Long.MinValue
    var firstLoc: String = null
    var i = s.indexOf("<" + blockTag + ">")
    while (i >= 0 && i < end) {
      val close = s.indexOf("</" + blockTag + ">", i)
      val stop = if (close < 0 || close > end) end else close
      val loc = childText(s, "loc", i, stop)
      if (loc != null) {
        urls += 1
        val u = decodeEntities(loc._1.trim)
        if (firstLoc == null) firstLoc = u
        val lm = childText(s, "lastmod", i, stop)
        if (lm != null) {
          val e = lastmodEpoch(lm._1)
          if (e != Long.MinValue) {
            lastmods += 1
            if (e > latest) latest = e
          }
        }
      }
      i = s.indexOf("<" + blockTag + ">", stop + 1)
    }
    Sm(kind, urls, lastmods, if (latest == Long.MinValue) -1L else latest,
      firstLoc)
  }

  def kind(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.kind
  }

  def urls(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.urls
  }

  def lastmods(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.lastmods
  }

  def latest(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) Long.MinValue else r.latest
  }

  def firstLoc(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.firstLoc
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q146 sitemap. `params` packs `doc_id | mode<<40`:
    * 0 -> urlset with 2 + id%3 urls, date-only lastmod on even
    * indexes and full ISO on odd (T06:30:00Z), all in 2024-03 with
    * day 1 + (id+i)%28; 1 -> a sitemapindex with two children (full
    * ISO lastmod, same day rule); 2 -> the trap set: an
    * entity-escaped `&amp;` loc without lastmod, a whitespace-padded
    * loc (day 1+id%28), a LOC-LESS url that must not count, and a
    * third loc (day 1+(id+5)%28); 3 -> class 0's bytes cut 20 short
    * (unclosed root, refuses whole).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val host = s"https://s${id % 7}.example"
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (mode == 1) {
      sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      var j = 0
      while (j < 2) {
        val day = 1 + (id + j) % 28
        sb.append("  <sitemap>\n")
        sb.append("    <loc>").append(host).append("/sitemap").append(j)
          .append(".xml</loc>\n")
        sb.append(f"    <lastmod>2024-03-$day%02dT06:30:00Z</lastmod>%n")
        sb.append("  </sitemap>\n")
        j += 1
      }
      sb.append("</sitemapindex>\n")
    } else if (mode == 2) {
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      sb.append("  <url><loc>").append(host)
        .append("/a?x=1&amp;y=2</loc></url>\n")
      val d1 = 1 + id % 28
      sb.append("  <url>\n    <loc>  ").append(host)
        .append("/padded  </loc>\n")
      sb.append(f"    <lastmod>2024-03-$d1%02d</lastmod>%n  </url>%n")
      sb.append(f"  <url><lastmod>2024-03-$d1%02d</lastmod></url>%n")
      val d2 = 1 + (id + 5) % 28
      sb.append("  <url><loc>").append(host).append("/c</loc>")
      sb.append(f"<lastmod>2024-03-$d2%02d</lastmod></url>%n")
      sb.append("</urlset>\n")
    } else {
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      val n = (2 + id % 3).toInt
      var i = 0
      while (i < n) {
        val day = 1 + (id + i) % 28
        sb.append("  <url>\n")
        sb.append("    <loc>").append(host).append("/p").append(i)
          .append("</loc>\n")
        if (i % 2 == 0)
          sb.append(f"    <lastmod>2024-03-$day%02d</lastmod>%n")
        else
          sb.append(f"    <lastmod>2024-03-$day%02dT06:30:00Z</lastmod>%n")
        sb.append("  </url>\n")
        i += 1
      }
      sb.append("</urlset>\n")
    }
    val out = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (mode == 3) java.util.Arrays.copyOfRange(out, 0, out.length - 20)
    else out
  }
}

/** `binary -> string`: `urlset` | `index`, NULL on refusal. */
case class SmKind(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_kind"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SitemapEval.kind(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sk")
      s"""
         |String $res = graft.functions.SitemapEval.kind($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SmKind =
    copy(child = newChild)
}

/** `binary -> int`: loc-carrying block count. */
case class SmUrls(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_urls"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SitemapEval.urls(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("su")
      s"""
         |int $res = graft.functions.SitemapEval.urls($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SmUrls =
    copy(child = newChild)
}

/** `binary -> int`: blocks with a parseable lastmod. */
case class SmLastmods(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_lastmods"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SitemapEval.lastmods(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sl")
      s"""
         |int $res = graft.functions.SitemapEval.lastmods($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SmLastmods =
    copy(child = newChild)
}

/** `binary -> long`: max lastmod epoch, NULL when none parsed. */
case class SmLatest(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_latest"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SitemapEval.latest(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue || r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("se")
      s"""
         |long $res = graft.functions.SitemapEval.latest($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SmLatest =
    copy(child = newChild)
}

/** `binary -> string`: first loc, trimmed + entity-decoded. */
case class SmFirstLoc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_first_loc"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SitemapEval.firstLoc(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sf")
      s"""
         |String $res = graft.functions.SitemapEval.firstLoc($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SmFirstLoc =
    copy(child = newChild)
}

/** `long -> binary`: q146's synthesis (params pack `doc_id|mode<<40`). */
case class SmSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_synth"

  override protected def nullSafeEval(params: Any): Any =
    SitemapEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.SitemapEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): SmSynth =
    copy(child = newChild)
}

/** Column surface for the sitemap kernels. */
object SitemapOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def smKind(b: Column): Column = ColumnBridge.column(SmKind(bin(b)))
  def smUrls(b: Column): Column = ColumnBridge.column(SmUrls(bin(b)))
  def smLastmods(b: Column): Column = ColumnBridge.column(SmLastmods(bin(b)))
  def smLatest(b: Column): Column = ColumnBridge.column(SmLatest(bin(b)))
  def smFirstLoc(b: Column): Column = ColumnBridge.column(SmFirstLoc(bin(b)))

  def smSynth(params: Column): Column =
    ColumnBridge.column(SmSynth(
      ColumnBridge.expression(params.cast("long"))))
}
