package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RSS 2.0 / Atom feed ingest (q141) — the crawl-discovery channel
  * beside sitemaps (q103): blogs, news, and release pages announce new
  * URLs through feeds, and the two formats disagree in exactly the
  * places a sloppy reader conflates:
  *
  *  - an Atom `<link>` carries its URL in the `href` ATTRIBUTE while
  *    an RSS `<link>` carries element TEXT — the classic feed-reader
  *    bug reads an Atom link's empty text; Atom entries may also carry
  *    a `rel="self"` decoy that must lose to `rel="alternate"` or an
  *    unqualified link;
  *  - dates: RSS speaks RFC 822 (`Mon, 01 Jan 2024 00:02:05 +0000`,
  *    optional day-of-week, named month, numeric zone or GMT/UT) and
  *    Atom ISO 8601 (`2024-01-01T00:02:05Z` or `±HH:MM`) — both
  *    normalize to epoch SECONDS through real civil-date arithmetic
  *    (no library), offsets applied not ignored;
  *  - titles may be CDATA (`<![CDATA[..]]>` — verbatim, even when the
  *    payload spells tags and bare ampersands) or entity-escaped (the
  *    XML five + numeric, one level);
  *  - item scope: only `<item>`/`<entry>` children count — the
  *    channel-level title/link must never leak into item rows;
  *  - a feed whose root never CLOSES (`</rss>`/`</feed>` missing) is
  *    a truncated download and refuses WHOLE; an item missing a date
  *    simply does not contribute to the latest-timestamp read.
  *
  * Reference scope: scholar-stream polls a cursor-paged API (reference
  * ingestion/openalex_client.py) — feeds are the OPEN-web spelling of
  * the same discovery loop, a north-star extension of the crawl
  * family (q94/q103/q107/q113).
  */
object FeedEval {

  final case class Item(title: String, link: String, epoch: Long)
  final case class Feed(format: String, items: Array[Item])

  // ------------------------------------------------------ date algebra

  private val Months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val Dows = Array("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")

  /** Days from 1970-01-01 for a civil date (Hinnant's algorithm). */
  private def daysFromCivil(y0: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** Civil date from days since 1970-01-01 (inverse). */
  private def civilFromDays(z0: Long): (Int, Int, Int) = {
    val z = z0 + 719468L
    val era = (if (z >= 0) z else z - 146096L) / 146097L
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = (doy - (153 * mp + 2) / 5 + 1).toInt
    val m = (if (mp < 10) mp + 3 else mp - 9).toInt
    ((if (m <= 2) y + 1 else y).toInt, m, d)
  }

  /** RFC 822/1123: `[Dow, ]dd Mon yyyy HH:MM:SS (+|-)HHMM|GMT|UT`. */
  def parseRfc822(s0: String): Long = {
    var s = s0.trim
    val comma = s.indexOf(',')
    if (comma >= 0) s = s.substring(comma + 1).trim
    val p = s.split("\\s+")
    if (p.length < 5) return Long.MinValue
    val d = toInt(p(0)); val y = toInt(p(2))
    val mi = Months.indexWhere(_.equalsIgnoreCase(p(1)))
    val t = p(3).split(':')
    if (d < 1 || mi < 0 || y < 0 || t.length != 3) return Long.MinValue
    val hh = toInt(t(0)); val mm = toInt(t(1)); val ss = toInt(t(2))
    if (hh < 0 || mm < 0 || ss < 0) return Long.MinValue
    val zone = p(4)
    val off =
      if (zone == "GMT" || zone == "UT" || zone == "UTC") 0L
      else if ((zone.startsWith("+") || zone.startsWith("-")) && zone.length == 5) {
        val zh = toInt(zone.substring(1, 3)); val zm = toInt(zone.substring(3, 5))
        if (zh < 0 || zm < 0) return Long.MinValue
        val v = zh * 3600L + zm * 60L
        if (zone.startsWith("-")) -v else v
      } else return Long.MinValue
    daysFromCivil(y, mi + 1, d) * 86400L + hh * 3600L + mm * 60L + ss - off
  }

  /** ISO 8601: `yyyy-mm-ddTHH:MM:SS` + `Z` or `±HH:MM`. */
  def parseIso8601(s0: String): Long = {
    val s = s0.trim
    if (s.length < 20 || s.charAt(4) != '-' || s.charAt(7) != '-' ||
      (s.charAt(10) != 'T' && s.charAt(10) != 't') ||
      s.charAt(13) != ':' || s.charAt(16) != ':') return Long.MinValue
    val y = toInt(s.substring(0, 4)); val m = toInt(s.substring(5, 7))
    val d = toInt(s.substring(8, 10)); val hh = toInt(s.substring(11, 13))
    val mm = toInt(s.substring(14, 16)); val ss = toInt(s.substring(17, 19))
    if (y < 0 || m < 1 || m > 12 || d < 1 || hh < 0 || mm < 0 || ss < 0)
      return Long.MinValue
    val rest = s.substring(19)
    val off =
      if (rest == "Z" || rest == "z") 0L
      else if ((rest.startsWith("+") || rest.startsWith("-")) &&
        rest.length == 6 && rest.charAt(3) == ':') {
        val zh = toInt(rest.substring(1, 3)); val zm = toInt(rest.substring(4, 6))
        if (zh < 0 || zm < 0) return Long.MinValue
        val v = zh * 3600L + zm * 60L
        if (rest.startsWith("-")) -v else v
      } else return Long.MinValue
    daysFromCivil(y, m, d) * 86400L + hh * 3600L + mm * 60L + ss - off
  }

  private def toInt(s: String): Int =
    if (s.isEmpty || !s.forall(_.isDigit)) -1 else s.toInt

  /** Epoch seconds -> RFC 822 (UTC) for the synthesizer. */
  def toRfc822(epoch: Long): String = {
    val days = Math.floorDiv(epoch, 86400L)
    val sod = Math.floorMod(epoch, 86400L)
    val (y, m, d) = civilFromDays(days)
    val dow = Dows(((days % 7 + 7) % 7 + 4).toInt % 7)
    f"$dow, $d%02d ${Months(m - 1)} $y%04d ${sod / 3600}%02d:${sod / 60 % 60}%02d:${sod % 60}%02d +0000"
  }

  /** Epoch seconds -> ISO 8601 Z for the synthesizer. */
  def toIso8601(epoch: Long): String = {
    val days = Math.floorDiv(epoch, 86400L)
    val sod = Math.floorMod(epoch, 86400L)
    val (y, m, d) = civilFromDays(days)
    f"$y%04d-$m%02d-$d%02dT${sod / 3600}%02d:${sod / 60 % 60}%02d:${sod % 60}%02d Z"
      .replace(" Z", "Z")
  }

  // -------------------------------------------------------- XML helpers

  /** Element text with CDATA verbatim and one-level entity decode. */
  private def elementText(body: String, tag: String): String = {
    val open = body.indexOf("<" + tag + ">")
    if (open < 0) return null
    val from = open + tag.length + 2
    val close = body.indexOf("</" + tag + ">", from)
    if (close < 0) return null
    val raw = body.substring(from, close)
    if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
      raw.substring(9, raw.length - 3)
    else xmlDecode(raw)
  }

  private def xmlDecode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ref = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val dec = ref match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case r if r != null && r.startsWith("#x") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(2), 16)))
            catch { case _: Exception => null }
          case r if r != null && r.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (dec != null) { sb.append(dec); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Atom entry link: first `<link ... href>` whose rel is absent or
    * `alternate` — the `rel="self"` decoy must lose.
    */
  private def atomLink(body: String): String = {
    var at = 0
    while (true) {
      val open = body.indexOf("<link", at)
      if (open < 0) return null
      val end = body.indexOf('>', open)
      if (end < 0) return null
      val tag = body.substring(open, end + 1)
      val rel = attr(tag, "rel")
      if (rel == null || rel == "alternate") {
        val href = attr(tag, "href")
        if (href != null) return xmlDecode(href)
      }
      at = end + 1
    }
    null
  }

  private def attr(tag: String, name: String): String = {
    val p = java.util.regex.Pattern.compile(name + "\\s*=\\s*\"([^\"]*)\"")
    val m = p.matcher(tag)
    if (m.find()) m.group(1) else null
  }

  private def itemBodies(s: String, tag: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var at = 0
    var done = false
    while (!done) {
      val open = s.indexOf("<" + tag + ">", at)
      if (open < 0) done = true
      else {
        val close = s.indexOf("</" + tag + ">", open)
        if (close < 0) return null // an unclosed item: truncated
        out += s.substring(open + tag.length + 2, close)
        at = close + tag.length + 3
      }
    }
    out.toArray
  }

  // -------------------------------------------------------------- parse

  def parse(b: Array[Byte]): Feed = {
    if (b == null || b.length < 16) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val isRss = s.contains("<rss")
    val isAtom = !isRss && s.contains("<feed")
    if (isRss) {
      if (!s.contains("</rss>")) return null // truncated download
      val ch = s.indexOf("<channel>")
      if (ch < 0 || !s.contains("</channel>")) return null
      val bodies = itemBodies(s, "item")
      if (bodies == null) return null
      val items = bodies.map { body =>
        val t = elementText(body, "title")
        val l = elementText(body, "link")
        val ds = elementText(body, "pubDate")
        val e = if (ds == null) Long.MinValue else parseRfc822(ds)
        Item(t, l, e)
      }
      Feed("rss", items)
    } else if (isAtom) {
      if (!s.contains("</feed>")) return null
      val bodies = itemBodies(s, "entry")
      if (bodies == null) return null
      val items = bodies.map { body =>
        val t = elementText(body, "title")
        val l = atomLink(body)
        val ds = elementText(body, "updated")
        val e = if (ds == null) Long.MinValue else parseIso8601(ds)
        Item(t, l, e)
      }
      Feed("atom", items)
    } else null
  }

  def format(b: Array[Byte]): String = {
    val f = parse(b); if (f == null) null else f.format
  }

  def itemCount(b: Array[Byte]): Int = {
    val f = parse(b); if (f == null) -1 else f.items.length
  }

  def firstTitle(b: Array[Byte]): String = {
    val f = parse(b)
    if (f == null || f.items.isEmpty) null else f.items(0).title
  }

  def firstLink(b: Array[Byte]): String = {
    val f = parse(b)
    if (f == null || f.items.isEmpty) null else f.items(0).link
  }

  /** Max parseable item timestamp (epoch s); MinValue rows ignored. */
  def latestEpoch(b: Array[Byte]): Long = {
    val f = parse(b)
    if (f == null) return Long.MinValue
    var m = Long.MinValue
    for (i <- f.items) if (i.epoch > m) m = i.epoch
    m
  }

  /** LF-joined item titles as UTF-8 bytes. */
  def titles(b: Array[Byte]): Array[Byte] = {
    val f = parse(b)
    if (f == null) null
    else f.items.map(i => if (i.title == null) "" else i.title).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private final val Base = 1704067200L // 2024-01-01T00:00:00Z

  /** Synthesize a q141 feed: one item per 8 corpus words, item i at
    * `Base + id*37 + i*60` epoch seconds. `params` packs
    * `doc_id | mode<<40`: 0 → RSS 2.0, RFC 822 dates; 1 → Atom, ISO
    * dates, href links with a rel="self" decoy on every entry, item
    * 0's title entity-escaped (` &amp; more` suffix); 2 → RSS with
    * CDATA titles, item 0's payload spelling raw markup; 3 → RSS cut
    * before `</rss>` (refuses whole).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val nc = (ws.length + 7) / 8
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    if (mode == 1) {
      sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
      sb.append("<title>channel title never an item</title>\n")
      sb.append("<link href=\"https://feed.example/doc").append(id)
        .append("/self\" rel=\"self\"/>\n")
      sb.append("<updated>").append(toIso8601(Base + id * 37))
        .append("</updated>\n")
      var i = 0
      while (i < nc) {
        val t0 = ws.slice(i * 8, i * 8 + 8).mkString(" ")
        val t = if (i == 0) t0 + " &amp; more" else t0
        sb.append("<entry>\n<title>").append(t).append("</title>\n")
        sb.append("<link href=\"https://feed.example/doc").append(id)
          .append("/self\" rel=\"self\"/>\n") // the decoy must lose
        sb.append("<link href=\"https://feed.example/doc").append(id)
          .append("/item").append(i).append("\" rel=\"alternate\"/>\n")
        sb.append("<updated>").append(toIso8601(Base + id * 37 + i * 60))
          .append("</updated>\n</entry>\n")
        i += 1
      }
      sb.append("</feed>\n")
    } else {
      sb.append("<rss version=\"2.0\">\n<channel>\n")
      sb.append("<title>channel title never an item</title>\n")
      sb.append("<link>https://feed.example/doc").append(id).append("</link>\n")
      var i = 0
      while (i < nc) {
        val t0 = ws.slice(i * 8, i * 8 + 8).mkString(" ")
        val t =
          if (mode == 2 && i == 0) "<![CDATA[" + t0 + " <b> & raw]]>"
          else if (mode == 2) "<![CDATA[" + t0 + "]]>"
          else t0
        sb.append("<item>\n<title>").append(t).append("</title>\n")
        sb.append("<link>https://feed.example/doc").append(id)
          .append("/item").append(i).append("</link>\n")
        sb.append("<pubDate>").append(toRfc822(Base + id * 37 + i * 60))
          .append("</pubDate>\n</item>\n")
        i += 1
      }
      sb.append("</channel>\n")
      if (mode != 3) sb.append("</rss>\n")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> string`: feed format, NULL on refusal. */
case class FeedFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_format"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FeedEval.format(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ff")
      s"""
         |String $res = graft.functions.FeedEval.format($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedFormat =
    copy(child = newChild)
}

/** `binary -> int`: item/entry count. */
case class FeedItems(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_items"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FeedEval.itemCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fi")
      s"""
         |int $res = graft.functions.FeedEval.itemCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedItems =
    copy(child = newChild)
}

/** `binary -> string`: first item's decoded title. */
case class FeedFirstTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FeedEval.firstTitle(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ft")
      s"""
         |String $res = graft.functions.FeedEval.firstTitle($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedFirstTitle =
    copy(child = newChild)
}

/** `binary -> string`: first item's link (attr or text per format). */
case class FeedFirstLink(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_link"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FeedEval.firstLink(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fl")
      s"""
         |String $res = graft.functions.FeedEval.firstLink($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedFirstLink =
    copy(child = newChild)
}

/** `binary -> long`: max item timestamp, epoch seconds. */
case class FeedLatestEpoch(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_latest"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FeedEval.latestEpoch(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fe")
      s"""
         |long $res = graft.functions.FeedEval.latestEpoch($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedLatestEpoch =
    copy(child = newChild)
}

/** `binary -> binary`: LF-joined decoded item titles. */
case class FeedTitles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_titles"

  override protected def nullSafeEval(input: Any): Any =
    FeedEval.titles(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fx")
      s"""
         |byte[] $res = graft.functions.FeedEval.titles($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeedTitles =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q141's synthesis. */
case class FeedSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    FeedEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.FeedEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FeedSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the feed kernels. */
object FeedOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def feedFormat(b: Column): Column = ColumnBridge.column(FeedFormat(bin(b)))
  def feedItems(b: Column): Column = ColumnBridge.column(FeedItems(bin(b)))
  def feedFirstTitle(b: Column): Column =
    ColumnBridge.column(FeedFirstTitle(bin(b)))
  def feedFirstLink(b: Column): Column =
    ColumnBridge.column(FeedFirstLink(bin(b)))
  def feedLatestEpoch(b: Column): Column =
    ColumnBridge.column(FeedLatestEpoch(bin(b)))
  def feedTitles(b: Column): Column = ColumnBridge.column(FeedTitles(bin(b)))

  def feedSynth(text: Column, params: Column): Column =
    ColumnBridge.column(FeedSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
