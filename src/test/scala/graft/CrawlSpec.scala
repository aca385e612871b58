package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Crawl

/** Crawl-intake family: q93 HTML extraction and q94 link→frontier.
  *
  * The oracles already hash-match both queries end-to-end; these tests pin
  * the BEHAVIOR — each planted trap individually (a regression that
  * changed both engines' shared spelling identically would still hash-
  * match, so the traps are asserted against hand-derived expectations
  * here, the q82/WarcSpec discipline).
  */
class CrawlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // NOT cached: a cached plan would satisfy PlanAuditSpec's later build
  // of the same query from the cache manager, hiding the join/exchange
  // nodes its pins assert on (suite-order poisoning)
  private lazy val q93 =
    Crawl.q93HtmlExtract(spark, TestSpark.Sf0001).localCheckpoint()

  test("q93: body script content never leaks into the extracted text") {
    // every id%3!=2 page embeds <script>var s="</div> <p>no</p>";</script>
    // in the BODY — tag-strip without script-strip leaks the string body
    val leaked = q93.where(col("text_clean").contains("var s=") ||
      col("text_clean").contains("</div>")).count()
    assert(leaked === 0)
  }

  test("q93: quoted '>' inside an attribute does not truncate the tag") {
    // id%5==1 pages carry <p data-note="a>b">edge &lt;kept&gt;</p>; the
    // naive <[^>]*> regex stops at the quoted '>' and leaks `b">`
    val rows = q93.where(col("doc_id") % 5 === 1 && col("well_formed") === 1)
    assert(rows.where(col("text_clean").contains("b\">")).count() === 0)
    // entity decode runs AFTER tag strip: `edge <kept>` must survive as
    // text (decode-first would turn &lt;kept&gt; into a strippable tag)
    assert(rows.where(!col("text_clean").contains("edge <kept>")).count() === 0)
  }

  test("q93: &amp;lt; decodes single-pass to &lt;, never double to <") {
    // title is `Doc N: w1 &amp;lt;tag` — correct order (named entities
    // first, &amp; last) yields the literal `&lt;tag`
    val titles = q93.select("title").collect().map(_.getString(0))
    assert(titles.forall(_.endsWith("&lt;tag")))
    assert(!titles.exists(_.endsWith(" <tag")))
  }

  test("q93: entity chain decodes the full named set in body text") {
    val t = q93.where(col("doc_id") === 2) // 2%7==2 carries the long chain
      .select("text_clean").head().getString(0)
    assert(t.contains("AT&T 1 < 2 end 'q' \"qq\""), t)
  }

  test("q93: headless %9==5 pages are well_formed=0 with NULL body columns") {
    val bad = q93.where(col("doc_id") % 9 === 5)
    assert(bad.count() > 0)
    assert(bad.where(col("well_formed") =!= 0).count() === 0)
    assert(bad.where(col("text_clean").isNotNull || col("n_links").isNotNull ||
      col("n_chars_clean").isNotNull).count() === 0)
    // the head survives the broken body: title still extracted
    assert(bad.where(col("title").isNull).count() === 0)
  }

  test("q93: n_links counts exactly the two nav anchors on well-formed pages") {
    assert(q93.where(col("well_formed") === 1 && col("n_links") =!= 2)
      .count() === 0)
  }

  test("q93: unknown entities pass through untouched (htmlExtract unit)") {
    val df = spark.range(1).select(lit(7L).as("doc_id"),
      lit("<html><head><title>T</title></head><body><p>x &weird; y &amp;copy;</p></body></html>")
        .as("html"))
    val r = Crawl.htmlExtract(df).head()
    assert(r.getAs[String]("text_clean") === "x &weird; y &copy;")
  }

  private lazy val q94 =
    Crawl.q94LinkFrontier(spark, TestSpark.Sf0001).localCheckpoint()

  test("q94: self and previous-page links are already_fetched") {
    // id%8==6 links to its own page; id%9==2 links to page (id-1)
    val self = q94.where(col("doc_id") % 8 === 6 &&
      col("href").startsWith("https://site") && col("href").contains("/page"))
    assert(self.count() > 0)
    assert(self.where(col("already_fetched") =!= 1 || col("keep") =!= 0)
      .count() === 0)
    val prev = q94.where(col("doc_id") % 9 === 2 && col("doc_id") > 0 &&
      col("href").contains("/page"))
    assert(prev.count() > 0)
    assert(prev.where(col("already_fetched") =!= 1).count() === 0)
  }

  test("q94: skip classes carry a reason and NULL frontier verdicts") {
    val skipped = q94.where(col("skip_reason").isNotNull)
    assert(skipped.select("skip_reason").distinct().collect()
      .map(_.getString(0)).toSet === Set("fragment", "mailto", "javascript"))
    assert(skipped.where(col("resolved_url").isNotNull ||
      col("already_fetched").isNotNull || col("keep").isNotNull).count() === 0)
  }

  test("q94: resolution covers the RFC 3986 reference classes") {
    val r5 = q94.where(col("doc_id") === 5).collect()
      .map(r => r.getAs[String]("href") -> r.getAs[String]("resolved_url")).toMap
    assert(r5("/r/5") === "https://site5.example.com/r/5")
    assert(r5("sub/p0.html") === "https://site5.example.com/a/5/sub/p0.html")
    assert(r5("https://site8.example.com/x/5") === "https://site8.example.com/x/5")
    // 5%4==1: the messy absolute link resolves as-is, canonicalizes clean
    val messy = q94.where(col("doc_id") === 5 && col("href").startsWith("HTTPS://"))
      .head()
    val canon = messy.getAs[String]("canonical_url")
    assert(canon === "https://site10.example.com/y/1?id=2", canon)
  }

  test("q94: protocol-relative links inherit https") {
    val cdn = q94.where(col("href").startsWith("//cdn"))
    assert(cdn.count() > 0)
    assert(cdn.where(!col("canonical_url").startsWith("https://cdn"))
      .count() === 0)
  }

  test("q96: in-driver rank rounds equal the distributed loop bit-for-bit") {
    // r18: host/edge tables within the local caps run the five power-
    // iteration rounds in-driver; the integer arithmetic must reproduce
    // the distributed loop's exact floors on every host
    val local = Crawl.q96LinkRank(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    spark.conf.set("spark.graft.rank.localHostMax", "0")
    val dist = try Crawl.q96LinkRank(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    finally spark.conf.unset("spark.graft.rank.localHostMax")
    assert(local.toSeq === dist.toSeq)
  }

  test("q96: rank mass conserves within floor slack; dangling hosts still earn rank") {
    val r = Crawl.q96LinkRank(spark, TestSpark.Sf0001).collect()
    val n = r.length
    assert(n > 40) // site hosts + the cdn targets
    val total = r.map(_.getAs[Long]("rank_p5")).sum
    // every floor division drops < 1 pico per host/edge per round; after
    // 5 rounds the loss is bounded far under 0.1% of total mass
    assert(total <= 1000000000000L, s"mass exceeded 1.0: $total")
    assert(total > 999000000000L, s"mass leaked: $total")
    // cdn hosts appear only as link targets: dangling (out_deg 0) but
    // linked-to, so they must hold MORE than the teleport floor
    val base = 150000000000L / n
    val cdn = r.filter(_.getAs[String]("host").startsWith("cdn"))
    assert(cdn.nonEmpty)
    assert(cdn.forall(_.getAs[Long]("out_deg") === 0L))
    assert(cdn.forall(_.getAs[Long]("rank_p5") > base))
    // nobody falls below the teleport floor
    assert(r.forall(_.getAs[Long]("rank_p5") >= base))
  }

  test("q97: transport failure and content defect are distinct verdicts") {
    val r = Crawl.q97CrawlIntake(spark, TestSpark.Sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val id = row.getLong(0)
      val fetchFail = id % 13 == 9
      val headless = id % 9 == 5
      assert(row.getAs[Int]("fetch_ok") === (if (fetchFail) 0 else 1), s"doc $id")
      if (fetchFail) {
        // the stop-don't-guess stance propagates through all three
        // kernels: nothing downstream of a failed fetch is guessed
        assert(row.isNullAt(row.fieldIndex("uri")), s"doc $id")
        assert(row.isNullAt(row.fieldIndex("payload_md5")), s"doc $id")
        assert(row.isNullAt(row.fieldIndex("well_formed")), s"doc $id")
        assert(row.isNullAt(row.fieldIndex("text_clean")), s"doc $id")
      } else {
        assert(row.getAs[String]("uri") ===
          s"https://site${id % 40}.example.com/a/${id % 20}/page$id.html")
        // content defect: transport fine, page graded broken
        assert(row.getAs[Int]("well_formed") === (if (headless) 0 else 1), s"doc $id")
        if (!headless) assert(row.getAs[String]("text_clean") != null, s"doc $id")
      }
    }
  }

  private lazy val q98 =
    Crawl.q98RobotsGate(spark, TestSpark.Sf0001).localCheckpoint()

  test("q98: a graftbot group blocks wholesale and is never merged with *") {
    // hosts h%7==3 carry `graftbot: Disallow /`; RFC 9309 takes the most
    // specific UA group WHOLE — even a URL the * group would judge by
    // /r/ must match '/' here
    val gbHosts = (0 until 40).filter(_ % 7 == 3)
      .map(h => s"site$h.example.com").toSet
    val rows = q98.collect().filter(r => gbHosts(r.getAs[String]("host")))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("allowed") === 0, r.toString)
      assert(r.getAs[String]("matched_rule") === "/", r.toString)
      // the selected group has no delay, so none is reported
      assert(r.isNullAt(r.fieldIndex("crawl_delay")), r.toString)
    }
  }

  test("q98: longest-match allow overrides a shorter disallow") {
    // h in {9,21,33}: disallow /r/ (h%3==0) AND allow /r/{h%10} (h%4==1)
    val r9 = q98.collect().filter(r =>
      r.getAs[String]("host") === "site9.example.com" &&
        r.getAs[String]("path").startsWith("/r/"))
    assert(r9.nonEmpty)
    r9.foreach { r =>
      assert(r.getAs[Int]("allowed") === 1, r.toString)
      assert(r.getAs[String]("matched_rule") === "/r/9", r.toString)
    }
    // h=6: disallow /r/ with no carve-out (6%4!=1, 6%7!=3) -> blocked
    val r6 = q98.collect().filter(r =>
      r.getAs[String]("host") === "site6.example.com" &&
        r.getAs[String]("path").startsWith("/r/"))
    assert(r6.nonEmpty)
    r6.foreach { r =>
      assert(r.getAs[Int]("allowed") === 0, r.toString)
      assert(r.getAs[String]("matched_rule") === "/r/", r.toString)
    }
  }

  test("q98: rule-less hosts are allowed with NULL evidence; delays ride *") {
    val cdn = q98.collect().filter(_.getAs[String]("host").startsWith("cdn"))
    assert(cdn.nonEmpty)
    cdn.foreach { r =>
      assert(r.getAs[Int]("allowed") === 1)
      assert(r.isNullAt(r.fieldIndex("matched_rule")))
      assert(r.isNullAt(r.fieldIndex("crawl_delay")))
    }
    // an even non-graftbot host reports its *-group delay h%5+1
    val r6 = q98.collect().filter(_.getAs[String]("host") === "site6.example.com")
    assert(r6.nonEmpty)
    r6.foreach(r => assert(r.getAs[Int]("crawl_delay") === 6 % 5 + 1))
  }

  test("q98: an equal-length Allow beats Disallow (robotsJudge drill)") {
    import spark.implicits._
    val urls = Seq("https://tie.example.com/p/x").toDF("canonical_url")
    val rules = Seq(
      ("tie.example.com", "*", "allow", "/p/"),
      ("tie.example.com", "*", "disallow", "/p/"))
      .toDF("rhost", "ua", "rtype", "prefix")
    val r = Crawl.robotsJudge(urls, rules).head()
    assert(r.getAs[String]("rule_type") === "allow")
    assert(r.getAs[String]("matched_rule") === "/p/")
  }

  test("q99: the body splits on the FIRST separator; headers parse per spec") {
    val docs = spark.read.parquet(TestSpark.Sf0001 + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Crawl.q99HttpEnvelope(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      (id % 10) match {
        case 7 =>
          assert(r.getAs[Int]("has_envelope") === 0)
          assert(r.isNullAt(r.fieldIndex("status")) &&
            r.isNullAt(r.fieldIndex("body_md5")), s"doc $id")
        case 3 =>
          assert(r.getAs[Int]("status") === 301)
          // Location keeps its case: URL paths are case-sensitive
          assert(r.getAs[String]("location").contains("/Moved/"), s"doc $id")
        case 4 =>
          // lowercase header spelling still parses (case-insensitive names)
          assert(r.getAs[Int]("status") === 404)
          assert(r.getAs[String]("content_type") === "text/plain")
          // the body embeds another \r\n\r\n: split-on-first keeps it
          assert(r.getAs[Long]("body_len") === "not here\r\n\r\nx".length.toLong)
        case _ =>
          assert(r.getAs[Int]("status") === 200)
          // parameters stripped from the media type
          assert(r.getAs[String]("content_type") === "text/html", s"doc $id")
          assert(r.getAs[Long]("body_len") ===
            (docs(id).getBytes("UTF-8").length + "\r\n\r\ntail".length +
              (id % 5).toString.length).toLong, s"doc $id")
      }
    }
  }

  test("q103: CDATA strips, entities decode once, truncation refuses") {
    val rows = Crawl.q103SitemapIngest(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    // no CDATA wrapper, padding whitespace, or raw &amp; survives into loc
    val locs = rows.flatMap(r => Option(r.getAs[String]("loc")))
    assert(locs.nonEmpty)
    assert(!locs.exists(l => l.contains("CDATA") || l.contains("]]>")), "CDATA leaked")
    assert(!locs.exists(l => l.contains("\n") || l.startsWith(" ") || l.endsWith(" ")),
      "padding survived the trim")
    assert(!locs.exists(_.contains("&amp;")), "double-escaped ampersand")
    // the escaped-ampersand class decodes to a real query separator
    assert(locs.exists(_.contains("?a=1&b=2")))
    // truncated sitemaps: ok=0, every entry column NULL
    val bad = rows.filter(_.getLong(0) % 9 == 6)
    assert(bad.nonEmpty)
    bad.foreach { r =>
      assert(r.getAs[Int]("sitemap_ok") === 0)
      assert(r.isNullAt(r.fieldIndex("loc")) &&
        r.isNullAt(r.fieldIndex("entry_idx")), r.toString)
    }
    // optional lastmod: the (id+idx)%4==0 class reports NULL, not ""
    val noMod = rows.filter(r => !r.isNullAt(r.fieldIndex("entry_idx")) &&
      (r.getLong(0) + r.getAs[Int]("entry_idx")) % 4 == 0)
    assert(noMod.nonEmpty)
    assert(noMod.forall(_.isNullAt(rows.head.fieldIndex("lastmod"))))
    // canonical column is frontier-joinable (idempotent canonical form)
    val canons = rows.flatMap(r => Option(r.getAs[String]("canonical_url")))
    assert(canons.forall(c => c.startsWith("https://site") && !c.contains("CDATA")))
  }

  test("q105: every recrawl class lands in its verdict with the right evidence") {
    val rows = Crawl.q105CrawlDiff(spark, TestSpark.Sf0001).collect()
    val byVerdict = rows.groupBy(_.getAs[String]("verdict"))
    assert(byVerdict.keySet === Set("new", "gone", "changed", "unchanged"))
    byVerdict("gone").foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("old_md5")) &&
        r.isNullAt(r.fieldIndex("new_md5")) && r.getAs[Int]("revisit") === 0)
    }
    byVerdict("new").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("old_md5")) &&
        !r.isNullAt(r.fieldIndex("new_md5")) && r.getAs[Int]("revisit") === 0)
    }
    byVerdict("changed").foreach(r =>
      assert(r.getAs[String]("old_md5") !== r.getAs[String]("new_md5")))
    // the revisit bit is exactly the unchanged class — what a WARC writer
    // would emit as revisit records instead of full bodies
    byVerdict("unchanged").foreach { r =>
      assert(r.getAs[String]("old_md5") === r.getAs[String]("new_md5"))
      assert(r.getAs[Int]("revisit") === 1)
    }
  }

  test("q106: the main text block keeps; nav, headings and footers die per page") {
    import spark.implicits._
    val docs = spark.read.parquet(TestSpark.Sf0001 + "/documents.parquet")
      .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("t"))
      .as[(Long, String)].collect().toMap
    val rows = Crawl.q106ContentBlocks(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    // nav blocks are nearly all link text: never kept
    rows.filter(_.getAs[String]("block_text").contains("Home")).foreach { r =>
      assert(r.getAs[Int]("keep") === 0, r.toString)
      assert(r.getAs[Long]("n_link_chars") > 0, r.toString)
    }
    // footer blocks are short: never kept
    rows.filter(_.getAs[String]("block_text").startsWith("(c) site"))
      .foreach(r => assert(r.getAs[Int]("keep") === 0, r.toString))
    // every well-formed page keeps its main paragraph, and the kept text
    // IS the document's own text (whitespace-normalized)
    val kept = rows.filter(_.getAs[Int]("keep") == 1)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[String]("block_text")))
    docs.keys.filter(id => id % 9 != 5 && docs(id).length >= 25).foreach { id =>
      val k = kept.getOrElse(id, Array.empty[String])
      assert(k.contains(docs(id)), s"doc $id main block not kept: ${k.toSeq}")
    }
  }

  test("q94: exactly one keep per unfetched canonical, none per fetched") {
    val agg = q94.where(col("skip_reason").isNull)
      .groupBy("canonical_url")
      .agg(sum("keep").as("n_keep"), max("already_fetched").as("fetched"))
    assert(agg.where(col("fetched") === 0 && col("n_keep") =!= 1).count() === 0)
    assert(agg.where(col("fetched") === 1 && col("n_keep") =!= 0).count() === 0)
  }

  test("graft_dechunk walks hand-built chunked streams byte-exactly") {
    import graft.functions.HttpEval
    def d(s: String): Array[Byte] =
      HttpEval.dechunk(s.getBytes("ISO-8859-1"))
    def str(b: Array[Byte]): String =
      if (b == null) null else new String(b, "ISO-8859-1")
    // two chunks, mixed-case hex, extension skipped
    assert(str(d("5\r\nhello\r\nA;x=1\r\n 0123-wxyz\r\n0\r\n\r\n")) ===
      "hello 0123-wxyz")
    // uppercase hex + trailer fields consumed and discarded
    assert(str(d("B\r\nhello world\r\n0\r\nX-Sum: ok\r\nX-Tail: 2\r\n\r\n")) ===
      "hello world")
    // empty body: just the terminator
    assert(str(d("0\r\n\r\n")) === "")
    // refusals: no hex where a size must be, bare-LF size line,
    // truncated data, truncated terminator, trailing garbage after the
    // terminator, unterminated trailer
    assert(d("zz\r\nhi\r\n0\r\n\r\n") === null)
    assert(d("5\nhello\r\n0\r\n\r\n") === null)
    // a bare LF hidden INSIDE a chunk extension must refuse too — the
    // size line ended without CRLF, not an extension byte to consume
    assert(d("5;x\njunk\r\nhello\r\n0\r\n\r\n") === null)
    assert(d("9\r\nhello\r\n0\r\n\r\n") === null)
    assert(d("5\r\nhello\r\n0\r\n") === null)
    assert(d("5\r\nhello\r\n0\r\n\r\nEXTRA") === null)
    assert(d("5\r\nhello\r\n0\r\nX-Sum: ok\r\n") === null)
    // a chunk whose data EMBEDS a size-looking line must pass through
    // verbatim — length-driven walking, never pattern matching
    assert(str(d("8\r\n2\r\nab\r\n0\r\n0\r\n\r\n")) === "2\r\nab\r\n0")
  }

  test("charset sniff kernel: strict UTF-8 scan, SJIS structure, 1252 fallback") {
    import graft.functions.CharsetEval._
    def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // strict RFC 3629: shapes, overlongs, surrogates, the ceiling
    assert(utf8Valid("plain ascii".getBytes("UTF-8")))
    assert(utf8Valid("café カ 😀".getBytes("UTF-8")))
    assert(!utf8Valid(bs(0xC0, 0x80))) // overlong NUL (modified UTF-8)
    assert(!utf8Valid(bs(0xE0, 0x80, 0x80))) // overlong 3-byte
    assert(!utf8Valid(bs(0xED, 0xA0, 0x80))) // UTF-16 surrogate D800
    assert(!utf8Valid(bs(0xF4, 0x90, 0x80, 0x80))) // above U+10FFFF
    assert(!utf8Valid(bs(0x80))) // bare continuation
    assert(!utf8Valid(bs(0xC3))) // truncated tail
    // SJIS structure: pairs and half-width singles parse, and at least
    // one double-byte pair is required as positive evidence
    assert(sjisPlausible(bs('a', 0x83, 0x4A, 0x20, 0x93, 0xFA)))
    assert(!sjisPlausible(bs(0xB1, 0xB2))) // katakana singles only: no pair
    assert(!sjisPlausible(bs(0x97, 0x20))) // 1252 em dash before space
    assert(!sjisPlausible(bs(0x83))) // truncated pair
    assert(!sjisPlausible(bs(0xA0, 0x40))) // 0xA0 is not a CP932 lead
    // the classifier walks the rungs in order
    assert(sniff("ascii".getBytes("UTF-8")).toString === "utf-8")
    assert(sniff("café".getBytes("UTF-8")).toString === "utf-8")
    assert(sniff(bs('a', 0x83, 0x4A)).toString === "shift_jis")
    assert(sniff(bs('a', 0x20, 0x97, 0x20, 'b')).toString === "windows-1252")
    // windows-1252 punctuation that HAPPENS to parse as SJIS pairs needs
    // the structural rule stated honestly: 0x93 'q' is a legal pair, so
    // a quote-before-letter alone classifies SJIS — the sniffer's
    // documented ambiguity; the em-dash-before-space byte is what keeps
    // real 1252 prose out of it
    assert(sniff(bs(0x93, 'q')).toString === "shift_jis")
    // decode rung: the legacy charsets ANSI Spark refuses
    assert(decodeAs(bs(0x93, 'q', 0x94), com("windows-1252")).toString ===
      "“q”")
    assert(decodeAs(bs(0x83, 0x4A), com("shift_jis")).toString === "カ")
    assert(decodeAs(bs('a'), com("no-such-charset")) === null)
  }

  test("charset sniff kernel: BOM-less UTF-16 by one-sided zero pattern") {
    import graft.functions.CharsetEval._
    def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // the rung must fire BEFORE the UTF-8 scan: NUL bytes are valid
    // UTF-8, so UTF-16LE ascii would otherwise classify utf-8
    assert(sniff("hello utf".getBytes("UTF-16LE")).toString === "utf-16le")
    assert(sniff("hello utf".getBytes("UTF-16BE")).toString === "utf-16be")
    // an accented char (é = E9 00 LE) keeps the odd side zero-dominant
    assert(sniff("héllo wörld".getBytes("UTF-16LE")).toString === "utf-16le")
    // plain UTF-8 has no zeros: the pattern must NOT fire
    assert(sniff("plain ascii text".getBytes("UTF-8")).toString === "utf-8")
    // CJK UTF-16 has no zero bytes either — undetected, falls through
    // (stated scope: the premise is one-sided zeros)
    assert(sniff("日本語テキスト".getBytes("UTF-16LE")).toString !== "utf-16le")
    // too short / odd length / zeros on both sides: no verdict
    assert(utf16Pattern("ab".getBytes("UTF-16LE")) === 0)
    assert(utf16Pattern(bs('a', 0, 'b', 0, 'c', 0, 'd')) === 0)
    assert(utf16Pattern(bs(0, 'a', 'b', 0, 0, 'c', 'd', 0)) === 0)
    // strict decode: a lone high surrogate REPORTs instead of U+FFFD
    val lone = "ok text here".getBytes("UTF-16LE") ++ bs(0x35, 0xD8)
    assert(sniff(lone).toString === "utf-16le")
    assert(decodeAs(lone, com("utf-16le")) === null)
    assert(decodeAs("round trip".getBytes("UTF-16BE"), com("utf-16be"))
      .toString === "round trip")
  }

  private def com(s: String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  test("q112 parser reproduces q98's rule table from the raw files") {
    // the round-trip that LETS the gate consume the parser (and since
    // r13 it DOES — q98/q107 judge against parsedRobotsRules, the same
    // parse pipeline): parsing the residue-encoded robots.txt files must
    // yield EXACTLY the synthesized rule table — same hosts, UAs, types,
    // prefixes. The extra
    // file content (comments, Crawl-delay, unknown directives, sitemap
    // lines, the empty Disallow, the extrabot group) must all stay out.
    val parsed = graft.operators.Crawl
      .q112RobotsParse(spark, TestSpark.Sf0001)
      .where(col("rtype").isin("allow", "disallow") &&
        col("ua").isin("*", "graftbot"))
      .select(col("host"), col("ua"), col("rtype"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    val table = graft.operators.Crawl.robotsRules(spark)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    assert(table.nonEmpty)
    assert(parsed === table,
      s"parser/table drift:\n only parsed: ${parsed -- table}\n only table: ${table -- parsed}")
    // and the parsed crawl delays match q98's residue spelling
    val delays = graft.operators.Crawl
      .q112RobotsParse(spark, TestSpark.Sf0001)
      .where(col("rtype") === "crawl_delay")
      .select(col("host"), col("ua"), col("delay_sec"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val expected = (0 until 40).filter(_ % 2 == 0)
      .map(hh => (s"site$hh.example.com", "*", hh % 5 + 1)).toSet
    assert(delays === expected)
  }

  test("q178: local finish equals the distributed spelling row-for-row") {
    // the r19 local-finish gate (spark.graft.graph.localEdgeMax): the
    // CC/BPE/q96 equality discipline — same integers from both regimes
    val local = graft.operators.Crawl
      .q178HostGraph(spark, TestSpark.Sf0001).collect()(0)
    spark.conf.set("spark.graft.graph.localEdgeMax", "0")
    val dist = try graft.operators.Crawl
      .q178HostGraph(spark, TestSpark.Sf0001).collect()(0)
    finally spark.conf.unset("spark.graft.graph.localEdgeMax")
    assert(local.toSeq === dist.toSeq,
      s"local $local vs distributed $dist")
  }

  test("q178: degree-ordered triangle count equals the brute-force " +
    "recount, with the hub present and out-wedge-free") {
    val row = graft.operators.Crawl
      .q178HostGraph(spark, TestSpark.Sf0001).collect()(0)
    val nTri = row.getAs[Long]("n_triangles")
    // brute force over the SAME edges: undirected set, all {a,b,c}
    // with a < b < c lexicographic — orientation-free ground truth
    val edges = graft.operators.Crawl.hostEdges(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val und = edges.map { case (s, d) =>
      if (s < d) (s, d) else (d, s)
    }.toSet
    val hosts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- hosts.indices
      j <- (i + 1) until hosts.length
      if und.contains((hosts(i), hosts(j)))
      k <- (j + 1) until hosts.length
      if und.contains((hosts(j), hosts(k))) &&
        und.contains((hosts(i), hosts(k)))
    } brute += 1
    assert(nTri === brute, s"engine $nTri vs brute-force $brute")
    // the hub residue is live: every site links it, so its degree is
    // the maximum — degree ordering must give it ZERO out-edges (the
    // property that kills the degree-squared wedge blowup)
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (h, xs) => (h, xs.size) }
    val hubDeg = deg("site3hub.example.com")
    assert(hubDeg === deg.values.max, s"hub degree $hubDeg not maximal")
    // and the hub participates in triangles (one per site-site edge
    // between its neighbors), so the fix is observable
    assert(nTri > 0L)
    // hub-centered wedges under LEXICOGRAPHIC orientation (the old
    // spelling): edges below x hub x edges above — nonzero by
    // construction, so the hot case this graph now exercises is real
    val below = und.count(_._2 == "site3hub.example.com")
    val above = und.count(_._1 == "site3hub.example.com")
    assert(below > 0 && above > 0,
      s"hub must sort mid-range (below=$below above=$above)")
  }

  test("q107 host rank: the two-phase range spelling reproduces the dim " +
    "window exactly (the 1e8-host swap-in, values pinned)") {
    val prio = Crawl.q96LinkRank(spark, TestSpark.Sf0001)
      .select(col("host").as("rank_host"), col("rank_p5"))
      .localCheckpoint()
    def run(): Map[String, Int] = {
      Crawl.hostPriority(spark, prio).collect()
        .map(r => r.getString(0) -> r.getInt(2)).toMap
    }
    val dimWindow = run()
    spark.conf.set("graft.crawl.estimatedHosts", "200000000")
    val twoPhase =
      try run()
      finally spark.conf.unset("graft.crawl.estimatedHosts")
    assert(dimWindow.nonEmpty)
    assert(twoPhase === dimWindow)
    // and through the full query: host_priority column agrees
    spark.conf.set("graft.crawl.estimatedHosts", "200000000")
    val full =
      try Crawl.q107FetchSchedule(spark, TestSpark.Sf0001)
        .select("host", "host_priority").distinct().collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      finally spark.conf.unset("graft.crawl.estimatedHosts")
    full.foreach { case (h, p) =>
      assert(dimWindow.get(h).contains(p), s"host $h priority drifted")
    }
  }
}
