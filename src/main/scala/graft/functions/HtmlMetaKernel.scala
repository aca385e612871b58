package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Meta-robots + rel=canonical extraction (q154) — the
  * index-eligibility read a crawler applies AFTER fetching (q98/q112
  * gate before; this is the page's own verdict): a `noindex` page
  * must leave the corpus, a `nofollow` page contributes no frontier
  * links, and a `rel=canonical` declaration clusters duplicates
  * under their canonical target (the signal q101's content dedup
  * cannot see when bytes differ). Stated scope, strict about the
  * HTML reality:
  *
  *  - tag/attribute NAMES and the robots token values are
  *    case-insensitive; attribute ORDER is free; values quote with
  *    either quote (a `>` inside a quoted value must not end the
  *    tag);
  *  - the robots content is a comma-separated token list with free
  *    whitespace (`NOINDEX, follow`); unknown tokens are ignored,
  *    never guessed at;
  *  - COMMENTS strip first: a meta spelled inside `<!-- -->` binds
  *    nothing (the classic scraper bug);
  *  - the canonical href entity-decodes one level
  *    ([[HtmlEntityEval.decode]]) and resolves relative forms
  *    against the page origin (q94's resolution ladder: absolute /
  *    protocol-relative / root-relative);
  *  - only the FIRST robots meta and FIRST canonical link bind
  *    (Google's documented tie rule: first wins).
  *
  * Reference scope: scholar-stream filters by metadata flags
  * (reference sql/04_views_curated.sql) — the page-verdict read is
  * the open-web spelling of the same eligibility gate.
  */
object HtmlMetaEval {

  final case class Verdict(noindex: Int, nofollow: Int, canonical: String)

  private val Comment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")

  /** Parse one tag's attributes (quote-aware) into lowercase-name map. */
  private def attrs(s: String, from: Int, to: Int): Map[String, String] = {
    val m = scala.collection.mutable.HashMap[String, String]()
    var i = from
    while (i < to) {
      // attr name
      while (i < to && !s.charAt(i).isLetter) i += 1
      val ns = i
      while (i < to && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
      if (i > ns) {
        val name = s.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        var j = i
        while (j < to && s.charAt(j).isWhitespace) j += 1
        if (j < to && s.charAt(j) == '=') {
          j += 1
          while (j < to && s.charAt(j).isWhitespace) j += 1
          if (j < to && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val e = s.indexOf(q, j + 1)
            if (e >= 0 && e <= to) {
              m(name) = s.substring(j + 1, e)
              i = e + 1
            } else i = to
          } else {
            val vs = j
            while (j < to && !s.charAt(j).isWhitespace) j += 1
            m(name) = s.substring(vs, j)
            i = j
          }
        }
      } else i += 1
    }
    m.toMap
  }

  /** End index of the tag opened at `lt` (quote-aware scan for `>`). */
  private def tagEnd(s: String, lt: Int): Int = {
    var q: Char = 0
    var i = lt
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '\'') q = c
      else if (c == '>') return i
      i += 1
    }
    s.length
  }

  def parse(b: Array[Byte], origin: String): Verdict = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val raw =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val s = Comment.matcher(raw).replaceAll(" ")

    var noindex = 0; var nofollow = 0
    var robotsBound = false
    var canonical: String = null
    var i = s.indexOf('<')
    while (i >= 0) {
      var j = i + 1
      while (j < s.length && s.charAt(j).isLetter) j += 1
      val name = s.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
      val end = tagEnd(s, j)
      if (name == "meta" || name == "link") {
        val a = attrs(s, j, end)
        if (name == "meta" && !robotsBound &&
          a.get("name").exists(_.equalsIgnoreCase("robots"))) {
          robotsBound = true // first robots meta wins
          a.get("content").foreach { c =>
            c.split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT))
              .foreach {
                case "noindex" => noindex = 1
                case "nofollow" => nofollow = 1
                case "none" => noindex = 1; nofollow = 1
                case _ => () // index/follow/unknown: the default stands
              }
          }
        }
        if (name == "link" && canonical == null &&
          a.get("rel").exists(_.equalsIgnoreCase("canonical"))) {
          a.get("href").foreach { h0 =>
            val h = HtmlEntityEval.decode(
              UTF8String.fromString(h0.trim)).toString
            canonical =
              if (h.matches("^[A-Za-z]+://.*")) h
              else if (h.startsWith("//")) "https:" + h
              else if (h.startsWith("/")) origin + h
              else origin + "/" + h
          }
        }
      }
      i = s.indexOf('<', math.max(end, i + 1))
    }
    Verdict(noindex, nofollow, canonical)
  }

  def noindex(b: Array[Byte], origin: UTF8String): Int = {
    val r = parse(b, origin.toString); if (r == null) -1 else r.noindex
  }

  def nofollow(b: Array[Byte], origin: UTF8String): Int = {
    val r = parse(b, origin.toString); if (r == null) -1 else r.nofollow
  }

  def canonical(b: Array[Byte], origin: UTF8String): String = {
    val r = parse(b, origin.toString); if (r == null) null else r.canonical
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q154 page head. `params` packs `doc_id | mode<<40`:
    * 0 -> absolute self-canonical + `index, follow`; 1 -> UPPERCASE
    * `NOINDEX, follow` meta, no canonical; 2 -> attribute-order-
    * swapped RELATIVE canonical to another path + `nofollow`;
    * 3 -> no declarations at all; 4 -> single-quoted entity-escaped
    * self+query canonical AND a commented-out noindex that must bind
    * nothing.
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val host = s"https://site${id % 40}.example.com"
    val self = s"$host/p${id % 20}.html"
    val sb = new StringBuilder
    sb.append("<html><head><title>p").append(id).append("</title>\n")
    mode match {
      case 1 =>
        sb.append("<META NAME=\"Robots\" CONTENT=\"NOINDEX, follow\">\n")
      case 2 =>
        sb.append("<link href=\"/canon/").append(id % 10)
          .append("\" rel=\"canonical\">\n")
        sb.append("<meta content=\"nofollow\" name=\"robots\">\n")
      case 3 =>
        () // silence: the defaults stand
      case 4 =>
        sb.append("<!-- <meta name=\"robots\" content=\"noindex\"> -->\n")
        sb.append("<link rel='canonical' href='/p").append(id % 20)
          .append(".html?ref=a&amp;b'>\n")
      case _ =>
        sb.append("<link rel=\"canonical\" href=\"").append(self)
          .append("\">\n")
        sb.append("<meta name=\"robots\" content=\"index, follow\">\n")
    }
    sb.append("</head><body>page body</body></html>\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `(binary, string origin) -> int`: noindex verdict. */
case class MetaNoindex(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_meta_noindex"

  override protected def nullSafeEval(b: Any, o: Any): Any = {
    val r = HtmlMetaEval.noindex(b.asInstanceOf[Array[Byte]],
      o.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) => {
      val res = ctx.freshName("mn")
      s"""
         |int $res = graft.functions.HtmlMetaEval.noindex($b, $o);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): MetaNoindex =
    copy(left = l, right = r)
}

/** `(binary, string origin) -> int`: nofollow verdict. */
case class MetaNofollow(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_meta_nofollow"

  override protected def nullSafeEval(b: Any, o: Any): Any = {
    val r = HtmlMetaEval.nofollow(b.asInstanceOf[Array[Byte]],
      o.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) => {
      val res = ctx.freshName("mf")
      s"""
         |int $res = graft.functions.HtmlMetaEval.nofollow($b, $o);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): MetaNofollow =
    copy(left = l, right = r)
}

/** `(binary, string origin) -> string`: resolved canonical URL. */
case class MetaCanonical(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_meta_canonical"

  override protected def nullSafeEval(b: Any, o: Any): Any = {
    val r = HtmlMetaEval.canonical(b.asInstanceOf[Array[Byte]],
      o.asInstanceOf[UTF8String])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) => {
      val res = ctx.freshName("mc")
      s"""
         |String $res = graft.functions.HtmlMetaEval.canonical($b, $o);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): MetaCanonical =
    copy(left = l, right = r)
}

/** `long -> binary`: q154's synthesis (params pack `doc_id|mode<<40`). */
case class MetaSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_meta_synth"

  override protected def nullSafeEval(params: Any): Any =
    HtmlMetaEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HtmlMetaEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): MetaSynth =
    copy(child = newChild)
}

/** Column surface for the page-verdict kernels. */
object HtmlMetaOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))
  private def str(c: Column) = ColumnBridge.expression(c.cast("string"))

  def metaNoindex(b: Column, origin: Column): Column =
    ColumnBridge.column(MetaNoindex(bin(b), str(origin)))

  def metaNofollow(b: Column, origin: Column): Column =
    ColumnBridge.column(MetaNofollow(bin(b), str(origin)))

  def metaCanonical(b: Column, origin: Column): Column =
    ColumnBridge.column(MetaCanonical(bin(b), str(origin)))

  def metaSynth(params: Column): Column =
    ColumnBridge.column(MetaSynth(ColumnBridge.expression(params.cast("long"))))
}
