package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BibTeX parsing (q145) — the citation-metadata format of the
  * scholarly corpus (the reference's whole domain is paper metadata:
  * reference ingestion/openalex_client.py ships title/author/year
  * rows; `.bib` is the same record in the format authors actually
  * exchange). Stated scope, strict about the format's real traps:
  *
  *  - entries `@type{key, field = value, ...}`; entry types and field
  *    names are CASE-INSENSITIVE (`@ARTICLE` == `@article`); a
  *    trailing comma before the closing brace is legal;
  *  - values: `{...}` brace-delimited with NESTING (inner braces are
  *    protective — `{w {Spark} w}` reads `w Spark w`), `"..."`
  *    quote-delimited, or bare (numbers, or a macro name defined by
  *    `@string`); parts concatenate with `#`;
  *  - `@string{name = value}` defines a macro and is NOT an entry;
  *    `@comment{...}` is skipped whole;
  *  - `author` splits on the unbraced ` and ` separator (the field's
  *    list grammar — inside a TITLE, ` and ` is prose);
  *  - out of scope, stated: `\"o`-style accent macros inside values
  *    pass through as text (q144 owns TeX), brace-protected ` and `
  *    in author names, crossref resolution.
  */
object BibtexEval {

  final case class Bib(entries: Int, articles: Int, firstKey: String,
                       authors: Int, yearMax: Int, titles: String)

  /** Index just past the balanced `{...}` group starting at `i` (which
    * must point at `{`), or -1 when unbalanced to EOF.
    */
  private def skipGroup(s: String, i: Int): Int = {
    var depth = 0
    var j = i
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '{') depth += 1
      else if (c == '}') {
        depth -= 1
        if (depth == 0) return j + 1
      }
      j += 1
    }
    -1
  }

  /** One value part starting at `i` (brace group, quoted string, or
    * bare word); returns (text, next index) with protective braces
    * stripped and macros resolved, or null when malformed.
    */
  private def part(s: String, i0: Int,
                   macros: scala.collection.Map[String, String]): (String, Int) = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return null
    s.charAt(i) match {
      case '{' =>
        val end = skipGroup(s, i)
        if (end < 0) return null
        (s.substring(i + 1, end - 1).replace("{", "").replace("}", ""), end)
      case '"' =>
        val q = s.indexOf('"', i + 1)
        if (q < 0) return null
        (s.substring(i + 1, q).replace("{", "").replace("}", ""), q + 1)
      case _ =>
        var j = i
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        if (j == i) return null
        val w = s.substring(i, j)
        val v = if (w.forall(_.isDigit)) w else macros.getOrElse(w.toLowerCase, w)
        (v, j)
    }
  }

  /** Full `#`-concatenated value expression starting at `i`. */
  private def value(s: String, i0: Int,
                    macros: scala.collection.Map[String, String]): (String, Int) = {
    val first = part(s, i0, macros)
    if (first == null) return null
    val sb = new StringBuilder(first._1)
    var i = first._2
    var go = true
    while (go) {
      var j = i
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j < s.length && s.charAt(j) == '#') {
        val nxt = part(s, j + 1, macros)
        if (nxt == null) return null
        sb.append(nxt._1)
        i = nxt._2
      } else go = false
    }
    (sb.toString, i)
  }

  def parse(b: Array[Byte]): Bib = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }

    val macros = scala.collection.mutable.HashMap[String, String]()
    var entries = 0; var articles = 0; var authors = 0; var yearMax = -1
    var firstKey: String = null
    val titles = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) != '@') i += 1
      else {
        var j = i + 1
        while (j < s.length && s.charAt(j).isLetter) j += 1
        val kind = s.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j >= s.length || s.charAt(j) != '{') { i = j }
        else if (kind == "comment") {
          val end = skipGroup(s, j)
          i = if (end < 0) s.length else end
        } else if (kind == "string") {
          val end = skipGroup(s, j)
          val stop = if (end < 0) s.length else end - 1
          val eq = s.indexOf('=', j)
          if (eq >= 0 && eq < stop) {
            val name = s.substring(j + 1, eq).trim.toLowerCase(java.util.Locale.ROOT)
            val v = value(s, eq + 1, macros)
            if (v != null && name.nonEmpty) macros(name) = v._1
          }
          i = if (end < 0) s.length else end
        } else {
          // an entry: @kind{key, field = value, ...}
          val end = skipGroup(s, j)
          val stop = if (end < 0) s.length else end - 1
          entries += 1
          if (kind == "article") articles += 1
          var k = j + 1
          val comma = s.indexOf(',', k)
          val keyEnd = if (comma < 0 || comma > stop) stop else comma
          val key = s.substring(k, keyEnd).trim
          if (firstKey == null && key.nonEmpty) firstKey = key
          k = keyEnd + 1
          // field loop
          var more = k < stop
          while (more) {
            val eq = s.indexOf('=', k)
            if (eq < 0 || eq >= stop) more = false
            else {
              val fname = s.substring(k, eq).trim
                .stripPrefix(",").trim.toLowerCase(java.util.Locale.ROOT)
              val v = value(s, eq + 1, macros)
              if (v == null) more = false
              else {
                fname match {
                  case "author" =>
                    val names = v._1.split(" and ").map(_.trim).filter(_.nonEmpty)
                    authors += names.length
                  case "title" => titles += v._1
                  case "year" =>
                    val y = v._1.trim
                    if (y.nonEmpty && y.forall(_.isDigit) && y.length <= 4) {
                      val yi = y.toInt
                      if (yi > yearMax) yearMax = yi
                    }
                  case _ => ()
                }
                k = v._2
                // skip the field separator comma if present
                while (k < stop && (s.charAt(k).isWhitespace || s.charAt(k) == ',')) k += 1
                more = k < stop
              }
            }
          }
          i = if (end < 0) s.length else end
        }
      }
    }
    Bib(entries, articles, firstKey, authors, yearMax, titles.mkString("\n"))
  }

  def entries(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.entries
  }

  def articles(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.articles
  }

  def firstKey(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.firstKey
  }

  def authors(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.authors
  }

  def yearMax(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.yearMax
  }

  /** Newline-joined titles, or null when the file has no entries. */
  def titles(b: Array[Byte]): String = {
    val r = parse(b)
    if (r == null || r.entries == 0) null else r.titles
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q145 `.bib` file from corpus words (>= 10 by corpus
    * contract). `params` packs `doc_id | mode<<40`:
    * 0 -> two plain entries (article + inproceedings), braced and
    * quoted values mixed; 1 -> the SAME records via an `@string`
    * macro, `#` concatenation, case-variant types/fields, and a
    * trailing comma — the grammar-invariance drill; 2 -> a protective
    * nested-brace title plus an `@comment` that must not count;
    * 3 -> bare-number year, a missing author field, trailing comma.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    mode match {
      case 1 =>
        sb.append("@string{jn = \"").append(ws(7)).append(" \"}\n")
        sb.append("@ARTICLE{doc").append(id).append("a,\n")
        sb.append("  AUTHOR = {").append(ws(0)).append(' ').append(ws(1))
          .append(" and ").append(ws(2)).append(' ').append(ws(3)).append("},\n")
        sb.append("  Title = {").append(ws(4)).append(' ').append(ws(5))
          .append(' ').append(ws(6)).append("},\n")
        sb.append("  Journal = jn # \"journal\",\n")
        sb.append("  Year = \"2019\",\n")
        sb.append("}\n")
        sb.append("@InProceedings{doc").append(id).append("b,\n")
        sb.append("  author = {").append(ws(8)).append(" and ").append(ws(9))
          .append("},\n")
        sb.append("  title = \"on ").append(ws(0)).append(" and ").append(ws(1))
          .append("\",\n")
        sb.append("  year = {2021}\n")
        sb.append("}\n")
      case 2 =>
        sb.append("@comment{not an entry, even with author = {x and y}}\n")
        sb.append("@article{doc").append(id).append("a,\n")
        sb.append("  author = {").append(ws(0)).append(' ').append(ws(1))
          .append(" and ").append(ws(2)).append(' ').append(ws(3)).append("},\n")
        sb.append("  title = {").append(ws(4)).append(" {Spark} ").append(ws(6))
          .append("},\n")
        sb.append("  year = {2019}\n")
        sb.append("}\n")
        sb.append("@inproceedings{doc").append(id).append("b,\n")
        sb.append("  author = \"").append(ws(8)).append(" and ").append(ws(9))
          .append("\",\n")
        sb.append("  title = {on ").append(ws(0)).append(" and ").append(ws(1))
          .append("},\n")
        sb.append("  year = {2021}\n")
        sb.append("}\n")
      case 3 =>
        sb.append("@article{doc").append(id).append("a, author = {")
          .append(ws(0)).append(' ').append(ws(1)).append(" and ")
          .append(ws(2)).append(' ').append(ws(3)).append("}, title = {")
          .append(ws(4)).append(' ').append(ws(5)).append(' ').append(ws(6))
          .append("}, year = 1997,}\n")
        sb.append("@misc{doc").append(id).append("b, title = {")
          .append(ws(7)).append(' ').append(ws(8))
          .append("}, year = 2024}\n")
      case _ =>
        sb.append("@article{doc").append(id).append("a,\n")
        sb.append("  author = {").append(ws(0)).append(' ').append(ws(1))
          .append(" and ").append(ws(2)).append(' ').append(ws(3)).append("},\n")
        sb.append("  title = {").append(ws(4)).append(' ').append(ws(5))
          .append(' ').append(ws(6)).append("},\n")
        sb.append("  journal = \"").append(ws(7)).append(" journal\",\n")
        sb.append("  year = {2019}\n")
        sb.append("}\n")
        sb.append("@inproceedings{doc").append(id).append("b,\n")
        sb.append("  author = \"").append(ws(8)).append(" and ").append(ws(9))
          .append("\",\n")
        sb.append("  title = {on ").append(ws(0)).append(" and ").append(ws(1))
          .append("},\n")
        sb.append("  year = {2021}\n")
        sb.append("}\n")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> int`: entry count (`@string`/`@comment` excluded). */
case class BibEntries(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_entries"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.entries(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("be")
      s"""
         |int $res = graft.functions.BibtexEval.entries($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibEntries =
    copy(child = newChild)
}

/** `binary -> int`: `@article` count. */
case class BibArticles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_articles"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.articles(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ba")
      s"""
         |int $res = graft.functions.BibtexEval.articles($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibArticles =
    copy(child = newChild)
}

/** `binary -> string`: first entry's citation key, NULL when none. */
case class BibFirstKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_first_key"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.firstKey(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("bk")
      s"""
         |String $res = graft.functions.BibtexEval.firstKey($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibFirstKey =
    copy(child = newChild)
}

/** `binary -> int`: total author-name count across entries. */
case class BibAuthors(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_authors"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.authors(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("bu")
      s"""
         |int $res = graft.functions.BibtexEval.authors($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibAuthors =
    copy(child = newChild)
}

/** `binary -> int`: max year across entries, NULL when none parsed. */
case class BibYearMax(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_year_max"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.yearMax(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("by")
      s"""
         |int $res = graft.functions.BibtexEval.yearMax($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibYearMax =
    copy(child = newChild)
}

/** `binary -> string`: newline-joined titles, NULL when no entries. */
case class BibTitles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_titles"

  override protected def nullSafeEval(input: Any): Any = {
    val r = BibtexEval.titles(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("bt")
      s"""
         |String $res = graft.functions.BibtexEval.titles($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BibTitles =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q145's synthesis. */
case class BibSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bib_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    BibtexEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.BibtexEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BibSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the BibTeX kernels. */
object BibtexOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def bibEntries(b: Column): Column = ColumnBridge.column(BibEntries(bin(b)))
  def bibArticles(b: Column): Column = ColumnBridge.column(BibArticles(bin(b)))
  def bibFirstKey(b: Column): Column = ColumnBridge.column(BibFirstKey(bin(b)))
  def bibAuthors(b: Column): Column = ColumnBridge.column(BibAuthors(bin(b)))
  def bibYearMax(b: Column): Column = ColumnBridge.column(BibYearMax(bin(b)))
  def bibTitles(b: Column): Column = ColumnBridge.column(BibTitles(bin(b)))

  def bibSynth(text: Column, params: Column): Column =
    ColumnBridge.column(BibSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
