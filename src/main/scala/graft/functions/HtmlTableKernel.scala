package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML table extraction (q147) — the structured-data rung of the
  * page-intake family: q93 strips a page to prose, but TABLES carry
  * the web's relational payload (specs, rankings, schedules) and a
  * training pipeline reads them as rows, not word soup. Stated scope,
  * strict about the grammar HTML actually permits:
  *
  *  - `</tr>`, `</td>`, `</th>` are OPTIONAL (HTML5 omissibility): a
  *    new `<tr>`/`<td>`/`<th>` or the `</table>` implicitly closes
  *    what is open — the classic scraper bug is requiring the close;
  *  - tag names and attributes are case-insensitive; attribute values
  *    may be quoted with either quote (a `>` inside a quoted value
  *    must not end the tag — q93's quote discipline);
  *  - `colspan="N"` widens that row's LOGICAL column count; the
  *    table's width is the max across its rows;
  *  - cell text: inline tags strip to their content, entities decode
  *    one level via the shared table ([[HtmlEntityEval.decode]]),
  *    whitespace collapses; text outside any cell (captions, stray
  *    prose) contributes nothing;
  *  - out of scope, stated: NESTED tables (the synthesizer never
  *    builds one; a real corpus would route them to the quarantine
  *    read), `rowspan` (column accounting only).
  *
  * Reference scope: scholar-stream reads JSON API rows (reference
  * ingestion/openalex_client.py) — table extraction is the open-web
  * spelling of the same structured read, extending q93/q128.
  */
object HtmlTableEval {

  final case class Ht(tables: Int, rows: Int, firstRows: Int,
                      firstCols: Int, firstCells: String)

  private def collapse(s: String): String =
    s.replaceAll("[ \t\r\n]+", " ").trim

  def parse(b: Array[Byte]): Ht = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }

    var tables = 0; var rowsTotal = 0
    var firstRows = 0; var firstCols = 0
    var firstCells: String = null

    var inTable = false
    var inCell = false
    var rowOpen = false
    var rowCols = 0      // logical width of the open row (colspan-summed)
    var tableCols = 0    // max width so far in the open table
    var tableRows = 0
    val cell = new StringBuilder
    val rowCells = scala.collection.mutable.ArrayBuffer[String]()
    val tableLines = scala.collection.mutable.ArrayBuffer[String]()
    var pendingSpan = 1

    def closeCell(): Unit = {
      if (inCell) {
        val text = collapse(
          HtmlEntityEval.decode(UTF8String.fromString(cell.toString)).toString)
        rowCells += text
        rowCols += pendingSpan
        cell.setLength(0)
        inCell = false
      }
    }

    def closeRow(): Unit = {
      closeCell()
      if (rowOpen) {
        tableLines += rowCells.mkString("\t")
        rowCells.clear()
        tableRows += 1
        if (rowCols > tableCols) tableCols = rowCols
        rowCols = 0
        rowOpen = false
      }
    }

    def closeTable(): Unit = {
      closeRow()
      if (inTable) {
        rowsTotal += tableRows
        if (tables == 1) { // the table just closed was the first
          firstRows = tableRows
          firstCols = tableCols
          firstCells = tableLines.mkString("\n")
        }
        tableLines.clear()
        tableRows = 0; tableCols = 0
        inTable = false
      }
    }

    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '<') {
        if (inCell) cell.append(c)
        i += 1
      } else {
        // read tag name
        var j = i + 1
        val closing = j < s.length && s.charAt(j) == '/'
        if (closing) j += 1
        var k = j
        while (k < s.length && s.charAt(k).isLetterOrDigit) k += 1
        val name = s.substring(j, k).toLowerCase(java.util.Locale.ROOT)
        // scan attrs to the real '>' (quote-aware)
        var q: Char = 0
        var e = k
        var done = false
        while (e < s.length && !done) {
          val ch = s.charAt(e)
          if (q != 0) { if (ch == q) q = 0 }
          else if (ch == '"' || ch == '\'') q = ch
          else if (ch == '>') done = true
          if (!done) e += 1
        }
        val attrs = s.substring(k, math.min(e, s.length))
        val next = if (e < s.length) e + 1 else s.length

        name match {
          case "table" =>
            if (!closing) {
              if (!inTable) { tables += 1; inTable = true }
              // nested <table>: out of stated scope; treated as a no-op
            } else closeTable()
          case "tr" if inTable =>
            if (!closing) { closeRow(); rowOpen = true }
            else closeRow()
          case "td" | "th" if inTable =>
            if (!closing) {
              closeCell()
              if (!rowOpen) rowOpen = true // a cell implies a row
              pendingSpan = {
                val m = java.util.regex.Pattern
                  .compile("(?i)colspan\\s*=\\s*[\"']?(\\d+)")
                  .matcher(attrs)
                if (m.find()) math.max(1, m.group(1).toInt) else 1
              }
              inCell = true
            } else closeCell()
          case _ =>
            () // inline or unknown tag: stripped, content flows on
        }
        i = next
      }
    }
    closeTable() // EOF closes whatever is open (truncation-tolerant)
    Ht(tables, rowsTotal, firstRows, firstCols, firstCells)
  }

  def tables(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.tables
  }

  def rows(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.rows
  }

  def firstRows(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null || r.tables == 0) -1 else r.firstRows
  }

  def firstCols(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null || r.tables == 0) -1 else r.firstCols
  }

  /** First table's cells, tab-joined per row, newline-joined rows;
    * null when the page has no table.
    */
  def firstCells(b: Array[Byte]): String = {
    val r = parse(b)
    if (r == null || r.tables == 0) null else r.firstCells
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q147 page from corpus words (>= 10 by corpus
    * contract). `params` packs `doc_id | mode<<40`:
    * 0 -> one fully-closed 3x2 table (th header w0/w1, rows w2/w3
    * and w4/w5) with prose around it; 1 -> the SAME logical table
    * with uppercase tags, omitted `</tr>`/`</td>`, attributes, and
    * a `>` inside a quoted attribute — the omissibility drill;
    * 2 -> a `colspan="2"` header spelling `w0 &amp; w1` plus an
    * inline `<b>` cell; 3 -> class 0's table plus a second 1x2
    * table (w6/w7).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    sb.append("<html><body><p>prose before ").append(ws(8)).append("</p>\n")
    if (mode == 1) {
      sb.append("<TABLE class=\"t>1\" id=\"doc").append(id).append("\">\n")
      sb.append("<TR><TH>").append(ws(0)).append("<TH>").append(ws(1))
        .append("\n")
      sb.append("<TR><TD>").append(ws(2)).append("<TD>").append(ws(3))
        .append("\n")
      sb.append("<TR><TD>").append(ws(4)).append("<TD>").append(ws(5))
        .append("\n")
      sb.append("</TABLE>\n")
    } else if (mode == 2) {
      sb.append("<table>\n")
      sb.append("<tr><th colspan=\"2\">").append(ws(0)).append(" &amp; ")
        .append(ws(1)).append("</th></tr>\n")
      sb.append("<tr><td><b>").append(ws(2)).append("</b></td><td>")
        .append(ws(3)).append("</td></tr>\n")
      sb.append("</table>\n")
    } else {
      sb.append("<table>\n")
      sb.append("<tr><th>").append(ws(0)).append("</th><th>").append(ws(1))
        .append("</th></tr>\n")
      sb.append("<tr><td>").append(ws(2)).append("</td><td>").append(ws(3))
        .append("</td></tr>\n")
      sb.append("<tr><td>").append(ws(4)).append("</td><td>").append(ws(5))
        .append("</td></tr>\n")
      sb.append("</table>\n")
      if (mode == 3) {
        sb.append("<table><tr><td>").append(ws(6)).append("</td><td>")
          .append(ws(7)).append("</td></tr></table>\n")
      }
    }
    sb.append("<p>prose after ").append(ws(9)).append("</p></body></html>\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> int`: top-level table count. */
case class HtTables(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_tables"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlTableEval.tables(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ht")
      s"""
         |int $res = graft.functions.HtmlTableEval.tables($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtTables =
    copy(child = newChild)
}

/** `binary -> int`: row count across all tables. */
case class HtRows(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_table_rows"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlTableEval.rows(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("hr")
      s"""
         |int $res = graft.functions.HtmlTableEval.rows($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtRows =
    copy(child = newChild)
}

/** `binary -> int`: first table's row count, NULL when no table. */
case class HtFirstRows(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_first_rows"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlTableEval.firstRows(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("hf")
      s"""
         |int $res = graft.functions.HtmlTableEval.firstRows($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtFirstRows =
    copy(child = newChild)
}

/** `binary -> int`: first table's colspan-aware width, NULL when none. */
case class HtFirstCols(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_first_cols"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlTableEval.firstCols(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("hc")
      s"""
         |int $res = graft.functions.HtmlTableEval.firstCols($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtFirstCols =
    copy(child = newChild)
}

/** `binary -> string`: first table's cells (tab/newline joined). */
case class HtFirstCells(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_first_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HtmlTableEval.firstCells(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("hx")
      s"""
         |String $res = graft.functions.HtmlTableEval.firstCells($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtFirstCells =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q147's synthesis. */
case class HtSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_table_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    HtmlTableEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.HtmlTableEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HtSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the HTML table kernels. */
object HtmlTableOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def htTables(b: Column): Column = ColumnBridge.column(HtTables(bin(b)))
  def htRows(b: Column): Column = ColumnBridge.column(HtRows(bin(b)))
  def htFirstRows(b: Column): Column = ColumnBridge.column(HtFirstRows(bin(b)))
  def htFirstCols(b: Column): Column = ColumnBridge.column(HtFirstCols(bin(b)))
  def htFirstCells(b: Column): Column = ColumnBridge.column(HtFirstCells(bin(b)))

  def htSynth(text: Column, params: Column): Column =
    ColumnBridge.column(HtSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
