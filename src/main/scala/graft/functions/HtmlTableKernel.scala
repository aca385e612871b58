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
  *  - the LOGICAL GRID is what extracts, not the tag stream:
  *    `colspan="N"` occupies N columns of the row; `rowspan="N"`
  *    CARRIES the cell DOWN into the next N-1 rows (its text
  *    duplicates into each carried row at its column — the
  *    pandas-read_html semantics a downstream tabular consumer
  *    expects), with later cells flowing around the occupied
  *    columns; the table's width is the max occupied width;
  *  - NESTED tables parse as their own tables (counted, rows
  *    counted) via a table STACK; the inner table's text is EXCLUDED
  *    from the outer cell (the outer cell keeps only its own prose) —
  *    a flat parser either drops the inner rows or bleeds them into
  *    the outer grid;
  *  - cell text: inline tags strip to their content, entities decode
  *    one level via the shared table ([[HtmlEntityEval.decode]]),
  *    whitespace collapses; text outside any cell (captions, stray
  *    prose) contributes nothing.
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

  /** A cell carried down by rowspan: its column, rows still owed, its
    * text, and the colspan it keeps occupying. */
  private final class Carry(val col: Int, var rowsLeft: Int,
                            val text: String, val span: Int)

  /** Parse a span attribute safely: at most 5 digits (an 11+-digit
    * hostile value would throw in toInt), clamped to [1, cap] — the
    * colspan cap (HTML spec clamps at 1000) also bounds the occupied-set
    * fill so colspan="2000000000" can't drive a 2-billion-cell loop. */
  private def spanValue(digits: String, cap: Int): Int = {
    val d = if (digits.length > 5) digits.substring(0, 5) else digits
    math.min(math.max(1, d.toInt), cap)
  }

  private val ColspanPat = java.util.regex.Pattern
    .compile("(?i)colspan\\s*=\\s*[\"']?(\\d+)")
  private val RowspanPat = java.util.regex.Pattern
    .compile("(?i)rowspan\\s*=\\s*[\"']?(\\d+)")

  /** One open table's grid state (stack entry — nested tables parse
    * as their own tables without bleeding into the outer grid). */
  private final class TCtx(val id: Int) {
    var rowOpen = false
    var inCell = false
    val cell = new StringBuilder
    var pendingSpan = 1
    var pendingRowspan = 1
    // the open row's grid: text at its start column + occupied columns
    val rowSlots = scala.collection.mutable.TreeMap.empty[Int, String]
    val occupied = scala.collection.mutable.HashSet.empty[Int]
    var rowSeeded = false
    val carry = scala.collection.mutable.ArrayBuffer.empty[Carry]
    var tableCols = 0
    var tableRows = 0
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
  }

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

    val stack = scala.collection.mutable.ArrayBuffer.empty[TCtx]
    def top: TCtx = stack(stack.length - 1)

    // seed a fresh row from the carried rowspans: each still-owed cell
    // re-occupies its columns and re-emits its text (carry-down)
    def seedRow(t: TCtx): Unit = {
      if (!t.rowSeeded) {
        t.rowSlots.clear(); t.occupied.clear()
        val live = t.carry.filter(_.rowsLeft > 0)
        t.carry.clear(); t.carry ++= live
        t.carry.foreach { cy =>
          t.rowSlots(cy.col) = cy.text
          var c = cy.col
          while (c < cy.col + cy.span) { t.occupied += c; c += 1 }
          cy.rowsLeft -= 1
        }
        t.rowSeeded = true
      }
    }

    def closeCell(t: TCtx): Unit = {
      if (t.inCell) {
        val text = collapse(
          HtmlEntityEval.decode(UTF8String.fromString(t.cell.toString)).toString)
        // place at the lowest free column, flowing around carried cells
        var c = 0
        while (t.occupied.contains(c)) c += 1
        t.rowSlots(c) = text
        var k = c
        while (k < c + t.pendingSpan) { t.occupied += k; k += 1 }
        if (t.pendingRowspan > 1)
          t.carry += new Carry(c, t.pendingRowspan - 1, text, t.pendingSpan)
        t.cell.setLength(0)
        t.inCell = false
      }
    }

    def closeRow(t: TCtx): Unit = {
      closeCell(t)
      if (t.rowOpen) {
        t.lines += t.rowSlots.values.mkString("\t")
        t.tableRows += 1
        if (t.occupied.size > t.tableCols) t.tableCols = t.occupied.size
        t.rowSlots.clear(); t.occupied.clear()
        t.rowOpen = false
        t.rowSeeded = false
      }
    }

    def closeTable(): Unit = {
      if (stack.nonEmpty) {
        val t = top
        closeRow(t)
        rowsTotal += t.tableRows
        if (t.id == 1) { // the OUTERMOST FIRST table in document order
          firstRows = t.tableRows
          firstCols = t.tableCols
          firstCells = t.lines.mkString("\n")
        }
        stack.remove(stack.length - 1)
      }
    }

    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '<') {
        // text flows to the INNERMOST open cell; nested-table prose
        // never bleeds outward
        if (stack.nonEmpty && top.inCell) top.cell.append(c)
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
              tables += 1
              stack += new TCtx(tables)
            } else closeTable()
          case "tr" if stack.nonEmpty =>
            val t = top
            if (!closing) {
              closeRow(t)
              t.rowOpen = true
              seedRow(t)
            } else closeRow(t)
          case "td" | "th" if stack.nonEmpty =>
            val t = top
            if (!closing) {
              closeCell(t)
              if (!t.rowOpen) { t.rowOpen = true; seedRow(t) } // cell implies row
              t.pendingSpan = {
                val m = ColspanPat.matcher(attrs)
                if (m.find()) spanValue(m.group(1), 1000) else 1
              }
              t.pendingRowspan = {
                val m = RowspanPat.matcher(attrs)
                // bound: a hostile rowspan must not carry forever
                if (m.find()) spanValue(m.group(1), 65535) else 1
              }
              t.inCell = true
            } else closeCell(t)
          case _ =>
            () // inline or unknown tag: stripped, content flows on
        }
        i = next
      }
    }
    while (stack.nonEmpty) closeTable() // EOF closes whatever is open
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
    * table (w6/w7); 4 -> the ROWSPAN drill — w0 spans two rows (its
    * text carries down), the last row closes with a colspan pair, so
    * the grid is 3 wide where no single row spells 3 cells;
    * 5 -> a NESTED table inside cell (0,1) — the outer cell keeps
    * only its own prose, the inner counts as its own table.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    sb.append("<html><body><p>prose before ").append(ws(8)).append("</p>\n")
    if (mode == 4) {
      sb.append("<table>\n")
      sb.append("<tr><td rowspan=\"2\">").append(ws(0)).append("</td><td>")
        .append(ws(1)).append("</td></tr>\n")
      sb.append("<tr><td>").append(ws(2)).append("</td></tr>\n")
      sb.append("<tr><td>").append(ws(3)).append("</td><td colspan=\"2\">")
        .append(ws(4)).append("</td></tr>\n")
      sb.append("</table>\n")
    } else if (mode == 5) {
      sb.append("<table>\n")
      sb.append("<tr><td>").append(ws(0)).append("</td><td>before ")
        .append("<table><tr><td>").append(ws(5)).append("</td><td>")
        .append(ws(6)).append("</td></tr></table>")
        .append(" after</td></tr>\n")
      sb.append("<tr><td>").append(ws(2)).append("</td><td>").append(ws(3))
        .append("</td></tr>\n")
      sb.append("</table>\n")
    } else if (mode == 1) {
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
