package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** RFC 9112 §7.1 chunked transfer-coding decode — the OTHER wire framing
  * beside q99's Content-Length envelope (servers that stream responses
  * chunk them; a crawler that cannot de-chunk reads hex size lines as
  * body text): each chunk is `hex-size [;extension] CRLF data CRLF`,
  * terminated by a zero-size chunk, optional trailer fields, and a blank
  * line.
  *
  * Decode stance is the q82/q95 stop-don't-guess: a size line with no
  * hex digits, a missing CRLF after size or data, chunk data running
  * past the payload, an unterminated trailer, or ANY bytes after the
  * final blank line each yield NULL — never a half-decoded guess. Hex
  * sizes parse case-insensitively (servers emit both), chunk extensions
  * (`;name=value`) are skipped per spec, trailer lines are consumed and
  * discarded.
  */
object HttpEval {
  def dechunk(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(b.length)
    var p = 0
    while (true) {
      var size = 0L
      var digits = 0
      var q = p
      var more = true
      while (q < b.length && more) {
        val d = Character.digit((b(q) & 0xFF).toChar, 16)
        if (d >= 0 && digits < 8) { size = size * 16 + d; digits += 1; q += 1 }
        else more = false
      }
      if (digits == 0) return null // a size line must start with hex
      if (q < b.length && b(q) == ';') { // chunk extension: skip to CR
        while (q < b.length && b(q) != '\r') {
          // a bare LF (or any control byte) inside the extension means
          // the size line ended without CRLF — framing lied, refuse
          if ((b(q) & 0xFF) < 0x20) return null
          q += 1
        }
      }
      if (q + 1 >= b.length || b(q) != '\r' || b(q + 1) != '\n') return null
      q += 2
      if (size == 0) {
        // trailer section: zero or more field lines, then the blank line
        while (true) {
          if (q + 1 < b.length && b(q) == '\r' && b(q + 1) == '\n') {
            // strict: the terminator must END the payload — trailing
            // garbage means the framing lied
            return if (q + 2 == b.length) out.toByteArray else null
          }
          val start = q
          while (q < b.length && b(q) != '\r') q += 1
          if (q == start || q + 1 >= b.length || b(q + 1) != '\n') return null
          q += 2
        }
      }
      if (q + size + 2 > b.length) return null // truncated chunk data
      out.write(b, q, size.toInt)
      q += size.toInt
      if (b(q) != '\r' || b(q + 1) != '\n') return null
      p = q + 2
    }
    null // unreachable
  }

  /** Byte offset of the first `\r\n\r\n`, or -1 when absent. */
  def headerEnd(b: Array[Byte]): Int = {
    if (b == null) return -1
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}

/** `binary -> int`: byte offset of the first `\r\n\r\n` header/body
  * separator (0-based offset OF the separator), or NULL when absent —
  * the BYTE-level split an envelope with a non-UTF-8 body needs (casting
  * UTF-16 payload bytes through a string to find the separator mangles
  * every byte the decoder later depends on).
  */
case class HttpHeaderEnd(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_sep"

  override protected def nullSafeEval(input: Any): Any = {
    val r = HttpEval.headerEnd(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sep")
      s"""
         |int $res = graft.functions.HttpEval.headerEnd($bytes);
         |if ($res < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HttpHeaderEnd =
    copy(child = newChild)
}

/** `binary -> binary`: chunked transfer-coding decode via
  * [[HttpEval.dechunk]].
  */
case class HttpDechunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dechunk"

  override protected def nullSafeEval(input: Any): Any =
    HttpEval.dechunk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("dechunked")
      s"""
         |byte[] $res = graft.functions.HttpEval.dechunk($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HttpDechunk =
    copy(child = newChild)
}

/** Column surface for the HTTP wire-framing kernels. */
object HttpOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def dechunk(bin: Column): Column =
    ColumnBridge.column(HttpDechunk(ColumnBridge.expression(bin.cast("binary"))))

  def headerEnd(bin: Column): Column =
    ColumnBridge.column(HttpHeaderEnd(ColumnBridge.expression(bin.cast("binary"))))
}
