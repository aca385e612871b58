package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-walk helpers for WARC (ISO 28500) — the container web crawls are
  * archived in and the native input of a web-scale corpus build (Common
  * Crawl ships WARC; RefinedWeb/FineWeb start from it). A WARC stream is
  * records back-to-back, each:
  *
  *   `WARC/1.x\r\n` + header lines (`Name: value\r\n`, names
  *   case-insensitive) + `\r\n` + exactly Content-Length payload bytes +
  *   `\r\n\r\n`
  *
  * The parse is Content-Length-DRIVEN: payloads are arbitrary bytes and
  * routinely contain `\r\n\r\n`, so any split-on-separator spelling reads
  * garbage — the fixture synthesis embeds the separator inside every
  * payload precisely so a split-based refactor fails the oracle.
  *
  * Malformed-tail contract (the 100 TB ingest stance, [[Y4mMeta]]'s):
  * records BEFORE the first malformed/truncated one are served, the
  * stream reports `truncated = 1`, and the broken tail never becomes a
  * short record. A stream without the 5-byte `WARC/` magic is NULL
  * everywhere — "not this container at all" stays distinguishable from
  * "this container, zero valid records".
  */
private[functions] object WarcWalk {
  /** Parse one record starting at `pos`. Returns
    * `(typeOff, typeLen, uriOff, uriLen, idOff, idLen, clen, payloadOff,
    * nextPos)` with -1 offsets for absent optional headers, or null when
    * the record is malformed or runs past the buffer.
    */
  def record(bb: Array[Byte], pos: Int): Array[Long] = {
    val len = bb.length
    val version = "WARC/1."
    if (pos < 0 || pos + version.length >= len) return null
    var i = pos
    var m = 0
    while (m < version.length) {
      if (bb(i) != version.charAt(m)) return null
      i += 1; m += 1
    }
    // rest of the version line to CRLF (the spec mandates CRLF endings)
    while (i + 1 < len && !(bb(i) == '\r' && bb(i + 1) == '\n')) i += 1
    if (i + 1 >= len) return null
    i += 2
    var typeOff = -1L; var typeLen = -1L
    var uriOff = -1L; var uriLen = -1L
    var idOff = -1L; var idLen = -1L
    var clen = -1L
    var done = false
    while (!done) {
      if (i + 1 >= len) return null
      if (bb(i) == '\r' && bb(i + 1) == '\n') { i += 2; done = true }
      else {
        val nameOff = i
        while (i < len && bb(i) != ':' && bb(i) != '\r') i += 1
        if (i >= len || bb(i) != ':') return null
        val nameLen = i - nameOff
        i += 1
        while (i < len && (bb(i) == ' ' || bb(i) == '\t')) i += 1
        val valOff = i
        while (i + 1 < len && !(bb(i) == '\r' && bb(i + 1) == '\n')) i += 1
        if (i + 1 >= len) return null
        val valLen = i - valOff
        i += 2
        if (nameEq(bb, nameOff, nameLen, "warc-type")) {
          typeOff = valOff; typeLen = valLen
        } else if (nameEq(bb, nameOff, nameLen, "warc-target-uri")) {
          uriOff = valOff; uriLen = valLen
        } else if (nameEq(bb, nameOff, nameLen, "warc-record-id")) {
          idOff = valOff; idLen = valLen
        } else if (nameEq(bb, nameOff, nameLen, "content-length")) {
          // real crawl WARCs occasionally pad header values with trailing
          // LWS; mirror the leading skip so ' 42 ' parses while keeping
          // the non-numeric rejection for genuinely bad values
          var valEnd = valOff + valLen
          while (valEnd > valOff &&
            (bb(valEnd - 1) == ' ' || bb(valEnd - 1) == '\t')) valEnd -= 1
          var v = 0L
          var j = valOff
          var any = false
          while (j < valEnd && bb(j) >= '0' && bb(j) <= '9' &&
            v < (1L << 40)) {
            v = v * 10 + (bb(j) - '0'); j += 1; any = true
          }
          if (!any || j < valEnd) return null // non-numeric length
          clen = v
        } // unknown headers are skipped, as a real reader must
      }
    }
    if (clen < 0) return null // Content-Length is the walk; without it, stop
    val payloadOff = i.toLong
    val end = payloadOff + clen
    // the 4-byte record separator belongs to the record: a stream cut
    // anywhere inside header+payload+separator drops the whole record
    if (end + 4 > len) return null
    if (bb(end.toInt) != '\r' || bb(end.toInt + 1) != '\n' ||
      bb(end.toInt + 2) != '\r' || bb(end.toInt + 3) != '\n') return null
    Array(typeOff, typeLen, uriOff, uriLen, idOff, idLen, clen, payloadOff,
      end + 4)
  }

  private def nameEq(bb: Array[Byte], off: Int, l: Int, lower: String): Boolean = {
    if (l != lower.length) return false
    var k = 0
    while (k < l) {
      val c = bb(off + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      if (lc != lower.charAt(k)) return false
      k += 1
    }
    true
  }

  def magic(bb: Array[Byte]): Boolean =
    bb.length >= 5 && bb(0) == 'W' && bb(1) == 'A' && bb(2) == 'R' &&
      bb(3) == 'C' && bb(4) == '/'
}

/** The shared evaluation bodies — called from both the interpreted eval
  * and the generated code (the [[Y4mEval]] single-implementation rule).
  */
object WarcEval {
  /** `(nValidRecords << 1) | truncatedBit`; null when not WARC at all.
    * Implemented AS the offsets walk's trailer so the two verdict
    * surfaces can never disagree (and a consumer needing both — q82 —
    * pays ONE walk, not two).
    */
  def meta(bb: Array[Byte]): java.lang.Long = {
    val a = offsets(bb)
    if (a == null) null
    else java.lang.Long.valueOf(a.getLong(a.numElements() - 1))
  }

  /** Byte offsets of every VALID record from ONE linear walk, with the
    * stream verdict `(nValidRecords << 1) | truncatedBit` appended as
    * the LAST element — the iteration table q82 explodes (slice off the
    * trailer), so per-stream parsing stays O(bytes) instead of the
    * O(records²) an index-based seek would pay re-walking the prefix per
    * exploded row (a real crawl segment holds 10⁴–10⁵ records), and the
    * verdict rides the same walk instead of a second one. Null when not
    * WARC at all; the walk stops at the first malformed record (that
    * tail is the truncated bit, not an offset), and the 2^20 backstop is
    * itself a truncation — a stream with unwalked bytes left must never
    * report "complete" just because the counter cap fired first.
    */
  def offsets(bb: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (!WarcWalk.magic(bb)) return null
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var pos = 0
    var truncated = false
    var done = false
    while (!done && pos < bb.length && out.length < (1 << 20)) {
      val r = WarcWalk.record(bb, pos)
      if (r == null) { truncated = true; done = true }
      else {
        out += pos.toLong
        pos = r(8).toInt
      }
    }
    if (!truncated && pos < bb.length) truncated = true // counter cap hit
    out += ((out.length.toLong << 1) | (if (truncated) 1L else 0L))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Header field of the record at byte offset `off` (from [[offsets]]):
    * code 0 = WARC-Type, 1 = WARC-Target-URI, 2 = WARC-Record-ID. Null
    * when no valid record starts there or the field is absent. O(that
    * record), never a prefix re-walk.
    */
  def header(bb: Array[Byte], off: Int, code: Int): UTF8String = {
    val r = WarcWalk.record(bb, off)
    if (r == null) return null
    val (o, l) = code match {
      case 0 => (r(0), r(1))
      case 1 => (r(2), r(3))
      case _ => (r(4), r(5))
    }
    if (o < 0) return null
    UTF8String.fromBytes(bb, o.toInt, l.toInt)
  }

  /** Exactly the Content-Length payload bytes of the record at byte
    * offset `off`.
    */
  def payload(bb: Array[Byte], off: Int): Array[Byte] = {
    val r = WarcWalk.record(bb, off)
    if (r == null) return null
    java.util.Arrays.copyOfRange(bb, r(7).toInt, (r(7) + r(6)).toInt)
  }
}

/** `binary -> long`: stream verdict `(nValidRecords << 1) | truncated`. */
case class WarcMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_meta"

  override protected def nullSafeEval(input: Any): Any =
    WarcEval.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val boxed = ctx.freshName("warcMeta")
      s"""
         |Object $boxed = graft.functions.WarcEval.meta($bytes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WarcMeta =
    copy(child = newChild)
}

/** `binary -> array<long>`: valid-record byte offsets from one walk,
  * with the packed stream verdict appended as the last element.
  */
case class WarcOffsets(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_offsets"

  override protected def nullSafeEval(input: Any): Any =
    WarcEval.offsets(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val boxed = ctx.freshName("warcOffs")
      s"""
         |Object $boxed = graft.functions.WarcEval.offsets($bytes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WarcOffsets =
    copy(child = newChild)
}

/** `(binary, int) -> string`: header field `code` of the record at byte
  * offset `off` (0 = WARC-Type, 1 = WARC-Target-URI, 2 = WARC-Record-ID).
  */
case class WarcHeader(left: Expression, right: Expression, code: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_warc_header_$code"

  override protected def nullSafeEval(bin: Any, idx: Any): Any =
    WarcEval.header(bin.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int], code)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val boxed = ctx.freshName("warcHdr")
      s"""
         |Object $boxed = graft.functions.WarcEval.header($bytes, $idx, $code);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WarcHeader =
    copy(left = newLeft, right = newRight)
}

/** `(binary, int) -> binary`: the exact Content-Length payload of the
  * record at byte offset `off`.
  */
case class WarcPayload(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_payload"

  override protected def nullSafeEval(bin: Any, idx: Any): Any =
    WarcEval.payload(bin.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val boxed = ctx.freshName("warcPay")
      s"""
         |Object $boxed = graft.functions.WarcEval.payload($bytes, $idx);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (byte[]) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WarcPayload =
    copy(left = newLeft, right = newRight)
}
