package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** ORC footer introspection (q186) — the fourth and last of the big
  * lake formats' OWN metadata planes (Parquet q166, Avro q164, Arrow
  * IPC q185; a lake audit that reads three of four still rescans the
  * fourth): ORC's tail is read BACKWARD — the file's LAST byte is the
  * postscript length, the PostScript protobuf (never compressed)
  * names the compression kind and the footer length, and the Footer
  * protobuf carries the row count, the stripe list, and the schema
  * type tree. The walk is the q161 protobuf discipline applied to
  * the published orc_proto:
  *
  *  - PostScript: footerLength(1 varint), compression(2 enum),
  *    ...， magic(8000, "ORC") — the field id 8000 spells as a
  *    TWO-byte tag, a one-byte-tag reader never finds it;
  *  - Footer (stated scope: compression NONE; other kinds keep the
  *    triage verdict with NULL row facts — q164's per-layer stance):
  *    stripes(3, repeated message) each carrying numberOfRows(5),
  *    types(4, repeated) where the ROOT type's subtypes — packed OR
  *    unpacked (both legal, q161's drill) — count the table's
  *    columns, numberOfRows(6);
  *  - the footer's row count is CROSS-CHECKED against the stripes'
  *    own sum (q166's `verified` discipline — a lying footer is
  *    flagged, never trusted);
  *  - `ORC` leading magic opens the file; a postscript length
  *    running past the buffer refuses fields while the magic verdict
  *    survives.
  */
object OrcEval {

  final case class Orc(compression: Int, nStripes: Int, nColumns: Int,
                       numRows: Long, sumStripeRows: Long, ok: Int)

  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class R(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) throw Truncated
      val v = b(i) & 0xFF; i += 1; v
    }
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      while (shift <= 63) {
        val v = u8()
        acc |= (v & 0x7FL) << shift
        if ((v & 0x80) == 0) return acc
        shift += 7
      }
      throw Truncated
    }
    def skip(n: Long): Unit = {
      if (n < 0 || i + n > end) throw Truncated
      i += n.toInt
    }
  }

  /** Walk a message, dispatching (fieldId, wireType) to `f`; `f`
    * returns true when it consumed the value. */
  private def walk(r: R)(f: (Int, Int) => Boolean): Unit = {
    while (r.i < r.end) {
      val tag = r.varint()
      val fid = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      if (fid == 0) throw Truncated
      if (!f(fid, wt)) wt match {
        case 0 => r.varint(); ()
        case 1 => r.skip(8)
        case 2 => r.skip(r.varint())
        case 5 => r.skip(4)
        case _ => throw Truncated
      }
    }
  }

  def parse(b: Array[Byte]): Orc = {
    if (b == null || b.length < 16) return null
    if (!(b(0) == 'O' && b(1) == 'R' && b(2) == 'C')) return null
    val psLen = b(b.length - 1) & 0xFF
    val psStart = b.length - 1 - psLen
    if (psLen == 0 || psStart < 3)
      return Orc(-1, -1, -1, -1L, -1L, 0) // magic survives, tail refuses
    var footerLen = -1L
    var compression = 0 // NONE default
    var magicOk = false
    try {
      val ps = new R(b, psStart, b.length - 1)
      walk(ps) { (fid, wt) =>
        (fid, wt) match {
          case (1, 0) => footerLen = ps.varint(); true
          case (2, 0) => compression = ps.varint().toInt; true
          case (8000, 2) =>
            val n = ps.varint()
            if (n == 3L && ps.b(ps.i) == 'O' && ps.b(ps.i + 1) == 'R' &&
              ps.b(ps.i + 2) == 'C') magicOk = true
            ps.skip(n)
            true
          case _ => false
        }
      }
    } catch {
      case Truncated => return Orc(-1, -1, -1, -1L, -1L, 0)
      case _: ArrayIndexOutOfBoundsException =>
        return Orc(-1, -1, -1, -1L, -1L, 0)
    }
    if (!magicOk || footerLen <= 0L)
      return Orc(-1, -1, -1, -1L, -1L, 0)
    if (compression != 0) // stated scope: NONE decodes, others triage
      return Orc(compression, -1, -1, -1L, -1L, 1)
    val fStart = psStart - footerLen
    if (fStart < 3) return Orc(compression, -1, -1, -1L, -1L, 0)
    var nStripes = 0
    var sumStripeRows = 0L
    var numRows = -1L
    var nColumns = -1
    var sawRoot = false
    try {
      val fr = new R(b, fStart.toInt, psStart)
      walk(fr) { (fid, wt) =>
        (fid, wt) match {
          case (3, 2) => // StripeInformation
            val len = fr.varint()
            val stripeEnd = fr.i + len.toInt
            if (stripeEnd > fr.end) throw Truncated
            val sr = new R(b, fr.i, stripeEnd)
            walk(sr) { (sfid, swt) =>
              if (sfid == 5 && swt == 0) {
                sumStripeRows += sr.varint(); true
              } else false
            }
            fr.i = stripeEnd
            nStripes += 1
            true
          case (4, 2) => // Type
            val len = fr.varint()
            val typeEnd = fr.i + len.toInt
            if (typeEnd > fr.end) throw Truncated
            if (!sawRoot) {
              // the ROOT type's subtypes(2) count the columns —
              // packed (wt 2) or unpacked (wt 0), both legal
              var subs = 0
              val tr = new R(b, fr.i, typeEnd)
              walk(tr) { (tfid, twt) =>
                (tfid, twt) match {
                  case (2, 0) => tr.varint(); subs += 1; true
                  case (2, 2) =>
                    val pl = tr.varint()
                    val pEnd = tr.i + pl.toInt
                    if (pEnd > tr.end) throw Truncated
                    while (tr.i < pEnd) { tr.varint(); subs += 1 }
                    true
                  case _ => false
                }
              }
              nColumns = subs
              sawRoot = true
            }
            fr.i = typeEnd
            true
          case (6, 0) => numRows = fr.varint(); true
          case _ => false
        }
      }
    } catch {
      case Truncated => return Orc(compression, -1, -1, -1L, -1L, 0)
      case _: ArrayIndexOutOfBoundsException =>
        return Orc(compression, -1, -1, -1L, -1L, 0)
    }
    if (numRows < 0L || !sawRoot) return Orc(compression, -1, -1, -1L, -1L, 0)
    Orc(compression, nStripes, nColumns, numRows, sumStripeRows, 1)
  }

  /** compression(4)<<48 | ok<<47 | verified<<46 | (nStripes+1)(10)<<36
    * | (nColumns+1)(10)<<26 | (numRows+1)(26); -1 when not ORC. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) return -1L
    val verified =
      if (r.numRows >= 0L && r.numRows == r.sumStripeRows) 1L else 0L
    ((if (r.compression < 0) 15L else r.compression.toLong) << 48) |
      (r.ok.toLong << 47) |
      (verified << 46) |
      (math.min(r.nStripes + 1, 1023).toLong << 36) |
      (math.min(r.nColumns + 1, 1023).toLong << 26) |
      math.min(r.numRows + 1, (1L << 26) - 1)
  }

  // -------------------------------------------------------------- synth

  private def putVarint(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  private def putTag(o: java.io.ByteArrayOutputStream, fid: Int,
                     wt: Int): Unit =
    putVarint(o, (fid.toLong << 3) | wt)

  private def stripe(rows: Long): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putTag(o, 1, 0); putVarint(o, 3L) // offset
    putTag(o, 3, 0); putVarint(o, 100L) // dataLength
    putTag(o, 5, 0); putVarint(o, rows)
    o.toByteArray
  }

  /** Synthesize a q186 ORC tail. `params` packs `doc_id | mode<<40`:
    * 0 -> NONE compression, 2 stripes, root with UNPACKED subtypes,
    * verified; 1 -> 3 stripes, PACKED subtypes, and a footer row
    * count that DISAGREES with the stripe sum (verified = 0);
    * 2 -> compression ZLIB (kind reported, row facts refuse by
    * stated scope); 3 -> postscript length past EOF (magic survives,
    * fields refuse).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    def rows(k: Int): Long = 100L + (id + k) % 900
    val nStripes = if (mode == 1) 3 else 2
    val nCols = (id % 6 + 2).toInt
    val o = new java.io.ByteArrayOutputStream()
    o.write("ORC".getBytes("US-ASCII"), 0, 3)
    // filler "stripe data" (never parsed)
    var k = 0
    val fill = (32 + id % 16).toInt
    while (k < fill) { o.write(((id + k * 3) % 251).toInt); k += 1 }
    // footer
    val f = new java.io.ByteArrayOutputStream()
    var si = 0
    var sum = 0L
    while (si < nStripes) {
      val sb = stripe(rows(si))
      putTag(f, 3, 2); putVarint(f, sb.length.toLong)
      f.write(sb, 0, sb.length)
      sum += rows(si)
      si += 1
    }
    // root type: struct with nCols subtypes
    val t = new java.io.ByteArrayOutputStream()
    putTag(t, 1, 0); putVarint(t, 12L) // kind STRUCT
    if (mode == 1) {
      val pk = new java.io.ByteArrayOutputStream()
      var c = 0
      while (c < nCols) { putVarint(pk, (c + 1).toLong); c += 1 }
      val pb = pk.toByteArray
      putTag(t, 2, 2); putVarint(t, pb.length.toLong)
      t.write(pb, 0, pb.length)
    } else {
      var c = 0
      while (c < nCols) { putTag(t, 2, 0); putVarint(t, (c + 1).toLong); c += 1 }
    }
    val tb = t.toByteArray
    putTag(f, 4, 2); putVarint(f, tb.length.toLong)
    f.write(tb, 0, tb.length)
    // child types (leaves), so the tree is plausible (never re-read)
    var c = 0
    while (c < nCols) {
      val lt = new java.io.ByteArrayOutputStream()
      putTag(lt, 1, 0); putVarint(lt, 8L) // kind STRING
      val lb = lt.toByteArray
      putTag(f, 4, 2); putVarint(f, lb.length.toLong)
      f.write(lb, 0, lb.length)
      c += 1
    }
    putTag(f, 6, 0)
    putVarint(f, if (mode == 1) sum + 7 else sum) // the mode-1 lie
    val fb = f.toByteArray
    o.write(fb, 0, fb.length)
    // postscript
    val ps = new java.io.ByteArrayOutputStream()
    putTag(ps, 1, 0); putVarint(ps, fb.length.toLong)
    putTag(ps, 2, 0); putVarint(ps, if (mode == 2) 1L else 0L)
    putTag(ps, 8000, 2); putVarint(ps, 3L)
    ps.write("ORC".getBytes("US-ASCII"), 0, 3)
    val pb = ps.toByteArray
    o.write(pb, 0, pb.length)
    o.write(if (mode == 3) 250 else pb.length) // the mode-3 lie
    o.toByteArray
  }
}

/** `binary -> long`: packed ORC triage; NULL when not ORC at all. */
case class OrcMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_orc_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OrcEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("om")
      s"""
         |long $res = graft.functions.OrcEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrcMeta =
    copy(child = newChild)
}

/** `long -> binary`: q186's synthesis. */
case class OrcSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_orc_synth"

  override protected def nullSafeEval(params: Any): Any =
    OrcEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.OrcEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): OrcSynth =
    copy(child = newChild)
}

/** Column surface for the ORC kernels. */
object OrcOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def orcMeta(b: Column): Column = ColumnBridge.column(OrcMeta(bin(b)))

  def orcSynth(params: Column): Column =
    ColumnBridge.column(OrcSynth(ColumnBridge.expression(params.cast("long"))))
}
