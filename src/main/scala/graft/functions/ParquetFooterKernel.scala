package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Parquet footer walk (q166) — the lake's OWN format introspected
  * without a scan (what `ANALYZE`-less observability reads first: how
  * many rows does this drop claim, how many columns, how many row
  * groups — straight from the footer, before trusting a byte of
  * data). The footer is Thrift COMPACT protocol (parquet-format
  * `FileMetaData`), so the walk is a real wire grammar:
  *
  *  - `PAR1` magic at BOTH ends; u32le footer length at EOF-8; the
  *    footer is the last `len` bytes before it;
  *  - compact-protocol struct fields are `(delta << 4) | type` bytes
  *    — field ids arrive as DELTAS from the previous id (a reader
  *    treating them as absolute ids mistakes field 2-after-1 for
  *    field 32) — with a zigzag-varint escape when the delta
  *    overflows the nibble; BOOLEAN values live in the TYPE nibble
  *    itself (true/false are different type codes, no value byte);
  *  - lists carry `(size << 4) | elemType` headers with a varint
  *    escape at size 15; i16/i32/i64 are ZIGZAG varints; unknown
  *    fields at every level skip by type (the tf.Example discipline,
  *    q161);
  *  - the schema is a FLATTENED TREE in list order: element 0 is the
  *    root whose `num_children` IS the table's column count — counting
  *    list entries instead reports nested groups as phantom columns;
  *  - `num_rows` is cross-checked against the SUM of the row groups'
  *    own `num_rows` (the q59 meta/payload discipline): `verified`
  *    reports the agreement, and a footer whose two counts disagree
  *    is flagged, never trusted.
  *
  * At test scale the whole file rides a `binaryFile` row; a 100 TB
  * deployment feeds this kernel the TAIL RANGE of each object (the
  * footer length bound is read first) — the walk itself only ever
  * touches bytes at and after `EOF - 8 - footer_len`.
  */
object ParquetFooterEval {

  final case class Meta(numRows: Long, nColumns: Int, nGroups: Int,
                        sumGroupRows: Long)

  // ---------------------------------------------------- compact reader

  private final class Reader(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) throw Truncated
      val v = b(i) & 0xFF
      i += 1
      v
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

    def zigzag(): Long = {
      val u = varint()
      (u >>> 1) ^ -(u & 1L)
    }

    def skipBytes(n: Long): Unit = {
      if (n < 0L || i + n > end) throw Truncated
      i += n.toInt
    }
  }

  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Skip one value of the given compact type id. */
  private def skip(r: Reader, tpe: Int): Unit = tpe match {
    case 1 | 2 => () // boolean true/false: value in the type
    case 3 | 4 | 5 | 6 => r.varint(); ()
    case 7 => r.skipBytes(8L)
    case 8 => r.skipBytes(r.varint())
    case 9 | 10 =>
      val h = r.u8()
      var n = (h >> 4) & 0x0F
      val et = h & 0x0F
      var size = n.toLong
      if (n == 15) size = r.varint()
      var k = 0L
      while (k < size) { skipElem(r, et); k += 1 }
    case 11 =>
      val n = r.varint()
      if (n > 0) {
        val kv = r.u8()
        val kt = (kv >> 4) & 0x0F
        val vt = kv & 0x0F
        var k = 0L
        while (k < n) { skipElem(r, kt); skipElem(r, vt); k += 1 }
      }
    case 12 => skipStruct(r)
    case _ => throw Truncated
  }

  /** List/map elements spell booleans as one byte, not in the type. */
  private def skipElem(r: Reader, tpe: Int): Unit = tpe match {
    case 1 | 2 => r.skipBytes(1L)
    case t => skip(r, t)
  }

  private def skipStruct(r: Reader): Unit = {
    var lastId = 0
    var done = false
    while (!done) {
      val h = r.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0x0F
        val delta = (h >> 4) & 0x0F
        lastId = if (delta == 0) r.zigzag().toInt else lastId + delta
        skip(r, tpe)
      }
    }
  }

  /** Walk one struct, calling `field(id, type)`; the callback must
    * consume the value and return true, or return false to skip. */
  private def readStruct(r: Reader)(field: (Int, Int) => Boolean): Unit = {
    var lastId = 0
    var done = false
    while (!done) {
      val h = r.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0x0F
        val delta = (h >> 4) & 0x0F
        lastId = if (delta == 0) r.zigzag().toInt else lastId + delta
        if (!field(lastId, tpe)) skip(r, tpe)
      }
    }
  }

  private def listHeader(r: Reader): (Long, Int) = {
    val h = r.u8()
    val et = h & 0x0F
    var size = ((h >> 4) & 0x0F).toLong
    if (size == 15L) size = r.varint()
    (size, et)
  }

  // ------------------------------------------------------------- parse

  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 12) return null
    val n = b.length
    if (!(b(0) == 'P' && b(1) == 'A' && b(2) == 'R' && b(3) == '1')) return null
    if (!(b(n - 4) == 'P' && b(n - 3) == 'A' && b(n - 2) == 'R' &&
      b(n - 1) == '1')) return null
    val flen = (b(n - 8) & 0xFF) | ((b(n - 7) & 0xFF) << 8) |
      ((b(n - 6) & 0xFF) << 16) | ((b(n - 5) & 0xFF) << 24)
    if (flen <= 0 || n - 8 - flen < 4) return null
    val r = new Reader(b, n - 8 - flen, n - 8)
    var numRows = -1L
    var nColumns = -1
    var nGroups = 0
    var sumGroupRows = 0L
    try {
      readStruct(r) { (fid, tpe) =>
        (fid, tpe) match {
          case (2, 9) | (2, 10) => // schema: list<SchemaElement>
            val (size, et) = listHeader(r)
            if (et != 12) throw Truncated
            var k = 0L
            while (k < size) {
              var numChildren = -1
              readStruct(r) { (sfid, stpe) =>
                if (sfid == 5 && stpe == 5) { // num_children: i32
                  numChildren = r.zigzag().toInt
                  true
                } else false
              }
              if (k == 0L) nColumns = math.max(numChildren, 0)
              k += 1
            }
            true
          case (3, 6) => // num_rows: i64
            numRows = r.zigzag()
            true
          case (4, 9) | (4, 10) => // row_groups: list<RowGroup>
            val (size, et) = listHeader(r)
            if (et != 12) throw Truncated
            var k = 0L
            while (k < size) {
              readStruct(r) { (gfid, gtpe) =>
                if (gfid == 3 && gtpe == 6) { // RowGroup.num_rows: i64
                  sumGroupRows += r.zigzag()
                  true
                } else false
              }
              nGroups += 1
              k += 1
            }
            true
          case _ => false
        }
      }
    } catch {
      case Truncated => return null
      case _: ArrayIndexOutOfBoundsException => return null
    }
    if (numRows < 0L || nColumns < 0) return null
    Meta(numRows, nColumns, nGroups, sumGroupRows)
  }

  def numRows(b: Array[Byte]): Long = {
    val m = parse(b)
    if (m == null) -1L else m.numRows
  }

  // -------------------------------------------------------------- synth

  private def putVarint(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  private def putZig(o: java.io.ByteArrayOutputStream, v: Long): Unit =
    putVarint(o, (v << 1) ^ (v >> 63))

  private def putStr(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    val u = s.getBytes("UTF-8")
    o.write(0x48) // field 4 (name), type binary — caller-positioned
    putVarint(o, u.length.toLong)
    o.write(u, 0, u.length)
  }

  /** A metadata-only parquet file (footer introspection never reads
    * row-group data): `PAR1` + compact-protocol FileMetaData +
    * u32le length + `PAR1`. Rows split across two row groups so the
    * group-sum cross-check has something to verify. */
  def synthFile(numRows: Long, nCols: Int): Array[Byte] = {
    val f = new java.io.ByteArrayOutputStream()
    // 1: version i32
    f.write(0x15); putZig(f, 1L)
    // 2: schema list<struct>: root + nCols leaves
    f.write(0x19)
    val n = nCols + 1
    if (n < 15) f.write((n << 4) | 0x0C)
    else { f.write(0xFC); putVarint(f, n.toLong) }
    putStr(f, "root")
    f.write(0x15); putZig(f, nCols.toLong) // 5: num_children (delta 1)
    f.write(0x00)
    var c = 0
    while (c < nCols) { putStr(f, "c" + c); f.write(0x00); c += 1 }
    // 3: num_rows i64
    f.write(0x16); putZig(f, numRows)
    // 4: row_groups list<struct> — two groups splitting the rows
    f.write(0x19); f.write(0x2C)
    val g0 = numRows / 2
    Seq(g0, numRows - g0).foreach { rows =>
      f.write(0x36) // field 3 (num_rows) in RowGroup, delta 3, i64
      putZig(f, rows)
      f.write(0x00)
    }
    f.write(0x00)
    val fb = f.toByteArray
    val o = new java.io.ByteArrayOutputStream()
    o.write("PAR1".getBytes("US-ASCII"), 0, 4)
    o.write(fb, 0, fb.length)
    var k = 0
    while (k < 4) { o.write((fb.length >> (8 * k)) & 0xFF); k += 1 }
    o.write("PAR1".getBytes("US-ASCII"), 0, 4)
    o.toByteArray
  }

  /** Packed: nColumns<<24 | nGroups<<8 | verified<<1 | 1; -1 refusal.
    * `verified` = the footer's num_rows equals the row groups' sum. */
  def meta(b: Array[Byte]): Long = {
    val m = parse(b)
    if (m == null) return -1L
    val verified = if (m.numRows == m.sumGroupRows) 1L else 0L
    (math.min(m.nColumns, 0xFFFF).toLong << 24) |
      (math.min(m.nGroups, 0xFFFF).toLong << 8) | (verified << 1) | 1L
  }
}

/** `binary -> long`: the footer's declared row count, NULL on refusal. */
case class ParquetNumRows(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parquet_num_rows"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ParquetFooterEval.numRows(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pnr")
      s"""
         |long $res = graft.functions.ParquetFooterEval.numRows($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ParquetNumRows =
    copy(child = newChild)
}

/** `binary -> long`: packed (nColumns, nGroups, verified), -1 refusal. */
case class ParquetMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parquet_meta"

  override protected def nullSafeEval(input: Any): Any =
    ParquetFooterEval.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ParquetFooterEval.meta($b)")

  override protected def withNewChildInternal(
      newChild: Expression): ParquetMeta =
    copy(child = newChild)
}

/** `(long rows, long cols) -> binary`: a metadata-only parquet file
  * for q187's routed census. */
case class ParquetSynth(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parquet_synth"

  override protected def nullSafeEval(rows: Any, cols: Any): Any =
    ParquetFooterEval.synthFile(rows.asInstanceOf[Long],
      cols.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, c) =>
      s"graft.functions.ParquetFooterEval.synthFile($r, (int)$c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ParquetSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the Parquet footer kernels. */
object ParquetFooterOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def parquetNumRows(b: Column): Column =
    ColumnBridge.column(ParquetNumRows(bin(b)))
  def parquetMeta(b: Column): Column = ColumnBridge.column(ParquetMeta(bin(b)))

  def parquetSynth(rows: Column, cols: Column): Column =
    ColumnBridge.column(ParquetSynth(
      ColumnBridge.expression(rows.cast("long")),
      ColumnBridge.expression(cols.cast("long"))))
}
