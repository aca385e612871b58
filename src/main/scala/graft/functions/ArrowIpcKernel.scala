package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Arrow IPC stream triage (q185) — the ML ecosystem's interchange
  * format (what `pyarrow` streams between feature pipelines and
  * training hosts), and the repo's THIRD wire grammar after protobuf
  * (q161) and Thrift compact (q166): every IPC message head is a
  * FLATBUFFER, so the walk is a real vtable parse —
  *
  *  - framing: `FFFFFFFF` continuation + i32le metadata length
  *    (8-padded) + the Message flatbuffer + an 8-aligned body of
  *    `bodyLength` bytes; `FFFFFFFF 00000000` is end-of-stream;
  *  - a flatbuffer root is a u32 offset to a TABLE whose first i32 is
  *    a SIGNED back-offset to its VTABLE; field presence lives in the
  *    vtable (a 0 slot means ABSENT → the field's DEFAULT, never a
  *    read at offset 0 — the classic flatbuffers bug);
  *  - `Message` fields by id: version(0), header_type(1, union tag),
  *    header(2, offset), bodyLength(3, i64) — the header UNION
  *    dispatches Schema(1) / DictionaryBatch(2) / RecordBatch(3);
  *  - Schema's `fields` VECTOR (field id 1) carries its length as the
  *    leading i32 — the column count without reading a Field table;
  *  - RecordBatch's `length` (field id 0, i64) is the row count;
  *  - DictionaryBatch messages are structural (skipped by framing,
  *    never counted as data batches);
  *  - the stream must OPEN with a Schema message; truncation
  *    mid-message keeps what served and flags `truncated` (q82).
  */
object ArrowIpcEval {

  final case class Ipc(nFields: Int, nBatches: Int, totalRows: Long,
                       bodyBytes: Long, truncated: Int)

  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL

  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def i64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  /** Absolute position of table field `id`'s data, or -1 if absent. */
  private def fieldPos(b: Array[Byte], tablePos: Int, id: Int,
                       limit: Int): Int = {
    if (tablePos < 0 || tablePos + 4 > limit) return -2
    val soffset = i32le(b, tablePos)
    val vt = tablePos - soffset
    if (vt < 0 || vt + 4 > limit) return -2
    val vtSize = u16le(b, vt)
    val slot = 4 + 2 * id
    if (slot + 2 > vtSize) return -1 // beyond the vtable: absent
    if (vt + slot + 2 > limit) return -2
    val off = u16le(b, vt + slot)
    if (off == 0) return -1 // the 0-means-absent rule
    tablePos + off
  }

  /** Safety net: a malformed flatbuffer can claim offsets the explicit
    * checks below don't individually re-derive; any residual
    * out-of-range dereference maps to the refusal verdict, never an
    * uncaught crash (the OrcKernel/CborKernel pattern). */
  def parse(b: Array[Byte]): Ipc =
    try parseImpl(b)
    catch { case _: IndexOutOfBoundsException => null }

  private def parseImpl(b: Array[Byte]): Ipc = {
    if (b == null || b.length < 8) return null
    var i = 0
    var nFields = -1
    var nBatches = 0
    var totalRows = 0L
    var bodyBytes = 0L
    var sawSchema = false
    var truncated = 0
    var done = false
    while (!done) {
      if (i + 8 > b.length) {
        // no EOS marker arrived: a cut-off stream
        if (!sawSchema) return null
        truncated = 1; done = true
      } else if (u32le(b, i) != 0xFFFFFFFFL) {
        if (!sawSchema) return null
        truncated = 1; done = true
      } else {
        val metaLen = i32le(b, i + 4)
        if (metaLen == 0) {
          done = true // clean end-of-stream
        } else if (metaLen < 8 || i + 8 + metaLen > b.length) {
          if (!sawSchema) return null
          truncated = 1; done = true
        } else {
          val fb = i + 8
          val limit = fb + metaLen
          // every derived position is validated against [0, limit)
          // before dereference: a crafted root/field offset must land
          // on the truncated/refusal path, not an uncaught throw
          val root = fb + u32le(b, fb).toInt
          val htPos = fieldPos(b, root, 1, limit)
          val hdPos = fieldPos(b, root, 2, limit)
          val blPos = fieldPos(b, root, 3, limit)
          if (htPos == -2 || hdPos == -2 || blPos == -2 ||
            (htPos >= 0 && htPos + 1 > limit) ||
            (hdPos >= 0 && hdPos + 4 > limit) ||
            (blPos >= 0 && blPos + 8 > limit)) {
            if (!sawSchema) return null
            truncated = 1; done = true
          } else {
            val headerType = if (htPos < 0) 0 else b(htPos) & 0xFF
            val bodyLength = if (blPos < 0) 0L else i64le(b, blPos)
            if (bodyLength < 0L || i + 8 + metaLen + bodyLength > b.length) {
              if (!sawSchema) return null
              truncated = 1; done = true
            } else {
              headerType match {
                case 1 => // Schema
                  if (hdPos < 0) return null
                  val schemaTable = hdPos + u32le(b, hdPos).toInt
                  val fv = fieldPos(b, schemaTable, 1, limit)
                  if (fv == -2) return null
                  nFields =
                    if (fv < 0) 0
                    else {
                      if (fv + 4 > limit) return null
                      val vec = fv + u32le(b, fv).toInt
                      if (vec < 0 || vec + 4 > limit) return null
                      i32le(b, vec)
                    }
                  sawSchema = true
                case 3 => // RecordBatch
                  if (!sawSchema) return null
                  if (hdPos >= 0) {
                    val rbTable = hdPos + u32le(b, hdPos).toInt
                    val lp = fieldPos(b, rbTable, 0, limit)
                    totalRows +=
                      (if (lp < 0 || lp + 8 > limit) 0L else i64le(b, lp))
                  }
                  nBatches += 1
                  bodyBytes += bodyLength
                case _ =>
                  // DictionaryBatch and friends: structural, framed past
                  if (!sawSchema) return null
              }
              val bodyPadded = (bodyLength + 7L) & ~7L
              i += 8 + metaLen + bodyPadded.toInt
            }
          }
        }
      }
    }
    if (!sawSchema) return null
    Ipc(nFields, nBatches, totalRows, bodyBytes, truncated)
  }

  /** nFields(10)<<44 | nBatches(10)<<34 | truncated<<33 | 1<<32 |
    * totalRows(32); -1 when not an IPC stream. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) return -1L
    (math.min(r.nFields, 1023).toLong << 44) |
      (math.min(r.nBatches, 1023).toLong << 34) |
      (r.truncated.toLong << 33) | (1L << 32) |
      math.min(r.totalRows, 0xFFFFFFFFL)
  }

  def bodyBytes(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else r.bodyBytes
  }

  // -------------------------------------------------------------- synth

  private final class W {
    val o = new java.io.ByteArrayOutputStream()
    def pos: Int = o.size()
    def u8(v: Int): Unit = o.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { var k = 0; while (k < 4) { u8(((v >> (8 * k)) & 0xFF).toInt); k += 1 } }
    def i64(v: Long): Unit = { var k = 0; while (k < 8) { u8(((v >> (8 * k)) & 0xFF).toInt); k += 1 } }
    def pad(n: Int): Unit = { var k = 0; while (k < n) { u8(0); k += 1 } }
    def bytes: Array[Byte] = o.toByteArray
  }

  /** One Message flatbuffer: headerType, header table built by
    * `emitHeader` (returns its table pos), bodyLength; version
    * present unless `omitVersion`. */
  private def messageFb(headerType: Int, bodyLength: Long,
                        omitVersion: Boolean,
                        emitHeader: W => Int): Array[Byte] = {
    val w = new W
    w.u32(0) // placeholder: root offset patched at the end
    // header target table first (so offsets are forward from fields)
    val headerTable = emitHeader(w)
    // Message vtable
    val vtPos = w.pos
    w.u16(14); w.u16(20)
    w.u16(if (omitVersion) 0 else 16) // version i16 at +16
    w.u16(18) // header_type u8 at +18
    w.u16(12) // header offset at +12
    w.u16(4) // bodyLength i64 at +4
    w.u16(0) // custom_metadata absent
    // Message table
    val tPos = w.pos
    w.u32((tPos - vtPos).toLong) // soffset (positive: vtable before)
    w.i64(bodyLength)
    w.u32((headerTable - (tPos + 12)).toLong) // relative header offset
    w.u16(4) // version = V4 (ignored by the triage)
    w.u8(headerType)
    w.u8(0) // padding
    val out = w.bytes
    // patch root offset
    out(0) = (tPos & 0xFF).toByte
    out(1) = ((tPos >> 8) & 0xFF).toByte
    out(2) = ((tPos >> 16) & 0xFF).toByte
    out(3) = ((tPos >> 24) & 0xFF).toByte
    // pad the flatbuffer to 8 bytes
    val padded = (out.length + 7) & ~7
    java.util.Arrays.copyOf(out, padded)
  }

  private def schemaHeader(nFields: Int)(w: W): Int = {
    // the fields VECTOR: length + nFields offsets to minimal tables
    // (each a vtable-only empty Field)
    val emptyVt = w.pos
    w.u16(4); w.u16(4)
    val emptyTables = (0 until nFields).map { _ =>
      val t = w.pos
      w.u32((t - emptyVt).toLong)
      t
    }
    val vecPos = w.pos
    w.u32(nFields.toLong)
    emptyTables.foreach { t =>
      val here = w.pos
      w.u32((t - here).toLong) // negative relative: target precedes
    }
    // Schema vtable + table: only field 1 (fields vector) present
    val vtPos = w.pos
    w.u16(8); w.u16(8)
    w.u16(0) // endianness absent -> default
    w.u16(4) // fields vector offset at +4
    val tPos = w.pos
    w.u32((tPos - vtPos).toLong)
    w.u32((vecPos - (tPos + 4)).toLong) // relative (negative) offset
    tPos
  }

  private def batchHeader(rows: Long)(w: W): Int = {
    val vtPos = w.pos
    w.u16(6); w.u16(12)
    w.u16(4) // length i64 at +4
    val tPos = w.pos
    w.u32((tPos - vtPos).toLong)
    w.i64(rows)
    tPos
  }

  /** Synthesize a q185 stream. `params` packs `doc_id | mode<<40`:
    * 0 -> schema(3 fields) + 2 batches + EOS; 1 -> schema(5) +
    * batch + a DICTIONARY message (framed past, not counted) +
    * batch + EOS; 2 -> schema with fields ABSENT (vtable-0 default)
    * + 1 batch; 3 -> class 0 cut mid-second-batch (schema + first
    * batch serve, truncated). Body bytes are 8-multiples of filler.
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    def rows(k: Int): Long = 10L + (id + k) % 90
    val bodyLen = 64L + (id % 32) * 8
    val o = new java.io.ByteArrayOutputStream()
    def put(fb: Array[Byte], body: Long): Unit = {
      val w = new W
      w.u32(0xFFFFFFFFL)
      w.u32(fb.length.toLong)
      val h = w.bytes
      o.write(h, 0, h.length)
      o.write(fb, 0, fb.length)
      var k = 0L
      while (k < body) { o.write(((id + k) % 251).toInt); k += 1 }
    }
    val nf = if (mode == 1) 5 else 3
    if (mode == 2)
      put(messageFb(1, 0L, omitVersion = true,
        { w => // Schema whose fields vector is ABSENT entirely
          val vtPos = w.pos
          w.u16(4); w.u16(4)
          val tPos = w.pos
          w.u32((tPos - vtPos).toLong)
          tPos
        }), 0L)
    else put(messageFb(1, 0L, omitVersion = false, schemaHeader(nf)), 0L)
    put(messageFb(3, bodyLen, omitVersion = false, batchHeader(rows(0))),
      bodyLen)
    if (mode == 0 || mode == 3)
      put(messageFb(3, bodyLen, omitVersion = false, batchHeader(rows(1))),
        bodyLen)
    if (mode == 1) {
      put(messageFb(2, 16L, omitVersion = false, batchHeader(7L)), 16L)
      put(messageFb(3, bodyLen, omitVersion = false, batchHeader(rows(1))),
        bodyLen)
    }
    // EOS
    val w2 = new W
    w2.u32(0xFFFFFFFFL); w2.u32(0L)
    val eos = w2.bytes
    o.write(eos, 0, eos.length)
    val all = o.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - eos.length - (bodyLen / 2).toInt)
    else all
  }
}

/** `binary -> long`: packed IPC triage; NULL when not a stream. */
case class ArrowIpcMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_arrow_ipc_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ArrowIpcEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("am")
      s"""
         |long $res = graft.functions.ArrowIpcEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ArrowIpcMeta =
    copy(child = newChild)
}

/** `binary -> long`: summed body bytes of counted batches. */
case class ArrowIpcBody(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_arrow_ipc_body"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ArrowIpcEval.bodyBytes(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ab")
      s"""
         |long $res = graft.functions.ArrowIpcEval.bodyBytes($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ArrowIpcBody =
    copy(child = newChild)
}

/** `long -> binary`: q185's synthesis. */
case class ArrowIpcSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_arrow_ipc_synth"

  override protected def nullSafeEval(params: Any): Any =
    ArrowIpcEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.ArrowIpcEval.synth($p)")

  override protected def withNewChildInternal(
      newChild: Expression): ArrowIpcSynth =
    copy(child = newChild)
}

/** Column surface for the Arrow IPC kernels. */
object ArrowIpcOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def arrowMeta(b: Column): Column = ColumnBridge.column(ArrowIpcMeta(bin(b)))
  def arrowBody(b: Column): Column = ColumnBridge.column(ArrowIpcBody(bin(b)))

  def arrowSynth(params: Column): Column =
    ColumnBridge.column(ArrowIpcSynth(
      ColumnBridge.expression(params.cast("long"))))
}
