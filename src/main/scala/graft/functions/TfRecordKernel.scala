package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** TFRecord container walk (q160) — the framing TensorFlow training
  * shards ship in (one length-prefixed record per example; the format
  * every tf.data input pipeline reads and the one a training-data
  * build ultimately EMITS). Unlike every other source in the family
  * the container has NO magic bytes — each record is
  *
  *   u64le length | u32le masked-crc32c(length bytes)
  *   | data | u32le masked-crc32c(data)
  *
  * with the Castagnoli CRC masked as `((c >>> 15) | (c << 17)) +
  * 0xa282ead8` (the TensorFlow rotation that keeps stored CRCs from
  * colliding with CRCs OF stored CRCs). That framing dictates the
  * refusal split:
  *
  *  - the LENGTH crc failing on the first record is the only
  *    "not a TFRecord" detector the format offers (valid = 0);
  *  - a LENGTH crc failing mid-stream leaves nothing trustworthy to
  *    advance by — the walk stops and reports `truncated = 1`
  *    (records before the break serve, q82's stance);
  *  - a DATA crc failing refuses THAT RECORD (counted, not served,
  *    its bytes excluded from the accounting) while the verified
  *    length still advances the walk to its siblings — the
  *    per-member discipline of q132/q136;
  *  - a record extending past EOF is a truncated download.
  *
  * The length is genuinely little-endian: a big-endian reader passes
  * the length CRC (it checks raw bytes, not the interpretation) and
  * then walks out of bounds — the oracle's counts catch it. Zero-byte
  * records are legal (the data CRC of the empty span).
  */
object TfRecordEval {

  final case class Res(valid: Int, nRecords: Int, nValid: Int,
                       totalBytes: Long, truncated: Int,
                       first: Array[Byte])

  private def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** TensorFlow's CRC mask: rotate right 15, add the magic. */
  def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  private def u32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def u64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  def parse(b: Array[Byte]): Res = {
    if (b == null || b.length < 12) return Res(0, -1, -1, -1L, -1, null)
    var i = 0
    var nRecords = 0
    var nValid = 0
    var total = 0L
    var truncated = 0
    var first: Array[Byte] = null
    var valid = -1
    var stop = false
    while (!stop) {
      val remaining = b.length - i
      if (remaining == 0) { stop = true } // clean end
      else if (remaining < 12) {
        // a record cannot start here: a partial tail
        if (valid < 0) return Res(0, -1, -1, -1L, -1, null)
        truncated = 1; stop = true
      } else {
        val lcrcOk = mask(crc32c(b, i, 8)) == u32le(b, i + 8)
        if (!lcrcOk) {
          if (valid < 0) return Res(0, -1, -1, -1L, -1, null)
          // mid-stream length corruption: nothing trustworthy advances
          truncated = 1; stop = true
        } else {
          valid = 1
          val len = u64le(b, i)
          if (len < 0L || len > (remaining - 16).toLong) {
            // verified length pointing past EOF: truncated download
            truncated = 1; stop = true
          } else {
            val l = len.toInt
            val data = i + 12
            nRecords += 1
            if (mask(crc32c(b, data, l)) == u32le(b, data + l)) {
              nValid += 1
              total += l
              if (first == null)
                first = java.util.Arrays.copyOfRange(b, data, data + l)
            }
            i = data + l + 4
          }
        }
      }
    }
    if (valid < 0) Res(0, -1, -1, -1L, -1, null)
    else Res(1, nRecords, nValid, total, truncated, first)
  }

  def valid(b: Array[Byte]): Int = parse(b).valid

  def records(b: Array[Byte]): Int = parse(b).nRecords

  def validRecords(b: Array[Byte]): Int = parse(b).nValid

  def totalBytes(b: Array[Byte]): Long = parse(b).totalBytes

  def truncated(b: Array[Byte]): Int = parse(b).truncated

  def first(b: Array[Byte]): Array[Byte] = {
    val r = parse(b)
    if (r.valid == 0) null else r.first
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
    o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
  }

  private def putU64le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 8) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  /** Append one record; `corruptData` flips a data-CRC bit. */
  def record(o: java.io.ByteArrayOutputStream, payload: Array[Byte],
             corruptData: Boolean): Unit = {
    val lenBytes = new java.io.ByteArrayOutputStream()
    putU64le(lenBytes, payload.length.toLong)
    val lb = lenBytes.toByteArray
    o.write(lb, 0, 8)
    putU32le(o, mask(crc32c(lb, 0, 8)))
    o.write(payload, 0, payload.length)
    val d = mask(crc32c(payload, 0, payload.length))
    putU32le(o, if (corruptData) d ^ 1 else d)
  }

  /** Synthesize a q160 stream. `params` packs `doc_id | mode << 40`:
    * 0 -> three word-payload records; 1 -> an EMPTY record (legal),
    * a >255-byte record (the length's second byte is significant —
    * a big-endian reader walks out of bounds), and a word record;
    * 2 -> class 0 with record 1's DATA crc corrupted (counted, not
    * served, siblings read); 3 -> class 0 cut 6 bytes short (the
    * last record refuses, earlier ones serve, truncated = 1).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def pay(k: Int): Array[Byte] =
      (ws(k) + " " + ws(k + 1) + "#" + (id % 97 + k)).getBytes(utf8)
    val o = new java.io.ByteArrayOutputStream()
    if (mode == 1) {
      record(o, Array.emptyByteArray, corruptData = false)
      val big = (ws(0) + " ") * 60
      record(o, big.getBytes(utf8), corruptData = false)
      record(o, pay(2), corruptData = false)
    } else {
      record(o, pay(0), corruptData = false)
      record(o, pay(1), corruptData = mode == 2)
      record(o, pay(2), corruptData = false)
    }
    val all = o.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 6)
    else all
  }
}

/** `binary -> int`: 1 iff the first record's length CRC validates. */
case class TfrValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_valid"

  override protected def nullSafeEval(input: Any): Any =
    TfRecordEval.valid(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.TfRecordEval.valid($b)")

  override protected def withNewChildInternal(newChild: Expression): TfrValid =
    copy(child = newChild)
}

/** `binary -> int`: fully-framed record count, NULL on refusal. */
case class TfrRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_records"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfRecordEval.records(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tfn")
      s"""
         |int $res = graft.functions.TfRecordEval.records($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfrRecords =
    copy(child = newChild)
}

/** `binary -> int`: data-CRC-verified record count, NULL on refusal. */
case class TfrValidRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_valid_records"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfRecordEval.validRecords(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tfv")
      s"""
         |int $res = graft.functions.TfRecordEval.validRecords($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfrValidRecords =
    copy(child = newChild)
}

/** `binary -> long`: verified payload byte sum, NULL on refusal. */
case class TfrTotalBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_bytes"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfRecordEval.totalBytes(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tfb")
      s"""
         |long $res = graft.functions.TfRecordEval.totalBytes($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfrTotalBytes =
    copy(child = newChild)
}

/** `binary -> int`: 1 iff the walk stopped before a clean end. */
case class TfrTruncated(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_truncated"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfRecordEval.truncated(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tft")
      s"""
         |int $res = graft.functions.TfRecordEval.truncated($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfrTruncated =
    copy(child = newChild)
}

/** `binary -> binary`: first data-CRC-verified payload. */
case class TfrFirst(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_first"

  override protected def nullSafeEval(input: Any): Any =
    TfRecordEval.first(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("tff")
      s"""
         |byte[] $res = graft.functions.TfRecordEval.first($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfrFirst =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q160's synthesis. */
case class TfrSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfr_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    TfRecordEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.TfRecordEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TfrSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the TFRecord kernels. */
object TfRecordOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def tfrValid(b: Column): Column = ColumnBridge.column(TfrValid(bin(b)))
  def tfrRecords(b: Column): Column = ColumnBridge.column(TfrRecords(bin(b)))
  def tfrValidRecords(b: Column): Column =
    ColumnBridge.column(TfrValidRecords(bin(b)))
  def tfrTotalBytes(b: Column): Column =
    ColumnBridge.column(TfrTotalBytes(bin(b)))
  def tfrTruncated(b: Column): Column =
    ColumnBridge.column(TfrTruncated(bin(b)))
  def tfrFirst(b: Column): Column = ColumnBridge.column(TfrFirst(bin(b)))

  def tfrSynth(text: Column, params: Column): Column =
    ColumnBridge.column(TfrSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
