package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Avro Object Container File walk (q164) — the OTHER lake
  * interchange format beside Parquet (Kafka pipelines and warehouse
  * exports hand corpora over as `.avro`; a training-data build that
  * cannot read it re-ingests through a lossy CSV hop). The container
  * (Avro 1.11 spec, "Object Container Files"):
  *
  *   `Obj\x01` magic | file-metadata map | 16-byte sync marker,
  *   then per block: object count (zigzag varint long) | byte size
  *   (zigzag varint long) | serialized objects (codec-compressed) |
  *   the SAME 16-byte sync marker.
  *
  * The format's real traps, each load-bearing here:
  *
  *  - every integer is a ZIGZAG varint — a plain-varint reader maps
  *    count 3 to 6 and walks into garbage; negative longs (legal in
  *    payload fields) are small zigzags, not 10-byte two's-complement;
  *  - the metadata MAP has two legal spellings: a positive item
  *    count, or a NEGATIVE count whose absolute value is the item
  *    count with a byte-size long following (spec: "if a block's
  *    count is negative, its absolute value is used, and the count is
  *    followed immediately by a long block size") — a reader that
  *    only knows the positive form dies on real writers that emit
  *    the sized form for skippability;
  *  - `avro.codec` absent means `null` (identity); `deflate` is RAW
  *    deflate (RFC 1951, no zlib wrapper — the ZIP discipline, shared
  *    thread-local Inflater); an UNKNOWN codec keeps the container
  *    verdict and refuses the records (q132's per-layer stance);
  *  - each block's trailing sync marker must EQUAL the header's —
  *    a mismatch means the stream was spliced or corrupted and
  *    nothing after the last good block is trustworthy (blocks
  *    before it serve, `truncated = 1` — q82's stop-don't-guess);
  *  - truncation mid-block: the verified blocks serve, the tail
  *    refuses.
  *
  * Record decode is SCHEMA-VERIFIED, not schema-general (q161's
  * named-feature stance): the engine reads corpus records of the
  * stated shape `{id: long, delta: long, text: string,
  * tag: [null, string]}` and checks the container's declared
  * `avro.schema` actually spells those fields in order before
  * decoding a byte — a container declaring anything else keeps its
  * metadata verdict with NULL record facts.
  */
object AvroEval {

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Field names the stated corpus schema must declare, in order. */
  private val Fields = Array("\"id\"", "\"delta\"", "\"text\"", "\"tag\"")

  private val infl = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater(true) // raw deflate, Avro spec "deflate"
  }

  final case class Res(isAvro: Int, codec: Int, nBlocks: Int, nRecords: Int,
                       nTagged: Int, truncated: Int, sumIds: Long,
                       sumDelta: Long, first: Array[Byte])

  private val Refuse = Res(0, -1, -1, -1, -1, -1, Long.MinValue,
    Long.MinValue, null)

  // ------------------------------------------------------------ varints

  /** Zigzag varint long at `off`; returns (value, nextOff) packed as
    * two array slots, or null on truncation/overlong. */
  private def zigzag(b: Array[Byte], off: Int): Array[Long] = {
    var i = off
    var shift = 0
    var acc = 0L
    while (i < b.length && shift <= 63) {
      val v = b(i) & 0xFF
      acc |= (v & 0x7FL) << shift
      i += 1
      if ((v & 0x80) == 0) {
        val dec = (acc >>> 1) ^ -(acc & 1L)
        return Array(dec, i.toLong)
      }
      shift += 7
    }
    null
  }

  // ------------------------------------------------------------- walk

  /** Decode one record of the stated schema starting at `off` in the
    * (decompressed) block; returns next offset or -1, accumulating
    * into `acc` = (sumIds, sumDelta, nTagged, firstText or null). */
  private final class RecAcc {
    var sumIds = 0L
    var sumDelta = 0L
    var nTagged = 0
    var first: Array[Byte] = null
  }

  private def readRecord(b: Array[Byte], off: Int, acc: RecAcc): Int = {
    val idv = zigzag(b, off)
    if (idv == null) return -1
    val dv = zigzag(b, idv(1).toInt)
    if (dv == null) return -1
    val tl = zigzag(b, dv(1).toInt)
    if (tl == null || tl(0) < 0L) return -1
    // bounds math in Long: a claimed length near Int.MaxValue must not
    // wrap negative and slip past the check (one crafted file would
    // otherwise crash the job instead of refusing)
    if (tl(1) + tl(0) > b.length.toLong) return -1
    val tStart = tl(1).toInt
    val tLen = tl(0).toInt
    val uv = zigzag(b, tStart + tLen)
    if (uv == null) return -1
    var next = uv(1).toInt
    if (uv(0) == 1L) { // union branch 1: string tag present
      val gl = zigzag(b, next)
      if (gl == null || gl(0) < 0L) return -1
      val nextL = gl(1) + gl(0) // Long math — no Int wrap on huge claims
      if (nextL > b.length.toLong) return -1
      next = nextL.toInt
      acc.nTagged += 1
    } else if (uv(0) != 0L) return -1 // only [null, string] is legal
    acc.sumIds += idv(0)
    acc.sumDelta += dv(0)
    if (acc.first == null)
      acc.first = java.util.Arrays.copyOfRange(b, tStart, tStart + tLen)
    next
  }

  /** Safety net over the walk: any residual index arithmetic a crafted
    * file drives out of range maps to the documented refusal, never an
    * uncaught crash (the OrcKernel/CborKernel pattern). */
  def parse(b: Array[Byte]): Res =
    try parseImpl(b)
    catch {
      case _: IndexOutOfBoundsException => Refuse
      case _: NegativeArraySizeException => Refuse
      case _: IllegalArgumentException => Refuse
    }

  private def parseImpl(b: Array[Byte]): Res = {
    if (b == null || b.length < 20) return Refuse
    var k = 0
    while (k < 4) { if (b(k) != Magic(k)) return Refuse; k += 1 }

    // ---- file metadata map (positive OR negative-sized blocks)
    var i = 4
    var codecStr = "null"
    var schema: String = null
    var done = false
    while (!done) {
      val cv = zigzag(b, i)
      if (cv == null) return Refuse
      var n = cv(0)
      i = cv(1).toInt
      if (n == 0L) done = true
      else {
        if (n < 0L) { // sized form: |n| items after a byte-size long
          val sz = zigzag(b, i)
          if (sz == null || sz(0) < 0L) return Refuse
          i = sz(1).toInt
          n = -n
        }
        var j = 0L
        while (j < n) {
          val kl = zigzag(b, i)
          if (kl == null || kl(0) < 0L) return Refuse
          if (kl(1) + kl(0) > b.length.toLong) return Refuse // Long math
          val kStart = kl(1).toInt
          val kLen = kl(0).toInt
          val key = new String(b, kStart, kLen,
            java.nio.charset.StandardCharsets.UTF_8)
          val vl = zigzag(b, kStart + kLen)
          if (vl == null || vl(0) < 0L) return Refuse
          if (vl(1) + vl(0) > b.length.toLong) return Refuse // Long math
          val vStart = vl(1).toInt
          val vLen = vl(0).toInt
          if (key == "avro.codec")
            codecStr = new String(b, vStart, vLen,
              java.nio.charset.StandardCharsets.UTF_8)
          else if (key == "avro.schema")
            schema = new String(b, vStart, vLen,
              java.nio.charset.StandardCharsets.UTF_8)
          i = vStart + vLen
          j += 1
        }
      }
    }
    if (i + 16 > b.length) return Refuse
    val sync = java.util.Arrays.copyOfRange(b, i, i + 16)
    i += 16

    val codecId = codecStr match {
      case "null" => 1
      case "deflate" => 2
      case _ => 3
    }
    // stated-schema verification: the declared record must spell the
    // four field names in order (q161's named-feature stance)
    val schemaOk = schema != null && {
      var pos = 0
      var ok = true
      var f = 0
      while (ok && f < Fields.length) {
        val at = schema.indexOf(Fields(f), pos)
        if (at < 0) ok = false else pos = at + Fields(f).length
        f += 1
      }
      ok
    }
    val decodable = codecId != 3 && schemaOk

    // ---- data blocks
    var nBlocks = 0
    var nRecords = 0
    var truncated = 0
    val acc = new RecAcc
    var stop = false
    while (!stop) {
      if (i == b.length) stop = true // clean end
      else {
        val cv = zigzag(b, i)
        val sv = if (cv == null) null else zigzag(b, cv(1).toInt)
        if (cv == null || sv == null || cv(0) < 0L || sv(0) < 0L ||
          sv(1).toInt + sv(0) + 16 > b.length) {
          truncated = 1; stop = true
        } else {
          val count = cv(0).toInt
          val size = sv(0).toInt
          val dStart = sv(1).toInt
          // the block's own sync must equal the header's
          var same = true
          var s = 0
          while (s < 16) {
            if (b(dStart + size + s) != sync(s)) same = false
            s += 1
          }
          if (!same) { truncated = 1; stop = true }
          else {
            if (decodable) {
              val body: Array[Byte] =
                if (codecId == 1)
                  java.util.Arrays.copyOfRange(b, dStart, dStart + size)
                else {
                  val inf = infl.get()
                  inf.reset()
                  inf.setInput(b, dStart, size)
                  val out = new java.io.ByteArrayOutputStream()
                  val buf = new Array[Byte](8192)
                  try {
                    var fin = false
                    while (!fin) {
                      val n = inf.inflate(buf)
                      if (n > 0) out.write(buf, 0, n)
                      else fin = true
                      if (inf.finished()) fin = true
                      if (out.size() > (1 << 24)) return Refuse // bomb guard
                    }
                    if (!inf.finished()) { truncated = 1; null }
                    else out.toByteArray
                  } catch {
                    case _: java.util.zip.DataFormatException =>
                      truncated = 1; null
                  }
                }
              if (body == null) stop = true
              else {
                // decode into a block-local accumulator: a block that
                // breaks mid-record contributes NOTHING (blocks serve
                // whole or not at all — q82's stance)
                val blk = new RecAcc
                var off = 0
                var r = 0
                var bad = false
                while (r < count && !bad) {
                  val next = readRecord(body, off, blk)
                  if (next < 0) bad = true else { off = next; r += 1 }
                }
                if (bad || off != body.length) { truncated = 1; stop = true }
                else {
                  nBlocks += 1; nRecords += count
                  acc.sumIds += blk.sumIds
                  acc.sumDelta += blk.sumDelta
                  acc.nTagged += blk.nTagged
                  if (acc.first == null) acc.first = blk.first
                }
              }
            } else { nBlocks += 1; nRecords += count }
            if (!stop) i = dStart + size + 16
          }
        }
      }
    }
    // framing alone gives block/record COUNTS even when the codec or
    // schema refuses the decode — only the record FACTS go NULL
    if (!decodable)
      Res(1, codecId, nBlocks, nRecords, -1, truncated,
        Long.MinValue, Long.MinValue, null)
    else Res(1, codecId, nBlocks, nRecords, acc.nTagged, truncated,
      acc.sumIds, acc.sumDelta, acc.first)
  }

  /** Packed meta: isAvro<<40 | truncated<<36 | codec<<32 |
    * nBlocks<<24 | (nRecords+1)<<12 | (nTagged+1); -1 sentinel when
    * not Avro at all. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r.isAvro == 0) return -1L
    val nr = math.min(r.nRecords + 1, 0xFFF).toLong
    val nt = math.min(r.nTagged + 1, 0xFFF).toLong
    (1L << 40) | (r.truncated.toLong << 36) | (r.codec.toLong << 32) |
      (math.min(r.nBlocks, 0xFF).toLong << 24) | (nr << 12) | nt
  }

  def sumIds(b: Array[Byte]): Long = parse(b).sumIds

  def sumDelta(b: Array[Byte]): Long = parse(b).sumDelta

  def first(b: Array[Byte]): Array[Byte] = parse(b).first

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putZig(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63)
    while ((v & ~0x7FL) != 0L) {
      o.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    o.write(v.toInt)
  }

  private def putStr(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    val u = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    putZig(o, u.length.toLong)
    o.write(u, 0, u.length)
  }

  val SchemaJson: String =
    """{"type":"record","name":"doc","fields":[""" +
      """{"name":"id","type":"long"},{"name":"delta","type":"long"},""" +
      """{"name":"text","type":"string"},""" +
      """{"name":"tag","type":["null","string"]}]}"""

  /** One record of the stated schema. */
  def recordBytes(id: Long, delta: Long, text: String,
                  tag: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putZig(o, id)
    putZig(o, delta)
    putStr(o, text)
    if (tag == null) putZig(o, 0L)
    else { putZig(o, 1L); putStr(o, tag) }
    o.toByteArray
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** Container with the given blocks (already-serialized record
    * concatenations with their counts), metadata form and codec. */
  def container(blocks: Array[(Int, Array[Byte])], codec: String,
                sizedMeta: Boolean, sync: Array[Byte],
                corruptLastSync: Boolean): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Magic, 0, 4)
    val entries = Seq("avro.schema" -> SchemaJson) ++
      (if (codec != null) Seq("avro.codec" -> codec) else Nil) ++
      (if (sizedMeta) Seq("user.meta" -> "graft") else Nil)
    if (sizedMeta) {
      // the negative-count sized form: measure the items first
      val items = new java.io.ByteArrayOutputStream()
      entries.foreach { case (k, v) => putStr(items, k); putStr(items, v) }
      val ib = items.toByteArray
      putZig(o, -entries.size.toLong)
      putZig(o, ib.length.toLong)
      o.write(ib, 0, ib.length)
    } else {
      putZig(o, entries.size.toLong)
      entries.foreach { case (k, v) => putStr(o, k); putStr(o, v) }
    }
    putZig(o, 0L)
    o.write(sync, 0, 16)
    var bi = 0
    while (bi < blocks.length) {
      val (count, raw) = blocks(bi)
      val body = if (codec == "deflate") deflateRaw(raw) else raw
      putZig(o, count.toLong)
      putZig(o, body.length.toLong)
      o.write(body, 0, body.length)
      val s = sync.clone()
      if (corruptLastSync && bi == blocks.length - 1) s(0) = (s(0) ^ 1).toByte
      o.write(s, 0, 16)
      bi += 1
    }
    o.toByteArray
  }

  /** Synthesize a q164 container. `params` packs `doc_id | mode<<40`:
    * 0 -> null codec, one 3-record block, positive-count metadata;
    * 1 -> deflate codec, TWO blocks (2+1), negative-SIZED metadata
    * with an extra ignored key; 2 -> null codec, two blocks, the
    * SECOND block's sync corrupted (block 1 serves, truncated);
    * 3 -> deflate, two blocks cut 6 bytes short into block 2's
    * trailing sync (block 1 serves, truncated). Records:
    * id = doc_id*10+k, delta = -(doc_id%97)-k, text = q160's word
    * payload, tag = word k on even k else null.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    def pay(k: Int): String = ws(k) + " " + ws(k + 1) + "#" + (id % 97 + k)
    def rec(k: Int): Array[Byte] =
      recordBytes(id * 10 + k, -(id % 97) - k, pay(k),
        if (k % 2 == 0) ws(k) else null)
    val sync = new Array[Byte](16)
    var s = 0
    while (s < 16) { sync(s) = ((id + s * 7) % 251).toByte; s += 1 }
    def cat(ks: Int*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      ks.foreach { k => val r = rec(k); o.write(r, 0, r.length) }
      o.toByteArray
    }
    mode match {
      case 1 => container(Array((2, cat(0, 1)), (1, cat(2))), "deflate",
        sizedMeta = true, sync, corruptLastSync = false)
      case 2 => container(Array((2, cat(0, 1)), (1, cat(2))), "null",
        sizedMeta = false, sync, corruptLastSync = true)
      case 3 =>
        val whole = container(Array((2, cat(0, 1)), (1, cat(2))), "deflate",
          sizedMeta = false, sync, corruptLastSync = false)
        java.util.Arrays.copyOfRange(whole, 0, whole.length - 6)
      case _ => container(Array((3, cat(0, 1, 2))), "null",
        sizedMeta = false, sync, corruptLastSync = false)
    }
  }
}

/** `binary -> long`: packed container meta, -1 when not Avro. */
case class AvroMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_meta"

  override protected def nullSafeEval(input: Any): Any =
    AvroEval.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.AvroEval.meta($b)")

  override protected def withNewChildInternal(newChild: Expression): AvroMeta =
    copy(child = newChild)
}

/** `binary -> long`: sum of decoded record ids, NULL on refusal. */
case class AvroSumIds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_sum_ids"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AvroEval.sumIds(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("asi")
      s"""
         |long $res = graft.functions.AvroEval.sumIds($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AvroSumIds =
    copy(child = newChild)
}

/** `binary -> long`: sum of decoded `delta` fields (negative zigzags
  * by construction), NULL on refusal. */
case class AvroSumDelta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_sum_delta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AvroEval.sumDelta(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("asd")
      s"""
         |long $res = graft.functions.AvroEval.sumDelta($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AvroSumDelta =
    copy(child = newChild)
}

/** `binary -> binary`: the first decoded record's text bytes. */
case class AvroFirst(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_first"

  override protected def nullSafeEval(input: Any): Any =
    AvroEval.first(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("afb")
      s"""
         |byte[] $res = graft.functions.AvroEval.first($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AvroFirst =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q164's synthesis. */
case class AvroSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    AvroEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.AvroEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AvroSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the Avro kernels. */
object AvroOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def avroMeta(b: Column): Column = ColumnBridge.column(AvroMeta(bin(b)))
  def avroSumIds(b: Column): Column = ColumnBridge.column(AvroSumIds(bin(b)))
  def avroSumDelta(b: Column): Column =
    ColumnBridge.column(AvroSumDelta(bin(b)))
  def avroFirst(b: Column): Column = ColumnBridge.column(AvroFirst(bin(b)))

  def avroSynth(text: Column, params: Column): Column =
    ColumnBridge.column(AvroSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
