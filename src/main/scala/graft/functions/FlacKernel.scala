package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FLAC header metadata (q139) — the third audio-triage rung (q56/q62
  * cover WAV, q130 MP3): lossless archives and podcast masters ship as
  * FLAC, and a correct header read is a real parse, not a byte peek:
  *
  *  - `fLaC` magic, then METADATA BLOCKS: a 1-byte header whose TOP
  *    bit is the last-block flag and low 7 bits the type, plus a
  *    24-bit BIG-endian length; unknown types (PADDING, APPLICATION,
  *    SEEKTABLE) skip by length; a block running past EOF refuses the
  *    FIELDS while the magic verdict survives (q39's meta split);
  *  - STREAMINFO (type 0) must be FIRST and exactly 34 bytes; its
  *    tail packs sample rate (20 bits), channels-1 (3), bits-1 (5),
  *    and total samples (36 — crossing 32 bits, a u32 reader
  *    truncates) into one bit-packed 64-bit field;
  *  - VORBIS_COMMENT (type 4) flips endianness MID-FILE: FLAC frames
  *    the block big-endian, but the Vorbis payload inside is
  *    LITTLE-endian u32s (vendor length, comment count, per-comment
  *    lengths) — the single most common FLAC-reader bug; the comment
  *    KEY is case-insensitive, values are UTF-8, and `TITLE` is
  *    extracted;
  *  - a zero sample rate refuses (duration would divide by zero);
  *    duration is `total_samples * 1000 / rate` in Long arithmetic.
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — audio triage is a north-star
  * extension of the multimodal meta family (q33/q39/q129/q130).
  */
object FlacEval {

  final case class Meta(nBlocks: Int, rate: Int, channels: Int, bits: Int,
                        totalSamples: Long, title: String)

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  private def u24be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Full block walk; null when the header is unreadable. */
  def parse(b: Array[Byte]): Meta = {
    if (!isFlac(b)) return null
    var off = 4
    var n = 0
    var last = false
    var rate = -1; var channels = -1; var bits = -1
    var total = -1L
    var title: String = null
    while (!last) {
      if (off + 4 > b.length) return null // truncated mid-header
      val h = b(off) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = u24be(b, off + 1)
      val body = off + 4
      if (body + len > b.length) return null // truncated mid-block
      if (n == 0) {
        // STREAMINFO must be FIRST and exactly 34 bytes
        if (btype != 0 || len != 34) return null
        // the bit-packed tail: 8 bytes at body+10
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (b(body + 10 + i) & 0xFFL); i += 1 }
        rate = (v >>> 44).toInt // 20 bits
        channels = ((v >>> 41) & 0x7).toInt + 1
        bits = ((v >>> 36) & 0x1F).toInt + 1
        total = v & ((1L << 36) - 1)
        if (rate == 0) return null // duration would divide by zero
      } else if (btype == 4) {
        // VORBIS_COMMENT: LITTLE-endian u32s inside a big-endian file
        var p = body
        if (p + 4 > body + len) return null
        val vlen = u32le(b, p); p += 4
        if (vlen < 0 || p + vlen > body + len) return null
        p += vlen.toInt
        if (p + 4 > body + len) return null
        val count = u32le(b, p); p += 4
        var c = 0L
        while (c < count) {
          if (p + 4 > body + len) return null
          val clen = u32le(b, p); p += 4
          if (clen < 0 || p + clen > body + len) return null
          val s = new String(b, p, clen.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          val eq = s.indexOf('=')
          if (eq > 0 &&
            s.substring(0, eq).equalsIgnoreCase("TITLE") && title == null) {
            title = s.substring(eq + 1)
          }
          p += clen.toInt
          c += 1
        }
      }
      // other types: skipped by declared length
      n += 1
      off = body + len
    }
    Meta(n, rate, channels, bits, total, title)
  }

  def blocks(b: Array[Byte]): Int = {
    val m = parse(b)
    if (m == null) -1 else m.nBlocks
  }

  def rate(b: Array[Byte]): Int = {
    val m = parse(b)
    if (m == null) -1 else m.rate
  }

  def channels(b: Array[Byte]): Int = {
    val m = parse(b)
    if (m == null) -1 else m.channels
  }

  def bits(b: Array[Byte]): Int = {
    val m = parse(b)
    if (m == null) -1 else m.bits
  }

  def totalSamples(b: Array[Byte]): Long = {
    val m = parse(b)
    if (m == null) -1L else m.totalSamples
  }

  def durationMs(b: Array[Byte]): Long = {
    val m = parse(b)
    if (m == null) -1L else m.totalSamples * 1000L / m.rate
  }

  def title(b: Array[Byte]): String = {
    val m = parse(b)
    if (m == null) null else m.title
  }

  // -------------------------------------------------------------- synth

  private def blockHeader(out: java.io.ByteArrayOutputStream, btype: Int,
                          len: Int, last: Boolean): Unit = {
    out.write((if (last) 0x80 else 0) | btype)
    out.write((len >> 16) & 0xFF); out.write((len >> 8) & 0xFF)
    out.write(len & 0xFF)
  }

  private def streamInfo(rate: Int, channels: Int, bits: Int,
                         total: Long): Array[Byte] = {
    val si = new Array[Byte](34)
    // min/max blocksize 4096
    si(0) = 0x10; si(1) = 0x00; si(2) = 0x10; si(3) = 0x00
    // min/max framesize left zero (unknown)
    var v = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | (total & ((1L << 36) - 1))
    var i = 7
    while (i >= 0) { si(10 + (7 - i)) = ((v >>> (i * 8)) & 0xFF).toByte; i -= 1 }
    // md5 left zero (unknown audio)
    si
  }

  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  /** Synthesize a q139 FLAC header from a document's byte count.
    * `params` packs `doc_id | mode<<40`: 0 → STREAMINFO only;
    * 1 → STREAMINFO + PADDING + VORBIS_COMMENT (TITLE + a
    * lowercase-key artist decoy, the little-endian drill) last;
    * 2 → the wide shape (96 kHz, 8 channels, 24-bit, a 36-bit total
    * crossing 2^33) carrying the same comment trio; 3 → truncated
    * mid-STREAMINFO (magic survives, fields refuse).
    */
  def synth(textLen: Long, params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val rateTab = Array(44100, 48000, 32000)
    val rate = if (mode == 2) 96000 else rateTab((id % 3).toInt)
    val channels = if (mode == 2) 8 else (id % 2).toInt + 1
    val bits = if (mode == 2) 24 else 16
    val total =
      if (mode == 2) (1L << 33) + textLen
      else textLen * 1000L + id % 997
    val out = new java.io.ByteArrayOutputStream(256)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = streamInfo(rate, channels, bits, total)
    if (mode == 3) {
      blockHeader(out, 0, 34, last = true)
      out.write(si, 0, 20) // cut mid-block
      return out.toByteArray
    }
    blockHeader(out, 0, 34, last = mode == 0)
    out.write(si, 0, 34)
    if (mode != 0) {
      // PADDING: an unknown-to-the-fields block skipped by length
      blockHeader(out, 1, 6, last = false)
      out.write(new Array[Byte](6), 0, 6)
      // VORBIS_COMMENT: little-endian u32s inside the big-endian file
      val vendor = "graft synth".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val c1 = s"TITLE=doc $id title".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val c2 = s"artist=corpus $id".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val vc = new java.io.ByteArrayOutputStream(64)
      le32(vc, vendor.length); vc.write(vendor, 0, vendor.length)
      le32(vc, 2)
      le32(vc, c1.length); vc.write(c1, 0, c1.length)
      le32(vc, c2.length); vc.write(c2, 0, c2.length)
      val vcb = vc.toByteArray
      blockHeader(out, 4, vcb.length, last = true)
      out.write(vcb, 0, vcb.length)
    }
    out.toByteArray
  }
}

/** `binary -> int`: metadata block count, NULL on field refusal. */
case class FlacBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_blocks"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.blocks(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fb")
      s"""
         |int $res = graft.functions.FlacEval.blocks($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacBlocks =
    copy(child = newChild)
}

/** `binary -> int`: sample rate (Hz). */
case class FlacRate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_rate"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.rate(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fr")
      s"""
         |int $res = graft.functions.FlacEval.rate($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacRate =
    copy(child = newChild)
}

/** `binary -> int`: channel count. */
case class FlacChannels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_channels"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.channels(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fc")
      s"""
         |int $res = graft.functions.FlacEval.channels($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacChannels =
    copy(child = newChild)
}

/** `binary -> int`: bits per sample. */
case class FlacBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.bits(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fi")
      s"""
         |int $res = graft.functions.FlacEval.bits($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacBits =
    copy(child = newChild)
}

/** `binary -> long`: total samples (the 36-bit field). */
case class FlacTotalSamples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_total"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.totalSamples(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ft")
      s"""
         |long $res = graft.functions.FlacEval.totalSamples($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacTotalSamples =
    copy(child = newChild)
}

/** `binary -> long`: duration in ms (Long arithmetic). */
case class FlacDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_duration"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.durationMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fd")
      s"""
         |long $res = graft.functions.FlacEval.durationMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacDurationMs =
    copy(child = newChild)
}

/** `binary -> string`: the Vorbis-comment TITLE, NULL when absent. */
case class FlacTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = FlacEval.title(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("fn")
      s"""
         |String $res = graft.functions.FlacEval.title($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacTitle =
    copy(child = newChild)
}

/** `(long textLen, long params) -> binary`: q139's synthesis. */
case class FlacSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_synth"

  override protected def nullSafeEval(textLen: Any, params: Any): Any =
    FlacEval.synth(textLen.asInstanceOf[Long], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.FlacEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FlacSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the FLAC kernels. */
object FlacOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def flacBlocks(b: Column): Column = ColumnBridge.column(FlacBlocks(bin(b)))
  def flacRate(b: Column): Column = ColumnBridge.column(FlacRate(bin(b)))
  def flacChannels(b: Column): Column = ColumnBridge.column(FlacChannels(bin(b)))
  def flacBits(b: Column): Column = ColumnBridge.column(FlacBits(bin(b)))
  def flacTotalSamples(b: Column): Column =
    ColumnBridge.column(FlacTotalSamples(bin(b)))
  def flacDurationMs(b: Column): Column =
    ColumnBridge.column(FlacDurationMs(bin(b)))
  def flacTitle(b: Column): Column = ColumnBridge.column(FlacTitle(bin(b)))

  def flacSynth(textLen: Column, params: Column): Column =
    ColumnBridge.column(FlacSynth(
      ColumnBridge.expression(textLen.cast("long")),
      ColumnBridge.expression(params.cast("long"))))
}
