package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** OGG container metadata (q149) — the fourth audio-triage rung
  * (q56/q62 WAV, q130 MP3, q139 FLAC): podcasts and speech corpora
  * ship as Ogg Vorbis/Opus, and the container has two traps a byte
  * peek gets wrong:
  *
  *  - LACING: a page's segment table spells packet lengths in
  *    255-valued runs — a lacing value of 255 means "packet
  *    continues", so a packet of EXACTLY 255 bytes needs a
  *    terminating 0 lacing value, and a reader that counts lacing
  *    entries as packets overcounts;
  *  - the GRANULE position is a 64-bit little-endian sample count —
  *    a u32 reader truncates any file longer than ~25 hours at 48 kHz
  *    (the synthesizer crosses 2^32 on purpose); duration derives
  *    from the LAST page's granule over the codec clock — Vorbis
  *    counts in the stream's own sample rate, Opus ALWAYS in 48 kHz
  *    regardless of the input rate the header reports;
  *  - codec identification is the FIRST packet of the BOS page:
  *    `vorbis` (channels u8 at 11, rate u32le at 12) or
  *    `OpusHead` (channels u8 at 9, input rate u32le at 12);
  *  - CROSS-PAGE packet reassembly: a page ending with lacing 255
  *    leaves its packet OPEN and the next page must carry the
  *    continued-packet flag (header_type bit 0) — the packet counts
  *    ONCE, where it terminates; a flag that disagrees with the
  *    carry state (set with nothing open, or clear with a packet
  *    open) marks a spliced/lossy stream and refuses, and a stream
  *    ENDING with an open packet is a truncation and refuses
  *    (stop-don't-guess);
  *  - a page running past EOF is a truncated download and refuses
  *    the FIELDS while the magic verdict survives (q139's split);
  *    out of scope, stated: page CRC verification (transport
  *    integrity is q95's rung).
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — audio triage is a north-star
  * extension of the multimodal meta family (q33/q39/q129/q130/q139).
  */
object OggEval {

  final case class Meta(codec: String, pages: Int, packets: Int,
                        channels: Int, rate: Int, granule: Long,
                        durationMs: Long)

  def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def u64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }

  def parse(b: Array[Byte]): Meta = {
    if (!isOgg(b)) return null
    var off = 0
    var pages = 0
    var packets = 0
    var codec: String = null
    var channels = -1; var rate = -1
    var lastGranule = -1L
    var openAcross = false // a packet left open at the previous page end
    while (off < b.length) {
      if (off + 27 > b.length) return null // truncated mid-header
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S')) return null // lost sync: refuse, never scan
      if (b(off + 4) != 0) return null // version must be 0
      // continued-packet flag must agree with the carry state: a flag
      // set with nothing open (or clear with a packet open) means a
      // page went missing — a spliced stream, refuse
      val contFlag = (b(off + 5) & 0x01) != 0
      if (contFlag != openAcross) return null
      val granule = u64le(b, off + 6)
      val nSegs = b(off + 26) & 0xFF
      if (off + 27 + nSegs > b.length) return null
      // lacing: 255 continues the packet, < 255 terminates it; a
      // packet open from the PREVIOUS page terminates here and counts
      // ONCE (cross-page reassembly)
      var payload = 0
      var open = openAcross
      var i = 0
      while (i < nSegs) {
        val l = b(off + 27 + i) & 0xFF
        payload += l
        if (l == 255) open = true
        else { packets += 1; open = false }
        i += 1
      }
      openAcross = open
      val body = off + 27 + nSegs
      if (body + payload > b.length) return null // truncated mid-page
      pages += 1
      lastGranule = granule
      if (pages == 1 && payload >= 8) {
        if (b(body) == 0x01 && b(body + 1) == 'v' && b(body + 2) == 'o' &&
          b(body + 3) == 'r' && b(body + 4) == 'b' && b(body + 5) == 'i' &&
          b(body + 6) == 's' && payload >= 16) {
          codec = "vorbis"
          channels = b(body + 11) & 0xFF
          rate = u32le(b, body + 12).toInt
        } else if (b(body) == 'O' && b(body + 1) == 'p' && b(body + 2) == 'u' &&
          b(body + 3) == 's' && b(body + 4) == 'H' && b(body + 5) == 'e' &&
          b(body + 6) == 'a' && b(body + 7) == 'd' && payload >= 16) {
          codec = "opus"
          channels = b(body + 9) & 0xFF
          rate = u32le(b, body + 12).toInt
        } else return null // first packet identifies or the file refuses
      }
      off = body + payload
    }
    if (codec == null || rate <= 0) return null
    if (openAcross) return null // the stream ends mid-packet: truncated
    // Opus granules tick at 48 kHz regardless of the input rate
    val clock = if (codec == "opus") 48000L else rate.toLong
    val dur = if (lastGranule < 0) -1L else lastGranule * 1000L / clock
    Meta(codec, pages, packets, channels, rate, lastGranule, dur)
  }

  def codec(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.codec
  }

  def pages(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.pages
  }

  def packets(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.packets
  }

  def channels(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.channels
  }

  def rate(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.rate
  }

  def granule(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.granule
  }

  def durationMs(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.durationMs
  }

  // -------------------------------------------------------------- synth

  private val Rates = Array(8000, 22050, 44100, 48000)

  private def putU32le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  private def putU64le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def page(out: java.io.ByteArrayOutputStream, headerType: Int,
                   granule: Long, serial: Long, seq: Long,
                   lacing: Array[Int], payload: Array[Byte]): Unit = {
    out.write('O'); out.write('g'); out.write('g'); out.write('S')
    out.write(0) // version
    out.write(headerType)
    putU64le(out, granule)
    putU32le(out, serial)
    putU32le(out, seq)
    putU32le(out, 0L) // CRC: out of stated scope
    out.write(lacing.length)
    lacing.foreach(out.write)
    out.write(payload, 0, payload.length)
  }

  /** Synthesize a q149 OGG stream. `params` packs `doc_id | mode<<40`:
    * 0 -> Vorbis, BOS ident page + EOS data page (one 20-byte
    * packet); 1 -> Opus, same layout; 2 -> Vorbis whose data page
    * carries a 255-byte packet (lacing `255, 0` — the terminator
    * drill) AND the 20-byte packet; 3 -> class 0 cut 15 bytes short
    * (truncated mid-page, refuses fields); 4 -> a packet SPLIT ACROSS
    * pages — the data page ends with lacing `255, 255` (510 bytes,
    * open) and an EOS page with the continued-packet flag terminates
    * it (lacing `30`) beside a fresh 20-byte packet: 3 pages, 3
    * packets (the split one counts ONCE, where it ends). The last
    * granule crosses 2^32 on purpose (a u32 reader truncates).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val serial = id % 100000L
    val rate = Rates((id % 4).toInt)
    val ch = 1 + (id % 2).toInt
    val granule = 4294967296L + (id % 1000L) * 960L
    val out = new java.io.ByteArrayOutputStream()
    // BOS page: the identification packet
    val ident: Array[Byte] =
      if (mode == 1) {
        val p = new java.io.ByteArrayOutputStream()
        p.write("OpusHead".getBytes("US-ASCII"))
        p.write(1) // version
        p.write(ch)
        p.write(0x38); p.write(0x01) // pre-skip 312, LE
        putU32le(p, rate.toLong) // input sample rate
        p.write(0); p.write(0) // output gain
        p.write(0) // mapping family
        p.toByteArray
      } else {
        val p = new java.io.ByteArrayOutputStream()
        p.write(0x01)
        p.write("vorbis".getBytes("US-ASCII"))
        putU32le(p, 0L) // version
        p.write(ch)
        putU32le(p, rate.toLong)
        putU32le(p, 0L); putU32le(p, 0L); putU32le(p, 0L) // bitrates
        p.write(0xB8) // blocksizes
        p.write(0x01) // framing bit
        p.toByteArray
      }
    page(out, 0x02, 0L, serial, 0L, Array(ident.length), ident)
    // EOS data page
    if (mode == 2) {
      val big = Array.fill[Byte](255)(0x42)
      val small = Array.fill[Byte](20)(0x17)
      page(out, 0x04, granule, serial, 1L, Array(255, 0, 20), big ++ small)
    } else if (mode == 4) {
      // a 540-byte packet split across two pages: the first leaves it
      // OPEN (-1 granule: no packet ends here), the EOS page carries
      // the continuation flag and terminates it beside a fresh packet
      val head = Array.fill[Byte](510)(0x33)
      page(out, 0x00, -1L, serial, 1L, Array(255, 255), head)
      val tail = Array.fill[Byte](30)(0x34)
      val small = Array.fill[Byte](20)(0x17)
      page(out, 0x04 | 0x01, granule, serial, 2L, Array(30, 20),
        tail ++ small)
    } else {
      val small = Array.fill[Byte](20)(0x17)
      page(out, 0x04, granule, serial, 1L, Array(20), small)
    }
    val all = out.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 15)
    else all
  }
}

/** `binary -> string`: `vorbis` | `opus`, NULL on refusal. */
case class OggCodec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_codec"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.codec(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("oc")
      s"""
         |String $res = graft.functions.OggEval.codec($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggCodec =
    copy(child = newChild)
}

/** `binary -> int`: page count. */
case class OggPages(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_pages"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.pages(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("op")
      s"""
         |int $res = graft.functions.OggEval.pages($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggPages =
    copy(child = newChild)
}

/** `binary -> int`: lacing-terminated packet count. */
case class OggPackets(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_packets"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.packets(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ok")
      s"""
         |int $res = graft.functions.OggEval.packets($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggPackets =
    copy(child = newChild)
}

/** `binary -> int`: channel count from the ident header. */
case class OggChannels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_channels"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.channels(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("oh")
      s"""
         |int $res = graft.functions.OggEval.channels($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggChannels =
    copy(child = newChild)
}

/** `binary -> int`: sample rate the ident header reports. */
case class OggRate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_rate"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.rate(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("or")
      s"""
         |int $res = graft.functions.OggEval.rate($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggRate =
    copy(child = newChild)
}

/** `binary -> long`: last page's 64-bit granule position. */
case class OggGranule(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_granule"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.granule(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("og")
      s"""
         |long $res = graft.functions.OggEval.granule($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggGranule =
    copy(child = newChild)
}

/** `binary -> long`: duration in ms over the codec clock. */
case class OggDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_duration_ms"

  override protected def nullSafeEval(input: Any): Any = {
    val r = OggEval.durationMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("od")
      s"""
         |long $res = graft.functions.OggEval.durationMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OggDurationMs =
    copy(child = newChild)
}

/** `long -> binary`: q149's synthesis (params pack `doc_id|mode<<40`). */
case class OggSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ogg_synth"

  override protected def nullSafeEval(params: Any): Any =
    OggEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.OggEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): OggSynth =
    copy(child = newChild)
}

/** Column surface for the OGG kernels. */
object OggOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def oggCodec(b: Column): Column = ColumnBridge.column(OggCodec(bin(b)))
  def oggPages(b: Column): Column = ColumnBridge.column(OggPages(bin(b)))
  def oggPackets(b: Column): Column = ColumnBridge.column(OggPackets(bin(b)))
  def oggChannels(b: Column): Column = ColumnBridge.column(OggChannels(bin(b)))
  def oggRate(b: Column): Column = ColumnBridge.column(OggRate(bin(b)))
  def oggGranule(b: Column): Column = ColumnBridge.column(OggGranule(bin(b)))
  def oggDurationMs(b: Column): Column = ColumnBridge.column(OggDurationMs(bin(b)))

  def oggSynth(params: Column): Column =
    ColumnBridge.column(OggSynth(ColumnBridge.expression(params.cast("long"))))
}
