package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Matroska/WebM (EBML) video metadata (q162) — the fourth
  * video-triage rung (q90 MP4, q102's Y4M, q152 AVI): WebM is THE
  * open web video container, and EBML is unlike every chunk format
  * the family has met — both the element ID and its size are VINTs
  * whose own first byte carries their length in its leading-zero
  * count:
  *
  *  - IDs keep the length-marker bit in their value (`0x1A45DFA3` IS
  *    the EBML header's four bytes); SIZES strip it — conflating the
  *    two reads every payload at the wrong offset;
  *  - an all-value-bits-ones size means UNKNOWN: live-streamed WebM
  *    ships its Segment with `01 FF FF FF FF FF FF FF` (the element
  *    runs to EOF) — a skip-by-size reader jumps off the end of the
  *    file, so the walk must DESCEND into an unknown-size Segment
  *    and refuse unknown sizes anywhere else;
  *  - sizes need not be minimal: `40 23` is a legal 2-byte spelling
  *    of 35 (the synthesizer pads one this way — a reader assuming
  *    1-byte sizes for small values derails);
  *  - Duration (`0x4489`) is a FLOAT, 4 or 8 bytes by its size, in
  *    TimestampScale (`0x2AD7B1`, default 1 000 000 ns) ticks —
  *    `duration_ms = floor(ticks * scale / 1e6)` in double math;
  *  - Cluster (`0x1F43B6F6`) is frame payload (~the whole file in
  *    real captures) and its bytes can spell element IDs — the
  *    synthesizer plants a lying TrackEntry there; the walk never
  *    descends into Cluster (q152's movi decoy discipline);
  *  - a sized element running past EOF refuses WHOLE (truncation).
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — video triage is a north-star
  * extension of the multimodal meta family (q33/q39/q90/q129/q152).
  */
object EbmlEval {

  final case class Meta(doctype: Int, width: Int, height: Int,
                        nVideo: Int, nAudio: Int, durationMs: Long)

  def isEbml(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

  // element IDs (marker bit kept, per the EBML spec's ID convention)
  private final val IdEbml = 0x1A45DFA3L
  private final val IdDocType = 0x4282L
  private final val IdSegment = 0x18538067L
  private final val IdInfo = 0x1549A966L
  private final val IdTimestampScale = 0x2AD7B1L
  private final val IdDuration = 0x4489L
  private final val IdTracks = 0x1654AE6BL
  private final val IdTrackEntry = 0xAEL
  private final val IdTrackType = 0x83L
  private final val IdVideo = 0xE0L
  private final val IdPixelWidth = 0xB0L
  private final val IdPixelHeight = 0xBAL
  private final val IdCluster = 0x1F43B6F6L

  // state indices into the walk's long[] scratch
  private final val HasHeader = 0
  private final val Doctype = 1
  private final val W = 2
  private final val H = 3
  private final val NVid = 4
  private final val NAud = 5
  private final val Scale = 6
  private final val DurBits = 7
  private final val HasDur = 8
  private final val TrackType = 9

  private def uintAt(b: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L
    var k = 0
    while (k < len) { v = (v << 8) | (b(from + k) & 0xFF); k += 1 }
    v
  }

  /** Walk one element run in [from, to); returns false on refusal. */
  private def walk(b: Array[Byte], from: Int, to: Int,
                   m: Array[Long]): Boolean = {
    var i = from
    while (i < to) {
      // ID vint: leading-zero count of the FIRST byte gives the
      // length; the marker bit stays IN the value
      val fb = b(i) & 0xFF
      val ilen =
        if ((fb & 0x80) != 0) 1 else if ((fb & 0x40) != 0) 2
        else if ((fb & 0x20) != 0) 3 else if ((fb & 0x10) != 0) 4 else -1
      if (ilen < 0 || i + ilen > to) return false
      val id = uintAt(b, i, ilen)
      val j = i + ilen
      if (j >= to) return false
      // size vint: length the same way, but the marker bit is STRIPPED
      val sb = b(j) & 0xFF
      if (sb == 0) return false // length > 8: out of scope
      val slen = 8 - (31 - Integer.numberOfLeadingZeros(sb))
      if (j + slen > to) return false
      var size = (sb & ((1 << (8 - slen)) - 1)).toLong
      var k = 1
      while (k < slen) { size = (size << 8) | (b(j + k) & 0xFF); k += 1 }
      val unknown = size == (1L << (7 * slen)) - 1
      val body = j + slen
      // unknown size is the live-stream spelling: legal ONLY for
      // Segment (runs to EOF); anywhere else nothing downstream is
      // trustworthy
      if (unknown && id != IdSegment) return false
      if (!unknown && size > (to - body).toLong) return false
      val end = if (unknown) to else body + size.toInt
      id match {
        case IdEbml =>
          m(HasHeader) = 1
          if (!walk(b, body, end, m)) return false
        case IdDocType =>
          val s = new String(b, body, end - body,
            java.nio.charset.StandardCharsets.US_ASCII)
          m(Doctype) = if (s == "webm") 1 else if (s == "matroska") 2 else 3
        case IdSegment | IdInfo | IdTracks | IdVideo =>
          if (!walk(b, body, end, m)) return false
        case IdTrackEntry =>
          m(TrackType) = 0
          if (!walk(b, body, end, m)) return false
          if (m(TrackType) == 1) m(NVid) += 1
          else if (m(TrackType) == 2) m(NAud) += 1
        case IdTrackType => m(TrackType) = uintAt(b, body, end - body)
        case IdTimestampScale => m(Scale) = uintAt(b, body, end - body)
        case IdDuration =>
          val n = end - body
          if (n == 4) {
            val f = java.lang.Float.intBitsToFloat(uintAt(b, body, 4).toInt)
            m(DurBits) = java.lang.Double.doubleToLongBits(f.toDouble)
          } else if (n == 8) {
            m(DurBits) = uintAt(b, body, 8)
          } else return false
          m(HasDur) = 1
        case IdPixelWidth => m(W) = uintAt(b, body, end - body)
        case IdPixelHeight => m(H) = uintAt(b, body, end - body)
        case IdCluster => () // frame payload: NEVER descend (decoy)
        case _ => () // Void and friends: skipped by size
      }
      i = end
    }
    true
  }

  def parse(b: Array[Byte]): Meta = {
    if (!isEbml(b)) return null
    val m = new Array[Long](10)
    m(Scale) = 1000000L // TimestampScale default: 1 ms ticks
    if (!walk(b, 0, b.length, m)) return null
    if (m(HasHeader) == 0) return null
    val ms =
      if (m(HasDur) == 1) {
        val ticks = java.lang.Double.longBitsToDouble(m(DurBits))
        math.floor(ticks * m(Scale).toDouble / 1e6).toLong
      } else -1L
    Meta(m(Doctype).toInt, m(W).toInt, m(H).toInt,
      m(NVid).toInt, m(NAud).toInt, ms)
  }

  /** Doctype code (1 webm, 2 matroska, 3 other), or -1 on refusal. */
  def doctype(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.doctype.toLong
  }

  /** `(width << 32) | height`, or -1 on refusal. */
  def dims(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else (r.width.toLong << 32) | r.height.toLong
  }

  /** `(n_video << 16) | n_audio`, or -1 on refusal. */
  def tracks(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else (r.nVideo.toLong << 16) | r.nAudio.toLong
  }

  /** floor(ticks * scale / 1e6) ms, or -1 on refusal / no Duration. */
  def durationMs(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.durationMs
  }

  // -------------------------------------------------------------- synth

  private def idBytes(id: Long): Array[Byte] = {
    var n = 1
    while ((id >> (8 * n)) != 0) n += 1
    val out = new Array[Byte](n)
    var k = 0
    while (k < n) { out(k) = ((id >> (8 * (n - 1 - k))) & 0xFF).toByte; k += 1 }
    out
  }

  /** Minimal-length size vint (value strictly below the all-ones
    * UNKNOWN spelling of each length).
    */
  private def vint(v: Long): Array[Byte] = {
    var len = 1
    while (v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    out(0) = (((1 << (8 - len)) | ((v >> (8 * (len - 1))) &
      ((1 << (8 - len)) - 1))) & 0xFF).toByte
    var k = 1
    while (k < len) { out(k) = ((v >> (8 * (len - 1 - k))) & 0xFF).toByte; k += 1 }
    out
  }

  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vint(body.length.toLong) ++ body

  /** The same element with its size spelled in a NON-minimal 2-byte
    * vint — legal EBML, derails a 1-byte-size assumption.
    */
  private def elWide(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ Array((0x40 | (body.length >> 8)).toByte,
      (body.length & 0xFF).toByte) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    var n = 1
    while ((v >> (8 * n)) != 0) n += 1
    val out = new Array[Byte](n)
    var k = 0
    while (k < n) { out(k) = ((v >> (8 * (n - 1 - k))) & 0xFF).toByte; k += 1 }
    out
  }

  private def header(doctype: String): Array[Byte] =
    el(IdEbml, el(IdDocType,
      doctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  private def video(w: Long, h: Long): Array[Byte] =
    el(IdTrackEntry, el(IdTrackType, uintBody(1L)) ++
      el(IdVideo, el(IdPixelWidth, uintBody(w)) ++
        el(IdPixelHeight, uintBody(h))))

  private def audio(): Array[Byte] =
    el(IdTrackEntry, el(IdTrackType, uintBody(2L)))

  private def durDouble(ticks: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(ticks)
    el(IdDuration, (0 until 8).map(k =>
      ((bits >> (8 * (7 - k))) & 0xFF).toByte).toArray)
  }

  private def durFloat(ticks: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(ticks)
    el(IdDuration, (0 until 4).map(k =>
      ((bits >> (8 * (3 - k))) & 0xFF).toByte).toArray)
  }

  /** Cluster whose payload BYTES spell a lying video TrackEntry —
    * the flat-scan decoy the tree walk must never read.
    */
  private def decoyCluster(): Array[Byte] =
    el(IdCluster, el(IdTrackEntry, el(IdTrackType, uintBody(1L)) ++
      el(IdVideo, el(IdPixelWidth, uintBody(9999L)) ++
        el(IdPixelHeight, uintBody(9999L)))) ++
      "lying-frame-data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Synthesize a q162 container. `params` packs `doc_id | mode<<40`:
    * 0 -> webm, one video track, double(8) Duration at the default
    * scale, sized Segment, cluster decoy; 1 -> matroska, video+audio,
    * float(4) Duration at scale 500 000 (the /2 arithmetic drill),
    * UNKNOWN-size Segment (the live-stream spelling); 2 -> webm, no
    * TimestampScale element (default applies), a Void padded to a
    * 2-byte non-minimal size vint, cluster decoy; 3 -> class 0 cut 15
    * bytes short (magic survives, fields refuse).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val w = 320L + (id % 4) * 160L
    val h = 240L + (id % 3) * 120L
    val out = new java.io.ByteArrayOutputStream()
    mode match {
      case 1 =>
        out.write(header("matroska"))
        val info = el(IdInfo, el(IdTimestampScale, uintBody(500000L)) ++
          durFloat((2L * (3000L + id % 1000L)).toFloat))
        val tracks = el(IdTracks, video(w, h) ++ audio())
        out.write(idBytes(IdSegment))
        out.write(Array(0x01.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
          0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
        out.write(info); out.write(tracks); out.write(decoyCluster())
      case 2 =>
        out.write(header("webm"))
        val info = el(IdInfo, durDouble((7777L + id % 777L).toDouble))
        val pad = elWide(0xECL, new Array[Byte](35)) // Void, wide size
        val tracks = el(IdTracks, video(w, h))
        out.write(el(IdSegment, info ++ pad ++ tracks ++ decoyCluster()))
      case _ =>
        out.write(header("webm"))
        val info = el(IdInfo, el(IdTimestampScale, uintBody(1000000L)) ++
          durDouble((10000L + id % 5000L).toDouble))
        val tracks = el(IdTracks, video(w, h))
        out.write(el(IdSegment, info ++ tracks ++ decoyCluster()))
    }
    val all = out.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 15)
    else all
  }
}

/** `binary -> int`: doctype code (1 webm, 2 matroska, 3 other). */
case class EbmlDoctype(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ebml_doctype"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EbmlEval.doctype(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ed")
      s"""
         |long $res = graft.functions.EbmlEval.doctype($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = (int) $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EbmlDoctype =
    copy(child = newChild)
}

/** `binary -> long`: `(width << 32) | height`, NULL on refusal. */
case class EbmlDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ebml_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EbmlEval.dims(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("edm")
      s"""
         |long $res = graft.functions.EbmlEval.dims($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EbmlDims =
    copy(child = newChild)
}

/** `binary -> long`: `(n_video << 16) | n_audio` track counts. */
case class EbmlTracks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ebml_tracks"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EbmlEval.tracks(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("et")
      s"""
         |long $res = graft.functions.EbmlEval.tracks($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EbmlTracks =
    copy(child = newChild)
}

/** `binary -> long`: floor(Duration ticks * scale / 1e6) ms. */
case class EbmlDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ebml_duration_ms"

  override protected def nullSafeEval(input: Any): Any = {
    val r = EbmlEval.durationMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("edu")
      s"""
         |long $res = graft.functions.EbmlEval.durationMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EbmlDurationMs =
    copy(child = newChild)
}

/** `long -> binary`: q162's synthesis (params pack `doc_id|mode<<40`). */
case class EbmlSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ebml_synth"

  override protected def nullSafeEval(params: Any): Any =
    EbmlEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.EbmlEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): EbmlSynth =
    copy(child = newChild)
}

/** Column surface for the EBML kernels. */
object EbmlOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def ebmlDoctype(b: Column): Column = ColumnBridge.column(EbmlDoctype(bin(b)))
  def ebmlDims(b: Column): Column = ColumnBridge.column(EbmlDims(bin(b)))
  def ebmlTracks(b: Column): Column = ColumnBridge.column(EbmlTracks(bin(b)))
  def ebmlDurationMs(b: Column): Column =
    ColumnBridge.column(EbmlDurationMs(bin(b)))

  def ebmlSynth(params: Column): Column =
    ColumnBridge.column(EbmlSynth(ColumnBridge.expression(params.cast("long"))))
}
