package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** AVI (RIFF) video metadata (q152) — the third video-triage rung
  * (q90 MP4, q102's Y4M frames): archival footage and screen
  * captures still ship as AVI, and the container is a RIFF TREE, not
  * a flat chunk list:
  *
  *  - `LIST` chunks carry a 4-byte list type then SUB-chunks — the
  *    walk recurses into `hdrl`/`strl` but must NOT descend into
  *    `movi` (frame payload: in real files it is ~the whole file,
  *    and its BYTES can spell chunk names — the synthesizer plants a
  *    decoy `avih` there that a flat grep-scanner would read);
  *  - `avih` (inside `hdrl`) carries microseconds-per-frame, total
  *    frames, and dims; `strh` (inside each `strl`) types its stream
  *    `vids`/`auds` — counting strh is the cross-check against a
  *    lying avih stream count;
  *  - WORD alignment: odd-sized chunks (the classic `JUNK` padding)
  *    are followed by a pad byte ([[WavFmt]]'s rule);
  *  - duration is `frames * us_per_frame / 1000` in LONG arithmetic —
  *    the product crosses 2^32 for ordinary half-hour files, the u32
  *    trap q149's granule also sets;
  *  - a chunk running past EOF refuses WHOLE (truncated download).
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — video triage is a north-star
  * extension of the multimodal meta family (q33/q39/q90/q129).
  */
object AviEval {

  final case class Meta(width: Int, height: Int, vids: Int, auds: Int,
                        frames: Long, usPerFrame: Long)

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL

  private def fcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk one chunk run in [from, to); returns null on a truncation.
    * Mutates `m` as headers are met; recursion depth is bounded by
    * the RIFF nesting the walk ACCEPTS (hdrl/strl only).
    */
  private def walk(b: Array[Byte], from: Int, to: Int,
                   m: Array[Long]): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val id = fcc(b, i)
      val size = le32(b, i + 4)
      val body = i + 8
      if (body + size > to) return false // truncated mid-chunk
      id match {
        case "LIST" =>
          if (size < 4) return false
          val lt = fcc(b, body)
          // recurse into header lists only; movi payload is DATA
          if (lt == "hdrl" || lt == "strl") {
            if (!walk(b, body + 4, body + size.toInt, m)) return false
          }
        case "avih" =>
          if (size < 40) return false
          m(0) = le32(b, body) // us per frame
          m(1) = le32(b, body + 16) // total frames
          m(2) = le32(b, body + 32) // width
          m(3) = le32(b, body + 36) // height
          m(6) = 1
        case "strh" =>
          if (size < 4) return false
          fcc(b, body) match {
            case "vids" => m(4) += 1
            case "auds" => m(5) += 1
            case _ => ()
          }
        case _ => () // JUNK and friends: skipped by size
      }
      val step = 8L + size + (size & 1L)
      if (i + step > to) return false
      i += step.toInt
    }
    true
  }

  def parse(b: Array[Byte]): Meta = {
    if (!isAvi(b)) return null
    val m = new Array[Long](7)
    if (!walk(b, 12, b.length, m)) return null
    if (m(6) == 0) return null // no avih: not a readable AVI header
    Meta(m(2).toInt, m(3).toInt, m(4).toInt, m(5).toInt, m(1), m(0))
  }

  /** `(width << 32) | height`, or -1 on refusal. */
  def dims(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else (r.width.toLong << 32) | r.height.toLong
  }

  /** `(vids << 16) | auds` strh counts, or -1 on refusal. */
  def streams(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else (r.vids.toLong << 16) | r.auds.toLong
  }

  def frames(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.frames
  }

  def durationMs(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) -1L else r.frames * r.usPerFrame / 1000L
  }

  // -------------------------------------------------------------- synth

  private def putLe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
    o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
  }

  private def chunk(o: java.io.ByteArrayOutputStream, id: String,
                    body: Array[Byte]): Unit = {
    o.write(id.getBytes("US-ASCII"))
    putLe32(o, body.length.toLong)
    o.write(body, 0, body.length)
    if ((body.length & 1) == 1) o.write(0) // WORD alignment pad
  }

  private def list(o: java.io.ByteArrayOutputStream, lt: String,
                   body: Array[Byte]): Unit = {
    o.write("LIST".getBytes("US-ASCII"))
    putLe32(o, (body.length + 4).toLong)
    o.write(lt.getBytes("US-ASCII"))
    o.write(body, 0, body.length)
    if (((body.length + 4) & 1) == 1) o.write(0)
  }

  private def strl(stype: String): Array[Byte] = {
    val s = new java.io.ByteArrayOutputStream()
    val h = new java.io.ByteArrayOutputStream()
    h.write(stype.getBytes("US-ASCII"))
    (0 until 52).foreach(_ => h.write(0))
    chunk(s, "strh", h.toByteArray)
    s.toByteArray
  }

  /** Synthesize a q152 AVI. `params` packs `doc_id | mode<<40`:
    * 0 -> JUNK + hdrl(avih + vids strl) + movi with a decoy `avih`
    * byte string; 1 -> adds an auds strl (two streams); 2 -> the
    * JUNK chunk is ODD-sized (the pad-byte drill); 3 -> class 0 cut
    * 25 bytes short (truncated, refuses). Frames * us/frame crosses
    * 2^32 by construction.
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val w = 160 + (id % 4) * 80
    val h = 120 + (id % 3) * 60
    val uspf = if (id % 2 == 0) 33333L else 40000L
    val frames = 200000L + (id % 1000L)
    val avih = {
      val a = new java.io.ByteArrayOutputStream()
      putLe32(a, uspf)
      putLe32(a, 0L); putLe32(a, 0L); putLe32(a, 0x10L)
      putLe32(a, frames)
      putLe32(a, 0L)
      putLe32(a, if (mode == 1) 2L else 1L) // dwStreams
      putLe32(a, 0L)
      putLe32(a, w)
      putLe32(a, h)
      (0 until 16).foreach(_ => a.write(0))
      a.toByteArray
    }
    val hdrl = {
      val x = new java.io.ByteArrayOutputStream()
      chunk(x, "avih", avih)
      list(x, "strl", strl("vids"))
      if (mode == 1) list(x, "strl", strl("auds"))
      x.toByteArray
    }
    val movi = {
      val x = new java.io.ByteArrayOutputStream()
      // frame payload whose BYTES spell a decoy header: a flat
      // scanner greps this; the tree walk never descends here
      x.write("00dcavihXXXXlying-frame-data".getBytes("US-ASCII"))
      (0 until 40).foreach(_ => x.write((id % 251).toInt))
      x.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    val payload = new java.io.ByteArrayOutputStream()
    payload.write("AVI ".getBytes("US-ASCII"))
    chunk(payload, "JUNK",
      new Array[Byte](if (mode == 2) 13 else 16)) // odd size drills the pad
    list(payload, "hdrl", hdrl)
    list(payload, "movi", movi)
    val pb = payload.toByteArray
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, pb.length.toLong)
    out.write(pb, 0, pb.length)
    val all = out.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 25)
    else all
  }
}

/** `binary -> long`: `(width << 32) | height`, NULL on refusal. */
case class AviDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AviEval.dims(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ad")
      s"""
         |long $res = graft.functions.AviEval.dims($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviDims =
    copy(child = newChild)
}

/** `binary -> long`: `(vids << 16) | auds` strh counts. */
case class AviStreams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_streams"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AviEval.streams(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("as")
      s"""
         |long $res = graft.functions.AviEval.streams($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviStreams =
    copy(child = newChild)
}

/** `binary -> long`: avih total frames. */
case class AviFrames(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frames"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AviEval.frames(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("af")
      s"""
         |long $res = graft.functions.AviEval.frames($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviFrames =
    copy(child = newChild)
}

/** `binary -> long`: `frames * us_per_frame / 1000` in Long math. */
case class AviDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_duration_ms"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AviEval.durationMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("au")
      s"""
         |long $res = graft.functions.AviEval.durationMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviDurationMs =
    copy(child = newChild)
}

/** `long -> binary`: q152's synthesis (params pack `doc_id|mode<<40`). */
case class AviSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_synth"

  override protected def nullSafeEval(params: Any): Any =
    AviEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.AviEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): AviSynth =
    copy(child = newChild)
}

/** Column surface for the AVI kernels. */
object AviOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def aviDims(b: Column): Column = ColumnBridge.column(AviDims(bin(b)))
  def aviStreams(b: Column): Column = ColumnBridge.column(AviStreams(bin(b)))
  def aviFrames(b: Column): Column = ColumnBridge.column(AviFrames(bin(b)))
  def aviDurationMs(b: Column): Column = ColumnBridge.column(AviDurationMs(bin(b)))

  def aviSynth(params: Column): Column =
    ColumnBridge.column(AviSynth(ColumnBridge.expression(params.cast("long"))))
}
