package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ID3v2 tag parsing (q158) — the metadata container in front of the
  * MP3 audio q130 reads (podcast/music corpora carry titles, artists,
  * and durations HERE, not in the frame headers), with the format's
  * three genuine traps:
  *
  *  - the tag size is SYNCHSAFE (7 bits per byte — so the tag never
  *    spells a frame-sync 0xFF; a plain-u32 reader misplaces the
  *    audio for any tag past 127 bytes);
  *  - FRAME sizes split by version: v2.3 spells plain big-endian
  *    u32, v2.4 spells synchsafe — the single most common ID3 parser
  *    bug, visible only when a frame crosses 127 bytes (the
  *    synthesizer pads one across on purpose);
  *  - text frames carry an ENCODING byte: 0 = ISO-8859-1 (0xE9 IS
  *    `é`), 1 = UTF-16 with BOM (both byte orders), 3 = UTF-8;
  *  - zero padding after the last frame stops the walk (a 0x00
  *    frame id is padding, not a frame); unknown frames (PRIV,
  *    TXXX) skip by size but still COUNT; a frame past the tag end
  *    refuses fields while the magic verdict survives.
  *
  * `TIT2`/`TPE1` extract title/artist; `TLEN` the length in ms; the
  * byte after the tag is checked for an MP3 frame sync (the
  * audio-follows read that hands off to q130).
  */
object Id3Eval {

  final case class Tag(version: Int, tagSize: Int, frames: Int,
                       title: String, artist: String, lenMs: Long,
                       audioFollows: Int)

  def isId3(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 &&
      b(0) == 'I' && b(1) == 'D' && b(2) == '3'

  private def synchsafe(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7F) << 21) | ((b(o + 1) & 0x7F) << 14) |
      ((b(o + 2) & 0x7F) << 7) | (b(o + 3) & 0x7F)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** Decode a text-frame payload: encoding byte + text. */
  private def text(b: Array[Byte], from: Int, len: Int): String = {
    if (len < 1) return null
    val enc = b(from) & 0xFF
    val cs = enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => null // UTF-16 with BOM: decoder below
      case 3 => java.nio.charset.StandardCharsets.UTF_8
      case _ => return null // v2.2 encodings out of stated scope
    }
    val raw = java.util.Arrays.copyOfRange(b, from + 1, from + len)
    try {
      val s =
        if (cs != null) new String(raw, cs)
        else {
          if (raw.length < 2) return null
          // BOM-dispatched UTF-16 (q126's discipline)
          val bom0 = raw(0) & 0xFF; val bom1 = raw(1) & 0xFF
          val charset =
            if (bom0 == 0xFE && bom1 == 0xFF) java.nio.charset.StandardCharsets.UTF_16BE
            else if (bom0 == 0xFF && bom1 == 0xFE) java.nio.charset.StandardCharsets.UTF_16LE
            else return null // BOM-less UTF-16 in a tag: refuse the field
          new String(raw, 2, raw.length - 2, charset)
        }
      // a trailing NUL terminator is container plumbing, not text
      val cut = s.indexOf('\u0000')
      if (cut >= 0) s.substring(0, cut) else s
    } catch { case _: Exception => null }
  }

  def parse(b: Array[Byte]): Tag = {
    if (!isId3(b)) return null
    val major = b(3) & 0xFF
    if (major != 3 && major != 4) return null // v2.2/v2.5: stated scope
    val tagSize = synchsafe(b, 6)
    if (10 + tagSize > b.length) return null // truncated tag
    val end = 10 + tagSize
    var i = 10
    var frames = 0
    var title: String = null; var artist: String = null
    var lenMs = -1L
    var stop = false
    while (!stop && i + 10 <= end) {
      if (b(i) == 0) { stop = true } // zero padding: the walk ends
      else {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size =
          if (major == 4) synchsafe(b, i + 4)
          else u32be(b, i + 4).toInt
        val body = i + 10
        if (size < 0 || body + size > end) return null // frame past tag end
        frames += 1
        id match {
          case "TIT2" => title = text(b, body, size)
          case "TPE1" => artist = text(b, body, size)
          case "TLEN" =>
            val t = text(b, body, size)
            if (t != null && t.nonEmpty && t.forall(_.isDigit) &&
              t.length <= 12) lenMs = t.toLong
          case _ => () // unknown frame: skipped by size, still counted
        }
        i = body + size
      }
    }
    val audio =
      if (end + 1 < b.length && (b(end) & 0xFF) == 0xFF &&
        (b(end + 1) & 0xE0) == 0xE0) 1
      else 0
    Tag(major, tagSize, frames, title, artist, lenMs, audio)
  }

  def version(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.version
  }

  def tagSize(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.tagSize
  }

  def frames(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.frames
  }

  def title(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.title
  }

  def artist(b: Array[Byte]): String = {
    val r = parse(b); if (r == null) null else r.artist
  }

  def lenMs(b: Array[Byte]): Long = {
    val r = parse(b); if (r == null) -1L else r.lenMs
  }

  def audioFollows(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.audioFollows
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putSynchsafe(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 21) & 0x7F); o.write((v >> 14) & 0x7F)
    o.write((v >> 7) & 0x7F); o.write(v & 0x7F)
  }

  private def putU32be(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xFF); o.write((v >> 16) & 0xFF)
    o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
  }

  private def frame(o: java.io.ByteArrayOutputStream, major: Int,
                    id: String, body: Array[Byte]): Unit = {
    o.write(id.getBytes("US-ASCII"))
    if (major == 4) putSynchsafe(o, body.length) else putU32be(o, body.length)
    o.write(0); o.write(0) // frame flags
    o.write(body, 0, body.length)
  }

  private def textBody(enc: Int, s: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(enc)
    enc match {
      case 0 => o.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      case 3 => o.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => ()
    }
    o.toByteArray
  }

  private def utf16Body(s: String, be: Boolean): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(1)
    if (be) { o.write(0xFE); o.write(0xFF)
      o.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)) }
    else { o.write(0xFF); o.write(0xFE)
      o.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)) }
    o.toByteArray
  }

  /** Synthesize a q158 tagged stream. `params` packs `doc_id|mode<<40`:
    * 0 -> v2.3 (plain-u32 frame sizes), latin1 title with the 0xE9
    * byte, UTF-8 artist; 1 -> v2.4 (SYNCHSAFE frame sizes) whose
    * padded UTF-16 title crosses 127 bytes (both BOM orders by id
    * parity) — a plain-u32 reader derails here; 2 -> v2.3 with an
    * unknown PRIV frame (counted, skipped) and 64 bytes of zero
    * padding; 3 -> class 0 cut 10 bytes short (truncated, refuses);
    * every intact class is followed by one MP3 sync byte pair.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val title = "café " + ws(0) + " " + ws(1)
    val padded = title + " " + ("x" * 80)
    val artist = ws(2) + " " + ws(3)
    val lenMs = 60000L + (id % 300L) * 1000L
    val major = if (mode == 1) 4 else 3
    val fr = new java.io.ByteArrayOutputStream()
    if (mode == 1) {
      frame(fr, major, "TIT2", utf16Body(padded, be = id % 2 == 0))
      frame(fr, major, "TPE1", textBody(0, artist))
    } else {
      frame(fr, major, "TIT2",
        if (mode == 2) textBody(3, title) else textBody(0, title))
      if (mode == 2) frame(fr, major, "PRIV",
        ("owner@example" + ("\u0000" * 7)).getBytes("US-ASCII"))
      frame(fr, major, "TPE1", textBody(3, artist))
    }
    frame(fr, major, "TLEN", textBody(0, lenMs.toString))
    if (mode == 2) fr.write(new Array[Byte](64), 0, 64) // zero padding
    val frames = fr.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(major); out.write(0) // version major, revision
    out.write(0) // tag flags
    putSynchsafe(out, frames.length)
    out.write(frames, 0, frames.length)
    // the first audio bytes: an MP3 frame sync
    out.write(0xFF); out.write(0xFB); out.write(0x90); out.write(0x00)
    val all = out.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 10)
    else all
  }
}

/** `binary -> int`: ID3v2 major version (3 | 4). */
case class Id3Version(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_version"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.version(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("iv")
      s"""
         |int $res = graft.functions.Id3Eval.version($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3Version =
    copy(child = newChild)
}

/** `binary -> int`: synchsafe tag size. */
case class Id3TagSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_tag_size"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.tagSize(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("iz")
      s"""
         |int $res = graft.functions.Id3Eval.tagSize($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3TagSize =
    copy(child = newChild)
}

/** `binary -> int`: frame count (unknown frames included). */
case class Id3Frames(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_frames"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.frames(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("if")
      s"""
         |int $res = graft.functions.Id3Eval.frames($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3Frames =
    copy(child = newChild)
}

/** `binary -> string`: TIT2 title. */
case class Id3Title(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_title"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.title(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("it")
      s"""
         |String $res = graft.functions.Id3Eval.title($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3Title =
    copy(child = newChild)
}

/** `binary -> string`: TPE1 artist. */
case class Id3Artist(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_artist"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.artist(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ia")
      s"""
         |String $res = graft.functions.Id3Eval.artist($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3Artist =
    copy(child = newChild)
}

/** `binary -> long`: TLEN milliseconds, NULL when absent. */
case class Id3LenMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_len_ms"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.lenMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("il")
      s"""
         |long $res = graft.functions.Id3Eval.lenMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3LenMs =
    copy(child = newChild)
}

/** `binary -> int`: 1 when an MP3 sync follows the tag. */
case class Id3AudioFollows(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_audio_follows"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Id3Eval.audioFollows(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("io")
      s"""
         |int $res = graft.functions.Id3Eval.audioFollows($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Id3AudioFollows =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q158's synthesis. */
case class Id3Synth(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_id3_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    Id3Eval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.Id3Eval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Id3Synth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the ID3 kernels. */
object Id3Ops {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def id3Version(b: Column): Column = ColumnBridge.column(Id3Version(bin(b)))
  def id3TagSize(b: Column): Column = ColumnBridge.column(Id3TagSize(bin(b)))
  def id3Frames(b: Column): Column = ColumnBridge.column(Id3Frames(bin(b)))
  def id3Title(b: Column): Column = ColumnBridge.column(Id3Title(bin(b)))
  def id3Artist(b: Column): Column = ColumnBridge.column(Id3Artist(bin(b)))
  def id3LenMs(b: Column): Column = ColumnBridge.column(Id3LenMs(bin(b)))
  def id3AudioFollows(b: Column): Column =
    ColumnBridge.column(Id3AudioFollows(bin(b)))

  def id3Synth(text: Column, params: Column): Column =
    ColumnBridge.column(Id3Synth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
