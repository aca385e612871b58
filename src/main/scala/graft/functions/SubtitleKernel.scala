package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subtitle extraction (q138) — SRT and WebVTT cue parsing, the
  * video-speech TEXT side of a multimodal training pair (every
  * captioned video on the web carries one of these two formats; the
  * reference ingests a JSON feed only — reference
  * ingestion/openalex_client.py — so this is a north-star extension
  * of the text-intake family q93/q106/q125/q133).
  *
  * Format detection is structural and strict (never guessed):
  * an optional UTF-8 BOM then `WEBVTT` → VTT; a first non-blank line
  * that is a bare integer (an SRT cue counter) → SRT; anything else
  * refuses WHOLE — a dot-timestamped cue file without the WEBVTT
  * magic is a truncated/mislabeled download, not an SRT.
  *
  * The parse is block-wise (blank-line separated) with the traps:
  *  - SRT timestamps spell `HH:MM:SS,mmm` (COMMA); VTT spells
  *    `MM:SS.mmm` or `HH:MM:SS.mmm` (DOT, hours OPTIONAL) — each
  *    format accepts only its own separator (a tolerant parser would
  *    mask mislabeled files), and the VTT hour field must be inferred
  *    from the colon count, not assumed;
  *  - VTT blocks may be NOTE/STYLE/REGION comments (skipped), and a
  *    cue may carry an IDENTIFIER line above the timing line and
  *    SETTINGS after the end timestamp (`align:start`) — both must
  *    not leak into cue text;
  *  - cue text may span MULTIPLE lines (kept, joined by LF);
  *  - refusal is PER CUE for a malformed timing line, a bad SRT
  *    counter, or end <= start (siblings parse — the q132 stance);
  *    a file with ZERO valid cues refuses whole.
  *
  * Reported: format, valid-cue count, the sum of cue durations, the
  * last valid cue's absolute end (pins the H/M/S/ms place-value
  * arithmetic — a duration sum alone cannot see a swapped field),
  * and the LF-joined cue text.
  */
object SubtitleEval {

  final case class Cue(startMs: Long, endMs: Long, text: String)
  final case class Subs(format: String, cues: Array[Cue])

  private def splitLines(s: String): Array[String] = s.split("\r?\n", -1)

  private def isBlank(s: String): Boolean = s.forall(c => c == ' ' || c == '\t')

  /** `HH:MM:SS<sep>mmm` with optional hours when `hoursOptional`;
    * returns -1 on malformation.
    */
  private def timestamp(s: String, sep: Char, hoursOptional: Boolean): Long = {
    val t = s.trim
    val parts = t.split(':')
    if (parts.length != 3 && !(hoursOptional && parts.length == 2)) return -1L
    val (h, m, rest) =
      if (parts.length == 3) (parts(0), parts(1), parts(2))
      else ("0", parts(0), parts(1))
    val di = rest.indexOf(sep)
    if (di < 0) return -1L
    val sec = rest.substring(0, di)
    val ms = rest.substring(di + 1)
    if (ms.length != 3) return -1L
    def num(x: String, maxLen: Int): Long = {
      if (x.isEmpty || x.length > maxLen || !x.forall(_.isDigit)) -1L
      else x.toLong
    }
    val hv = num(h, 3); val mv = num(m, 2); val sv = num(sec, 2); val msv = num(ms, 3)
    if (hv < 0 || mv < 0 || sv < 0 || msv < 0 || mv > 59 || sv > 59) return -1L
    ((hv * 60 + mv) * 60 + sv) * 1000 + msv
  }

  /** Timing line: `start --> end [settings]`; null cue on refusal. */
  private def timing(line: String, sep: Char, hoursOptional: Boolean,
                     allowSettings: Boolean): (Long, Long) = {
    val a = line.indexOf("-->")
    if (a < 0) return null
    val start = timestamp(line.substring(0, a), sep, hoursOptional)
    var endStr = line.substring(a + 3).trim
    if (allowSettings) {
      val sp = endStr.indexOf(' ')
      if (sp > 0) endStr = endStr.substring(0, sp) // settings follow
    }
    val end = timestamp(endStr, sep, hoursOptional)
    if (start < 0 || end < 0 || end <= start) null else (start, end)
  }

  def parse(b: Array[Byte]): Subs = {
    if (b == null || b.length < 4) return null
    var off = 0
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
      (b(2) & 0xFF) == 0xBF) off = 3
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val lines = splitLines(s)
    // blocks: runs of non-blank lines
    val blocks = scala.collection.mutable.ArrayBuffer[Array[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    for (ln <- lines) {
      if (isBlank(ln)) {
        if (cur.nonEmpty) { blocks += cur.toArray; cur = scala.collection.mutable.ArrayBuffer[String]() }
      } else cur += ln
    }
    if (cur.nonEmpty) blocks += cur.toArray
    if (blocks.isEmpty) return null

    val first = blocks.head
    val cues = scala.collection.mutable.ArrayBuffer[Cue]()
    if (first(0).startsWith("WEBVTT")) {
      // VTT: the header block may carry metadata lines; cue blocks follow
      for (blk <- blocks.tail) {
        val head = blk(0)
        if (head.startsWith("NOTE") || head.startsWith("STYLE") ||
          head.startsWith("REGION")) {
          // comment block: skipped, never a cue
        } else {
          // optional identifier line: the first line WITHOUT "-->"
          val ti = if (blk(0).contains("-->")) 0
          else if (blk.length > 1 && blk(1).contains("-->")) 1
          else -1
          if (ti >= 0) {
            val tm = timing(blk(ti), '.', hoursOptional = true, allowSettings = true)
            if (tm != null && blk.length > ti + 1) {
              cues += Cue(tm._1, tm._2, blk.drop(ti + 1).mkString("\n"))
            }
            // malformed timing or empty text: that cue refuses, siblings parse
          }
        }
      }
      if (cues.isEmpty) null else Subs("vtt", cues.toArray)
    } else if (first(0).trim.nonEmpty && first(0).trim.forall(_.isDigit)) {
      // SRT: counter line, comma timing line, text lines
      for (blk <- blocks) {
        val okCounter = blk(0).trim.nonEmpty && blk(0).trim.forall(_.isDigit)
        if (okCounter && blk.length >= 3) {
          val tm = timing(blk(1), ',', hoursOptional = false, allowSettings = false)
          if (tm != null) cues += Cue(tm._1, tm._2, blk.drop(2).mkString("\n"))
        }
      }
      if (cues.isEmpty) null else Subs("srt", cues.toArray)
    } else null
  }

  def format(b: Array[Byte]): String = {
    val p = parse(b)
    if (p == null) null else p.format
  }

  def cueCount(b: Array[Byte]): Int = {
    val p = parse(b)
    if (p == null) -1 else p.cues.length
  }

  /** Sum of valid-cue durations in ms, or -1. */
  def totalMs(b: Array[Byte]): Long = {
    val p = parse(b)
    if (p == null) return -1L
    var s = 0L
    for (c <- p.cues) s += c.endMs - c.startMs
    s
  }

  /** Last valid cue's absolute end in ms, or -1 — pins place values. */
  def lastEndMs(b: Array[Byte]): Long = {
    val p = parse(b)
    if (p == null) return -1L
    var m = -1L
    for (c <- p.cues) if (c.endMs > m) m = c.endMs
    m
  }

  /** LF-joined cue text (cue-internal line breaks kept) as UTF-8. */
  def text(b: Array[Byte]): Array[Byte] = {
    val p = parse(b)
    if (p == null) null
    else p.cues.map(_.text).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // -------------------------------------------------------------- synth

  private def two(v: Long): String = f"$v%02d"
  private def three(v: Long): String = f"$v%03d"

  private def srtTs(ms: Long): String = {
    val h = ms / 3600000; val m = ms / 60000 % 60; val s = ms / 1000 % 60
    s"${two(h)}:${two(m)}:${two(s)},${three(ms % 1000)}"
  }

  /** VTT short spelling: MM:SS.mmm (hours must be zero). */
  private def vttTs(ms: Long): String = {
    val m = ms / 60000; val s = ms / 1000 % 60
    s"${two(m)}:${two(s)}.${three(ms % 1000)}"
  }

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q138 subtitle file: 6 words per cue, cue i spanning
    * `base + i*2500 .. +2000` ms with `base = (id%2)*3725999 +
    * (id%7)*111` for SRT (drills the hour place) and `(id%7)*111`
    * for VTT (the short MM:SS spelling requires < 1 h).
    * `params` packs `doc_id | mode<<40`: 0 → SRT, LF endings;
    * 1 → WebVTT with BOM, CRLF, NOTE block, cue ids, settings, and
    * cue text split 3/3 across two lines; 2 → SRT with cue #2's
    * timing corrupted (that cue refuses, siblings parse);
    * 3 → cue lines WITHOUT any header/counter (refuses whole).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val n = (ws.length + 5) / 6
    val off = (id % 7) * 111
    val base = if (mode == 1 || mode == 3) off else (id % 2) * 3725999L + off
    val sb = new StringBuilder
    val nl = if (mode == 1) "\r\n" else "\n"
    if (mode == 1) sb.append("WEBVTT - doc ").append(id).append(nl).append(nl)
    var i = 0
    while (i < n) {
      val cw = ws.slice(i * 6, i * 6 + 6)
      val start = base + i * 2500L
      val end = start + 2000L
      if (mode == 1) {
        sb.append("c").append(i + 1).append(nl)
        sb.append(vttTs(start)).append(" --> ").append(vttTs(end))
          .append(" align:start position:10%").append(nl)
        if (cw.length > 3) {
          sb.append(cw.take(3).mkString(" ")).append(nl)
          sb.append(cw.drop(3).mkString(" ")).append(nl)
        } else sb.append(cw.mkString(" ")).append(nl)
        sb.append(nl)
        if (i == 0) { // a NOTE block between cues, never a cue
          sb.append("NOTE synthesized for doc ").append(id).append(nl).append(nl)
        }
      } else if (mode == 3) {
        sb.append(srtTs(start)).append(" --> ").append(srtTs(end)).append(nl)
        sb.append(cw.mkString(" ")).append(nl).append(nl)
      } else {
        sb.append(i + 1).append(nl)
        val ts = if (mode == 2 && i == 1)
          srtTs(start).replace(":", ";") + " --> " + srtTs(end) // corrupt
        else srtTs(start) + " --> " + srtTs(end)
        sb.append(ts).append(nl)
        sb.append(cw.mkString(" ")).append(nl).append(nl)
      }
      i += 1
    }
    val body = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (mode == 1) {
      val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
      val out = new Array[Byte](3 + body.length)
      System.arraycopy(bom, 0, out, 0, 3)
      System.arraycopy(body, 0, out, 3, body.length)
      out
    } else body
  }
}

/** `binary -> string`: detected subtitle format, NULL on refusal. */
case class SubFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_format"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SubtitleEval.format(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sf")
      s"""
         |String $res = graft.functions.SubtitleEval.format($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubFormat =
    copy(child = newChild)
}

/** `binary -> int`: valid-cue count, NULL on refusal. */
case class SubCueCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_cues"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SubtitleEval.cueCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sc")
      s"""
         |int $res = graft.functions.SubtitleEval.cueCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubCueCount =
    copy(child = newChild)
}

/** `binary -> long`: duration sum over valid cues (ms). */
case class SubTotalMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_total_ms"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SubtitleEval.totalMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("st")
      s"""
         |long $res = graft.functions.SubtitleEval.totalMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubTotalMs =
    copy(child = newChild)
}

/** `binary -> long`: last valid cue's absolute end (ms). */
case class SubLastEndMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_last_end"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SubtitleEval.lastEndMs(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("se")
      s"""
         |long $res = graft.functions.SubtitleEval.lastEndMs($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubLastEndMs =
    copy(child = newChild)
}

/** `binary -> binary`: LF-joined cue text. */
case class SubText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_text"

  override protected def nullSafeEval(input: Any): Any =
    SubtitleEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sx")
      s"""
         |byte[] $res = graft.functions.SubtitleEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubText =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q138's synthesis. */
case class SubSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sub_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    SubtitleEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.SubtitleEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SubSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the subtitle kernels. */
object SubtitleOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def subFormat(bin: Column): Column =
    ColumnBridge.column(SubFormat(ColumnBridge.expression(bin.cast("binary"))))

  def subCueCount(bin: Column): Column =
    ColumnBridge.column(SubCueCount(ColumnBridge.expression(bin.cast("binary"))))

  def subTotalMs(bin: Column): Column =
    ColumnBridge.column(SubTotalMs(ColumnBridge.expression(bin.cast("binary"))))

  def subLastEndMs(bin: Column): Column =
    ColumnBridge.column(SubLastEndMs(ColumnBridge.expression(bin.cast("binary"))))

  def subText(bin: Column): Column =
    ColumnBridge.column(SubText(ColumnBridge.expression(bin.cast("binary"))))

  def subSynth(text: Column, params: Column): Column =
    ColumnBridge.column(SubSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
