package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** MP3 frame-header metadata — the crawl AUDIO format the decode-meta
  * family (q56 WAV, q62 resample, q56 MP4 boxes) was missing: an
  * ID3v2-aware scan to the first valid MPEG-1 Layer III frame header,
  * field decode through the published bitrate/sample-rate tables, and a
  * CBR duration estimate from the audio byte count — the triage a
  * corpus pipeline runs before any costly full decode.
  *
  * Scope is stated, not guessed: MPEG-1 Layer III (version bits 11,
  * layer bits 01 — the overwhelming web MP3 class). Duration comes
  * from the VBR HEADER when one exists — most real podcast/music MP3s
  * are VBR, and a CBR estimate over their bytes is wrong for the
  * majority class:
  *
  *  - `Xing`/`Info` in the first frame's side-info shadow (offset
  *    4+32 stereo/joint/dual, 4+17 mono — the MODE bits move it, the
  *    classic Xing-reader bug), big-endian flags, frame count when
  *    flags bit 0 says so: duration = frames × 1152 / sampleRate
  *    (`Info` is the CBR spelling of the same header — the count is
  *    exact there too);
  *  - `VBRI` (Fraunhofer) at the FIXED offset 4+32 regardless of
  *    mode, frame count 14 bytes in;
  *  - a declared VBR header whose frame-count field is cut off
  *    REFUSES — the duration basis is untrustworthy and a CBR
  *    fallback would report the exact wrong number the header exists
  *    to correct (stop-don't-guess);
  *  - no VBR header → the CBR estimate over post-tag bytes.
  *
  * The ID3v2 header's synchsafe size is honored (tag bytes are NOT
  * audio and must not enter the duration), sync is required WITHIN
  * the first 16 bytes after the tag (a deep-scan heuristic would
  * happily "find" sync bytes inside text), and `free` (0) or `bad`
  * (15) bitrate indexes, reserved sample rates, and a truncated
  * header all refuse.
  *
  * Packed result: `vbr<<49 | bitrate_kbps<<40 | sample_rate<<20 |
  * duration_ms` (duration saturates at 2^20-1 ms ≈ 17 min — far past
  * any header-sized payload this kernel triages; `vbr` = 1 when the
  * duration came from a VBR header's frame count).
  */
object Mp3Eval {

  private final val NoMeta = java.lang.Long.MIN_VALUE

  // MPEG-1 Layer III tables (ISO 11172-3)
  private val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val SampleRate = Array(44100, 48000, 32000, 0)

  /** Packed MP3 meta, or the NULL-marker on refusal. */
  def meta(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return NoMeta
    var pos = 0
    // ID3v2: "ID3" ver(2) flags(1) synchsafe size(4)
    if (b.length >= 10 && (b(0) & 0xFF) == 'I' && (b(1) & 0xFF) == 'D' &&
      (b(2) & 0xFF) == '3') {
      var size = 0
      var i = 6
      while (i < 10) {
        val v = b(i) & 0xFF
        if (v >= 0x80) return NoMeta // synchsafe bytes carry 7 bits
        size = (size << 7) | v
        i += 1
      }
      pos = 10 + size
    }
    val audioBytes = b.length - pos
    if (audioBytes < 4) return NoMeta
    // sync must sit within the first 16 post-tag bytes
    val limit = math.min(pos + 16, b.length - 3)
    var h = -1
    var p = pos
    while (h < 0 && p < limit) {
      if ((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xE0) == 0xE0) h = p
      else p += 1
    }
    if (h < 0) return NoMeta
    val b1 = b(h + 1) & 0xFF
    val b2 = b(h + 2) & 0xFF
    if ((b1 & 0x18) != 0x18) return NoMeta // MPEG-1 only
    if ((b1 & 0x06) != 0x02) return NoMeta // Layer III only
    val brIdx = (b2 & 0xF0) >> 4
    val srIdx = (b2 & 0x0C) >> 2
    val kbps = BitrateKbps(brIdx)
    val sr = SampleRate(srIdx)
    if (kbps == 0 || sr == 0) return NoMeta // free/bad/reserved
    // ---- VBR headers: Xing/Info in the side-info shadow (offset
    // depends on the MODE bits), VBRI at the fixed 4+32
    def u32be(o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    def tagAt(o: Int, t: String): Boolean =
      o + 4 <= b.length && (b(o) & 0xFF) == t.charAt(0) &&
        (b(o + 1) & 0xFF) == t.charAt(1) && (b(o + 2) & 0xFF) == t.charAt(2) &&
        (b(o + 3) & 0xFF) == t.charAt(3)
    val mode = (b(h + 3) & 0xC0) >> 6 // 3 = mono
    val xingOff = h + 4 + (if (mode == 3) 17 else 32)
    val vbriOff = h + 4 + 32
    var vbrFrames = -1L
    if (tagAt(xingOff, "Xing") || tagAt(xingOff, "Info")) {
      // flags u32be; bit 0 = frame count present
      if (xingOff + 8 > b.length) return NoMeta // declared, cut: refuse
      val flags = u32be(xingOff + 4)
      if ((flags & 1L) != 0L) {
        if (xingOff + 12 > b.length) return NoMeta
        vbrFrames = u32be(xingOff + 8)
      }
    } else if (tagAt(vbriOff, "VBRI")) {
      // "VBRI" ver(2) delay(2) quality(2) bytes(4) frames(4)
      if (vbriOff + 18 > b.length) return NoMeta
      vbrFrames = u32be(vbriOff + 14)
    }
    val durMs =
      if (vbrFrames >= 0L)
        // MPEG-1 Layer III: 1152 samples per frame
        math.min(vbrFrames * 1152L * 1000L / sr, (1L << 20) - 1)
      else // CBR estimate over the POST-TAG byte count
        math.min((audioBytes.toLong * 8) / kbps, (1L << 20) - 1)
    val vbrBit = if (vbrFrames >= 0L) 1L else 0L
    (vbrBit << 49) | (kbps.toLong << 40) | (sr.toLong << 20) | durMs
  }

  // ───────────────────────────── synthesis ─────────────────────────────

  /** Synthesize an MP3 prefix: optional ID3v2 tag of `tagSize` payload
    * bytes, one MPEG-1 Layer III header with the given table indexes,
    * an optional VBR header (`vbrKind`: 0 none, 1 Xing stereo, 2 VBRI,
    * 3 Xing MONO — the 17-byte side-info offset), then `junk` filler
    * bytes standing in for the audio stream.
    */
  def synth(brIdx: Int, srIdx: Int, tagSize: Int, junk: Int,
            seed: Long, vbrKind: Int = 0, frames: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + tagSize + junk)
    if (tagSize > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((tagSize >> 21) & 0x7F); out.write((tagSize >> 14) & 0x7F)
      out.write((tagSize >> 7) & 0x7F); out.write(tagSize & 0x7F)
      var i = 0
      while (i < tagSize) { out.write(((seed + i * 7) % 0x60 + 0x20).toInt); i += 1 }
    }
    out.write(0xFF)
    out.write(0xFB) // MPEG-1 (11), Layer III (01), no CRC
    out.write(((brIdx & 0x0F) << 4) | ((srIdx & 0x03) << 2))
    out.write(if (vbrKind == 3) 0xC0 else 0x00) // mode: mono moves Xing
    def u32be(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    if (vbrKind == 1 || vbrKind == 3) {
      val side = if (vbrKind == 3) 17 else 32
      var i = 0
      while (i < side) { out.write(0); i += 1 }
      out.write('X'); out.write('i'); out.write('n'); out.write('g')
      u32be(1L) // flags: frame count present
      u32be(frames.toLong)
    } else if (vbrKind == 2) {
      var i = 0
      while (i < 32) { out.write(0); i += 1 }
      out.write('V'); out.write('B'); out.write('R'); out.write('I')
      out.write(0); out.write(1) // version
      out.write(0); out.write(0) // delay
      out.write(0); out.write(0) // quality
      u32be(junk.toLong) // bytes (informational)
      u32be(frames.toLong)
    }
    var i = 0
    while (i < junk) { out.write(((seed * 3 + i * 11) % 251).toInt); i += 1 }
    out.toByteArray
  }
}

/** `binary -> long`: packed MP3 frame-header meta via [[Mp3Eval.meta]];
  * NULL on refusal.
  */
case class Mp3Meta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = Mp3Eval.meta(input.asInstanceOf[Array[Byte]])
    if (r == java.lang.Long.MIN_VALUE) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("mp3m")
      s"""
         |long $res = graft.functions.Mp3Eval.meta($bytes);
         |if ($res == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

/** `(long seed, long shape) -> binary`: q130's synthesis — `shape`
  * packs `brIdx | srIdx<<8 | tagSize<<16 | junk<<32 | vbrKind<<48 |
  * frames<<50` (vbrKind: 0 none, 1 Xing stereo, 2 VBRI, 3 Xing mono).
  */
case class Mp3Synth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_synth"

  override protected def nullSafeEval(seed: Any, shape: Any): Any = {
    val sh = shape.asInstanceOf[Long]
    Mp3Eval.synth((sh & 0xFF).toInt, ((sh >> 8) & 0xFF).toInt,
      ((sh >> 16) & 0xFFFF).toInt, ((sh >> 32) & 0xFFFF).toInt,
      seed.asInstanceOf[Long], ((sh >> 48) & 0x3).toInt,
      ((sh >> 50) & 0xFFF).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sh) =>
      s"graft.functions.Mp3Eval.synth((int)($sh & 0xFF), " +
        s"(int)(($sh >> 8) & 0xFF), (int)(($sh >> 16) & 0xFFFF), " +
        s"(int)(($sh >> 32) & 0xFFFF), $s, (int)(($sh >> 48) & 0x3), " +
        s"(int)(($sh >> 50) & 0xFFF))")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Mp3Synth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the MP3 kernels. */
object Mp3Ops {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def mp3Meta(bin: Column): Column =
    ColumnBridge.column(Mp3Meta(ColumnBridge.expression(bin.cast("binary"))))

  def mp3Synth(seed: Column, shape: Column): Column =
    ColumnBridge.column(Mp3Synth(
      ColumnBridge.expression(seed.cast("long")),
      ColumnBridge.expression(shape.cast("long"))))
}
