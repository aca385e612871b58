package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd WAV `fmt ` scan over a `binary` column.
  *
  * A canonical PCM WAV puts `fmt ` as the first chunk (fixed offsets),
  * but the RIFF grammar allows any chunks (`LIST`, `JUNK`, `bext`, …)
  * before it — real corpora carry such files routinely. This walks the
  * chunk sequence (`id(4cc) size(u32le) data[size]`, WORD-aligned: an
  * odd-sized chunk is followed by a pad byte) from offset 12 until it
  * meets `fmt `, then reads the PCM parameters: channels (LE u16 at
  * payload offset 2), sample rate (LE u32 at 4), bits/sample (LE u16 at
  * 14). Same preference-order (b) custom-expression rationale as
  * [[JpegDims]]/[[Mp4Dims]]: a variable-offset scan cannot be a
  * fixed-offset builtin, and a primitive byte loop stays inside
  * whole-stage codegen.
  *
  * Returns `(rate << 32) | (channels << 16) | bits` packed in one LONG;
  * NULL when the payload is not RIFF/WAVE, no `fmt ` chunk is found, or
  * the chunk is truncated. The caller splits the packed value with
  * codegen'd bit ops.
  */
case class WavFmt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_fmt"

  override protected def nullSafeEval(input: Any): Any = {
    val bb = input.asInstanceOf[Array[Byte]]
    val len = bb.length
    def be32(o: Int): Long =
      (((bb(o) & 0xFF) << 24) | ((bb(o + 1) & 0xFF) << 16) |
        ((bb(o + 2) & 0xFF) << 8) | (bb(o + 3) & 0xFF)) & 0xFFFFFFFFL
    def le16(o: Int): Int = (bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long =
      ((bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8) | ((bb(o + 2) & 0xFF) << 16) |
        ((bb(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL
    if (len < 12 || be32(0) != 0x52494646L || be32(8) != 0x57415645L) return null
    var i = 12
    while (i + 8 <= len) {
      val id = be32(i)
      val size = le32(i + 4)
      if (id == 0x666D7420L) { // "fmt "
        if (size < 16L || i + 8 + 16 > len) return null
        val channels = le16(i + 10)
        val rate = le32(i + 12)
        val bits = le16(i + 22)
        return (rate << 32) | (channels.toLong << 16) | bits.toLong
      }
      // WORD alignment: odd-sized chunks carry a pad byte. A size running
      // past the payload is malformed; a zero-size chunk still advances
      // by its 8-byte header, so the walk always progresses.
      val step = 8L + size + (size & 1L)
      if (i + step > len) return null
      i += step.toInt
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val bb = ctx.freshName("bb")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val id = ctx.freshName("id")
      val size = ctx.freshName("size")
      val step = ctx.freshName("step")
      val ch = ctx.freshName("ch")
      val rate = ctx.freshName("rate")
      val bits = ctx.freshName("bits")
      val scan = ctx.freshName("wavscan")
      def be32(o: String) =
        s"(((($bb[$o] & 0xFF) << 24) | (($bb[($o) + 1] & 0xFF) << 16) | " +
          s"(($bb[($o) + 2] & 0xFF) << 8) | ($bb[($o) + 3] & 0xFF)) & 0xFFFFFFFFL)"
      def le32(o: String) =
        s"((($bb[$o] & 0xFF) | (($bb[($o) + 1] & 0xFF) << 8) | " +
          s"(($bb[($o) + 2] & 0xFF) << 16) | (($bb[($o) + 3] & 0xFF) << 24)) & 0xFFFFFFFFL)"
      def le16(o: String) =
        s"(($bb[$o] & 0xFF) | (($bb[($o) + 1] & 0xFF) << 8))"
      s"""
         |${ev.isNull} = true;
         |$scan: {
         |  final byte[] $bb = $bytes;
         |  final int $len = $bb.length;
         |  if ($len < 12 || ${be32("0")} != 0x52494646L || ${be32("8")} != 0x57415645L) break $scan;
         |  int $i = 12;
         |  while ($i + 8 <= $len) {
         |    final long $id = ${be32(i)};
         |    final long $size = ${le32(s"$i + 4")};
         |    if ($id == 0x666D7420L) {
         |      if ($size < 16L || $i + 8 + 16 > $len) break $scan;
         |      final long $ch = ${le16(s"$i + 10")};
         |      final long $rate = ${le32(s"$i + 12")};
         |      final long $bits = ${le16(s"$i + 22")};
         |      ${ev.value} = ($rate << 32) | ($ch << 16) | $bits;
         |      ${ev.isNull} = false;
         |      break $scan;
         |    }
         |    final long $step = 8L + $size + ($size & 1L);
         |    if ($i + $step > $len) break $scan;
         |    $i += (int) $step;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavFmt =
    copy(child = newChild)
}

/** Shared PCM fold body — called from BOTH the interpreted eval and the
  * generated code (the Y4M technique: one implementation, zero parity
  * surface).
  */
object WavEval {
  /** Decode the PCM `data` chunk's SAMPLES — the audio sibling of the
    * BMP/Y4M pixel folds: walks the RIFF chunk sequence for `fmt ` and
    * `data`, then folds every sample's magnitude into
    * `(sumAbs << 17) | peakAbs`:
    *
    *  - 16-bit PCM: LE signed samples, |s| <= 32768 (peak lane is 17
    *    bits wide precisely for -32768); an odd data size is malformed;
    *  - 8-bit PCM: unsigned bytes centered at 128, |v - 128| <= 128;
    *  - format code != 1 (non-PCM), other bit depths, a data chunk
    *    running past the payload, or no fmt/data at all: NULL — never a
    *    garbage fold.
    *
    * The 46-bit sum lane supports ~2^31 samples (a day of mono 24 kHz in
    * ONE payload) — beyond any binary-column row. Mean magnitude at any
    * precision is a bit-split + division away (the caller derives the
    * sample count from the data size and fmt).
    */
  def pcmStats(bb: Array[Byte]): java.lang.Long = {
    val len = bb.length
    def be32(o: Int): Long =
      (((bb(o) & 0xFF) << 24) | ((bb(o + 1) & 0xFF) << 16) |
        ((bb(o + 2) & 0xFF) << 8) | (bb(o + 3) & 0xFF)) & 0xFFFFFFFFL
    def le16(o: Int): Int = (bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long =
      ((bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8) | ((bb(o + 2) & 0xFF) << 16) |
        ((bb(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL
    if (len < 12 || be32(0) != 0x52494646L || be32(8) != 0x57415645L) return null
    var fmtCode = -1
    var bits = -1
    var dataOff = -1L
    var dataLen = -1L
    var i = 12
    while (i + 8 <= len && (bits < 0 || dataOff < 0)) {
      val id = be32(i)
      val size = le32(i + 4)
      if (id == 0x666D7420L) { // "fmt "
        if (size < 16L || i + 8 + 16 > len) return null
        fmtCode = le16(i + 8)
        bits = le16(i + 22)
      } else if (id == 0x64617461L) { // "data"
        dataOff = i + 8L
        dataLen = size
      }
      // advance only while something is still missing: the walk stops AT
      // the last needed chunk, so a FINAL odd-sized data chunk missing
      // its pad byte (spec-mandated, commonly omitted in the wild) is
      // accepted — its payload completeness is checked separately below;
      // a mid-stream chunk must still be properly padded or the walk
      // refuses
      if (bits < 0 || dataOff < 0) {
        val step = 8L + size + (size & 1L)
        if (i + step > len) return null
        i += step.toInt
      }
    }
    if (fmtCode != 1 || dataOff < 0) return null
    if (bits != 8 && bits != 16) return null
    if (dataOff + dataLen > len) return null
    if (bits == 16 && (dataLen & 1L) != 0) return null
    var sum = 0L
    var peak = 0
    var p = dataOff.toInt
    val end = (dataOff + dataLen).toInt
    if (bits == 16) {
      while (p < end) {
        val s = ((bb(p) & 0xFF) | (bb(p + 1) << 8)).toShort.toInt
        val a = if (s < 0) -s else s // |-32768| = 32768 fits the 17-bit lane
        sum += a
        if (a > peak) peak = a
        p += 2
      }
    } else {
      while (p < end) {
        val v = (bb(p) & 0xFF) - 128
        val a = if (v < 0) -v else v
        sum += a
        if (a > peak) peak = a
        p += 1
      }
    }
    java.lang.Long.valueOf((sum << 17) | peak.toLong)
  }
}

/** `binary -> long`: PCM sample-magnitude statistics
  * `(sumAbs << 17) | peakAbs` via the RIFF walk + sample fold
  * ([[WavEval.pcmStats]]) — REAL audio decode, the modality sibling of
  * [[BmpLuma]] (pixels) and [[Y4mFrameLuma]] (frames).
  */
case class WavPcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_pcm_stats"

  override protected def nullSafeEval(input: Any): Any =
    WavEval.pcmStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val boxed = ctx.freshName("pcmStats")
      s"""
         |Object $boxed = graft.functions.WavEval.pcmStats($bytes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}
