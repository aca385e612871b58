package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Netpbm (PNM) pixel decode (q172) — the UNCOMPRESSED interchange
  * format scientific and vision pipelines still emit (P2/P5 PGM
  * grayscale, P3/P6 PPM color; the fourth lossless rung after BMP
  * q59, PNG q121, GIF q124), with the format's own traps:
  *
  *  - the header is TOKENIZED, not fixed-offset: width/height/maxval
  *    separated by arbitrary whitespace runs, and `#` COMMENTS may
  *    appear wherever whitespace can — a fixed-offset reader dies on
  *    the first commented header;
  *  - ASCII rasters (P2/P3) are whitespace-separated decimal samples
  *    spanning lines arbitrarily; binary rasters (P5/P6) begin after
  *    EXACTLY ONE whitespace char following maxval (consuming a run
  *    would eat raster bytes that happen to be 0x20/0x0A);
  *  - maxval > 255 makes each binary sample TWO bytes BIG-endian
  *    (the 16-bit trap: a one-byte reader shears every row);
  *  - maxval must be 1..65535; a raster shorter than w·h·channels
  *    (·bytes) keeps dims and refuses stats (q59's meta/stat split).
  *
  * Luma is the Rec.601 integer fold in the file's OWN sample space
  * (gray: the sample; RGB: `(299r+587g+114b)/1000` floor) — no
  * maxval rescale, stated not guessed. Resource guard: each edge
  * <= 4096.
  */
object PnmEval {

  final case class Pnm(format: Int, w: Int, h: Int, maxval: Int,
                       min: Long, max: Long, sum: Long, statsOk: Boolean)

  private final class Tok(val b: Array[Byte]) {
    var i = 0
    /** Skip whitespace and `#` comments (to end of line). */
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i) & 0xFF
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0B ||
          c == 0x0C) i += 1
        else if (c == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else go = false
      }
    }

    /** Next decimal token as Int; -1 on refusal. */
    def int(): Int = {
      skipWs()
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
        any = true
      }
      if (!any) -1 else v.toInt
    }
  }

  def parse(b: Array[Byte]): Pnm = {
    if (b == null || b.length < 2 || b(0) != 'P') return null
    val format = b(1) - '0'
    if (format != 2 && format != 3 && format != 5 && format != 6) return null
    val t = new Tok(b)
    t.i = 2
    val w = t.int()
    val h = t.int()
    val maxval = t.int()
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    if (maxval <= 0 || maxval > 65535) return null
    val channels = if (format == 3 || format == 6) 3 else 1
    val nSamples = w.toLong * h * channels

    var min = Long.MaxValue
    var max = Long.MinValue
    var sum = 0L
    var ok = true

    if (format == 2 || format == 3) {
      // ASCII raster: whitespace/comment-separated decimals
      var k = 0L
      val samples = new Array[Long](if (channels == 3) 3 else 1)
      var px = 0
      while (ok && k < nSamples) {
        val v = t.int()
        if (v < 0 || v > maxval) ok = false
        else {
          samples(px) = v
          px += 1
          if (px == channels) {
            val luma =
              if (channels == 3)
                (299L * samples(0) + 587L * samples(1) + 114L * samples(2)) / 1000L
              else samples(0)
            if (luma < min) min = luma
            if (luma > max) max = luma
            sum += luma
            px = 0
          }
          k += 1
        }
      }
    } else {
      // binary raster: EXACTLY ONE whitespace after maxval
      if (t.i >= b.length) ok = false
      else {
        val c = b(t.i) & 0xFF
        if (c != ' ' && c != '\t' && c != '\n' && c != '\r') ok = false
        else {
          var p = t.i + 1
          val bytesPer = if (maxval > 255) 2 else 1
          val need = nSamples * bytesPer
          if (p + need > b.length) ok = false
          else {
            var k = 0L
            val samples = new Array[Long](3)
            var px = 0
            while (k < nSamples) {
              val v =
                if (bytesPer == 2) {
                  val hi = b(p) & 0xFF
                  val lo = b(p + 1) & 0xFF
                  p += 2
                  (hi << 8) | lo // big-endian per spec
                } else { val x = b(p) & 0xFF; p += 1; x }
              if (v > maxval) { ok = false; k = nSamples }
              else {
                samples(px) = v
                px += 1
                if (px == channels) {
                  val luma =
                    if (channels == 3)
                      (299L * samples(0) + 587L * samples(1) +
                        114L * samples(2)) / 1000L
                    else samples(0)
                  if (luma < min) min = luma
                  if (luma > max) max = luma
                  sum += luma
                  px = 0
                }
                k += 1
              }
            }
          }
        }
      }
    }
    if (!ok) Pnm(format, w, h, maxval, -1L, -1L, -1L, statsOk = false)
    else Pnm(format, w, h, maxval, min, max, sum, statsOk = true)
  }

  /** format(4) << 44 | maxval(17) << 27 | w(13) << 14 | h(13) << 1 | 1;
    * -1 when not PNM. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) return -1L
    (r.format.toLong << 44) | (r.maxval.toLong << 27) |
      (r.w.toLong << 14) | (r.h.toLong << 1) | 1L
  }

  /** Summed luma as a plain long (exact for any stated-scope image);
    * -1 when stats refuse. Sum travels UNPACKED because 16-bit
    * samples over 4096x4096 pixels need 40 bits — packing it beside
    * min/max silently corrupted lumas above 4095. */
  def luma(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null || !r.statsOk) return -1L
    r.sum
  }

  /** (max << 17) | min — 17-bit fields hold the full 16-bit sample
    * space (maxval <= 65535); -1 when stats refuse. */
  def lumaRange(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null || !r.statsOk) return -1L
    (r.max << 17) | r.min
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q172 image. `params` packs `doc_id | mode<<40`:
    * 0 -> P5 binary gray, maxval 255; 1 -> P6 binary RGB with header
    * COMMENTS (q59's channel maps); 2 -> P2 ASCII gray across ragged
    * lines; 3 -> P5 16-bit gray (maxval 1000, big-endian pairs);
    * 4 -> class 0 with the raster cut 3 bytes short (dims survive,
    * stats refuse). Gray sample (x,r) = (id*2 + x + r*11) % 256 (or
    * % 1001 for 16-bit); RGB channels are q59's residue maps.
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val w = (id % 6 + 2).toInt
    val h = (id % 4 + 2).toInt
    val o = new java.io.ByteArrayOutputStream()
    def wr(s: String): Unit =
      o.write(s.getBytes("US-ASCII"), 0, s.length)
    def gray(x: Int, r: Int): Int = ((id * 2 + x + r * 11) % 256).toInt
    mode match {
      case 1 =>
        wr("P6\n# synthesized for doc " + id + "\n" + w +
          " # width\n " + h + "\n255\n")
        var r = 0
        while (r < h) {
          var x = 0
          while (x < w) {
            o.write(((id * 2 + x + r * 11) % 256).toInt)
            o.write(((id * 3 + x * 5 + r) % 256).toInt)
            o.write(((id + x * 7 + r * 13) % 256).toInt)
            x += 1
          }
          r += 1
        }
      case 2 =>
        wr("P2\n" + w + "  " + h + "\n255\n")
        var r = 0
        while (r < h) {
          var x = 0
          val line = new StringBuilder
          while (x < w) {
            line.append(gray(x, r))
            line.append(if (x % 3 == 2) "\n" else " ")
            x += 1
          }
          wr(line.toString)
          r += 1
        }
        wr("\n")
      case 3 =>
        wr("P5 " + w + " " + h + " 1000\n")
        var r = 0
        while (r < h) {
          var x = 0
          while (x < w) {
            val v = ((id * 2 + x + r * 11) % 1001).toInt
            o.write((v >> 8) & 0xFF) // big-endian
            o.write(v & 0xFF)
            x += 1
          }
          r += 1
        }
      case _ =>
        wr("P5\n" + w + " " + h + "\n255\n")
        var r = 0
        while (r < h) {
          var x = 0
          while (x < w) { o.write(gray(x, r)); x += 1 }
          r += 1
        }
    }
    val all = o.toByteArray
    // mode 4 shares the default (P5) layout above, cut 3 raster
    // bytes short: dims survive, stats refuse
    if (mode == 4) java.util.Arrays.copyOfRange(all, 0, all.length - 3)
    else all
  }
}

/** `binary -> long`: packed (format, maxval, dims); NULL if not PNM. */
case class PnmMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pnm_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PnmEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pm")
      s"""
         |long $res = graft.functions.PnmEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PnmMeta =
    copy(child = newChild)
}

/** `binary -> long`: summed luma in the file's own sample space;
  * NULL when the raster refuses. */
case class PnmLuma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pnm_luma"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PnmEval.luma(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pl")
      s"""
         |long $res = graft.functions.PnmEval.luma($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PnmLuma =
    copy(child = newChild)
}

/** `binary -> long`: `(max << 17) | min` luma range in the file's own
  * sample space (17-bit fields cover 16-bit samples); NULL when the
  * raster refuses. */
case class PnmLumaRange(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pnm_luma_range"

  override protected def nullSafeEval(input: Any): Any = {
    val r = PnmEval.lumaRange(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("pr")
      s"""
         |long $res = graft.functions.PnmEval.lumaRange($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PnmLumaRange =
    copy(child = newChild)
}

/** `long -> binary`: q172's synthesis (params pack `doc_id|mode<<40`). */
case class PnmSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pnm_synth"

  override protected def nullSafeEval(params: Any): Any =
    PnmEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.PnmEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): PnmSynth =
    copy(child = newChild)
}

/** Column surface for the PNM kernels. */
object PnmOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def pnmMeta(b: Column): Column = ColumnBridge.column(PnmMeta(bin(b)))
  def pnmLuma(b: Column): Column = ColumnBridge.column(PnmLuma(bin(b)))
  def pnmLumaRange(b: Column): Column =
    ColumnBridge.column(PnmLumaRange(bin(b)))

  def pnmSynth(params: Column): Column =
    ColumnBridge.column(PnmSynth(ColumnBridge.expression(params.cast("long"))))
}
