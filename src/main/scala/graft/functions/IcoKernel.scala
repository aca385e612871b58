package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** ICO (favicon) metadata (q176) — the icon container every crawled
  * site ships (`/favicon.ico`; the highest-REQUEST-frequency image
  * artifact on the web) and a directory-of-images format with its
  * own traps:
  *
  *  - ICONDIR: u16 reserved (MUST be 0), u16 type (1 = icon; 2 is a
  *    cursor — out of stated scope, refuses), u16 count, then 16-byte
  *    entries: width/height BYTES where 0 means 256 (the
  *    high-resolution spelling a naive reader takes literally),
  *    bit depth, u32 payload size, u32 payload offset;
  *  - each payload is EITHER an embedded PNG (Vista+ icons — sniffed
  *    by magic) or a BMP DIB whose BITMAPINFOHEADER height is
  *    DOUBLED (XOR raster + AND mask; a reader trusting `biHeight`
  *    reports every classic icon twice as tall — the kernel
  *    cross-checks `dibH == 2 * entryH` and fails the ENTRY on
  *    mismatch);
  *  - an entry whose payload span runs past EOF refuses — that entry
  *    only, siblings serve (q132's per-member stance); a directory
  *    cut mid-entries refuses WHOLE (the q82 framing rule).
  */
object IcoEval {

  final case class Ico(n: Int, nValid: Int, maxW: Int, maxBpp: Int,
                       hasPng: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL

  def parse(b: Array[Byte]): Ico = {
    if (b == null || b.length < 6) return null
    if (le16(b, 0) != 0 || le16(b, 2) != 1) return null // icons only
    val n = le16(b, 4)
    if (n == 0 || n > 64) return null
    if (6 + 16 * n > b.length) return Ico(n, -1, -1, -1, -1) // cut directory
    var nValid = 0
    var maxW = 0
    var maxBpp = 0
    var hasPng = 0
    var k = 0
    while (k < n) {
      val e = 6 + 16 * k
      val w = { val v = b(e) & 0xFF; if (v == 0) 256 else v }
      val h = { val v = b(e + 1) & 0xFF; if (v == 0) 256 else v }
      val bpp = le16(b, e + 6)
      val size = le32(b, e + 8)
      val off = le32(b, e + 12)
      val inBounds = off >= 6 + 16L * n && size >= 8L &&
        off + size <= b.length
      if (inBounds) {
        val o = off.toInt
        val png = (b(o) & 0xFF) == 0x89 && b(o + 1) == 'P' &&
          b(o + 2) == 'N' && b(o + 3) == 'G'
        val entryOk =
          if (png) true
          else if (size >= 40L && le32(b, o) == 40L) {
            // BMP DIB: biHeight must be DOUBLE the entry height
            val dibH = le32(b, o + 8)
            dibH == 2L * h
          } else false
        if (entryOk) {
          nValid += 1
          if (w > maxW) maxW = w
          if (bpp > maxBpp) maxBpp = bpp
          if (png) hasPng = 1
        }
      }
      k += 1
    }
    Ico(n, nValid, maxW, maxBpp, hasPng)
  }

  /** n(8)<<32 | (nValid+1)(8)<<24 | maxW(9)<<15 | maxBpp(7)<<8 |
    * hasPng(1); -1 not ICO. nValid -1 (cut directory) packs 0. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r == null) return -1L
    (r.n.toLong << 32) | ((r.nValid + 1).toLong << 24) |
      (math.max(r.maxW, 0).toLong << 15) |
      (math.max(r.maxBpp, 0).toLong << 8) | math.max(r.hasPng, 0).toLong
  }

  // -------------------------------------------------------------- synth

  private def putLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }

  private def putLe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  /** A minimal doubled-height DIB payload for an (w, h, bpp) entry. */
  private def dib(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putLe32(o, 40L) // biSize
    putLe32(o, w.toLong)
    putLe32(o, 2L * h) // the doubled height
    putLe16(o, 1) // planes
    putLe16(o, bpp)
    putLe32(o, 0L) // BI_RGB
    var k = 0
    while (k < 20) { o.write(0); k += 1 } // rest of the 40-byte header
    o.write(Array.fill(16)(0x5A.toByte), 0, 16) // token raster bytes
    o.toByteArray
  }

  /** Synthesize a q176 icon. `params` packs `doc_id | mode<<40`:
    * 0 -> two DIB entries (16x16@4, 32x32@32); 1 -> one PNG entry
    * with the 0-means-256 width byte (payload = a real q121 PNG);
    * 2 -> three entries: PNG + DIB + one whose offset points past
    * EOF (that entry refuses, siblings serve); 3 -> directory cut
    * mid-entries (whole refusal).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val o = new java.io.ByteArrayOutputStream()
    putLe16(o, 0); putLe16(o, 1)
    val png = PngPixelEval.synth(id, (id % 6 + 1).toInt, (id % 4 + 1).toInt, 0)
    mode match {
      case 1 =>
        putLe16(o, 1)
        val off = 6 + 16
        o.write(0); o.write(0) // 0 -> 256 x 256
        o.write(0); o.write(0)
        putLe16(o, 1); putLe16(o, 32)
        putLe32(o, png.length.toLong); putLe32(o, off.toLong)
        o.write(png, 0, png.length)
      case 2 =>
        putLe16(o, 3)
        val d = dib(16, 16, 8)
        val off0 = 6 + 48
        o.write(16); o.write(16); o.write(0); o.write(0)
        putLe16(o, 1); putLe16(o, 8)
        putLe32(o, d.length.toLong); putLe32(o, off0.toLong)
        val off1 = off0 + d.length
        o.write(48); o.write(48); o.write(0); o.write(0)
        putLe16(o, 1); putLe16(o, 24)
        putLe32(o, png.length.toLong); putLe32(o, off1.toLong)
        // the liar: offset far past EOF
        o.write(64); o.write(64); o.write(0); o.write(0)
        putLe16(o, 1); putLe16(o, 32)
        putLe32(o, 4096L); putLe32(o, 1L << 20)
        o.write(d, 0, d.length)
        o.write(png, 0, png.length)
      case 3 =>
        putLe16(o, 2)
        o.write(16); o.write(16); o.write(0); o.write(0) // half an entry
      case _ =>
        putLe16(o, 2)
        val d0 = dib(16, 16, 4)
        val d1 = dib(32, 32, 32)
        val off0 = 6 + 32
        o.write(16); o.write(16); o.write(16); o.write(0)
        putLe16(o, 1); putLe16(o, 4)
        putLe32(o, d0.length.toLong); putLe32(o, off0.toLong)
        o.write(32); o.write(32); o.write(0); o.write(0)
        putLe16(o, 1); putLe16(o, 32)
        putLe32(o, d1.length.toLong); putLe32(o, (off0 + d0.length).toLong)
        o.write(d0, 0, d0.length)
        o.write(d1, 0, d1.length)
    }
    o.toByteArray
  }
}

/** `binary -> long`: packed icon-directory triage; NULL if not ICO. */
case class IcoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ico_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = IcoEval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("im")
      s"""
         |long $res = graft.functions.IcoEval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IcoMeta =
    copy(child = newChild)
}

/** `long -> binary`: q176's synthesis (params pack `doc_id|mode<<40`). */
case class IcoSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ico_synth"

  override protected def nullSafeEval(params: Any): Any =
    IcoEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.IcoEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): IcoSynth =
    copy(child = newChild)
}

/** Column surface for the ICO kernels. */
object IcoOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def icoMeta(b: Column): Column = ColumnBridge.column(IcoMeta(bin(b)))

  def icoSynth(params: Column): Column =
    ColumnBridge.column(IcoSynth(ColumnBridge.expression(params.cast("long"))))
}
