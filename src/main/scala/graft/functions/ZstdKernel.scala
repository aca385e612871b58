package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Zstandard frame metadata walk (q165) — the compression layer
  * Common Crawl moved to (`.warc.zst` replaced `.warc.gz` as the
  * primary distribution in 2020); a crawl-intake pipeline triages
  * these containers BEFORE paying decompression: how many frames,
  * how much declared content, which window budget will decoding
  * need, is the tail intact. The walk covers the RFC 8878 FRAME
  * grammar without decoding a block:
  *
  *  - magic `28 B5 2F FD` (LE 0xFD2FB528) opens a regular frame;
  *    `5x 2A 4D 18` (LE 0x184D2A5x) opens a SKIPPABLE frame (the
  *    dictionary/seek-table carrier `.warc.zst` uses) whose u32le
  *    size advances the walk with no content inspection;
  *  - the Frame_Header_Descriptor byte fans out: FCS field size
  *    0/2/4/8 (size 0 still means ONE byte under Single_Segment;
  *    the 2-byte form carries a +256 OFFSET — a reader without it
  *    is wrong on every mid-size frame), Single_Segment REPLACES the
  *    Window_Descriptor (reading one anyway shifts every later
  *    field), Dictionary_ID 0/1/2/4 bytes, a reserved bit that MUST
  *    be zero (set ⇒ the stream is not trustworthy past this point);
  *  - block headers are 3-byte LE: Last_Block bit, Block_Type
  *    (raw / RLE / compressed; type 3 reserved ⇒ refuse), and
  *    Block_Size — where an RLE block's CONTENT is exactly ONE byte
  *    regardless of its declared (decoded) size: a walker advancing
  *    by Block_Size overruns into the next frame;
  *  - Content_Checksum adds 4 tail bytes when flagged;
  *  - truncation anywhere: frames before the break serve,
  *    `truncated = 1` (q82's stop-don't-guess).
  *
  * Block CONTENT decode (FSE/Huffman) is out of stated scope — this
  * is the triage rung; a decoding deployment hands the framed spans
  * to a native zstd, exactly as q130 hands MP3 audio past its
  * header math.
  */
object ZstdEval {

  final case class Res(isZstd: Int, nFrames: Int, nSkippable: Int,
                       contentSize: Long, hasChecksum: Int, windowLog: Int,
                       dictId: Long, truncated: Int)

  private val Refuse = Res(0, -1, -1, -2L, -1, -1, -2L, -1)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def leN(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    var k = n - 1
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  def parse(b: Array[Byte]): Res = {
    if (b == null || b.length < 4) return Refuse
    var i = 0
    var frames = 0
    var skippable = 0
    var content = 0L
    var contentKnown = true
    var truncated = 0
    var firstCk = -1
    var firstWlog = -1
    var firstDict = -1L
    var sawAny = false
    var stop = false
    while (!stop) {
      if (i == b.length) stop = true // clean end
      else if (i + 4 > b.length) {
        if (!sawAny) return Refuse
        truncated = 1; stop = true
      } else {
        val magic = u32le(b, i)
        if (magic == 0xFD2FB528L) {
          sawAny = true
          if (i + 5 > b.length) { truncated = 1; stop = true }
          else {
            val fhd = b(i + 4) & 0xFF
            if ((fhd & 0x08) != 0) { // reserved bit set: not trustworthy
              truncated = 1; stop = true
            } else {
              val single = (fhd >> 5) & 1
              val fcsFlag = fhd >>> 6
              val dictFlag = fhd & 3
              var off = i + 5
              var wlog = -1
              var bad = false
              if (single == 0) {
                if (off + 1 > b.length) bad = true
                else {
                  wlog = 10 + ((b(off) & 0xFF) >>> 3)
                  off += 1
                }
              }
              val dictBytes = dictFlag match {
                case 1 => 1; case 2 => 2; case 3 => 4; case _ => 0
              }
              var dict = -1L
              if (!bad && dictBytes > 0) {
                if (off + dictBytes > b.length) bad = true
                else { dict = leN(b, off, dictBytes); off += dictBytes }
              }
              val fcsBytes = fcsFlag match {
                case 1 => 2; case 2 => 4; case 3 => 8
                case _ => if (single == 1) 1 else 0
              }
              var fcs = -1L
              if (!bad && fcsBytes > 0) {
                if (off + fcsBytes > b.length) bad = true
                else {
                  fcs = leN(b, off, fcsBytes)
                  if (fcsBytes == 2) fcs += 256L // the spec's offset
                  off += fcsBytes
                }
              }
              // block walk: sizes only, never content
              var last = false
              while (!bad && !last) {
                if (off + 3 > b.length) bad = true
                else {
                  val hdr = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
                    ((b(off + 2) & 0xFF) << 16)
                  last = (hdr & 1) == 1
                  val btype = (hdr >> 1) & 3
                  val bsize = hdr >>> 3
                  if (btype == 3) bad = true // reserved block type
                  else {
                    val contentBytes = if (btype == 1) 1 else bsize
                    off += 3 + contentBytes
                    if (off > b.length) bad = true
                  }
                }
              }
              if (!bad && (fhd & 0x04) != 0) { // Content_Checksum_flag
                off += 4
                if (off > b.length) bad = true
              }
              if (bad) { truncated = 1; stop = true }
              else {
                frames += 1
                if (fcs < 0L) contentKnown = false else content += fcs
                if (firstCk < 0) {
                  firstCk = (fhd >> 2) & 1
                  firstWlog = wlog
                  firstDict = dict
                }
                i = off
              }
            }
          }
        } else if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
          sawAny = true
          if (i + 8 > b.length) { truncated = 1; stop = true }
          else {
            val size = u32le(b, i + 4)
            if (i + 8 + size > b.length) { truncated = 1; stop = true }
            else { skippable += 1; i += 8 + size.toInt }
          }
        } else {
          if (!sawAny) return Refuse
          truncated = 1; stop = true // trailing garbage after frames
        }
      }
    }
    if (!sawAny) return Refuse
    Res(1, frames, skippable, if (contentKnown) content else -1L,
      if (firstCk < 0) 0 else firstCk, firstWlog, firstDict, truncated)
  }

  /** Packed meta: 1<<48 | truncated<<44 | hasCk<<40 | nFrames<<32 |
    * nSkippable<<24 | (windowLog+1)<<16 — or -1 when not zstd. */
  def meta(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r.isZstd == 0) return -1L
    (1L << 48) | (r.truncated.toLong << 44) | (r.hasChecksum.toLong << 40) |
      (math.min(r.nFrames, 0xFF).toLong << 32) |
      (math.min(r.nSkippable, 0xFF).toLong << 24) |
      ((r.windowLog + 1).toLong << 16)
  }

  /** Declared content-size total; -1 = some frame omitted it (NULL),
    * -2 = not zstd. */
  def contentSize(b: Array[Byte]): Long = parse(b).contentSize

  def dictId(b: Array[Byte]): Long = parse(b).dictId

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def putLeN(o: java.io.ByteArrayOutputStream, v: Long,
                     n: Int): Unit = {
    var k = 0
    while (k < n) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def blockHeader(o: java.io.ByteArrayOutputStream, last: Boolean,
                          btype: Int, size: Int): Unit = {
    val hdr = (if (last) 1 else 0) | (btype << 1) | (size << 3)
    o.write(hdr & 0xFF); o.write((hdr >> 8) & 0xFF); o.write((hdr >> 16) & 0xFF)
  }

  /** One regular frame carrying `payload` as raw blocks (+ an RLE
    * block of `rle` repeats when rle > 0). */
  def frame(o: java.io.ByteArrayOutputStream, payload: Array[Byte],
            rle: Int, single: Boolean, fcsFlag: Int, checksum: Boolean,
            dictId: Long, dictBytes: Int, windowByte: Int): Unit = {
    putU32le(o, 0xFD2FB528L)
    val dictFlag = dictBytes match {
      case 1 => 1; case 2 => 2; case 4 => 3; case _ => 0
    }
    val fhd = (fcsFlag << 6) | (if (single) 0x20 else 0) |
      (if (checksum) 0x04 else 0) | dictFlag
    o.write(fhd)
    if (!single) o.write(windowByte & 0xFF)
    if (dictBytes > 0) putLeN(o, dictId, dictBytes)
    val total = payload.length.toLong + rle
    val fcsBytes = fcsFlag match {
      case 1 => 2; case 2 => 4; case 3 => 8
      case _ => if (single) 1 else 0
    }
    if (fcsBytes == 2) putLeN(o, total - 256L, 2) // the +256 offset
    else if (fcsBytes > 0) putLeN(o, total, fcsBytes)
    // one raw block, then optionally one RLE block
    blockHeader(o, last = rle == 0, btype = 0, payload.length)
    o.write(payload, 0, payload.length)
    if (rle > 0) {
      blockHeader(o, last = true, btype = 1, rle)
      o.write('z') // RLE content: exactly ONE byte
    }
    if (checksum) putU32le(o, 0x12345678L) // value out of stated scope
  }

  /** Synthesize a q165 stream. `params` packs `doc_id | mode<<40`:
    * 0 -> one single-segment frame, 1-byte FCS, checksum; 1 -> a
    * skippable frame, then a frame with window descriptor, 2-byte
    * FCS (the +256 offset drill: content > 256), 2-byte dict id and
    * an RLE block (content 1 byte, decoded size many); 2 -> two
    * frames, the second 4-byte FCS, no checksum; 3 -> class 0 cut 5
    * bytes short (nothing serves, truncated); 4 is the caller's
    * plain-text class.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // capped at 200 so the 1-byte FCS classes can never overflow it
    val p0full = (ws(0) + " " + ws(1) + "#" + (id % 97)).getBytes(utf8)
    val p0 = if (p0full.length <= 200) p0full
    else java.util.Arrays.copyOfRange(p0full, 0, 200)
    val o = new java.io.ByteArrayOutputStream()
    mode match {
      case 1 =>
        // skippable frame first (a seek table would live here)
        putU32le(o, 0x184D2A53L)
        val skip = ("seek#" + (id % 13)).getBytes(utf8)
        putU32le(o, skip.length.toLong)
        o.write(skip, 0, skip.length)
        // regular frame: window descriptor, 2-byte FCS, dict, RLE
        val big = new Array[Byte](300 + (id % 7).toInt)
        var k = 0
        while (k < big.length) { big(k) = ('a' + (k % 26)).toByte; k += 1 }
        frame(o, big, rle = 40 + (id % 5).toInt, single = false,
          fcsFlag = 1, checksum = false, dictId = 1000L + id % 1000,
          dictBytes = 2, windowByte = (id % 8).toInt << 3)
      case 2 =>
        frame(o, p0, rle = 0, single = true, fcsFlag = 0,
          checksum = false, dictId = -1L, dictBytes = 0, windowByte = 0)
        frame(o, p0, rle = 0, single = false, fcsFlag = 2,
          checksum = false, dictId = -1L, dictBytes = 0,
          windowByte = (id % 4).toInt << 3)
      case 3 =>
        frame(o, p0, rle = 0, single = true, fcsFlag = 0,
          checksum = true, dictId = -1L, dictBytes = 0, windowByte = 0)
        val all = o.toByteArray
        return java.util.Arrays.copyOfRange(all, 0, all.length - 5)
      case _ =>
        frame(o, p0, rle = 0, single = true, fcsFlag = 0,
          checksum = true, dictId = -1L, dictBytes = 0, windowByte = 0)
    }
    o.toByteArray
  }
}

/** `binary -> long`: packed zstd triage meta, -1 when not zstd. */
case class ZstdMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_meta"

  override protected def nullSafeEval(input: Any): Any =
    ZstdEval.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ZstdEval.meta($b)")

  override protected def withNewChildInternal(newChild: Expression): ZstdMeta =
    copy(child = newChild)
}

/** `binary -> long`: declared content-size total; NULL when any frame
  * omits its FCS or the stream is not zstd. */
case class ZstdContentSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_content_size"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ZstdEval.contentSize(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zcs")
      s"""
         |long $res = graft.functions.ZstdEval.contentSize($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZstdContentSize =
    copy(child = newChild)
}

/** `binary -> long`: first frame's dictionary id, NULL when none. */
case class ZstdDictId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_dict_id"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ZstdEval.dictId(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("zdi")
      s"""
         |long $res = graft.functions.ZstdEval.dictId($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZstdDictId =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q165's synthesis. */
case class ZstdSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    ZstdEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.ZstdEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZstdSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the zstd kernels. */
object ZstdOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def zstdMeta(b: Column): Column = ColumnBridge.column(ZstdMeta(bin(b)))
  def zstdContentSize(b: Column): Column =
    ColumnBridge.column(ZstdContentSize(bin(b)))
  def zstdDictId(b: Column): Column = ColumnBridge.column(ZstdDictId(bin(b)))

  def zstdSynth(text: Column, params: Column): Column =
    ColumnBridge.column(ZstdSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
