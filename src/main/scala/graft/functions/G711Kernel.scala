package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** G.711 companded audio decode (q171) — the telephony rung of the
  * audio family (q62 folds LINEAR PCM; call-center and voicemail
  * corpora — the speech-data long tail — arrive µ-law/A-law
  * companded, WAVE format codes 7 and 6): each byte expands to its
  * 13/14-bit linear value through the published ITU-T G.711
  * piecewise-linear algorithm (the Sun `g711.c` formulation —
  * computed per byte, never a copied 256-entry table: the ALGORITHM
  * is the contract, and the oracle replays it in independent SQL
  * arithmetic), folded to q62's `(sumAbs << 17) | peakAbs` magnitude
  * contract.
  *
  * The companding traps each class drills:
  *  - µ-law bytes are stored COMPLEMENTED (`~b`) — a reader skipping
  *    the inversion decodes silence as full-scale;
  *  - A-law bytes are stored XOR 0x55 (the even-bit inversion) with
  *    a DIFFERENT segment-0 rule (no +0x84 bias; segments 0 and 1
  *    both unshifted);
  *  - both are 8-bit-only codes: a fmt declaring 16-bit G.711 is
  *    malformed and refuses (NULL, never a garbage fold);
  *  - the RIFF walk is q56/q62's: JUNK chunks skip by size, the walk
  *    stops AT the data chunk so a final odd-sized data chunk
  *    missing its pad byte is accepted.
  */
object G711Eval {

  /** |linear| of a µ-law byte (G.711 §table 2a/2b, g711.c algebra). */
  def ulawMag(bIn: Int): Int = {
    val u = (~bIn) & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    t - 0x84
  }

  /** |linear| of an A-law byte (G.711 §table 1a/1b, g711.c algebra). */
  def alawMag(bIn: Int): Int = {
    val a = bIn ^ 0x55
    val seg = (a & 0x70) >> 4
    val base = (a & 0x0F) << 4
    if (seg == 0) base + 8
    else if (seg == 1) base + 0x108
    else (base + 0x108) << (seg - 1)
  }

  private def be32(bb: Array[Byte], o: Int): Long =
    (((bb(o) & 0xFF) << 24) | ((bb(o + 1) & 0xFF) << 16) |
      ((bb(o + 2) & 0xFF) << 8) | (bb(o + 3) & 0xFF)) & 0xFFFFFFFFL

  private def le16(bb: Array[Byte], o: Int): Int =
    (bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8)

  private def le32(bb: Array[Byte], o: Int): Long =
    ((bb(o) & 0xFF) | ((bb(o + 1) & 0xFF) << 8) |
      ((bb(o + 2) & 0xFF) << 16) | ((bb(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL

  /** Walk to (fmtCode, bits, dataOff, dataLen); null on refusal. */
  private def walk(bb: Array[Byte]): Array[Long] = {
    val len = bb.length
    if (len < 12 || be32(bb, 0) != 0x52494646L ||
      be32(bb, 8) != 0x57415645L) return null
    var fmtCode = -1L
    var bits = -1L
    var dataOff = -1L
    var dataLen = -1L
    var i = 12
    while (i + 8 <= len && (bits < 0 || dataOff < 0)) {
      val id = be32(bb, i)
      val size = le32(bb, i + 4)
      if (id == 0x666D7420L) { // "fmt "
        if (size < 16L || i + 8 + 16 > len) return null
        fmtCode = le16(bb, i + 8)
        bits = le16(bb, i + 22)
      } else if (id == 0x64617461L) { // "data"
        dataOff = i + 8L
        dataLen = size
      }
      if (bits < 0 || dataOff < 0) {
        val step = 8L + size + (size & 1L)
        if (i + step > len) return null
        i += step.toInt
      }
    }
    if (dataOff < 0 || fmtCode < 0) return null
    if (dataOff + dataLen > len) return null
    Array(fmtCode, bits, dataOff, dataLen)
  }

  /** codec(4) << 36 | nSamples; codec 1 = µ-law, 2 = A-law; -1 refusal. */
  def meta(bb: Array[Byte]): Long = {
    if (bb == null) return -1L
    val w = walk(bb)
    if (w == null) return -1L
    val codec = w(0) match {
      case 7L => 1L
      case 6L => 2L
      case _ => return -1L
    }
    if (w(1) != 8L) return -1L // G.711 is an 8-bit code, always
    (codec << 36) | w(3)
  }

  /** `(sumAbs << 17) | peakAbs` over the expanded magnitudes; -1 refusal. */
  def stats(bb: Array[Byte]): Long = {
    if (bb == null) return -1L
    val w = walk(bb)
    if (w == null) return -1L
    val ulaw = w(0) == 7L
    if (!ulaw && w(0) != 6L) return -1L
    if (w(1) != 8L) return -1L
    var sum = 0L
    var peak = 0
    var p = w(2).toInt
    val end = (w(2) + w(3)).toInt
    while (p < end) {
      val m = if (ulaw) ulawMag(bb(p) & 0xFF) else alawMag(bb(p) & 0xFF)
      sum += m
      if (m > peak) peak = m
      p += 1
    }
    (sum << 17) | peak.toLong
  }

  // -------------------------------------------------------------- synth

  private def putLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }

  private def putLe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  /** Synthesize a q171 container. `params` packs `doc_id | mode<<40`:
    * 0 -> µ-law (fmt 7); 1 -> A-law (fmt 6); 2 -> A-law behind a
    * JUNK chunk with an ODD data size and no trailing pad (the
    * walk-stops-at-data acceptance); 3 -> fmt 7 DECLARING 16 bits
    * (malformed G.711 — meta and stats refuse). Data bytes are
    * `(doc_id*7 + k*13) % 256`, `n = 40 + doc_id % 17` samples
    * (n+1 even samples for classes 0/1/3).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val nBase = (40 + id % 17).toInt
    val n = if (mode == 2) nBase | 1 else nBase & ~1 // odd for the pad drill
    val fmtCode = if (mode == 0 || mode == 3) 7 else 6
    val bits = if (mode == 3) 16 else 8

    val body = new java.io.ByteArrayOutputStream()
    if (mode == 2) { // JUNK before fmt: fixed offsets cannot pass
      body.write("JUNK".getBytes("US-ASCII"), 0, 4)
      val jl = (id % 5).toInt * 2 + 4
      putLe32(body, jl.toLong)
      var k = 0
      while (k < jl) { body.write(0xAB); k += 1 }
    }
    body.write("fmt ".getBytes("US-ASCII"), 0, 4)
    putLe32(body, 16L)
    putLe16(body, fmtCode)
    putLe16(body, 1) // mono
    putLe32(body, 8000L)
    putLe32(body, 8000L)
    putLe16(body, 1)
    putLe16(body, bits)
    body.write("data".getBytes("US-ASCII"), 0, 4)
    putLe32(body, n.toLong)
    var k = 0
    while (k < n) { body.write(((id * 7 + k * 13) % 256).toInt); k += 1 }
    // no pad byte after an odd final data chunk, by design

    val whole = new java.io.ByteArrayOutputStream()
    whole.write("RIFF".getBytes("US-ASCII"), 0, 4)
    putLe32(whole, 4L + body.size())
    whole.write("WAVE".getBytes("US-ASCII"), 0, 4)
    val bbytes = body.toByteArray
    whole.write(bbytes, 0, bbytes.length)
    whole.toByteArray
  }
}

/** `binary -> long`: packed (codec, sample count); NULL on refusal. */
case class G711Meta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_g711_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = G711Eval.meta(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gm")
      s"""
         |long $res = graft.functions.G711Eval.meta($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): G711Meta =
    copy(child = newChild)
}

/** `binary -> long`: `(sumAbs << 17) | peakAbs`; NULL on refusal. */
case class G711Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_g711_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val r = G711Eval.stats(input.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("gs")
      s"""
         |long $res = graft.functions.G711Eval.stats($bytes);
         |if ($res < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): G711Stats =
    copy(child = newChild)
}

/** `long -> binary`: q171's synthesis (params pack `doc_id|mode<<40`). */
case class G711Synth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_g711_synth"

  override protected def nullSafeEval(params: Any): Any =
    G711Eval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.G711Eval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): G711Synth =
    copy(child = newChild)
}

/** Column surface for the G.711 kernels. */
object G711Ops {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def g711Meta(b: Column): Column = ColumnBridge.column(G711Meta(bin(b)))
  def g711Stats(b: Column): Column = ColumnBridge.column(G711Stats(bin(b)))

  def g711Synth(params: Column): Column =
    ColumnBridge.column(G711Synth(ColumnBridge.expression(params.cast("long"))))
}
