package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CBOR decode (q175, RFC 8949) — the binary interchange format
  * metadata sidecars and IoT/API dumps arrive in (the schemaless
  * sibling of q161's protobuf: no magic, no field numbers — typed
  * items with length-carrying heads). The walk is the real wire
  * grammar, with the format's traps load-bearing:
  *
  *  - every head byte is `major<<5 | info`; info < 24 is an
  *    IMMEDIATE value, 24-27 select 1/2/4/8-byte BIG-endian
  *    arguments (a reader assuming one width mis-frames everything
  *    after the first u16);
  *  - negative integers are major 1 with value `-1 - n` (two's
  *    complement never appears on the wire);
  *  - byte/text strings, arrays, and maps all have an INDEFINITE
  *    form (info 31) terminated by the `0xFF` break — an indefinite
  *    text string is a SEQUENCE OF CHUNKS that must concatenate
  *    (a definite-only reader dies on real encoders' streaming
  *    output);
  *  - tags (major 6) wrap any item TRANSPARENTLY and may nest;
  *  - duplicate map keys keep the LAST value (the q161 stance);
  *  - CBOR has no resync point: truncation anywhere, a bare break,
  *    or trailing bytes after the root item refuse WHOLE.
  *
  * Like q161, decode is a STATED-shape read: a top-level map with
  * `id` (uint), `delta` (negint), `text` (text string), `tags`
  * (array of uints) — unknown keys of ANY type (nested maps, floats,
  * simples included) skip by the grammar.
  */
object CborEval {

  final case class Res(ok: Int, id: Long, delta: Long, nTags: Int,
                       sumTags: Long, text: Array[Byte])

  private val Bad = Res(0, Long.MinValue, Long.MinValue, -1, -1L, null)

  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class R(val b: Array[Byte]) {
    var i = 0
    def u8(): Int = {
      if (i >= b.length) throw Truncated
      val v = b(i) & 0xFF
      i += 1
      v
    }
    def beN(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 8) | u8(); k += 1 }
      v
    }
    def take(n: Long): Array[Byte] = {
      if (n < 0L || i + n > b.length) throw Truncated
      val out = java.util.Arrays.copyOfRange(b, i, i + n.toInt)
      i += n.toInt
      out
    }
  }

  /** Argument for a head; -1 encodes indefinite (info 31). */
  private def arg(r: R, info: Int): Long = info match {
    case x if x < 24 => x.toLong
    case 24 => r.beN(1)
    case 25 => r.beN(2)
    case 26 => r.beN(4)
    case 27 => r.beN(8)
    case 31 => -1L
    case _ => throw Truncated // reserved 28-30
  }

  /** Skip one complete item (any type, tags transparent). */
  private def skipItem(r: R): Unit = {
    val h = r.u8()
    val major = h >> 5
    val info = h & 0x1F
    major match {
      case 0 | 1 => if (arg(r, info) == -1L) throw Truncated
      case 2 | 3 =>
        val n = arg(r, info)
        if (n >= 0L) { r.take(n); () }
        else { // indefinite: definite chunks of the same major type
          var done = false
          while (!done) {
            val c = r.u8()
            if (c == 0xFF) done = true
            else {
              if ((c >> 5) != major) throw Truncated
              val cn = arg(r, c & 0x1F)
              if (cn < 0L) throw Truncated // no nested indefinite chunks
              r.take(cn)
            }
          }
        }
      case 4 =>
        val n = arg(r, info)
        if (n >= 0L) { var k = 0L; while (k < n) { skipItem(r); k += 1 } }
        else {
          while (r.i < r.b.length && (r.b(r.i) & 0xFF) != 0xFF) skipItem(r)
          r.u8() // the break
        }
      case 5 =>
        val n = arg(r, info)
        if (n >= 0L) {
          var k = 0L
          while (k < n) { skipItem(r); skipItem(r); k += 1 }
        } else {
          while (r.i < r.b.length && (r.b(r.i) & 0xFF) != 0xFF) {
            skipItem(r); skipItem(r)
          }
          r.u8()
        }
      case 6 => arg(r, info); skipItem(r) // tag: transparent wrapper
      case 7 => info match {
        case x if x < 24 => () // simples incl. false/true/null
        case 24 => r.beN(1); ()
        case 25 => r.beN(2); ()
        case 26 => r.beN(4); ()
        case 27 => r.beN(8); ()
        case _ => throw Truncated // 0xFF break is never a bare item here
      }
    }
  }

  /** Read a text string (tags transparent, indefinite concatenated). */
  private def readText(r: R): Array[Byte] = {
    var h = r.u8()
    while ((h >> 5) == 6) { arg(r, h & 0x1F); h = r.u8() } // unwrap tags
    if ((h >> 5) != 3) throw Truncated
    val n = arg(r, h & 0x1F)
    if (n >= 0L) r.take(n)
    else {
      val out = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        val c = r.u8()
        if (c == 0xFF) done = true
        else {
          if ((c >> 5) != 3) throw Truncated
          val cn = arg(r, c & 0x1F)
          if (cn < 0L) throw Truncated
          val chunk = r.take(cn)
          out.write(chunk, 0, chunk.length)
        }
      }
      out.toByteArray
    }
  }

  private def readUint(r: R): Long = {
    var h = r.u8()
    while ((h >> 5) == 6) { arg(r, h & 0x1F); h = r.u8() }
    if ((h >> 5) != 0) throw Truncated
    val v = arg(r, h & 0x1F)
    if (v < 0L) throw Truncated
    v
  }

  def parse(b: Array[Byte]): Res = {
    if (b == null || b.length < 1) return Bad
    val r = new R(b)
    try {
      var h = r.u8()
      while ((h >> 5) == 6) { arg(r, h & 0x1F); h = r.u8() }
      if ((h >> 5) != 5) return Bad // stated shape: a top-level map
      val n = arg(r, h & 0x1F)
      var id = Long.MinValue
      var delta = Long.MinValue
      var text: Array[Byte] = null
      var nTags = -1
      var sumTags = -1L
      var named = 0
      def entry(): Unit = {
        // key must be a text string for the stated shape; other key
        // types skip with their values
        val save = r.i
        val kh = r.b(r.i) & 0xFF
        if ((kh >> 5) != 3) { skipItem(r); skipItem(r); return }
        r.i = save
        val key = new String(readText(r),
          java.nio.charset.StandardCharsets.UTF_8)
        key match {
          case "id" => id = readUint(r); named += 1
          case "delta" =>
            var h2 = r.u8()
            while ((h2 >> 5) == 6) { arg(r, h2 & 0x1F); h2 = r.u8() }
            if ((h2 >> 5) != 1) throw Truncated
            val nn = arg(r, h2 & 0x1F)
            if (nn < 0L) throw Truncated
            delta = -1L - nn
            named += 1
          case "text" => text = readText(r); named += 1
          case "tags" =>
            var h2 = r.u8()
            while ((h2 >> 5) == 6) { arg(r, h2 & 0x1F); h2 = r.u8() }
            if ((h2 >> 5) != 4) throw Truncated
            val cnt = arg(r, h2 & 0x1F)
            var c = 0
            var s = 0L
            if (cnt >= 0L) {
              var k = 0L
              while (k < cnt) { s += readUint(r); c += 1; k += 1 }
            } else {
              while (r.i < r.b.length && (r.b(r.i) & 0xFF) != 0xFF) {
                s += readUint(r); c += 1
              }
              r.u8()
            }
            nTags = c
            sumTags = s
            named += 1
          case _ => skipItem(r)
        }
      }
      if (n >= 0L) { var k = 0L; while (k < n) { entry(); k += 1 } }
      else {
        while (r.i < r.b.length && (r.b(r.i) & 0xFF) != 0xFF) entry()
        r.u8()
      }
      if (r.i != b.length) return Bad // no resync: trailing bytes refuse
      if (named == 0) return Bad // nothing of the stated shape present
      Res(1, id, delta, nTags, sumTags, text)
    } catch {
      case Truncated => Bad
      case _: ArrayIndexOutOfBoundsException => Bad
    }
  }

  def idVal(b: Array[Byte]): Long = parse(b).id

  def deltaVal(b: Array[Byte]): Long = parse(b).delta

  /** (nTags+1) << 48 | (sumTags+1); 0 on refusal/absent. */
  def tagsPacked(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r.ok == 0 || r.nTags < 0) return 0L
    ((r.nTags + 1).toLong << 48) | (r.sumTags + 1L)
  }

  def textBytes(b: Array[Byte]): Array[Byte] = parse(b).text

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putHead(o: java.io.ByteArrayOutputStream, major: Int,
                      value: Long): Unit = {
    if (value < 24L) o.write((major << 5) | value.toInt)
    else if (value < 256L) { o.write((major << 5) | 24); o.write(value.toInt) }
    else if (value < 65536L) {
      o.write((major << 5) | 25)
      o.write((value >> 8).toInt); o.write(value.toInt)
    } else if (value < (1L << 32)) {
      o.write((major << 5) | 26)
      var k = 3
      while (k >= 0) { o.write(((value >> (8 * k)) & 0xFF).toInt); k -= 1 }
    } else {
      o.write((major << 5) | 27)
      var k = 7
      while (k >= 0) { o.write(((value >> (8 * k)) & 0xFF).toInt); k -= 1 }
    }
  }

  private def putText(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    val u = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    putHead(o, 3, u.length.toLong)
    o.write(u, 0, u.length)
  }

  /** Synthesize a q175 item. `params` packs `doc_id | mode<<40`:
    * 0 -> definite map, 4 named keys + an unknown key; 1 -> the
    * INDEFINITE drill: indefinite map, text in two chunks, indefinite
    * tags array, an unknown key carrying a nested map; 2 -> duplicate
    * `text` key (last wins), 8-byte id argument (> 2^32), tag 0
    * wrapping the text value; 3 -> class 0 cut 4 bytes short.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val pay = ws(0) + " " + ws(1) + "#" + (id % 97)
    val o = new java.io.ByteArrayOutputStream()
    val idVal = if (mode == 2) id + (1L << 33) else id * 1000 + 7
    val deltaN = id % 97 + 4 // delta = -1 - n = -(id%97) - 5
    val tags = Array(id % 5, id % 7, id % 11)
    mode match {
      case 1 =>
        o.write(0xBF) // indefinite map
        putText(o, "id"); putHead(o, 0, idVal)
        putText(o, "text")
        o.write(0x7F) // indefinite text: two chunks
        val u = pay.getBytes("UTF-8")
        val cut = u.length / 2
        putHead(o, 3, cut.toLong); o.write(u, 0, cut)
        putHead(o, 3, (u.length - cut).toLong); o.write(u, cut, u.length - cut)
        o.write(0xFF)
        putText(o, "extra")
        o.write(0xA1); putText(o, "k"); putHead(o, 0, 9L) // nested map
        putText(o, "delta"); putHead(o, 1, deltaN)
        putText(o, "tags")
        o.write(0x9F) // indefinite array
        tags.foreach(t => putHead(o, 0, t))
        o.write(0xFF)
        o.write(0xFF) // map break
      case 2 =>
        o.write(0xA5) // 5 entries: text appears TWICE
        putText(o, "text"); putText(o, "decoy value, must lose")
        putText(o, "id"); putHead(o, 0, idVal)
        putText(o, "delta"); putHead(o, 1, deltaN)
        putText(o, "text")
        putHead(o, 6, 0L) // tag 0 wrapping the real text
        putText(o, pay)
        putText(o, "tags")
        putHead(o, 4, 3L)
        tags.foreach(t => putHead(o, 0, t))
      case _ =>
        o.write(0xA5)
        putText(o, "id"); putHead(o, 0, idVal)
        putText(o, "delta"); putHead(o, 1, deltaN)
        putText(o, "ignored"); o.write(0xF5) // true: an unknown simple
        putText(o, "text"); putText(o, pay)
        putText(o, "tags")
        putHead(o, 4, 3L)
        tags.foreach(t => putHead(o, 0, t))
    }
    val all = o.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 4)
    else all
  }
}

/** `binary -> long`: the decoded `id` uint; NULL on refusal/absent. */
case class CborId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cbor_id"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CborEval.idVal(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("cid")
      s"""
         |long $res = graft.functions.CborEval.idVal($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborId =
    copy(child = newChild)
}

/** `binary -> long`: the decoded `delta` negint; NULL on refusal. */
case class CborDelta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cbor_delta"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CborEval.deltaVal(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("cdl")
      s"""
         |long $res = graft.functions.CborEval.deltaVal($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborDelta =
    copy(child = newChild)
}

/** `binary -> long`: packed `(nTags+1)<<48 | (sumTags+1)`; NULL when
  * refused or the array is absent. */
case class CborTags(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cbor_tags"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CborEval.tagsPacked(input.asInstanceOf[Array[Byte]])
    if (r == 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ctg")
      s"""
         |long $res = graft.functions.CborEval.tagsPacked($bytes);
         |if ($res == 0L) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborTags =
    copy(child = newChild)
}

/** `binary -> binary`: the decoded `text` bytes (chunks concatenated). */
case class CborText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cbor_text"

  override protected def nullSafeEval(input: Any): Any =
    CborEval.textBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ctx")
      s"""
         |byte[] $res = graft.functions.CborEval.textBytes($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborText =
    copy(child = newChild)
}

/** `(binary, long) -> binary`: q175's synthesis. */
case class CborSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cbor_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    CborEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.CborEval.synth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CborSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the CBOR kernels. */
object CborOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def cborId(b: Column): Column = ColumnBridge.column(CborId(bin(b)))
  def cborDelta(b: Column): Column = ColumnBridge.column(CborDelta(bin(b)))
  def cborTags(b: Column): Column = ColumnBridge.column(CborTags(bin(b)))
  def cborText(b: Column): Column = ColumnBridge.column(CborText(bin(b)))

  def cborSynth(text: Column, params: Column): Column =
    ColumnBridge.column(CborSynth(bin(text),
      ColumnBridge.expression(params.cast("long"))))
}
