package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** tf.Example protobuf decode (q161) — the record INSIDE the q160
  * frames (every TFRecord training shard carries one serialized
  * `Example` per record: a `Features` map of name → bytes / float /
  * int64 lists). The walk is the protobuf WIRE grammar, whose real
  * traps are:
  *
  *  - varints are little-endian base-128 with int64 two's
  *    complement: a NEGATIVE int64 is a 10-byte varint (a 32-bit
  *    varint reader overruns into the next field);
  *  - repeated scalars arrive PACKED (one length-delimited blob,
  *    proto3's default) or UNPACKED (one tagged value each) — both
  *    legal on the wire, and a reader fixed on one spelling drops
  *    the other;
  *  - unknown fields at ANY level skip by wire type (varint / 8
  *    bytes / length-delimited / 4 bytes), never by guesswork;
  *    group wire types (3/4) and 6/7 are structural refusals;
  *  - map fields keep the LAST duplicate key (protobuf map
  *    semantics — a first-wins reader reports the stale value);
  *  - truncation anywhere (a varint past EOF, a length past the
  *    buffer) refuses WHOLE — protobuf has no resync point.
  *
  * The format has no magic: validity = the whole buffer parsing to
  * exact consumption with >= 1 named map entry (text that happens to
  * start with a plausible tag still dies on the first overrun).
  * Floats are IEEE754 LE singles; the synthesized corpus uses exact
  * quarter values so the micro-unit sum is engine-independent.
  */
object TfExampleEval {

  final case class Res(ok: Int, nFeatures: Int, text: Array[Byte],
                       nInts: Int, sumInts: Long, scoreMicros: Long,
                       hasScore: Boolean)

  private final class Cursor(val b: Array[Byte], var i: Int, val end: Int) {
    def fail(): Nothing = throw Bad
    /** Read a tag; field 0 is illegal protobuf (a zero tag byte is
      * padding or corruption, and a lenient reader would "parse"
      * trailing NULs clean). */
    def tag(): Long = {
      val t = varint()
      if ((t >>> 3) == 0L) fail()
      t
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var k = 0
      while (k < 10) {
        if (i >= end) fail()
        val x = b(i) & 0xFF
        i += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        k += 1
      }
      fail() // an 11-byte varint is not protobuf
    }
    def len(): Int = {
      val l = varint()
      if (l < 0L || l > (end - i).toLong) fail()
      l.toInt
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => if (end - i < 8) fail() else i += 8
      case 2 => i += len()
      case 5 => if (end - i < 4) fail() else i += 4
      case _ => fail() // groups (3/4) and reserved wire types
    }
  }

  private object Bad extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private def f32le(b: Array[Byte], o: Int): Float =
    java.lang.Float.intBitsToFloat((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24))

  /** Feature value: kind 1 bytes_list, 2 float_list, 3 int64_list. */
  private final case class Feat(kind: Int, bytes: Array[Byte],
                                floats: Array[Float], ints: Array[Long])

  private def parseFeature(b: Array[Byte], from: Int, to: Int): Feat = {
    val c = new Cursor(b, from, to)
    var kind = 0
    var bytes: Array[Byte] = null
    var floats: Array[Float] = null
    var ints: Array[Long] = null
    while (c.i < c.end) {
      val tag = c.tag()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) { // BytesList
        kind = 1
        val l = c.len(); val sub = new Cursor(b, c.i, c.i + l); c.i += l
        val acc = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        while (sub.i < sub.end) {
          val t2 = sub.tag()
          if ((t2 >>> 3).toInt == 1 && (t2 & 7).toInt == 2) {
            val vl = sub.len()
            acc += java.util.Arrays.copyOfRange(b, sub.i, sub.i + vl)
            sub.i += vl
          } else sub.skip((t2 & 7).toInt)
        }
        if (acc.nonEmpty) bytes = acc.head
      } else if (field == 2 && wire == 2) { // FloatList
        kind = 2
        val l = c.len(); val sub = new Cursor(b, c.i, c.i + l); c.i += l
        val acc = scala.collection.mutable.ArrayBuffer.empty[Float]
        while (sub.i < sub.end) {
          val t2 = sub.tag()
          val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
          if (f2 == 1 && w2 == 2) { // packed
            val vl = sub.len()
            if (vl % 4 != 0) sub.fail()
            var o = sub.i
            while (o < sub.i + vl) { acc += f32le(b, o); o += 4 }
            sub.i += vl
          } else if (f2 == 1 && w2 == 5) { // unpacked
            if (sub.end - sub.i < 4) sub.fail()
            acc += f32le(b, sub.i); sub.i += 4
          } else sub.skip(w2)
        }
        floats = acc.toArray
      } else if (field == 3 && wire == 2) { // Int64List
        kind = 3
        val l = c.len(); val sub = new Cursor(b, c.i, c.i + l); c.i += l
        val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (sub.i < sub.end) {
          val t2 = sub.tag()
          val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
          if (f2 == 1 && w2 == 2) { // packed
            val vl = sub.len()
            val stop = sub.i + vl
            while (sub.i < stop) acc += sub.varint()
            if (sub.i != stop) sub.fail()
          } else if (f2 == 1 && w2 == 0) { // unpacked
            acc += sub.varint()
          } else sub.skip(w2)
        }
        ints = acc.toArray
      } else c.skip(wire)
    }
    if (c.i != c.end) c.fail()
    Feat(kind, bytes, floats, ints)
  }

  def parse(b: Array[Byte]): Res = {
    val none = Res(0, -1, null, -1, -1L, -1L, hasScore = false)
    if (b == null || b.length == 0) return none
    try {
      val c = new Cursor(b, 0, b.length)
      // insertion-ordered, last value wins (protobuf map semantics)
      val feats = new java.util.LinkedHashMap[String, Feat]()
      var sawFeatures = false
      while (c.i < c.end) {
        val tag = c.tag()
        val field = (tag >>> 3).toInt
        val wire = (tag & 7).toInt
        if (field == 1 && wire == 2) { // Features
          sawFeatures = true
          val l = c.len(); val fc = new Cursor(b, c.i, c.i + l); c.i += l
          while (fc.i < fc.end) {
            val t2 = fc.tag()
            if ((t2 >>> 3).toInt == 1 && (t2 & 7).toInt == 2) { // map entry
              val el = fc.len()
              val ec = new Cursor(b, fc.i, fc.i + el); fc.i += el
              var key: String = null
              var value: Feat = null
              while (ec.i < ec.end) {
                val t3 = ec.tag()
                val f3 = (t3 >>> 3).toInt; val w3 = (t3 & 7).toInt
                if (f3 == 1 && w3 == 2) {
                  val kl = ec.len()
                  key = new String(b, ec.i, kl,
                    java.nio.charset.StandardCharsets.UTF_8)
                  ec.i += kl
                } else if (f3 == 2 && w3 == 2) {
                  val vl = ec.len()
                  value = parseFeature(b, ec.i, ec.i + vl)
                  ec.i += vl
                } else ec.skip(w3)
              }
              if (key != null && key.nonEmpty && value != null)
                feats.put(key, value) // duplicate key: LAST wins
            } else fc.skip((t2 & 7).toInt)
          }
        } else c.skip(wire)
      }
      if (c.i != c.end || !sawFeatures || feats.isEmpty) return none
      var text: Array[Byte] = null
      var nInts = -1
      var sumInts = 0L
      var scoreMicros = 0L
      var hasScore = false
      val t = feats.get("text")
      if (t != null && t.kind == 1) text = t.bytes
      val tok = feats.get("tokens")
      if (tok != null && tok.kind == 3 && tok.ints != null) {
        nInts = tok.ints.length
        var k = 0
        while (k < tok.ints.length) { sumInts += tok.ints(k); k += 1 }
      }
      val sc = feats.get("score")
      if (sc != null && sc.kind == 2 && sc.floats != null) {
        hasScore = true
        var s = 0.0
        var k = 0
        while (k < sc.floats.length) { s += sc.floats(k).toDouble; k += 1 }
        scoreMicros = Math.round(s * 1e6)
      }
      Res(1, feats.size(), text, nInts,
        if (nInts < 0) -1L else sumInts, scoreMicros, hasScore)
    } catch { case Bad => none }
  }

  def ok(b: Array[Byte]): Int = parse(b).ok

  def features(b: Array[Byte]): Int = {
    val r = parse(b); if (r.ok == 0) -1 else r.nFeatures
  }

  def text(b: Array[Byte]): Array[Byte] = parse(b).text

  def intCount(b: Array[Byte]): Int = {
    val r = parse(b); if (r.ok == 0) -1 else r.nInts
  }

  def intSum(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r.ok == 0 || r.nInts < 0) Long.MinValue else r.sumInts
  }

  def scoreMicros(b: Array[Byte]): Long = {
    val r = parse(b)
    if (r.ok == 0 || !r.hasScore) Long.MinValue else r.scoreMicros
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  private def putVarint(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    var more = true
    while (more) {
      val x = (v & 0x7FL).toInt
      v = v >>> 7
      if (v == 0L) { o.write(x); more = false } else o.write(x | 0x80)
    }
  }

  private def putTag(o: java.io.ByteArrayOutputStream, field: Int,
                     wire: Int): Unit = putVarint(o, (field.toLong << 3) | wire)

  private def lenDelim(field: Int, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    putTag(o, field, 2)
    putVarint(o, body.length.toLong)
    o.write(body, 0, body.length)
    o.toByteArray
  }

  private def bytesFeature(b: Array[Byte]): Array[Byte] =
    lenDelim(1, lenDelim(1, b)) // Feature.bytes_list.value

  private def intFeature(vals: Array[Long], packed: Boolean): Array[Byte] = {
    val inner = new java.io.ByteArrayOutputStream()
    if (packed) {
      val pack = new java.io.ByteArrayOutputStream()
      vals.foreach(putVarint(pack, _))
      inner.write(lenDelim(1, pack.toByteArray))
    } else {
      vals.foreach { v => putTag(inner, 1, 0); putVarint(inner, v) }
    }
    lenDelim(3, inner.toByteArray) // Feature.int64_list
  }

  private def floatFeature(vals: Array[Float], packed: Boolean): Array[Byte] = {
    def le(f: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(f)
      Array(((bits) & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
        ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte)
    }
    val inner = new java.io.ByteArrayOutputStream()
    if (packed) {
      val pack = new java.io.ByteArrayOutputStream()
      vals.foreach { f => val a = le(f); pack.write(a, 0, 4) }
      inner.write(lenDelim(1, pack.toByteArray))
    } else {
      vals.foreach { f => putTag(inner, 1, 5); val a = le(f); inner.write(a, 0, 4) }
    }
    lenDelim(2, inner.toByteArray) // Feature.float_list
  }

  /** Synthesize a q161 Example. `params` packs `doc_id | mode << 40`:
    * 0 -> packed int64s crossing 127/16383, bytes text, packed
    * quarter floats; 1 -> UNPACKED int64s with a NEGATIVE value (the
    * 10-byte varint) + unknown fields at Example and map-entry level
    * (skipped by wire type, never counted); 2 -> DUPLICATE `text`
    * keys (last wins) + UNPACKED floats; 3 -> class 0 cut 3 bytes
    * short (refuses whole).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val features = new java.io.ByteArrayOutputStream()
    def put(key: String, feature: Array[Byte],
            extraUnknown: Boolean = false): Unit = {
      val e = new java.io.ByteArrayOutputStream()
      e.write(lenDelim(1, key.getBytes(utf8)))
      e.write(lenDelim(2, feature))
      if (extraUnknown) { // unknown map-entry field 3, wire 5
        putTag(e, 3, 5)
        e.write(Array[Byte](1, 2, 3, 4), 0, 4)
      }
      features.write(lenDelim(1, e.toByteArray))
    }
    mode match {
      case 1 =>
        put("text", bytesFeature((ws(0) + " " + ws(1)).getBytes(utf8)),
          extraUnknown = true)
        put("tokens", intFeature(
          Array(id % 128, -(id % 50) - 1, 16500L), packed = false))
      case 2 =>
        put("text", bytesFeature(ws(0).getBytes(utf8)))
        put("tokens", intFeature(
          Array(id % 128, 300 + id % 1000, 7L), packed = true))
        put("score", floatFeature(
          Array((id % 4).toFloat * 0.25f), packed = false))
        // the duplicate key arrives LAST and must win
        put("text", bytesFeature(
          (ws(1) + " " + ws(2) + " " + ws(3)).getBytes(utf8)))
      case _ =>
        put("text", bytesFeature((ws(0) + " " + ws(1)).getBytes(utf8)))
        put("tokens", intFeature(
          Array(id % 128, 300 + id % 1000, 7L), packed = true))
        put("score", floatFeature(
          Array((id % 8).toFloat * 0.25f, 1.5f), packed = true))
    }
    val o = new java.io.ByteArrayOutputStream()
    if (mode == 1) { // unknown Example-level field 9, wire 0
      putTag(o, 9, 0)
      putVarint(o, 300L)
    }
    o.write(lenDelim(1, features.toByteArray))
    val all = o.toByteArray
    if (mode == 3) java.util.Arrays.copyOfRange(all, 0, all.length - 3)
    else all
  }
}

/** `binary -> int`: 1 iff the buffer parses as a features-bearing
  * Example with exact consumption. */
case class TfxOk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_ok"

  override protected def nullSafeEval(input: Any): Any =
    TfExampleEval.ok(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.TfExampleEval.ok($b)")

  override protected def withNewChildInternal(newChild: Expression): TfxOk =
    copy(child = newChild)
}

/** `binary -> int`: distinct feature-map keys (last-wins map). */
case class TfxFeatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_features"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfExampleEval.features(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("txf")
      s"""
         |int $res = graft.functions.TfExampleEval.features($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfxFeatures =
    copy(child = newChild)
}

/** `binary -> binary`: the `text` bytes feature (first value). */
case class TfxText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_text"

  override protected def nullSafeEval(input: Any): Any =
    TfExampleEval.text(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("txt")
      s"""
         |byte[] $res = graft.functions.TfExampleEval.text($bytes);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfxText =
    copy(child = newChild)
}

/** `binary -> int`: `tokens` int64-list length. */
case class TfxIntCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_int_count"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfExampleEval.intCount(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("txn")
      s"""
         |int $res = graft.functions.TfExampleEval.intCount($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfxIntCount =
    copy(child = newChild)
}

/** `binary -> long`: `tokens` int64 sum (two's complement exact). */
case class TfxIntSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_int_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfExampleEval.intSum(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("txs")
      s"""
         |long $res = graft.functions.TfExampleEval.intSum($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfxIntSum =
    copy(child = newChild)
}

/** `binary -> long`: `score` float-list sum in exact micro-units. */
case class TfxScoreMicros(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_score_micros"

  override protected def nullSafeEval(input: Any): Any = {
    val r = TfExampleEval.scoreMicros(input.asInstanceOf[Array[Byte]])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("txm")
      s"""
         |long $res = graft.functions.TfExampleEval.scoreMicros($bytes);
         |if ($res == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TfxScoreMicros =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q161's synthesis. */
case class TfxSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfx_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    TfExampleEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.TfExampleEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TfxSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the tf.Example kernels. */
object TfExampleOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def tfxOk(b: Column): Column = ColumnBridge.column(TfxOk(bin(b)))
  def tfxFeatures(b: Column): Column = ColumnBridge.column(TfxFeatures(bin(b)))
  def tfxText(b: Column): Column = ColumnBridge.column(TfxText(bin(b)))
  def tfxIntCount(b: Column): Column = ColumnBridge.column(TfxIntCount(bin(b)))
  def tfxIntSum(b: Column): Column = ColumnBridge.column(TfxIntSum(bin(b)))
  def tfxScoreMicros(b: Column): Column =
    ColumnBridge.column(TfxScoreMicros(bin(b)))

  def tfxSynth(text: Column, params: Column): Column =
    ColumnBridge.column(TfxSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
