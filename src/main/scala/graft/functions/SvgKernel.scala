package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** SVG metadata (q159) — the web's VECTOR image format (logos, icons,
  * figures — a crawl's image intake meets it beside q127's rasters),
  * with the format's operational traps:
  *
  *  - many real SVGs carry NO width/height attributes — dimensions
  *    FALL BACK to the `viewBox`'s third and fourth numbers (the
  *    icon-sprite reality); explicit attributes win when present,
  *    `px` suffixes strip, other units refuse the field (never a
  *    guessed conversion);
  *  - `<script>` inside an SVG is the sanitization read — an SVG
  *    with script is a security DROP before any training use, so the
  *    flag is first-class;
  *  - comments strip FIRST (a commented-out `<path/>` is not a
  *    shape — q154's discipline); shape elements (`path`, `rect`,
  *    `circle`, `ellipse`, `line`, `polygon`, `polyline`, `text`)
  *    count wherever they appear outside comments;
  *  - a document whose `</svg>` never arrives is a truncated
  *    download and refuses whole.
  */
object SvgEval {

  final case class Svg(width: Int, height: Int, shapes: Int, script: Int)

  private val Shapes = Set("path", "rect", "circle", "ellipse", "line",
    "polygon", "polyline", "text")
  private val Comment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")

  /** Numeric attribute value: unitless or `px`; -1 otherwise. */
  private def dim(v: String): Int = {
    val t = v.trim.stripSuffix("px").trim
    if (t.nonEmpty && t.forall(_.isDigit) && t.length <= 7) t.toInt else -1
  }

  def parse(b: Array[Byte]): Svg = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val raw =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val s = Comment.matcher(raw).replaceAll(" ")
    val open = s.indexOf("<svg")
    if (open < 0) return null
    if (s.indexOf("</svg>", open) < 0) return null // truncated download

    // the <svg ...> open tag's attributes (quote-aware end scan)
    var q: Char = 0
    var e = open + 4
    while (e < s.length && (q != 0 || s.charAt(e) != '>')) {
      val c = s.charAt(e)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '\'') q = c
      e += 1
    }
    val attrs = s.substring(open + 4, math.min(e, s.length))
    def attr(name: String): String = {
      val m = java.util.regex.Pattern
        .compile("(?i)\\b" + name + "\\s*=\\s*[\"']([^\"']*)[\"']")
        .matcher(attrs)
      if (m.find()) m.group(1) else null
    }
    var w = -1; var h = -1
    val aw = attr("width"); val ah = attr("height")
    if (aw != null) w = dim(aw)
    if (ah != null) h = dim(ah)
    if (w < 0 || h < 0) {
      val vb = attr("viewBox")
      if (vb != null) {
        val parts = vb.trim.split("[\\s,]+")
        if (parts.length == 4) {
          if (w < 0) w = dim(parts(2))
          if (h < 0) h = dim(parts(3))
        }
      }
    }

    var shapes = 0
    var script = 0
    var i = s.indexOf('<', open)
    while (i >= 0) {
      var j = i + 1
      while (j < s.length && s.charAt(j).isLetter) j += 1
      val name = s.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
      if (Shapes.contains(name)) shapes += 1
      else if (name == "script") script = 1
      i = s.indexOf('<', i + 1)
    }
    Svg(w, h, shapes, script)
  }

  def width(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.width
  }

  def height(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.height
  }

  def shapes(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.shapes
  }

  def script(b: Array[Byte]): Int = {
    val r = parse(b); if (r == null) -1 else r.script
  }

  // -------------------------------------------------------------- synth

  /** Synthesize a q159 SVG. `params` packs `doc_id | mode<<40`:
    * 0 -> explicit width/height (one with a `px` suffix) + 3 shapes;
    * 1 -> viewBox-ONLY dims (the icon-sprite fallback) + 2 shapes;
    * 2 -> a `<script>` payload + commented-out shape decoys + 4 real
    * shapes; 3 -> class 0 without its `</svg>` (truncated).
    */
  def synth(params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val w = 100 + (id % 10) * 10
    val h = 50 + (id % 5) * 20
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\"?>\n")
    mode match {
      case 1 =>
        sb.append("<svg xmlns=\"http://www.w3.org/2000/svg\" viewBox=\"0 0 ")
          .append(w).append(' ').append(h).append("\">\n")
        sb.append("  <path d=\"M0 0 L10 10\"/>\n")
        sb.append("  <polygon points=\"0,0 10,0 5,8\"/>\n")
        sb.append("</svg>\n")
      case 2 =>
        sb.append("<svg width=\"").append(w).append("\" height=\"")
          .append(h).append("\">\n")
        sb.append("  <!-- <path d=\"decoy\"/> <circle r=\"1\"/> -->\n")
        sb.append("  <script>alert('doc").append(id).append("')</script>\n")
        sb.append("  <rect width=\"5\" height=\"5\"/>\n")
        sb.append("  <circle r=\"3\"/>\n")
        sb.append("  <line x1=\"0\" y1=\"0\" x2=\"9\" y2=\"9\"/>\n")
        sb.append("  <text x=\"1\" y=\"1\">doc").append(id).append("</text>\n")
        sb.append("</svg>\n")
      case _ =>
        sb.append("<svg width=\"").append(w).append("px\" height=\"")
          .append(h).append("\" viewBox=\"0 0 999 999\">\n")
        sb.append("  <path d=\"M0 0 L5 5\"/>\n")
        sb.append("  <rect width=\"4\" height=\"4\"/>\n")
        sb.append("  <circle r=\"2\"/>\n")
        sb.append("</svg>\n")
    }
    val out = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (mode == 3) {
      val cut = sb.toString.indexOf("</svg>")
      java.util.Arrays.copyOfRange(out, 0, cut)
    } else out
  }
}

/** `binary -> int`: effective width (attr, else viewBox). */
case class SvgWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_svg_width"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SvgEval.width(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sw")
      s"""
         |int $res = graft.functions.SvgEval.width($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SvgWidth =
    copy(child = newChild)
}

/** `binary -> int`: effective height (attr, else viewBox). */
case class SvgHeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_svg_height"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SvgEval.height(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sh")
      s"""
         |int $res = graft.functions.SvgEval.height($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SvgHeight =
    copy(child = newChild)
}

/** `binary -> int`: shape-element count (comments stripped first). */
case class SvgShapes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_svg_shapes"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SvgEval.shapes(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("ss")
      s"""
         |int $res = graft.functions.SvgEval.shapes($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SvgShapes =
    copy(child = newChild)
}

/** `binary -> int`: 1 when the SVG carries script (the drop read). */
case class SvgScript(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_svg_script"

  override protected def nullSafeEval(input: Any): Any = {
    val r = SvgEval.script(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("sx")
      s"""
         |int $res = graft.functions.SvgEval.script($bytes);
         |if ($res < 0) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SvgScript =
    copy(child = newChild)
}

/** `long -> binary`: q159's synthesis (params pack `doc_id|mode<<40`). */
case class SvgSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_svg_synth"

  override protected def nullSafeEval(params: Any): Any =
    SvgEval.synth(params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.SvgEval.synth($p)")

  override protected def withNewChildInternal(newChild: Expression): SvgSynth =
    copy(child = newChild)
}

/** Column surface for the SVG kernels. */
object SvgOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  private def bin(c: Column) = ColumnBridge.expression(c.cast("binary"))

  def svgWidth(b: Column): Column = ColumnBridge.column(SvgWidth(bin(b)))
  def svgHeight(b: Column): Column = ColumnBridge.column(SvgHeight(bin(b)))
  def svgShapes(b: Column): Column = ColumnBridge.column(SvgShapes(bin(b)))
  def svgScript(b: Column): Column = ColumnBridge.column(SvgScript(bin(b)))

  def svgSynth(params: Column): Column =
    ColumnBridge.column(SvgSynth(ColumnBridge.expression(params.cast("long"))))
}
