package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON shape extraction (q153) — schema inference over a corpus of
  * unknown JSON: every ingest pipeline watches for SCHEMA DRIFT (a
  * field that was a number arriving as a string, an array collapsing
  * to a scalar, a new field appearing), and the detector's unit is
  * the (path, observed-type) pair. This kernel walks one document
  * with a strict recursive-descent parser and emits the document's
  * path->type SET (each pair once per document, sorted) as
  * newline-joined `path|type` lines — the narrow half of the
  * operator; the per-path histogram is DataFrame aggregation.
  *
  *  - paths: `$` for the root, `$.k` for object fields, `$.k[]` for
  *    array ELEMENTS (one nesting level of objects is walked;
  *    deeper values report their container type — stated scope);
  *  - types: `object array string number boolean null`;
  *  - strictness: trailing bytes after the root value, unterminated
  *    strings/containers, or bare words REFUSE the document
  *    (`$invalid|invalid` — the quarantine row, never a guess);
  *  - string escapes skip their escaped char (`\"` cannot end a
  *    string); numbers accept the JSON grammar loosely (sign,
  *    digits, dot, exponent) — their VALUE is never read, only the
  *    type.
  *
  * Reference scope: the reference's entire ingest is JSON envelopes
  * (reference ingestion/openalex_client.py, P4's json projection) —
  * shape inference is the schema-drift guard that ingest needs.
  */
object JsonShapeEval {

  private final class P(val s: String) {
    var i = 0
    def ws(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }
    def eof: Boolean = i >= s.length
  }

  /** Parse one value at p.i, recording (path, type); returns false on
    * malformed input. `depth` bounds object recursion: fields nest
    * under their path only one object level down (stated scope) —
    * deeper objects still VALIDATE fully.
    */
  private def value(p: P, path: String, depth: Int,
                    out: scala.collection.mutable.TreeSet[String]): Boolean = {
    p.ws()
    if (p.eof) return false
    val c = p.s.charAt(p.i)
    c match {
      case '{' =>
        out += s"$path|object"
        p.i += 1
        p.ws()
        if (!p.eof && p.s.charAt(p.i) == '}') { p.i += 1; return true }
        var more = true
        while (more) {
          p.ws()
          if (p.eof || p.s.charAt(p.i) != '"') return false
          val key = parseString(p)
          if (key == null) return false
          p.ws()
          if (p.eof || p.s.charAt(p.i) != ':') return false
          p.i += 1
          val childPath = if (depth < 2) s"$path.$key" else path
          if (depth < 2) {
            if (!value(p, childPath, depth + 1, out)) return false
          } else {
            // deeper: validate without new paths
            if (!value(p, path, depth + 1,
              new scala.collection.mutable.TreeSet[String]())) return false
          }
          p.ws()
          if (p.eof) return false
          p.s.charAt(p.i) match {
            case ',' => p.i += 1
            case '}' => p.i += 1; more = false
            case _ => return false
          }
        }
        true
      case '[' =>
        out += s"$path|array"
        p.i += 1
        p.ws()
        if (!p.eof && p.s.charAt(p.i) == ']') { p.i += 1; return true }
        var more = true
        while (more) {
          if (!value(p, s"$path[]", depth + 1, out)) return false
          p.ws()
          if (p.eof) return false
          p.s.charAt(p.i) match {
            case ',' => p.i += 1
            case ']' => p.i += 1; more = false
            case _ => return false
          }
        }
        true
      case '"' =>
        if (parseString(p) == null) return false
        out += s"$path|string"
        true
      case 't' =>
        if (p.s.startsWith("true", p.i)) { p.i += 4; out += s"$path|boolean"; true }
        else false
      case 'f' =>
        if (p.s.startsWith("false", p.i)) { p.i += 5; out += s"$path|boolean"; true }
        else false
      case 'n' =>
        if (p.s.startsWith("null", p.i)) { p.i += 4; out += s"$path|null"; true }
        else false
      case d if d == '-' || (d >= '0' && d <= '9') =>
        var j = p.i + 1
        while (j < p.s.length && ("0123456789.eE+-".indexOf(p.s.charAt(j)) >= 0)) j += 1
        p.i = j
        out += s"$path|number"
        true
      case _ => false
    }
  }

  /** Parse a JSON string at p.i (must point at `"`); returns content
    * with escapes RAW (values are never read, keys need identity
    * only), or null when unterminated.
    */
  private def parseString(p: P): String = {
    val s = p.s
    var j = p.i + 1
    val start = j
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\\') j += 2
      else if (c == '"') { p.i = j + 1; return s.substring(start, j) }
      else j += 1
    }
    null
  }

  /** Newline-joined sorted `path|type` lines; the `$invalid|invalid`
    * quarantine row when the document is not one valid JSON value.
    */
  def shape(b: Array[Byte]): String = {
    if (b == null) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        return "$invalid|invalid" }
    val p = new P(s)
    val out = new scala.collection.mutable.TreeSet[String]()
    val ok = value(p, "$", 0, out)
    p.ws()
    if (!ok || !p.eof) "$invalid|invalid" else out.mkString("\n")
  }

  // -------------------------------------------------------------- synth

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q153 JSON document from corpus words. `params`
    * packs `doc_id | mode<<40`: 0 -> canonical record; 1 -> score
    * arrives as a STRING (the number->string drift); 2 -> tags
    * collapses to a scalar and a new `extra` boolean appears;
    * 3 -> title arrives null.
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val sb = new StringBuilder
    sb.append("{\"id\": ").append(id).append(", ")
    if (mode == 3) sb.append("\"title\": null, ")
    else sb.append("\"title\": \"").append(ws(0)).append(' ').append(ws(1))
      .append("\", ")
    if (mode == 2) sb.append("\"tags\": \"").append(ws(2)).append("\", ")
    else if (mode == 3) sb.append("\"tags\": [\"").append(ws(2)).append("\"], ")
    else sb.append("\"tags\": [\"").append(ws(2)).append("\", \"")
      .append(ws(3)).append("\"], ")
    sb.append("\"meta\": {\"lang\": \"").append(ws(4)).append("\", ")
    if (mode == 1) sb.append("\"score\": \"0.5\"}")
    else sb.append("\"score\": 0.5}")
    if (mode == 2) sb.append(", \"extra\": true")
    sb.append("}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `binary -> string`: the document's sorted `path|type` lines. */
case class JsonShape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_shape"

  override protected def nullSafeEval(input: Any): Any = {
    val r = JsonShapeEval.shape(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val res = ctx.freshName("js")
      s"""
         |String $res = graft.functions.JsonShapeEval.shape($bytes);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JsonShape =
    copy(child = newChild)
}

/** `(binary text, long params) -> binary`: q153's synthesis. */
case class JsonShapeSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_shape_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    JsonShapeEval.synth(text.asInstanceOf[Array[Byte]],
      params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.JsonShapeEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JsonShapeSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the JSON shape kernels. */
object JsonShapeOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def jsonShape(b: Column): Column =
    ColumnBridge.column(JsonShape(ColumnBridge.expression(b.cast("binary"))))

  def jsonShapeSynth(text: Column, params: Column): Column =
    ColumnBridge.column(JsonShapeSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
