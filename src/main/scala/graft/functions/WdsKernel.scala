package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** WebDataset shard synthesis (q163) — the POSIX-tar training-shard
  * convention multimodal loaders stream (members named `<key>.<ext>`;
  * every member sharing a key is ONE sample): the synthesizer emits
  * shards that drill the assembler's contract, the tar walk itself is
  * q136's verified [[TarEval]]:
  *
  *  - the sample key is the basename up to the FIRST dot, the
  *    extension everything after it — `d7_0.seg.png` is sample
  *    `d7_0`, extension `seg.png` (a last-dot split misfiles it);
  *  - members of one sample need not be contiguous (mode 2
  *    interleaves two samples — a streaming-window assembler loses
  *    parts; the group-by assembler must not);
  *  - a checksum-corrupt member keeps its NAME but refuses its
  *    CONTENT (q136's per-member stance) — the sample counts the
  *    part yet reports incomplete;
  *  - an absent part (mode 1 drops a `.cls`) leaves the sample
  *    assembled but incomplete — the loader-side drop row.
  *
  * Reference scope: scholar-stream ingests a JSON feed (reference
  * ingestion/openalex_client.py) — training-shard assembly is a
  * north-star extension of the layout family (q80/q89/q136/q160).
  */
object WdsEval {

  private def words(text: Array[Byte]): Array[String] =
    new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Synthesize a q163 shard. `params` packs `doc_id | mode<<40`:
    * 0 -> two complete samples (`.txt/.cls/.json` + `.txt/.cls`);
    * 1 -> sample 1 missing its `.cls` (incomplete); 2 -> interleaved
    * member order + a multi-dot `seg.png` extension on sample 0;
    * 3 -> sample 0's `.cls` header checksum flipped (named part,
    * refused content).
    */
  def synth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val t0 = ws.slice(0, 3).mkString(" ").getBytes(utf8)
    val t1 = ws.slice(3, 6).mkString(" ").getBytes(utf8)
    val c0 = (id % 10).toString.getBytes(utf8)
    val c1 = ((id + 1) % 10).toString.getBytes(utf8)
    val j0 = s"""{"id":$id}""".getBytes(utf8)
    val png = ("PNGDATA" + id).getBytes(utf8)
    val k0 = s"d${id}_0"
    val k1 = s"d${id}_1"
    val out = new java.io.ByteArrayOutputStream(8 * 512)
    var flipAt = -1
    def m(name: String, content: Array[Byte], flip: Boolean = false): Unit = {
      if (flip) flipAt = out.size()
      TarEval.writeHeader(out, name, "", content.length, '0', oldGnu = false)
      out.write(content, 0, content.length)
      TarEval.pad(out, content.length)
    }
    mode match {
      case 1 =>
        m(k0 + ".txt", t0); m(k0 + ".cls", c0); m(k0 + ".json", j0)
        m(k1 + ".txt", t1)
      case 2 =>
        m(k0 + ".txt", t0); m(k1 + ".txt", t1); m(k0 + ".seg.png", png)
        m(k1 + ".cls", c1); m(k0 + ".cls", c0)
      case 3 =>
        m(k0 + ".txt", t0); m(k0 + ".cls", c0, flip = true)
        m(k0 + ".json", j0); m(k1 + ".txt", t1); m(k1 + ".cls", c1)
      case _ =>
        m(k0 + ".txt", t0); m(k0 + ".cls", c0); m(k0 + ".json", j0)
        m(k1 + ".txt", t1); m(k1 + ".cls", c1)
    }
    out.write(new Array[Byte](1024), 0, 1024) // end-of-archive trailer
    val bytes = out.toByteArray
    if (flipAt >= 0) {
      // flip one stored-checksum octal digit ('0'..'7' stays octal, so
      // the size still parses): the member refuses CONTENT, keeps NAME
      bytes(flipAt + 148) = (bytes(flipAt + 148) ^ 0x01).toByte
    }
    bytes
  }

  /** Synthesize a q174 MEDIA shard: the q163 layout carrying REAL
    * image members (the q118/q121/q124 synthesizers, q127's residue
    * parameters) beside their captions. `params` packs
    * `doc_id | mode<<40` (mode = doc_id % 4): 0 -> baseline-gray
    * JPEG `.jpg`; 1 -> five-filter RGB PNG `.png`; 2 -> GIF89a
    * `.gif`; 3 -> NO image member (the caption-only incomplete
    * sample). Members interleave two samples (`m<id>` with the
    * image + caption, `n<id>` caption-only) so assembly must be the
    * keyed aggregate, never a streaming window.
    */
  def mediaSynth(text: Array[Byte], params: Long): Array[Byte] = {
    val id = params & ((1L << 40) - 1)
    val mode = (params >> 40).toInt
    val ws = words(text)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val cap0 = ws.slice(0, 4).mkString(" ").getBytes(utf8)
    val cap1 = ws.slice(4, 7).mkString(" ").getBytes(utf8)
    val jw = (id % 3 + 1).toInt
    val jh = (id % 2 + 1).toInt
    val pw = (id % 6 + 1).toInt
    val ph = (id % 4 + 1).toInt
    val img: (String, Array[Byte]) = mode match {
      case 0 => ("jpg", JpegPixelEval.synthAny(id, jw, jh, 0, 0))
      case 1 => ("png", PngPixelEval.synth(id, pw, ph, 1))
      case 2 => ("gif", GifPixelEval.synth(id, pw, ph, 0))
      case _ => (null, null)
    }
    val out = new java.io.ByteArrayOutputStream(16 * 512)
    def m(name: String, content: Array[Byte]): Unit = {
      TarEval.writeHeader(out, name, "", content.length, '0', oldGnu = false)
      out.write(content, 0, content.length)
      TarEval.pad(out, content.length)
    }
    // interleaved on purpose: m-caption, n-caption, m-image
    m(s"m$id.txt", cap0)
    m(s"n$id.txt", cap1)
    if (img._1 != null) m(s"m$id." + img._1, img._2)
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }
}

/** `(binary text, long params) -> binary`: q163's shard synthesis. */
case class WdsSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wds_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    WdsEval.synth(text.asInstanceOf[Array[Byte]], params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.WdsEval.synth($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WdsSynth =
    copy(left = newLeft, right = newRight)
}

/** `(binary text, long params) -> binary`: q174's MEDIA shard. */
case class WdsMediaSynth(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wds_media_synth"

  override protected def nullSafeEval(text: Any, params: Any): Any =
    WdsEval.mediaSynth(text.asInstanceOf[Array[Byte]],
      params.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.WdsEval.mediaSynth($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WdsMediaSynth =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the WebDataset synthesizer. */
object WdsOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def wdsSynth(text: Column, params: Column): Column =
    ColumnBridge.column(WdsSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))

  def wdsMediaSynth(text: Column, params: Column): Column =
    ColumnBridge.column(WdsMediaSynth(
      ColumnBridge.expression(text.cast("binary")),
      ColumnBridge.expression(params.cast("long"))))
}
