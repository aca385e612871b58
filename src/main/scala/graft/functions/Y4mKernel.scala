package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared byte-walk helpers for the YUV4MPEG2 (Y4M) kernels — the
  * uncompressed VIDEO container (ffmpeg/x264's interchange format), the
  * moving-picture sibling of the BMP pixel walk: a plain-ASCII stream
  * header `YUV4MPEG2 [params]\n` followed by frames, each `FRAME
  * [params]\n` + planar pixel data. No codec anywhere, so REAL per-frame
  * pixel decode is a byte walk.
  *
  * Contract both kernels share:
  *  - stream params: `W<digits>` (width) and `H<digits>` (height) are
  *    required; `C<token>` selects chroma — the `420` family (any token
  *    with that prefix: 420, 420jpeg, 420mpeg2, 420paldv; frame size
  *    w*h*3/2, even dims required) and `mono` (frame size w*h) are
  *    supported, anything else is NULL (never a garbage parse);
  *  - frame headers may carry parameters (`FRAME Xsomething\n`), so frame
  *    k's offset is NOT a constant stride — both kernels WALK the frame
  *    sequence, which is what makes them correct on real encoder output;
  *  - luma IS the Y plane: sample k of the plane is the pixel's luma
  *    byte, no color transform needed (the 4:2:0/mono payoff).
  */
private[functions] object Y4mWalk {
  /** Parse the stream header: returns (width, height, lumaSize, frameSize,
    * firstFrameOffset) or null when the payload is not a supported Y4M.
    */
  def header(bb: Array[Byte]): Array[Long] = {
    val len = bb.length
    val magic = "YUV4MPEG2"
    if (len < magic.length + 1) return null
    var i = 0
    while (i < magic.length) {
      if (bb(i) != magic.charAt(i)) return null
      i += 1
    }
    var w = -1L
    var h = -1L
    var c420 = true // C absent => C420 per the format's convention
    var cKnown = true
    while (i < len && bb(i) != '\n') {
      if (bb(i) == ' ' && i + 1 < len) {
        val tag = bb(i + 1)
        var j = i + 2
        if (tag == 'W' || tag == 'H') {
          var v = 0L
          var any = false
          while (j < len && bb(j) >= '0' && bb(j) <= '9' && v < (1L << 40)) {
            v = v * 10 + (bb(j) - '0'); j += 1; any = true
          }
          if (any) { if (tag == 'W') w = v else h = v }
        } else if (tag == 'C') {
          // token runs to the next space / newline
          var e = j
          while (e < len && bb(e) != ' ' && bb(e) != '\n') e += 1
          val tok = new String(bb, j, e - j, "US-ASCII")
          if (tok.startsWith("420")) c420 = true
          else if (tok == "mono") c420 = false
          else cKnown = false
          j = e
        }
        i = j - 1
      }
      i += 1
    }
    if (i >= len || w <= 0 || h <= 0 || !cKnown) return null
    if (c420 && ((w & 1L) != 0 || (h & 1L) != 0)) return null // 4:2:0 needs even dims
    val luma = w * h
    val frame = if (c420) luma + luma / 2 else luma
    Array(w, h, luma, frame, i + 1L)
  }

  /** Advance from a frame header at `pos` to its pixel data: expects
    * `FRAME`, skips optional params to the newline. Returns the data
    * offset or -1 on mismatch/truncation.
    */
  def frameData(bb: Array[Byte], pos: Long): Long = {
    val len = bb.length
    val marker = "FRAME"
    if (pos + marker.length > len) return -1L
    var i = pos.toInt
    var m = 0
    while (m < marker.length) {
      if (bb(i) != marker.charAt(m)) return -1L
      i += 1; m += 1
    }
    while (i < len && bb(i) != '\n') i += 1
    if (i >= len) -1L else i + 1L
  }
}

/** `binary -> long`: Y4M stream metadata packed as
  * `(width << 40) | (height << 20) | nFrames` (each lane < 2^20 — a
  * million-pixel edge and a million frames, far past any payload that
  * fits a binary column; larger values are refused rather than wrapped).
  * The frame count comes from WALKING the frame sequence (frame headers
  * may carry params, so it is not a division); a payload whose last
  * frame is truncated is refused — at a 100 TB ingest, half-written
  * files must surface as NULL, not as a short video.
  */
case class Y4mMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_y4m_meta"

  override protected def nullSafeEval(input: Any): Any =
    Y4mEval.meta(input.asInstanceOf[Array[Byte]])

  // the walk is stateful ASCII parsing — genuinely clearer as a static
  // call than as inlined codegen; the call itself stays inside
  // whole-stage codegen (same technique as Spark's own StaticInvoke
  // expressions), so there is no per-row interpretation overhead
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val boxed = ctx.freshName("y4mMeta")
      s"""
         |Object $boxed = graft.functions.Y4mEval.meta($bytes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Y4mMeta =
    copy(child = newChild)
}

/** `(binary, int) -> long`: REAL pixel statistics of frame `idx`'s Y
  * plane — `(sumLuma << 16) | (maxLuma << 8) | minLuma`, the same packed
  * contract as [[BmpLuma]]. Walks the frame sequence to `idx` (frame
  * headers may carry params), folds exactly the w*h luma bytes, and
  * skips the chroma planes — U/V bytes contaminating the fold is the
  * slip the contract query's oracle is built to catch. NULL when the
  * payload is not a supported Y4M or the frame is absent/truncated.
  */
case class Y4mFrameLuma(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_y4m_frame_luma"

  override protected def nullSafeEval(bin: Any, idx: Any): Any =
    Y4mEval.frameLuma(bin.asInstanceOf[Array[Byte]], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, idx) => {
      val boxed = ctx.freshName("y4mLuma")
      s"""
         |Object $boxed = graft.functions.Y4mEval.frameLuma($bytes, $idx);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Y4mFrameLuma =
    copy(left = newLeft, right = newRight)
}

/** The shared evaluation bodies, called from BOTH the interpreted eval and
  * the generated code — one implementation, zero parity surface.
  */
object Y4mEval {
  def meta(bb: Array[Byte]): java.lang.Long = {
    val hdr = Y4mWalk.header(bb)
    if (hdr == null) return null
    val w = hdr(0); val h = hdr(1); val frame = hdr(3); val first = hdr(4)
    if (w >= (1L << 20) || h >= (1L << 20)) return null
    var pos = first
    var n = 0L
    while (pos < bb.length) {
      val data = Y4mWalk.frameData(bb, pos)
      if (data < 0 || data + frame > bb.length) return null // truncated tail
      n += 1
      pos = data + frame
    }
    if (n >= (1L << 20)) return null
    java.lang.Long.valueOf((w << 40) | (h << 20) | n)
  }

  def frameLuma(bb: Array[Byte], idx: Int): java.lang.Long = {
    if (idx < 0) return null
    val hdr = Y4mWalk.header(bb)
    if (hdr == null) return null
    val luma = hdr(2); val frame = hdr(3); val first = hdr(4)
    var pos = first
    var k = 0
    while (k < idx) {
      val data = Y4mWalk.frameData(bb, pos)
      if (data < 0 || data + frame > bb.length) return null
      pos = data + frame
      k += 1
    }
    val data = Y4mWalk.frameData(bb, pos)
    if (data < 0 || data + frame > bb.length) return null
    var i = data.toInt
    val end = (data + luma).toInt
    var sum = 0L
    var min = 255
    var max = 0
    while (i < end) {
      val y = bb(i) & 0xFF
      sum += y
      if (y < min) min = y
      if (y > max) max = y
      i += 1
    }
    java.lang.Long.valueOf((sum << 16) | (max.toLong << 8) | min.toLong)
  }
}
