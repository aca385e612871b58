package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Shared deflate fold body — called from BOTH the interpreted eval and the
  * generated code (the Y4M/WAV technique: one implementation, zero parity
  * surface).
  */
object DeflateEval {
  // one Deflater AND one drain buffer per executor thread, reset/reused
  // between rows: allocating the native zlib stream (or an 8 KiB drain
  // array) per row would dominate the fold / churn the GC at corpus
  // scale, and the leak bound is the thread count, not the row count
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // level 6, raw stream (no header)
  }
  private val drain = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflated byte length of the payload at level 6 — the numerator of the
    * compression-ratio quality signal. Deterministic for a given JVM's
    * zlib (the signal is thresholded, never hash-compared across engines —
    * this is why q66 is spec-gated rather than DuckDB-oracled).
    */
  def deflatedLen(bb: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bb)
    d.finish()
    val buf = drain.get()
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }
}

/** `binary -> int`: deflated (zlib level 6, raw) byte length via
  * [[DeflateEval.deflatedLen]]. The compression-ratio signal
  * `deflated/raw` is the classic repetitive-junk detector (boilerplate,
  * keyword stuffing, template spam compress far below natural language) —
  * the Gopher-adjacent quality gate a rule filter (q65) cannot express.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateEval.deflatedLen(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"${ev.value} = graft.functions.DeflateEval.deflatedLen($bytes);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
