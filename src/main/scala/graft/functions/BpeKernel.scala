package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODE as a codegen kernel — the apply side of the q85 trainer: a
  * trained merge table is a tiny constant (k rows), so it ships into the
  * generated code as a reference object and every document is tokenized
  * in one narrow pass, no join against a merges table and nothing
  * interpreted per row (the dotHof lesson: per-unit work must never be a
  * lambda).
  *
  * Semantics are EXACTLY the trainer's: the same tokenizer as
  * `TextOps.words` (engine lowercase, split on non-alphanumeric runs,
  * drop empties), then each merge applied IN RANK ORDER with the same
  * leftmost-greedy fold the training rounds used — so for every word the
  * trainer saw, the encoded symbol count equals the training-end
  * vocabulary state (BpeSpec pins this word-by-word), and unseen words
  * degrade gracefully to whatever prefix of the merge table applies.
  */
object BpeEval {
  /** Total BPE symbol count of `text` under the flattened merge table
    * `[l0, r0, l1, r1, ...]` (rank order).
    */
  def count(text: UTF8String, merges: Array[String]): Long = {
    // the engine's own lowercase, so kernel and `lower()` can never
    // disagree on a code point
    val words = text.toLowerCase.toString.split("[^a-z0-9]+")
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = new Array[String](w.length)
        var i = 0
        while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
        var n = w.length
        var mi = 0
        while (mi + 1 < merges.length && n > 1) {
          val l = merges(mi)
          val r = merges(mi + 1)
          // leftmost-greedy single pass (the trainer's fold): write
          // index chases read index, a fresh merge never re-merges
          var rd = 0
          var wr = 0
          while (rd < n) {
            if (rd + 1 < n && syms(rd) == l && syms(rd + 1) == r) {
              syms(wr) = l + r; rd += 2
            } else { syms(wr) = syms(rd); rd += 1 }
            wr += 1
          }
          n = wr
          mi += 2
        }
        total += n
      }
      wi += 1
    }
    total
  }
}

/** `string -> long`: BPE token count under a constant merge table. */
case class BpeTokens(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  // an odd-length flattened table means a dropped merge half — the count
  // loop would silently ignore the trailing element and mis-encode with
  // no signal, so a malformed table must fail loudly at plan time
  require(merges.length % 2 == 0,
    s"flattened merge table must hold (left, right) pairs; got ${merges.length} elements")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val mergeArr: Array[String] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEval.count(input.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.BpeEval.count($s, $ref);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** BYTE-level BPE encode (q123) — the GPT-2-class shape: pre-tokenize
  * with [[ByteBpeEval.PreTok]] (case kept, whitespace runs are tokens),
  * fall back to raw UTF-8 BYTES as the base alphabet (so every string is
  * representable — no OOV), and apply the trained merge table with the
  * same leftmost-greedy rank-order fold as [[BpeEval]]. Symbols are
  * 2-hex-char strings, exactly the trainer's representation, so kernel
  * and training loop can never disagree on a merge boundary.
  */
object ByteBpeEval {
  /** The shared pre-tokenizer. Stated divergences from GPT-2's
    * (Radford et al. 2019 §2.2): no English contraction splits and no
    * whitespace lookahead (RE2 — the oracle engine's regex — has no
    * lookahead); classes are explicit ASCII so Java and RE2 agree on
    * every byte, and non-ASCII runs fall to the "other" class where
    * byte-fallback handles them.
    */
  final val PreTok: String =
    " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"

  private val pat = java.util.regex.Pattern.compile(PreTok)
  private val Hex = "0123456789ABCDEF"

  /** `[n_pretoks, n_bpe_tokens]` of `text` under the flattened
    * rank-ordered merge table (hex-pair symbols).
    */
  def stats(text: UTF8String, merges: Array[String]): Array[Long] = {
    val m = pat.matcher(text.toString)
    var nTok = 0L
    var total = 0L
    while (m.find()) {
      nTok += 1
      val bb = UTF8String.fromString(m.group()).getBytes
      var syms = new Array[String](bb.length)
      var i = 0
      while (i < bb.length) {
        val v = bb(i) & 0xFF
        syms(i) = s"${Hex.charAt(v >> 4)}${Hex.charAt(v & 0x0F)}"
        i += 1
      }
      var n = bb.length
      var mi = 0
      while (mi + 1 < merges.length && n > 1) {
        val l = merges(mi)
        val r = merges(mi + 1)
        var rd = 0
        var wr = 0
        while (rd < n) {
          if (rd + 1 < n && syms(rd) == l && syms(rd + 1) == r) {
            syms(wr) = l + r; rd += 2
          } else { syms(wr) = syms(rd); rd += 1 }
          wr += 1
        }
        n = wr
        mi += 2
      }
      total += n
    }
    Array(nTok, total)
  }
}

/** `string -> array<long> [n_pretoks, n_bpe_tokens]`: byte-level BPE
  * stats under a constant merge table ([[ByteBpeEval]]).
  */
case class ByteBpeTokens(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.length % 2 == 0,
    s"flattened merge table must hold (left, right) pairs; got ${merges.length} elements")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_bpe"

  @transient private lazy val mergeArr: Array[String] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ByteBpeEval.stats(input.asInstanceOf[UTF8String], mergeArr))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeMerges", mergeArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ByteBpeEval.stats($s, $ref));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeTokens =
    copy(child = newChild)
}

object BpeOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** BPE token count of `text` under the flattened rank-ordered merge
    * table ([[BpeTokens]]).
    */
  def bpeTokens(text: Column, merges: Seq[String]): Column =
    ColumnBridge.column(BpeTokens(
      ColumnBridge.expression(text.cast("string")), merges))

  /** Byte-level BPE `[n_pretoks, n_bpe_tokens]` under the flattened
    * rank-ordered hex-pair merge table ([[ByteBpeTokens]]).
    */
  def byteBpeStats(text: Column, merges: Seq[String]): Column =
    ColumnBridge.column(ByteBpeTokens(
      ColumnBridge.expression(text.cast("string")), merges))
}
