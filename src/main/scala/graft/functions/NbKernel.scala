package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Constant-table scoring kernel for the q122 model-based quality
  * classifier (the fastText/FineWeb-edu rung above q65's rules and q81's
  * bigram LM): the per-bucket log-odds weights are TRAINED in-corpus by
  * DataFrame aggregation (Classifier.scala), collected dim-sized
  * (≤ NumBuckets rows — the q85 BPE argmax precedent), and applied here
  * as a codegen'd constant table: one pass over the token array scores
  * unigram + bigram hashed features with zero joins, zero explodes,
  * zero exchanges at scoring time. At 100 TB that is the difference
  * between a narrow map and an exploded feature join whose shuffle
  * carries one row per token instance.
  *
  * Exactness discipline: weights arrive as micro-units (ln-ratio rounded
  * HALF_UP to 6 dp × 1e6 — the q81 decimal spelling), so the per-doc
  * score is an exact integer sum that any engine reproduces; the oracle
  * replays bucket counts, weights, and sums from the corpus alone.
  *
  * The feature hash must agree byte-for-byte with the SQL spelling
  * `conv(substring(md5(feat), 1, 8), 16, 10) % NumBuckets`: the first
  * 8 hex chars of md5 are the first 4 digest bytes big-endian.
  */
object NbScoreEval {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private final val Sep: Byte = '_' // outside words()' [a-z0-9] alphabet

  private def bucket(d: java.security.MessageDigest, n: Int): Int = {
    val h = d.digest()
    val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    (v % n).toInt
  }

  /** `[n_feats, sum_micro]` over unigram + bigram hashed features of the
    * token array, or null when the array (or any element — words() never
    * produces one, stop-don't-guess if it does) is null.
    */
  def score(ws: ArrayData, weights: Array[Long]): Array[Long] = {
    if (ws == null) return null
    val n = ws.numElements()
    val d = md5.get()
    val nb = weights.length
    // cache UTF-8 bytes: each token feeds its unigram and up to two bigrams
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      bytes(i) = ws.getUTF8String(i).getBytes
      i += 1
    }
    var sum = 0L
    i = 0
    while (i < n) {
      d.reset()
      d.update(bytes(i))
      sum += weights(bucket(d, nb))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      d.reset()
      d.update(bytes(i))
      d.update(Sep)
      d.update(bytes(i + 1))
      sum += weights(bucket(d, nb))
      i += 1
    }
    Array(n.toLong + math.max(n - 1, 0), sum)
  }
}

/** `array<string> -> array<long> [n_feats, sum_micro]`: constant-weights
  * hashed-ngram scoring via [[NbScoreEval.score]]. The weight table is a
  * plan constant (captured at train time), so the whole scoring stage is
  * a codegen'd narrow map.
  */
case class NbScore(child: Expression, weights: Seq[Long])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nb_score"

  // Seq in the case class for Catalyst value-equality/canonicalization
  // (the BpeTokens discipline); the kernel walks a primitive array
  @transient private lazy val weightArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val r = NbScoreEval.score(input.asInstanceOf[ArrayData], weightArr)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wref = ctx.addReferenceObj("nbWeights", weightArr, "long[]")
    nullSafeCodeGen(ctx, ev, ws => {
      val res = ctx.freshName("nbsc")
      s"""
         |long[] $res = graft.functions.NbScoreEval.score($ws, $wref);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($res); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NbScore =
    copy(child = newChild)
}

/** Column surface for the classifier scoring kernel. */
object NbOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def nbScore(ws: Column, weights: Seq[Long]): Column =
    ColumnBridge.column(NbScore(ColumnBridge.expression(ws), weights))
}
