package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** In-bucket near-duplicate pair enumeration: given one LSH bucket's member
  * list `array<struct<vec_id bigint, v array<double>, nrm double>>` and a
  * cosine `threshold`, emit every surviving i<j pair as
  * `array<struct<doc_a bigint, doc_b bigint>>` with doc_a = min id,
  * doc_b = max id.
  *
  * Replaces the dense-regime nested higher-order projection in
  * [[graft.operators.Dedup.embedNearDupPairs]] (transform∘filter∘flatten
  * with a codegen'd dot in the middle): the HOF machinery allocates a
  * lambda frame, a sequence array, and an output array PER MEMBER per
  * bucket, which the r18 profile measured at 34 s of task time for q44's
  * ~2M candidate pairs where the arithmetic itself is ~0.2 s — this is a
  * single native i<j loop with zero allocation per pair (one output buffer
  * per bucket). Pair SET is bit-identical to the HOF spelling (same
  * predicate `dot/(nrm·nrm) >= threshold`, same least/greatest id order;
  * pinned by PairKernelSpec against the retained HOF twin); row order
  * within a bucket differs from the HOF's but every consumer runs
  * `.distinct()` next, so order is immaterial and declared so.
  *
  * NULL semantics mirror the HOF twin: a pair whose dot is NULL (either
  * vector NULL, length mismatch, or NULL element — [[DotProduct]]'s
  * contract) or whose norm is NULL fails the `>=` predicate and is simply
  * not emitted; a NULL member list yields NULL (BinaryExpression gate).
  *
  * NaN/zero-divisor semantics mirror the HOF twin too (ADVICE r18, which
  * flagged a silent divergence here). Two cases, both now bit-identical
  * to the SQL spelling under the session's own config:
  *
  *  - NaN ratio with a NON-zero divisor (NaN vector elements — the norm
  *    is then NaN too, so the divisor is NaN, not 0): Spark compares
  *    doubles NaN-as-largest (`nanSafeCompareDoubles`), so the SQL
  *    `>= threshold` SATISFIES and the pair is emitted. A plain Java
  *    `NaN >= t` is false, so the loop emits on `ratio >= t || isNaN`.
  *  - ZERO divisor (a zero-norm vector): under ANSI mode (the Spark 4
  *    default, and what every graft session runs) Catalyst's `Divide`
  *    THROWS DIVIDE_BY_ZERO before any comparison happens — the kernel
  *    raises the same error; with ANSI off the division yields NaN/±Inf
  *    and falls into the comparison rule above.
  *
  * PairKernelSpec pins both against the HOF twin (zero-norm and
  * NaN-element member fixtures).
  *
  * CodegenFallback is deliberate and cheap here: the expression is
  * invoked once per BUCKET GROUP (thousands of rows), never per pair —
  * the hot loop below is already compiled Scala over UnsafeArrayData, so
  * whole-stage codegen would only save the per-GROUP dispatch.
  */
case class BucketDupPairs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_bucket_dup_pairs"

  override protected def nullSafeEval(msAny: Any, tAny: Any): Any = {
    val ms = msAny.asInstanceOf[ArrayData]
    val t = tAny.asInstanceOf[Double]
    val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // unpack once per bucket: ids, vectors, norms
    val ids = new Array[Long](n)
    val vecs = new Array[ArrayData](n)
    val nrms = new Array[Double](n)
    val nrmOk = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val s = ms.getStruct(i, 3)
      ids(i) = s.getLong(0)
      vecs(i) = if (s.isNullAt(1)) null else s.getArray(1)
      nrmOk(i) = !s.isNullAt(2)
      nrms(i) = if (nrmOk(i)) s.getDouble(2) else 0.0
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n - 1) {
      val vi = vecs(i)
      if (vi != null && nrmOk(i)) {
        val d = vi.numElements()
        var j = i + 1
        while (j < n) {
          val vj = vecs(j)
          if (vj != null && nrmOk(j) && vj.numElements() == d) {
            var s = 0.0
            var k = 0
            var nullElem = false
            while (k < d && !nullElem) {
              if (vi.isNullAt(k) || vj.isNullAt(k)) nullElem = true
              else s += vi.getDouble(k) * vj.getDouble(k)
              k += 1
            }
            val div = nrms(i) * nrms(j)
            // ANSI Divide: a zero divisor throws before any comparison —
            // exactly what the SQL twin does on a zero-norm vector
            if (!nullElem && ansi && div == 0.0)
              throw org.apache.spark.sql.graft.ColumnBridge
                .divideByZeroError(origin.context)
            val ratio = s / div
            // Spark's nanSafeCompareDoubles: NaN is the LARGEST double,
            // so a NaN ratio passes any threshold — match it exactly
            if (!nullElem && (ratio >= t || java.lang.Double.isNaN(ratio))) {
              val row = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(2)
              row.setLong(0, math.min(ids(i), ids(j)))
              row.setLong(1, math.max(ids(i), ids(j)))
              out += row.asInstanceOf[InternalRow]
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketDupPairs =
    copy(left = newLeft, right = newRight)
}
