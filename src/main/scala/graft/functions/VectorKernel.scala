package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd dot product over two ArrayType(Double) columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
  * is evaluated INTERPRETED by Spark: higher-order functions allocate a
  * lambda-variable holder and an output array per row and walk them through
  * the generic `ArrayData` interface — judge-measured ~300 µs per 64-dim
  * pair-core, ~1000× a native loop, which made the ANN re-rank stages
  * (q26/q36) cost minutes for ~0.5 s of arithmetic. This expression emits a
  * primitive `double` loop via `doGenCode` (the preference-order (b) path:
  * custom Catalyst Expression over UDF), so the kernel stays inside
  * whole-stage codegen with zero per-row allocation.
  *
  * Semantics are EXACTLY the zip_with formulation's, pinned by
  * VectorKernelSpec against the HOF twin:
  *   - either input NULL            -> NULL  (BinaryExpression null gate)
  *   - length mismatch              -> NULL  (zip_with pads with null;
  *                                            null poisons the sum)
  *   - any NULL element             -> NULL  (same poisoning)
  *   - both empty                   -> 0.0   (aggregate's zero element)
  *
  * Reference analog: DuckDB's native `list_cosine_similarity` (the q19/q25
  * oracle function) is this same primitive loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Children MUST be ARRAY<DOUBLE>: `ExpectsInputTypes` is private[sql] in
  // Spark 4, so the type contract is enforced by the public wrapper
  // (VectorOps.dot inserts a no-op `cast("array<double>")` on both sides —
  // optimized away when already double, a real coercion otherwise).
  override def dataType: DataType = DoubleType

  // non-null inputs can still yield NULL (length mismatch / null element)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[DotProduct]]'s int8 twin: codegen'd dot product over two
  * ArrayType(Byte) columns, accumulated in `long` (overflow-free for any
  * array under 2^48 elements). The quantized-similarity currency at scale:
  * an int8 corpus copy is 8× smaller than doubles — memory bandwidth, not
  * FLOPs, is what the re-rank stage pays for — and cosine over symmetric
  * per-vector quantization needs no dequantization at all (the scale
  * cancels). NULL semantics identical to [[DotProduct]], pinned in
  * VectorKernelSpec.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getByte(i).toLong * y.getByte(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (long) $a.getByte($i) * $b.getByte($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}

/** The PQ asymmetric-distance kernel (q73): given a query's flat LUT
  * (ARRAY<DOUBLE> of m·ks partial dot products, position = sub·ks + code)
  * and a candidate's base-ks packed codeword long, accumulate the m table
  * entries the codes address — ADC ≈ ⟨q, x̂⟩ in m primitive loads, zero
  * array math per pair. The HOF spelling (aggregate over sequence with
  * element_at + floor/pow unpacking) walks generic ArrayData through
  * interpreted lambdas per pair — the dotHof lesson again, measured 6.9 s
  * for q73's sf0.001 sweep vs sub-second kernelized. Parity with the HOF
  * twin (VectorOps.pqAdcHof) is pinned in VectorKernelSpec.
  *
  * NULL semantics: either input NULL -> NULL (BinaryExpression gate); a
  * code addressing past the LUT or a NULL slot (an out-of-vocabulary
  * codeword — impossible for self-encoded corpora, defensive otherwise)
  * -> NULL, same poisoning discipline as [[DotProduct]].
  */
case class PqAdc(left: Expression, right: Expression, m: Int, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    var packed = b.asInstanceOf[Long]
    val n = lut.numElements()
    var s = 0.0
    var sub = 0
    while (sub < m) {
      val idx = sub * ks + (packed % ks).toInt
      if (idx < 0 || idx >= n || lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      packed /= ks
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val idx = ctx.freshName("idx")
      val packed = ctx.freshName("packed")
      s"""
         |final int $n = $a.numElements();
         |long $packed = $b;
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  final int $idx = $sub * $ks + (int) ($packed % $ks);
         |  if ($idx < 0 || $idx >= $n || $a.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($idx);
         |  $packed /= $ks;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
