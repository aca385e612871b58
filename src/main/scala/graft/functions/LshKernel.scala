package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd random-hyperplane LSH signature over an ArrayType(Double)
  * column: bit p of the result is the sign of Σᵢ ±v[i], where the sign
  * pattern of plane p is `hash(p, i) & 1` — the SAME Murmur3 chain Spark's
  * `hash(p, i)` builtin computes (`hashInt(i, hashInt(p, 42))`), so the
  * emitted buckets are bit-for-bit those of the HOF formulation this
  * kernel replaces, and every empirically-pinned recall number
  * (AnnRecallSpec 0.85, EmbedNearDupSpec containment) transfers unchanged.
  *
  * Why a kernel: the composable form — a `transform` whose lambda runs
  * `aggregate(zip_with(v, sequence(...)))` per plane — is evaluated
  * INTERPRETED, allocating lambda holders and walking generic ArrayData
  * for every (row × plane × dim); profiled at 2.2 s per side of the q44
  * band self-join at sf0.1 (the #1 cost in the whole sweep). This loop
  * JITs inside whole-stage codegen with zero per-row allocation beyond
  * the output bytes.
  *
  * Parity contract (pinned in LshKernelSpec against the HOF twin):
  *   - input NULL        -> NULL  (UnaryExpression null gate)
  *   - any NULL element  -> all-'0' bits (null poisons the HOF sum; its
  *                          `when(proj >= 0, "1").otherwise("0")` then
  *                          takes the otherwise branch for every plane)
  *   - empty vector      -> all-'0' bits (sequence(0, -1) is the
  *                          DESCENDING [0, -1]; zip_with pads v with
  *                          nulls — same poisoning)
  *   - bit p of plane p  -> '1' iff the signed sum is >= 0
  *   - a NaN sum         -> '1': the HOF's Spark SQL `proj >= 0` orders
  *                          NaN greater than everything, so the kernel
  *                          tests `!(s < 0)` (identical for every non-NaN
  *                          double) instead of Java's `s >= 0` (which is
  *                          false for NaN) — parity covers non-finite
  *                          inputs too, pinned by the NaN/Inf fixtures in
  *                          LshKernelSpec
  */
case class LshBits(vector: Expression, planes: Int) extends UnaryExpression {

  override def child: Expression = vector

  // see DotProduct: the ARRAY<DOUBLE> contract is enforced by the public
  // wrapper (VectorOps.lshBits inserts a no-op cast)
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_lsh_bits"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val bits = new Array[Byte](planes)
    var poisoned = n == 0
    var i = 0
    while (i < n && !poisoned) { poisoned = v.isNullAt(i); i += 1 }
    if (poisoned) {
      java.util.Arrays.fill(bits, '0'.toByte)
    } else {
      var p = 0
      while (p < planes) {
        val hp = Murmur3_x86_32.hashInt(p, 42)
        var s = 0.0
        var j = 0
        while (j < n) {
          val x = v.getDouble(j)
          s += (if ((Murmur3_x86_32.hashInt(j, hp) & 1) == 0) x else -x)
          j += 1
        }
        // !(s < 0), not (s >= 0): NaN must take the '1' branch like the
        // HOF twin's Spark SQL comparison (NaN is greatest) — see Scaladoc
        bits(p) = if (!(s < 0)) '1'.toByte else '0'.toByte
        p += 1
      }
    }
    UTF8String.fromBytes(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mm = classOf[Murmur3_x86_32].getName
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val poisoned = ctx.freshName("poisoned")
      val p = ctx.freshName("p")
      val hp = ctx.freshName("hp")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |final byte[] $bits = new byte[$planes];
         |boolean $poisoned = ($n == 0);
         |for (int $i = 0; $i < $n && !$poisoned; $i++) {
         |  $poisoned = $v.isNullAt($i);
         |}
         |if ($poisoned) {
         |  java.util.Arrays.fill($bits, (byte) '0');
         |} else {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    final int $hp = $mm.hashInt($p, 42);
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final double $x = $v.getDouble($j);
         |      $s += (($mm.hashInt($j, $hp) & 1) == 0) ? $x : -$x;
         |    }
         |    $bits[$p] = (!($s < 0.0)) ? (byte) '1' : (byte) '0';
         |  }
         |}
         |${ev.value} = $utf8.fromBytes($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(vector = newChild)
}
