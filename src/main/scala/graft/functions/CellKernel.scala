package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** The IVF centroid meet WITHOUT the row explosion. The r12 second-decade
  * run measured the break this kernel closes: ranking every (vector,
  * cell) by centroid similarity through a crossJoin + window
  * materializes n·nCells ROWS (1.25 B at the 100× corpus under
  * density-scaled cells — q36 took 490 s, ~75× per decade), when the
  * query only ever keeps each vector's top `nProbe` cells. The flops are
  * irreducible IVF assignment cost (Θ(n·nCells), what FAISS spends in
  * BLAS); the row materialization, window exchange, and per-row object
  * churn are not. This expression scans the collected centroid matrix in
  * a primitive loop per row and emits ONLY the top-nProbe cells — same
  * verdicts, zero intermediate rows, and the per-vector window exchange
  * disappears from the plan.
  *
  * Exactness is load-bearing: the similarity is the SAME forward-order
  * `dot / (norm·norm)` float walk as the `graft_dot`-composed column it
  * replaces (bit-identical doubles), and the selection order is
  * (csim desc, cell_id asc) — the window's sort key — so home cells,
  * probe sets, and SemDeDup's clusters are unchanged, not merely
  * statistically similar.
  *
  * Scale premise: the centroid table must fit on one machine — the SAME
  * premise the replaced `broadcast(centroids)` already staked (a few MB
  * at density-scaled cells for the measured corpora). The regime where
  * even centroids outgrow a broadcast wants a hierarchical coarse
  * quantizer (two-level IMI — probe centroid GROUPS, then members);
  * that is the stated next rung, not this kernel's contract.
  */
final class CentroidTable(val ids: Array[Long], val vecs: Array[Array[Double]])
  extends Serializable {
  val norms: Array[Double] = vecs.map { v =>
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }
  def size: Int = ids.length
}

object CellEval {
  /** Top-`k` cells of `v` by cosine against `t`, ordered (csim desc,
    * cell_id asc) — exactly the replaced window's sort key. Returns an
    * array of (cell_id, csim) structs; null when the vector is null,
    * holds a null element, or the table is empty.
    *
    * NULL-ELEMENT contract (ADVICE r13, intentional divergence from the
    * crossJoin+window spelling this kernel replaced — same family as
    * bandAssignments' NULL-vector contract): a vector containing a NULL
    * element returns NULL here and so drops out of cell assignment
    * entirely, whereas the old spelling still assigned such a vector a
    * home cell (every csim NULL, cell_id-asc tiebreak — i.e. always the
    * lowest cell id, a meaningless placement). A degenerate vector that
    * cannot be scored should not be probed or deduped against; the
    * corpus premise (no NULL elements in real embeddings) is what makes
    * the divergence observable only in hand-built fixtures.
    */
  def topCells(v: ArrayData, t: CentroidTable, k: Int): ArrayData = {
    if (v == null || t.size == 0) return null
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i)
      i += 1
    }
    var sv = 0.0
    i = 0
    while (i < n) { sv += x(i) * x(i); i += 1 }
    val nv = math.sqrt(sv)
    val kk = math.min(k, t.size)
    val topSim = new Array[Double](kk)
    val topId = new Array[Long](kk)
    var m = 0
    var c = 0
    while (c < t.size) {
      val cv = t.vecs(c)
      if (cv.length == n) { // length mismatch: that cell yields NULL sim
        var s = 0.0
        i = 0
        while (i < n) { s += x(i) * cv(i); i += 1 }
        val sim = s / (nv * t.norms(c))
        val id = t.ids(c)
        // displace iff strictly better under (sim desc, id asc); NaN
        // sorts ABOVE every double, matching Spark's descending order
        var pos = m
        while (pos > 0 && {
          val cmp = java.lang.Double.compare(sim, topSim(pos - 1))
          cmp > 0 || (cmp == 0 && id < topId(pos - 1))
        }) pos -= 1
        if (pos < kk) {
          val last = math.min(m, kk - 1)
          var j = last
          while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
          topSim(pos) = sim
          topId(pos) = id
          if (m < kk) m += 1
        }
      }
      c += 1
    }
    if (m == 0) return null
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = InternalRow(topId(i), topSim(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `array<double> -> array<struct<cell_id: long, csim: double>>`: the
  * vector's `nProbe` nearest centroids via [[CellEval.topCells]]. The
  * centroid table rides the expression (and thus the broadcast task
  * binary) as a reference object.
  */
case class TopCells(child: Expression, table: CentroidTable, nProbe: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell_id", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_cells"

  override protected def nullSafeEval(input: Any): Any =
    CellEval.topCells(input.asInstanceOf[ArrayData], table, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("centroidTable", table,
      classOf[CentroidTable].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.CellEval.topCells($v, $t, $nProbe);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** Column surface for the centroid-meet kernel. */
object CellOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def topCells(v: Column, table: CentroidTable, nProbe: Int): Column =
    ColumnBridge.column(TopCells(
      ColumnBridge.expression(v.cast("array<double>")), table, nProbe))
}
