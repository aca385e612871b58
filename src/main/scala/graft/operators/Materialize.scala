package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Once-per-invocation frame materialization (r18 verdict tasks #3–#6):
  * the q51 survivor-checkpoint pattern, factored out for every operator
  * whose plan consumes one frame from SEVERAL actions or branches.
  *
  * Why this exists: exchange reuse deduplicates identical subtrees only
  * WITHIN one physical plan — an operator that runs driver actions in a
  * loop (centroid/PQ trainers, argmax fetches) or fans one frame into
  * several plan branches re-executes the frame's full upstream per
  * consumer. r18 measured the spread alone REGRESSING exactly there
  * (q73 +0.43 s, q26 +0.26 s: every training action re-ran the spread
  * exchange), which is why the trainers stayed unspread. Materializing
  * the frame once per invocation removes the re-execution, and THEN the
  * r18 scan-parallelism floor can safely apply on top.
  *
  * Order is load-bearing: the spread repartition goes BELOW the
  * checkpoint (single-split scan → one exchange → blocks land already
  * `defaultParallelism`-wide), so consumers read spread blocks directly
  * — a respread ABOVE the checkpoint would re-execute its exchange per
  * action, the exact failure this helper removes. The spread key is the
  * r18 DETACHED key (`xxhash64(pk)`, never the raw key) so no downstream
  * aggregation exchange or self-join reuse point is deleted; it fires
  * only when the planned partition count under-fills the cluster, so at
  * lake scale the repartition is absent and only the checkpoint remains.
  *
  * This is WITHIN-invocation materialization, not cross-run caching:
  * every bench/oracle invocation rebuilds the frame from the parquet
  * inputs (the checkpoint lives and dies inside the timed region), and
  * the registry below releases a DISPLACED invocation's blocks as soon
  * as nothing can still read them — at most ONE reachable checkpoint per
  * (session, tag) no matter how many times a sweep re-runs the builder.
  *
  * Release is DEFERRED, not eager (r19 test catch): a temp view, a spec
  * twin, or any caller-held handle from an EARLIER invocation still
  * references the earlier LogicalRDD — releasing its blocks on re-invoke
  * made those frames throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (a
  * truncated-lineage checkpoint cannot recompute; observed live in
  * SqlSurfaceSpec's view-vs-twin hash comparisons). So a displaced
  * generation parks in a queue holding only a WEAK reference to its
  * checkpoint RDD, and its blocks are released on a later `once` call
  * once GC proves the frame unreachable — the same contract as Spark's
  * own ContextCleaner (which also unpersists GC'd persistent RDDs),
  * just prompt: the bench re-invokes builders hundreds of times per
  * sweep, so the sweep happens ~every query instead of "whenever the
  * cleaner thread polls its queue next".
  *
  * Kill-switch: `spark.graft.materialize=off` returns the frame
  * untouched (the pre-r19 plan, for A/B and for deployments that would
  * rather re-read a lake table than spend executor storage).
  */
private[graft] object Materialize {

  // release captures only the shared SparkContext and persistent-RDD ids;
  // ref is WEAK so a parked generation never keeps its own frame alive
  private final case class Displaced(
      ref: java.lang.ref.WeakReference[AnyRef], release: () => Unit)

  private final class SessionReg {
    val current = new java.util.concurrent.ConcurrentHashMap[String, Displaced]()
    val parked = new java.util.concurrent.ConcurrentLinkedQueue[Displaced]()
  }

  // WeakHashMap discipline (see Pipeline.outstanding): keys are sessions,
  // values must never strongly reference their key — Displaced holds the
  // RDD only weakly and the closures capture the context, never a Dataset.
  private val outstanding = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SessionReg]())

  /** Eagerly materialize `df` for this invocation; the previous
    * invocation's blocks under the same `tag` are released once they are
    * no longer reachable (see above). When `spreadKey` is given and the
    * planned partition count under-fills `defaultParallelism`, the rows
    * are hash-spread by the DETACHED `xxhash64(spreadKey)` before
    * materializing.
    */
  def once(tag: String, df: DataFrame, spreadKey: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get("spark.graft.materialize", "auto")
        .equalsIgnoreCase("off")) return df
    val dp = spark.sparkContext.defaultParallelism
    val spread = spreadKey match {
      case Some(k) if df.rdd.getNumPartitions < dp =>
        df.repartition(dp, xxhash64(k))
      case _ => df
    }
    val ck = spread.localCheckpoint(true)
    val sc = spark.sparkContext
    val ids = ColumnBridge.checkpointRddIds(ck)
    val reg = outstanding.computeIfAbsent(spark, _ => new SessionReg)
    // sweep: free every parked generation GC has proven unreachable
    val it = reg.parked.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (d.ref.get() == null) { d.release(); it.remove() }
    }
    val entry = Displaced(
      new java.lang.ref.WeakReference[AnyRef](
        ColumnBridge.checkpointRdd(ck).orNull),
      () => ColumnBridge.releaseCheckpointIds(sc, ids))
    val prev = reg.current.put(tag, entry)
    if (prev != null) {
      if (prev.ref.get() == null) prev.release() else reg.parked.add(prev)
    }
    ck
  }
}
