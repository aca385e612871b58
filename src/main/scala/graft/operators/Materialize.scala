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
  * the registry below releases the previous invocation's blocks on
  * re-invoke exactly like `Pipeline.outstanding` — at most ONE
  * outstanding checkpoint per (session, tag) no matter how many times a
  * sweep re-runs the builder.
  *
  * Kill-switch: `spark.graft.materialize=off` returns the frame
  * untouched (the pre-r19 plan, for A/B and for deployments that would
  * rather re-read a lake table than spend executor storage).
  */
private[graft] object Materialize {

  // WeakHashMap discipline (see Pipeline.outstanding): keys are sessions,
  // values must never strongly reference their key — release closures
  // capture only the shared SparkContext and persistent-RDD ids.
  private val outstanding = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, () => Unit]]())

  /** Eagerly materialize `df` for this invocation, releasing the previous
    * invocation's blocks registered under the same `tag`. When
    * `spreadKey` is given and the planned partition count under-fills
    * `defaultParallelism`, the rows are hash-spread by the DETACHED
    * `xxhash64(spreadKey)` before materializing.
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
    val release: () => Unit = () => ColumnBridge.releaseCheckpointIds(sc, ids)
    val m = outstanding.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, () => Unit]())
    val prev = m.put(tag, release)
    if (prev != null) prev()
    ck
  }
}
