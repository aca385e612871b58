package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 moved the converters (`classic.ExpressionUtils`) behind
  * `private[sql]`, so third-party expression libraries host this two-line
  * bridge inside the `org.apache.spark.sql` namespace — the established
  * pattern for Spark-native extension libraries. Nothing else in graft
  * lives outside the `graft` package, and nothing here touches behavior:
  * these are pure wrappers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrap a (typically checkpointed) DataFrame's execution RDD in a fresh
    * `LogicalRDD` carrying DEFAULT size statistics instead of the stats
    * rewritten from its originating plan.
    *
    * Why: `localCheckpoint` preserves the origin plan's estimated
    * `sizeInBytes` via `rewriteStatsAndConstraints`, and a join's estimate
    * is the PRODUCT of its children's. In an iterative self-join
    * (connected components' pointer jump) the checkpointed estimate
    * therefore feeds back into itself multiplicatively — the BigInt's
    * digit count doubles every round, and after ~15 rounds the driver
    * spends minutes multiplying million-digit numbers inside
    * `SizeInBytesOnlyStatsPlanVisitor` (observed live in a bench thread
    * dump). Resetting to default stats each round keeps every product
    * bounded. The default (`spark.sql.defaultSizeInBytes`, Long.Max) is
    * conservatively large, which only disables auto-broadcast for the
    * tiny in-loop joins — correct and cheap.
    */
  def freshStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Eagerly release the block-manager storage behind a `localCheckpoint`ed
    * DataFrame. `Dataset.unpersist` only uncaches through the CacheManager,
    * which never saw a checkpoint (persistence lives on the internal RDD
    * inside the `LogicalRDD` node) — without this, iterative algorithms
    * leave every round's materialized frame in storage until the RDD chain
    * happens to be garbage collected, which at full scale means rounds of
    * edge-set-sized blocks pinned in executor memory.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** The persistent-RDD ids behind a `localCheckpoint`ed DataFrame — the
    * session-free half of [[releaseCheckpoint]]: an (id, SparkContext) pair
    * can release the storage later WITHOUT holding the Dataset (and through
    * it the owning SparkSession) alive. A registry keyed weakly on the
    * session MUST release through ids: per WeakHashMap's documented
    * semantics, a value that strongly refers to its own key is never
    * reclaimed, and a Dataset strongly refers to its session.
    */
  def checkpointRddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
  }

  /** The checkpoint RDD OBJECT behind a `localCheckpoint`ed DataFrame —
    * the reachability handle a deferred-release registry tracks weakly:
    * every frame that can still read the checkpoint (temp views, spec
    * twins, caller-held Datasets) strongly references this object through
    * its `LogicalRDD`, so "the weak ref cleared" is exactly "no plan can
    * touch these blocks anymore" (the contract ContextCleaner uses).
    */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame): Option[AnyRef] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
  }

  /** Release checkpoint storage by persistent-RDD id on the SHARED context.
    * A no-op for ids already unpersisted (or collected) — the idempotence
    * that makes a deferred/registry-driven release safe to run late.
    */
  def releaseCheckpointIds(sc: org.apache.spark.SparkContext, ids: Seq[Int]): Unit =
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

  /** The ANSI DIVIDE_BY_ZERO error Catalyst's `Divide` raises — hosted
    * here because `QueryExecutionErrors` is `private[sql]` in Spark 4.
    * [[graft.functions.BucketDupPairs]] raises it to stay bit-identical
    * with the SQL division it replaces on zero-norm vectors.
    */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)

  /** A session clone: shares the SparkContext and SharedState (so cached
    * data, checkpoint blocks, and the warehouse are common) but carries an
    * independent COPY of the SessionState — runtime confs, temp views,
    * registered functions. Conf changes on the clone are invisible to the
    * parent, which is exactly what an iterative operator that wants
    * codegen/AQE/shuffle-partition toggles needs on a shared session.
    * `cloneSession` is `private[sql]` in Spark 4, hence hosted here.
    */
  def sessionClone(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Rebind a DataFrame's analyzed plan onto another session (typically a
    * `sessionClone`, or back to the caller), so that all DOWNSTREAM
    * planning and execution read that session's conf. Analysis is
    * idempotent on a resolved plan, and leaf nodes (file relations,
    * `LogicalRDD`) carry their data independent of the session.
    */
  def rebind(spark: org.apache.spark.sql.SparkSession,
             df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.analyzed)
}
