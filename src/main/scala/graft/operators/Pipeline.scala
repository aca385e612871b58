package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps.words

/** The composed end-to-end corpus pipeline — the product the individual
  * operator families exist for (the reference IS a pipeline:
  * /root/reference/README.md:10-25 chains ingest → clean → serve; a
  * training-corpus deployment chains the same shapes over documents).
  *
  * Every stage reuses the SAME column expressions / frame-parameterized
  * operators its standalone contract query is built from
  * (Text.qualityScore = q28, Text.shingles8 = q45, Dedup.lshPairsOn +
  * connectedComponents = q35/q37, Text.synthContacts/scrubPii = q46,
  * Text.quotaKeep = q42, the q43 packing window), in lockstep with
  * Oracles.corpusPipeline, whose CTE chain is generated from the same
  * builders as the standalone oracles — neither side can drift alone.
  */
object Pipeline {

  /** Q51: quality gate → holdout decontamination → exact dedup → LSH
    * near-dup components → PII scrub → quota sample → token packing →
    * survivor-frame TF-IDF top terms. Output: one manifest row per
    * surviving doc with its packed-bin assignment over the SCRUBBED text
    * and its rank-ordered relevance terms (df/N over the survivor frame).
    *
    * Packing semantics are q43's cumsum formulation (bin =
    * floor(exclusive-running-token-total / budget), per-source window) —
    * NOT stateful greedy binning: a document may straddle a bin boundary,
    * which is how offline packers batch when oversized docs are pre-split
    * (q43's documented contract). The oracle's floor(off / 512) matches
    * bit-for-bit at corpus scale: off ≤ Σ n_tokens stays far below 2^53,
    * so DuckDB's DOUBLE division is exact (the q43/q50 oracles already
    * rely on this; the type audit pins the HUGEINT cast-back class).
    *
    * Scale shape: stages 1/5/6 are narrow per-row work that fuses into
    * the scans; the wide operations are the holdout shingle join (keyed
    * by 8-gram, holdout side broadcast — benchmark-sized by definition),
    * the content-hash groupBy (uniform md5 keys), the LSH band self-join
    * (uniform band hashes, q35's plan), and the contraction loop
    * (O(log n) rounds, edge set shrinks monotonically). The survivor set
    * is checkpointed ONCE and feeds both the pair generation and the
    * final keep-join, so stages 1-3 run once, not per consumer — at
    * cluster scale the same role is played by persisting the survivor
    * table to storage between pipeline phases.
    */
  /** Stages 1-3 (quality gate → decontamination → exact dedup) as ONE
    * un-materialized plan — split out so PlanAuditSpec can audit the
    * physical shape (broadcast holdout, windowed keep rule) that q51's
    * eager checkpoint otherwise hides behind a LogicalRDD scan.
    */
  private[graft] def survivorPlan(
      docs: DataFrame,
      holdout: Column = col("source").isin("src18", "src19"),
      qualityFloor: Double = 0.7): DataFrame = {

    // 1. quality gate (q28's formula) over the train split
    val qual = docs.filter(!holdout)
      .withColumn("quality", Text.qualityScore(col("text")))
      .filter(col("quality") >= qualityFloor)

    // 2. decontamination (q45): drop any train doc sharing an 8-word
    //    shingle with the holdout split
    val holdSh = Text.shingles8(docs.filter(holdout)).select("sh8").distinct()
    val contam = Text.shingles8(qual)
      .join(broadcast(holdSh), "sh8")
      .select("doc_id").distinct()
    val clean = qual.join(contam, Seq("doc_id"), "left_anti")

    // 3. exact dedup (q21's keep rule): min doc_id per content hash —
    //    ONE content-hash-partitioned window over `clean` (a single wide
    //    shuffle), not groupBy + keep-join: the join formulation derives
    //    `clean` (and its decontamination shingle join) once per branch,
    //    and at corpus scale the keep set outgrows a broadcast, turning
    //    the join into a second wide shuffle
    val wDup = Window.partitionBy(md5(col("text")))
    clean.withColumn("_keep", min("doc_id").over(wDup))
      .filter(col("doc_id") === col("_keep"))
      .select("doc_id", "source", "lang", "quality", "text")
  }

  /** The last invocation's survivor-checkpoint release handle, per
    * session: `corpusPipelineOn` retires it on re-invoke (below), so a
    * caller that rebuilds the manifest repeatedly — Bench runs the
    * builder 1 warmup + reps + variance-retry times per sweep — pins at
    * most ONE survivor-sized block instead of one per run.
    * `Dataset.unpersist` cannot free checkpoint storage (it lives outside
    * the CacheManager), and an evicted localCheckpoint block is
    * unrecoverable, so an unbounded accumulation is a genuine
    * session-lifetime leak at corpus scale.
    */
  // weak keys: the registry must never keep a retired SparkSession (and
  // its SessionState) reachable — the entry dies with the session, and its
  // checkpoint storage is reclaimed by the ContextCleaner with the session.
  // CRITICAL: the values release through (SparkContext, rdd-id) pairs, NOT
  // through the checkpointed Dataset — per WeakHashMap's documented
  // semantics a value that strongly refers to its own key is never
  // reclaimed, and a Dataset strongly refers to its session; a
  // Dataset-capturing closure here would pin every retired session (plus
  // its last survivor checkpoint) for the process lifetime.
  private val outstanding = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, () => Unit]())

  /** The library entry point: the full pipeline over ANY
    * (doc_id, source, lang, text) frame, parameterized on the holdout
    * predicate, quality floor, quota salt, packing budget, and the scrub
    * transform (a deployment scrubs its own text; the q51 contract
    * instantiation synthesizes PII from doc_id first, as q46 does, so the
    * scrub stage has real positives to remove).
    *
    * Lifecycle contract: each call RETIRES the previous call's survivor
    * checkpoint on the same session — safe whenever invocations are
    * consumed sequentially (the Verify/Bench/SQL-view contexts). Callers
    * that need several live manifests on one session use
    * `corpusPipelineHandled` and drain each handle themselves.
    */
  def corpusPipelineOn(
      docs: DataFrame,
      holdout: Column = col("source").isin("src18", "src19"),
      qualityFloor: Double = 0.7,
      quotaSalt: String = "q51|",
      budget: Long = 512L,
      scrub: Column => Column = Text.scrubPii,
      topTermsK: Int = 3): DataFrame = {
    val (out, release) =
      corpusPipelineHandled(docs, holdout, qualityFloor, quotaSalt, budget,
        scrub, topTermsK)
    val prev = outstanding.put(docs.sparkSession, release)
    if (prev != null) prev()
    out
  }

  /** `corpusPipelineOn` plus the survivor checkpoint's release handle.
    * Call the handle once the manifest (and anything derived from it) has
    * been fully consumed; the manifest must not be re-executed afterwards
    * — its lineage is truncated at the released block.
    */
  def corpusPipelineHandled(
      docs: DataFrame,
      holdout: Column = col("source").isin("src18", "src19"),
      qualityFloor: Double = 0.7,
      quotaSalt: String = "q51|",
      budget: Long = 512L,
      scrub: Column => Column = Text.scrubPii,
      topTermsK: Int = 3): (DataFrame, () => Unit) = {

    // materialize the survivors once — consumed by BOTH the near-dup pair
    // generation and the final keep-join below; without this, stages 1-3
    // (scan + shingle join + dedup window) replay per consumer
    val exdedupCk = survivorPlan(docs, holdout, qualityFloor).localCheckpoint(true)
    val ckFresh = org.apache.spark.sql.graft.ColumnBridge.freshStats(exdedupCk)
    // r18 parallelism floor (the Tables.loadSpread rule applied to the
    // checkpoint): AQE coalesces the survivor frame's closing shuffle to
    // ONE partition at small corpus sizes, which serialized the entire
    // downstream half of the pipeline — LSH pair generation, TF-IDF,
    // packing — into ~10 sequential single-task jobs (profiled ~1.9 s at
    // sf0.1). When the checkpoint under-fills the cluster, respread it by
    // a DETACHED key (consumers re-run this exchange from the checkpoint,
    // a few thousand rows — never the survivor plan itself); at corpus
    // scale the checkpoint already carries ≥ cores partitions and the
    // condition never fires.
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    // r19: CHECKPOINT THE RESPREAD TOO. The bare repartition above the
    // checkpoint re-executed its exchange once per consumer — profiled as
    // ~4 back-to-back single-task ~0.3 s map-side jobs (the survivor
    // frame re-read per consumer) before the pair generation, the
    // TF-IDF branches, and the keep-join each time. Materializing the
    // spread copy costs one extra survivor-sized write (few MB at sf0.1;
    // at corpus scale the under-fill condition is false and neither the
    // respread nor this second checkpoint exists) and makes every
    // consumer read 32-way blocks directly. The first checkpoint's
    // blocks release immediately — only the spread copy stays.
    val (exdedup, liveCkIds) = if (ckFresh.rdd.getNumPartitions < dp) {
      val spreadCk = ckFresh.repartition(dp, xxhash64(col("doc_id")))
        .localCheckpoint(true)
      val spreadIds =
        org.apache.spark.sql.graft.ColumnBridge.checkpointRddIds(spreadCk)
      org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint(exdedupCk)
      (org.apache.spark.sql.graft.ColumnBridge.freshStats(spreadCk), spreadIds)
    } else
      (ckFresh,
        org.apache.spark.sql.graft.ColumnBridge.checkpointRddIds(exdedupCk))

    // 4. LSH near-dup components over the survivors (q22/q35/q37's exact
    //    scheme, frame-parameterized): keep singletons (no candidate
    //    pair → null cluster) and each component's minimum
    val clus = Dedup.connectedComponents(
      Dedup.lshPairsOn(exdedup.select("doc_id", "text")))
    val nearded = exdedup.join(clus, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))

    // 5. PII scrub
    val scrubbed = nearded.select(col("doc_id"), col("source"), col("lang"),
      col("quality"), scrub(col("text")).as("scrubbed"))

    // 6. per-language quota sample (q42's hash threshold; the salt keeps
    //    this stage's draw independent of any other sampling stage)
    val samp = scrubbed.filter(
      Text.quotaKeep(col("doc_id"), col("lang"), quotaSalt))

    // 7. token packing (q43's per-source window) over the SCRUBBED text
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = samp
      .select(col("doc_id"), col("source"), col("lang"), col("quality"),
        size(words(col("scrubbed"))).cast("long").as("n_tokens"))
      .withColumn("off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("lang"), col("quality"),
        col("n_tokens"),
        (col("off") % budget).as("bin_offset"),
        floor(col("off") / budget).as("bin"))

    // 8. TF-IDF relevance terms (q41's operator, frame-parameterized) —
    //    ANOTHER consumer of the one survivor checkpoint: df and N span
    //    EVERY survivor, not the quota-sampled manifest subset (sampling
    //    before computing IDF would bias every score by the sample rate),
    //    while the left join pays only for manifest rows. The terms
    //    aggregate to a rank-ordered comma string via an explicit
    //    array_sort (collect_list order is not deterministic under
    //    distributed aggregation).
    val terms = Text.tfIdfTopTermsOn(exdedup.select("doc_id", "text"), topTermsK)
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(
            struct((-col("score")).as("_ns"), col("term").as("term")))),
          e => e.getField("term")),
        ",").as("top_terms"))
    val manifest = packed.join(terms, Seq("doc_id"), "left")
    // the handle captures only the SHARED SparkContext and the persistent
    // RDD ids — no path back to the session, so the weak registry above
    // (and any caller-held handle) can outlive the session harmlessly
    val sc = docs.sparkSession.sparkContext
    (manifest,
      () => org.apache.spark.sql.graft.ColumnBridge.releaseCheckpointIds(sc, liveCkIds))
  }

  /** Q51's scrub stage: q46's PII synthesis ahead of the redaction, so the
    * scrub has real positives to remove — shared between the contract
    * query and the `vw_corpus_manifest` SQL view so neither can drift.
    */
  private[graft] val q51Scrub: Column => Column =
    t => Text.scrubPii(Text.synthContacts(col("doc_id"), t))

  /** Q51: the contract instantiation over `documents` — defaults
    * everywhere, plus the q46 PII synthesis ahead of the scrub (in
    * lockstep with Oracles.corpusPipeline).
    */
  def q51CorpusPipeline(spark: SparkSession, dir: String): DataFrame =
    // materialize the spread corpus once (r19): the survivor plan's
    // quality branch, holdout-shingle branch, and decontamination-shingle
    // branch each re-ran the scan + spread exchange map side (profiled as
    // three back-to-back ~0.6 s single-task jobs at sf0.1)
    corpusPipelineOn(Materialize.once("q51.docs",
      Tables.loadSpread(spark, dir, "documents")), scrub = q51Scrub)
}
