package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps.words

/** Lexical retrieval over the corpus — the serving-side read a curation
  * team runs against its own lake ("which documents match this query, and
  * how strongly") and the classic quality probe for dedup/boilerplate work
  * (a corpus whose top-10 for every query is near-identical documents has
  * a dedup problem). BM25 (Robertson/Sparck Jones; the Lucene-default
  * scoring) with the standard smoothed IDF.
  */
object Retrieval {

  /** BM25 free parameters — Lucene's defaults, as DOUBLE literals on both
    * sides (the oracle spells `CAST(1.2 AS DOUBLE)`): both engines bind
    * the IEEE754 double nearest the same decimal literal, so the
    * constants are bit-identical. A bare SQL `1.2` would be a DECIMAL
    * literal with engine-specific precision arithmetic — the q81 weight
    * lesson in another costume.
    */
  private val K1 = 1.2
  private val B = 0.75

  /** The q83 query table: fixed keyword queries over the synthetic
    * vocabulary, including a nowhere-occurring term (contributes nothing,
    * never NaN/NULL poison) and single- vs multi-term shapes.
    */
  private[graft] val Queries: Seq[(Int, String)] = Seq(
    (1, "merge join"), (2, "slow table scan"), (3, "fast value"),
    (4, "line column"), (5, "zzzunseen merge"))

  /** Q83: BM25 top-10 per query over `documents`. */
  def q83Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bm25TopKOn(Tables.load(spark, dir, "documents"),
      Queries.toDF("query_id", "qtext"))
  }

  /** BM25 top-k of `docs` for each row of `queries(query_id, qtext)`.
    *
    * The scale shape is SELECTIVE retrieval: the query-term dimension is
    * broadcast and filters the token stream BEFORE any wide operation, so
    * the only corpus-sized work is the narrow scan itself — matched
    * instances (corpus_rows × query-term selectivity) are what shuffles.
    * Per-document length is computed as a narrow `size(words(text))`
    * column (never a token-explode groupBy — same answer, one less
    * corpus-wide exchange); only TERM-cardinality frames broadcast (df,
    * the query table, the 1-row global) while the matched-tf ⋈ length
    * meet shuffles on doc_id — matched volume is a corpus fraction for a
    * common query term, exactly what must never be collected to the
    * driver; the final top-k is a per-query window that plans as
    * WindowGroupLimit.
    *
    * Determinism discipline: each (query, doc, term) score is rounded to
    * 6 dp and cast DECIMAL(18,6) BEFORE the per-doc sum (q64's rule:
    * double sums are aggregation-order-dependent), ranking orders by the
    * EXACT decimal score with doc_id as the total tiebreak, and only the
    * published column casts back to double.
    */
  def bm25TopKOn(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    // narrow per-doc length + the 1-row global stats (q41's broadcast)
    val dl = docs.select(col("doc_id"),
      coalesce(size(words(col("text"))), lit(0)).cast("long").as("dl"))
    val global = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    // query-term instances only: broadcast-filter the token stream first
    val matched = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .join(broadcast(qterms.select("term").distinct()), "term")
    val tf = matched.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // broadcast ONLY term-cardinality frames (df, the query table, the
    // 1-row global): tf is matched-instance-sized, which for a
    // high-document-frequency query term is a corpus FRACTION — a tf
    // broadcast that works on the bench corpus OOMs the driver at 100 TB.
    // The tf ⋈ dl meet shuffles on doc_id, the volume the query actually
    // selects.
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(global))
      .select(col("query_id"), col("doc_id"),
        round(
          log((col("n_docs").cast("double") - col("df") + 0.5) /
            (col("df").cast("double") + 0.5) + 1.0) *
            (col("tf").cast("double") * (lit(K1) + 1.0)) /
            (col("tf").cast("double") + lit(K1) *
              (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") *
                col("n_docs") / col("total_dl"))), 6)
          .cast("decimal(18,6)").as("s"))
      .groupBy("query_id", "doc_id").agg(sum("s").as("score_d"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_d").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("doc_id"), col("score_d").cast("double").as("score"))
  }

  /** Q156: inverted-index postings build — the LAYOUT op lexical
    * retrieval serves from (q83 scores ad hoc; a production index
    * materializes postings ONCE and every query reads them): per
    * term, document frequency, collection frequency, the top
    * document by term frequency (ties to the smallest doc_id — the
    * skew-safe min-struct, q151's discipline), and the postings list
    * itself as a doc_id-ordered `doc:tf` digest.
    *
    * Scale shape: `groupBy(term, doc)` keeps map-side combine (a
    * hot term's per-doc rows collapse before the exchange); the
    * per-term roll-up's collect_list is df-SIZED BY DESIGN — the
    * postings list IS the operator's output, exactly what an index
    * shard stores; at 100 TB the term dimension range-partitions
    * into shards (q80/q89's layout family) and each shard's lists
    * stay worker-local.
    */
  def q156PostingsBuild(spark: SparkSession, dir: String): DataFrame =
    postingsOn(Tables.load(spark, dir, "documents"))

  /** The q156 computation over any (doc_id, text) frame. */
  def postingsOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum("tf").as("cf"),
        min(struct((-col("tf")).as("negtf"), col("doc_id").as("doc_id")))
          .as("w"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat(s.getField("doc_id").cast("string"), lit(":"),
              s.getField("tf").cast("string"))), ",").cast("binary"))
          .as("postings_md5"))
      .select(col("term"), col("df"), col("cf"),
        col("w.doc_id").as("top_doc"),
        (-col("w.negtf")).as("top_tf"),
        col("postings_md5"))
  }
}
