package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.Tables
import graft.functions.TextOps.words

/** Q85: distributed BPE vocabulary training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer
  * a training pipeline TRAINS on its own corpus before anything counts,
  * packs, or prices tokens. A training-inclusive operator in q73's class:
  * each invocation runs the merge loop; a deployment trains once and
  * ships the merge table.
  *
  * The scale decomposition is the whole point: the corpus contributes ONE
  * pass (the word-frequency table — vocabulary-bounded, the measured q64
  * saturation premise), and every merge round rides that VOCABULARY frame,
  * never the corpus:
  *
  *   1. count adjacent symbol pairs weighted by word frequency
  *      (vocab-sized explode → pair aggregate);
  *   2. pick the most frequent pair — ties break lexicographically on
  *      (left, right), so the merge table is total-order deterministic;
  *   3. apply the merge leftmost-greedy inside every word's symbol array
  *      (the classic "aaa" + (a,a) → [aa, a] fold), and go again.
  *
  * The argmax is a 1-row driver fetch per round and the merged pair is
  * folded back as a LITERAL — the q36/q73 training-loop shape (k tiny
  * sequential stages, flat in corpus size). Checkpoint hygiene: each
  * round's vocabulary frame is localCheckpoint'ed behind fresh stats (the
  * contraction-loop discipline), and because the published result is the
  * plain merge TABLE, every intermediate block is released before
  * returning — the loop leaves nothing pinned.
  *
  * No DuckDB oracle (the per-round argmax is iterative); BpeSpec pins the
  * merge table against the textbook fixture and against an independent
  * single-machine Scala replay of the full algorithm on the real corpus.
  */
object Bpe {

  def q85BpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainOn(Tables.load(spark, dir, "documents"), 10)

  /** Train `merges` BPE merges over the words of `docs(text)`; returns
    * (round, left, right, merged, pair_count) — round is 1-based merge
    * order, pair_count the weighted adjacency count that won the round.
    */
  def bpeTrainOn(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    // the one corpus-sized pass: word -> frequency, word -> chars
    val wf0 = docs.select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))
    var wf = ColumnBridge.freshStats(wf0.localCheckpoint(true))
    var ckIds = ColumnBridge.checkpointRddIds(wf)
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val top = wf.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val cnt = top(0).getLong(2)
        val m = l + r
        out += ((round, l, r, m, cnt))
        // leftmost-greedy merge: fold each word's symbols, replacing the
        // array's last element when (last, next) is the winning pair —
        // a fresh merged symbol never re-merges within the same round
        val mergedSyms = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc: Column, x: Column) =>
            when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(x))))
        val next = ColumnBridge.freshStats(
          wf.select(col("freq"), mergedSyms.as("syms")).localCheckpoint(true))
        ckIds = ckIds ++ ColumnBridge.checkpointRddIds(next)
        wf = next
      }
      round += 1
    }
    // the result is a plain local table — nothing in the loop needs to
    // stay materialized
    ColumnBridge.releaseCheckpointIds(sc, ckIds)
    import spark.implicits._
    out.result().toDF("round", "left", "right", "merged", "pair_count")
  }

  /** Q86: BPE tokenization — train the q85 merge table, then count each
    * document's BPE tokens with the codegen'd [[graft.functions.BpeTokens]]
    * kernel (the merge table is a k-row constant, shipped into the
    * generated code as a reference object — no per-row join, no
    * interpreted loop). The n_words column rides along so the
    * chars-per-token compression a tokenizer buys is a one-line SQL read.
    * Training-inclusive like q85/q73; a deployment trains once and
    * encodes with the shipped table.
    */
  def q86BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val flat = trainedMerges(docs, 10)
    docs.select(col("doc_id"),
      coalesce(size(words(col("text"))), lit(0)).cast("long").as("n_words"),
      graft.functions.BpeOps.bpeTokens(col("text"), flat).as("n_bpe_tokens"))
  }

  /** Train and flatten a rank-ordered merge table `[l0, r0, l1, r1, ...]`
    * — the literal the encode kernel ships.
    */
  private[graft] def trainedMerges(docs: DataFrame, merges: Int): Seq[String] =
    bpeTrainOn(docs, merges).collect()
      .sortBy(_.getInt(0))
      .flatMap(r => Seq(r.getString(1), r.getString(2))).toSeq
}
