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
    bpeTrainOn(Tables.loadSpread(spark, dir, "documents"), 10)

  /** Train `merges` BPE merges over the words of `docs(text)`; returns
    * (round, left, right, merged, pair_count) — round is 1-based merge
    * order, pair_count the weighted adjacency count that won the round.
    */
  def bpeTrainOn(docs: DataFrame, merges: Int): DataFrame =
    // the one corpus-sized pass: word -> frequency, word -> chars
    mergeLoop(docs.select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        filter(split(col("word"), ""), s => s =!= "").as("syms")), merges)

  /** The merge loop over any prepared `(freq, syms)` vocabulary frame —
    * shared by the character-level (q85) and byte-level (q123) trainers;
    * the alphabet is whatever `syms` holds.
    *
    * TWO regimes (r18 optimization; the PqTrainTarget/centroidTable
    * driver-side discipline applied to the merge rounds): the CORPUS
    * contributes exactly one distributed pass either way — the word-
    * frequency aggregation that produced `wf0`. The merge rounds ride the
    * VOCABULARY frame only, and a vocabulary that fits the driver
    * (`spark.graft.bpe.localVocabMax` rows, default 262144 — the q64
    * saturation premise made checkable: the probe is `limit(max+1)`, so
    * the regime is decided by the ACTUAL row count, never by assumption)
    * runs all rounds as plain local compute: zero extra jobs, where the
    * distributed loop paid ~2 driver-job latencies per round (argmax
    * fetch + vocabulary re-checkpoint; profiled at 1.9 s wall for 10
    * rounds of sub-3-KiB shuffles at sf0.1, OPTIMIZATION_r18.md). Above
    * the cap the distributed loop below is UNCHANGED — same argmax, same
    * leftmost-greedy fold, vocabulary never collected.
    *
    * The local replay is exact, not approximate: pair counts are the
    * same freq-weighted adjacency sums, the argmax tie-break compares
    * UTF-8 BYTES (Spark string order is UTF8String binary order —
    * Scala's String.compareTo orders UTF-16 code units, which differs
    * for supplementary characters), and the merge fold is the identical
    * no-remerge leftmost-greedy scan. BpeSpec's independent replay and
    * the q85/q86/q123 oracles gate both regimes.
    */
  private def mergeLoop(wf0: DataFrame, merges: Int): DataFrame = {
    val spark = wf0.sparkSession
    val localMax = spark.conf.get("spark.graft.bpe.localVocabMax",
      (1 << 18).toString).toInt
    // checkpoint FIRST, probe the checkpoint (r18 verdict task #8): the
    // bare probe's limit(max+1) executes the full corpus word-frequency
    // aggregation and discards it, and in the above-cap regime
    // distributedMergeLoop then recomputed the SAME aggregation into its
    // own checkpoint — one wasted corpus pass at exactly the scale that
    // must pay only one. Both regimes now materialize wf0 exactly once;
    // the probe (and, above the cap, every merge round) reads the
    // checkpointed blocks. The q96/CC discipline: probe only frames that
    // are already materialized.
    val sc = spark.sparkContext
    val wfCk = ColumnBridge.freshStats(wf0.localCheckpoint(true))
    val ckIds = ColumnBridge.checkpointRddIds(wfCk)
    val probe = wfCk.limit(localMax + 1).collect()
    if (probe.length <= localMax) {
      // the collected rows are driver objects — the blocks can go now
      ColumnBridge.releaseCheckpointIds(sc, ckIds)
      val vocab = probe.map(r =>
        (r.getLong(0), r.getSeq[String](1).toArray))
      return localMergeLoop(spark, vocab, merges)
    }
    try distributedMergeLoop(spark, wfCk, merges)
    finally ColumnBridge.releaseCheckpointIds(sc, ckIds)
  }

  /** UTF-8 byte order — the exact comparator behind Spark's string
    * sort (UTF8String.compareTo): unsigned byte-wise, shorter-is-less
    * on a shared prefix.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The in-driver merge rounds over a collected vocabulary — value-
    * identical to [[distributedMergeLoop]] by construction (same counts,
    * same UTF-8 tie order, same no-remerge fold).
    */
  private def localMergeLoop(spark: SparkSession,
                             vocab0: Array[(Long, Array[String])],
                             merges: Int): DataFrame = {
    var vocab = vocab0
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val cnt = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (f, s) =>
        var i = 0
        while (i < s.length - 1) {
          cnt.merge((s(i), s(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        val it = cnt.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val k = e.getKey
          if (best == null || e.getValue > best._2 ||
            (e.getValue == best._2 &&
              (utf8Lt(k._1, best._1._1) ||
                (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))
            best = (k, e.getValue)
        }
        val ((l, r), c) = best
        val m = l + r
        out += ((round, l, r, m, c))
        vocab = vocab.map { case (f, s) =>
          if (s.length < 2) (f, s)
          else {
            val b = Array.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
                b += m; i += 2
              } else { b += s(i); i += 1 }
            }
            (f, b.result())
          }
        }
      }
      round += 1
    }
    import spark.implicits._
    out.result().toDF("round", "left", "right", "merged", "pair_count")
  }

  /** The distributed rounds over an ALREADY-CHECKPOINTED vocabulary frame
    * (mergeLoop materialized and probed it; the caller releases that
    * initial checkpoint — this loop releases only the rounds' own).
    */
  private def distributedMergeLoop(spark: SparkSession, wf0: DataFrame,
                                   merges: Int): DataFrame = {
    val sc = spark.sparkContext
    var wf = wf0
    var ckIds = Seq.empty[Int]
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
    val docs = Tables.loadSpread(spark, dir, "documents")
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

  // ---------------------------------------------------------------- q123

  /** Byte-level BPE training — the GPT-2-class rung above q85's
    * word-level trainer (Radford et al. 2019 §2.2): pre-tokenize with a
    * regex (case kept, whitespace runs are tokens too), then merge over
    * the UTF-8 BYTES of each pre-token, so the base alphabet is the 256
    * byte values and EVERY string — any language, emoji, binary-ish
    * junk — is representable with zero OOV (the byte-fallback property
    * word-level lacks). Symbols are carried as 2-hex-char strings
    * ("61", "6162", ...) so the q85 merge loop applies unchanged and
    * concatenation stays unambiguous at fixed 2-char granularity.
    *
    * The pre-tokenizer ([[graft.functions.ByteBpeEval.PreTok]]) diverges
    * from GPT-2's in two stated ways: no English contraction splits
    * ('s/'t/...) and no whitespace lookahead — both need constructs or
    * language-specific tables outside what a cross-engine oracle can
    * replay (RE2 has no lookahead); the classes are spelled in explicit
    * ASCII so Java and RE2 agree on every byte, with non-ASCII runs
    * falling to the "other" class where byte-fallback handles them.
    *
    * Same scale decomposition as q85: one corpus pass builds the
    * pre-token frequency frame (vocabulary-bounded), every merge round
    * rides the vocabulary, the argmax is a 1-row fetch.
    */
  def byteBpeTrainOn(docs: DataFrame, merges: Int): DataFrame = {
    val pre = regexp_extract_all(col("text"),
      lit(graft.functions.ByteBpeEval.PreTok), lit(0))
    val hexCol = hex(encode(col("tok"), "UTF-8"))
    mergeLoop(docs.select(explode(pre).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        transform(sequence(lit(1), octet_length(col("tok"))),
          i => hexCol.substr(i * 2 - 1, lit(2))).as("syms")), merges)
  }

  /** Q123: byte-level BPE tokenization — train [[byteBpeTrainOn]]'s merge
    * table (training-inclusive, the q85/q86 discipline), then stat every
    * document with the codegen'd constant-table kernel
    * [[graft.functions.ByteBpeTokens]]: pre-token count and byte-BPE
    * token count in one narrow pass, `n_bytes` alongside so the
    * bytes-per-token compression the tokenizer buys is a one-line read.
    * Zero joins, zero exchanges at encode time.
    */
  def q123ByteBpe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val flat = byteBpeTrainOn(docs, 10).collect()
      .sortBy(_.getInt(0))
      .flatMap(r => Seq(r.getString(1), r.getString(2))).toSeq
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      graft.functions.BpeOps.byteBpeStats(col("text"), flat).as("_s"))
      .select(col("doc_id"), col("n_bytes"),
        coalesce(col("_s").getItem(0), lit(0L)).as("n_pretoks"),
        coalesce(col("_s").getItem(1), lit(0L)).as("n_bpe_tokens"))
  }
}
