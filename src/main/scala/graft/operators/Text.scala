package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting).
  * Everything is per-row narrow work (no shuffle) except the final
  * aggregates, so these scale linearly with input splits.
  */
object Text {

  /** Q17: per-language corpus stats. */
  def q17TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        sum("n_chars").as("total_chars"),
        max(length(col("text"))).as("max_len"))

  /** Q20: exact distinct (the count-level dedup check). */
  def q20DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("total"),
        countDistinct(col("text")).as("distinct_texts"))

  /** Q27: marker-word language ID. A real deployment swaps the marker
    * table; the contract pins the scoring+argmax semantics (deterministic
    * tie-break by score order en>de>es>fr>zh).
    */
  /** The marker tables + argmax over an ARBITRARY text column — factored
    * so the document-level (q27) and line-level (q110) judgments share
    * one scoring spelling and cannot drift.
    */
  private[operators] def detectedLang(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def score(markers: Seq[String]) =
      markers.map(m => occurrences(padded, " " + m + " ")).reduce(_ + _)
    val sEn = score(Seq("the", "a", "of"))
    val sDe = score(Seq("der", "und", "die"))
    val sEs = score(Seq("el", "la", "los"))
    val sFr = score(Seq("le", "les", "des"))
    val sZh = score(Seq("的", "是"))
    val best = greatest(sEn, sDe, sEs, sFr, sZh)
    when(sEn === best, "en").when(sDe === best, "de")
      .when(sEs === best, "es").when(sFr === best, "fr")
      .otherwise("zh")
  }

  def q27LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"), detectedLang(col("text")).as("detected"))

  /** The q28 quality score (rounded to 6 dp) over any text column — shared
    * with the q51 pipeline's gate stage so the formula cannot drift.
    */
  private[graft] def qualityScore(text: Column): Column =
    // NULL text is explicitly ungradeable: without the outer guard, BOTH
    // null terms get skipped by least and a NULL document "scores" a
    // perfect 1.0 — the one value it must never get
    when(text.isNotNull,
      round(least(lit(1.0), size(words(text)).cast("double") / 50.0) * 0.5 +
        least(lit(1.0), avgTokenLen(text) / 5.0) * 0.5, 6))

  /** The guarded avg-token-length expression, shared by q28's column and
    * the quality score so the zero-token policy lives in ONE place: the
    * division is GUARDED, not left to the engine — legacy mode nulls x/0
    * but ANSI mode (Spark 4's default) THROWS, turning one empty
    * document into a query-crashing corpus landmine. The guarded NULL
    * then flows through `least`, which skips nulls, so token-less text
    * deterministically scores the avg-length ceiling's 0.5 (the q28
    * oracle agrees: DuckDB nulls the division and skips nulls in least
    * the same way).
    */
  private def avgTokenLen(text: Column): Column = {
    val nTokens = size(words(text))
    when(nTokens > 0,
      length(replace(text, lit(" "), lit(""))).cast("double") / nTokens)
  }

  /** Q28: quality scoring from length/token statistics
    * (training-data filtering primitive).
    */
  def q28Quality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"), size(words(col("text"))).as("n_tokens"),
      round(avgTokenLen(col("text")), 6).as("avg_token_len"),
      qualityScore(col("text")).as("quality"))

  /** Q29: whitespace + BPE-ish regex token counts. */
  def q29TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(words(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_bpe_tokens"))

  /** Q30: whitespace-normalized md5 document fingerprint — the exact-dup
    * key for content-defined dedup at scale.
    */
  def q30Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"), contentFingerprint(col("text")).as("fp"))

  /** Q41: per-document top-3 TF-IDF terms — the relevance-term extraction
    * step of a corpus pipeline. Document frequency and N span the FULL
    * corpus (that is what makes it IDF); only the per-document side is
    * id-bounded so the contract output stays fixed-size across scale
    * factors. Shape at scale: tf is one shuffle keyed by (doc_id, term),
    * df one shuffle keyed by term (bounded by vocabulary, naturally
    * skew-resistant after the per-doc distinct), N a broadcast scalar —
    * the df join is vocabulary-sized, NOT corpus-sized, and the window
    * partitions by doc_id. Scores are rounded to 6 places BEFORE ranking
    * so the ordering is engine-portable (same trick as q19).
    */
  def q41TfIdfTopTerms(spark: SparkSession, dir: String): DataFrame =
    tfIdfTopTermsOn(Tables.load(spark, dir, "documents"), 3,
      tfBound = col("doc_id") < 100)

  /** The TF-IDF computation over any (doc_id, text) frame — the
    * `minHashBandsOn` pattern, so a composed pipeline (q51-style) can
    * extract relevance terms from its own survivor set. `tfBound`
    * restricts only the PER-DOCUMENT side (q41's contract bound keeps its
    * output fixed-size across scale factors); document frequency and N
    * always span the full frame — that is what makes it IDF.
    */
  def tfIdfTopTermsOn(docs: DataFrame, k: Int,
                      tfBound: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    val tf = toks.filter(tfBound)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = docs
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "term", "tf", "df", "score")
  }

  /** Q43: sequence packing — assign documents to fixed-token-budget bins
    * for training-batch assembly. Packing is per `source` shard (the unit
    * a real pipeline packs independently), so the cumulative sum
    * parallelizes across shards instead of forcing a global single
    *-partition window; within a shard the order is doc_id (deterministic).
    * Bin id = floor(exclusive-running-token-total / budget): the cumsum
    * formulation (vs stateful greedy) is what stays a pure window
    * expression on any engine, and is how offline packers batch when
    * oversized docs are pre-split. Output carries the running total so a
    * consumer can also recover each doc's offset inside its bin.
    */
  def q43PackBins(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 512L // tokens per packed sequence
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("offset") % budget).as("bin_offset"),
        floor(col("offset") / budget).as("bin"))
  }

  /** Q50: pack ASSEMBLY — materializes the sequences q43 assigns: the
    * documents of each (source, bin) concatenated in doc_id order, plus
    * the bin's token total and member count. Same per-shard window as
    * q43 (bit-identical bin ids), then ONE groupBy(source, bin): the
    * in-bin ordering rides a sort_array over collected (doc_id, text)
    * structs — an in-memory sort of ≤ budget-bounded members per bin, not
    * a shuffle. Bins are capacity-bounded by construction (budget 512
    * tokens), so collect_list cannot blow up on skew at any corpus size.
    *
    * Zero-token caveat (ADVICE r6): the capacity bound counts TOKENS, so a
    * doc with zero tokens (empty / all-punctuation text) doesn't advance
    * the running sum — an arbitrarily long run of them shares one offset
    * and lands in a single bin's collect_list. The synthetic corpus never
    * emits such docs; a deployment whose corpus can should filter them
    * before binning (they carry no trainable content) or bump with
    * greatest(n_tokens, 1) to restore the bound.
    */
  def q50PackAssemble(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 512L // tokens per packed sequence (q43's constant)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum("n_tokens").over(w), lit(0L)) / budget))
      .groupBy("source", "bin")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("doc_id"), col("text")))),
          _.getField("text")), " ").as("packed"),
        sum("n_tokens").as("total_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Q42: deterministic per-language quota sampling — training-mix
    * rebalancing (downsample the dominant language, keep the tail). The
    * keep decision is a pure hash threshold on the salted doc id, so the
    * sample is reproducible on any engine with no RNG state: the 8-hex-
    * char md5 prefix compares lexicographically exactly like the 32-bit
    * value it encodes. A narrow filter — no shuffle, prunes at the scan.
    */
  /** The quota keep-decision over any (id, lang) pair — en is ~44% of the
    * corpus: keep 1/4 of it, 3/4 of everything else. Salted so independent
    * sampling stages (q42, q51) draw independent samples.
    */
  private[operators] def quotaKeep(id: Column, lang: Column, salt: String): Column = {
    val h = substring(md5(concat(lit(salt), id.cast("string"))), 1, 8)
    when(lang === "en", h < "40000000").otherwise(h < "c0000000")
  }

  def q42QuotaSample(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(quotaKeep(col("doc_id"), col("lang"), "q42|"))
      .select("doc_id", "lang")

  /** Q54: deterministic 80/10/10 train/val/test split — the assignment a
    * training pipeline makes before anything else touches the corpus.
    * Same salted-hash primitive as q42 (salt "split|", so the split is
    * independent of every sampling stage): reproducible on any engine
    * with no RNG state, stratified by construction (md5 is uniform
    * within every subpopulation — per-source/per-language proportions
    * hold automatically), and a pure narrow map — no shuffle, prunes to
    * two columns at the scan. Thresholds are 32-bit hex bounds:
    * 0xCCCCCCCC = 0.8, 0xE6666666 = 0.9.
    */
  /** q54's deterministic split assignment over any id column — shared
    * with q78's cross-tab so the two can never disagree on a doc's fold.
    */
  private[graft] def splitOf(id: Column): Column = {
    val h = substring(md5(concat(lit("split|"), id.cast("string"))), 1, 8)
    when(h < "cccccccc", "train")
      .when(h < "e6666666", "val")
      .otherwise("test")
  }

  def q54Split(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"), col("source"), splitOf(col("doc_id")).as("split"))

  /** Q78: the split × source TOKEN MATRIX — the stratification report a
    * training pipeline publishes after q54's assignment (is val/test
    * coverage proportional per domain, or did a fold starve?). One
    * `pivot` with EXPLICIT values: naming the columns up front lets the
    * rewrite plan directly as a two-phase aggregate (a partial-aggregable
    * pre-agg on (source, split) whose intermediate is bounded by
    * sources × folds, then the matrix agg) — `pivot` without values runs
    * a whole distinct-discovery JOB over the corpus before planning,
    * which is the 100 TB mistake this contract pins away (2 uniform
    * exchanges, plan-pinned). Exact BIGINT token sums; a fold a source
    * never hits reports NULL.
    */
  def q78SplitMatrix(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(words(col("text"))).cast("long").as("_nt"),
        splitOf(col("doc_id")).as("_split"))
      .groupBy("source")
      .pivot("_split", Seq("train", "val", "test"))
      .agg(sum(col("_nt")))

  /** Q77: CHAR-level repetition signals — the two Gopher repetition
    * families q47's count-based 3-gram fraction does not cover (Rae et
    * al. 2021 measure both): (a) `top2_frac` — the fraction of the
    * single-spaced text covered by occurrences of the MOST FREQUENT
    * word-2-gram (ties break to the lexicographically smallest, so the
    * reported gram is a total contract); (b) `dup5_frac` — the fraction
    * of word characters covered by any word-5-gram occurring at least
    * twice WITHIN the doc (q70's span-coverage rule, scoped per doc:
    * a token is covered iff a duplicate span starts in [p-4, p]).
    * Both numerators and denominators are exact BIGINT char sums with
    * ONE final rounding; docs too short for a window (< 2 / < 5 words)
    * report NULL, never a fake 0. All fan-outs are doc-length-bounded
    * explodes over uniform (doc_id[, gram]) keys — the within-doc
    * grouping means no corpus-wide hot key can exist by construction.
    *
    * The synthetic corpus has no organic within-doc 5-gram repeats, so
    * docs with `doc_id % 10 = 3` re-append their own first five words
    * twice (the q46/q67 residue discipline) — the dup5 rule has true
    * positives by construction and a coverage slip cannot hide behind an
    * all-zero column; real web text trips the rule organically.
    */
  def q77RepetitionChars(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("_w"))
    // tokenize ONCE (r18 verdict task #5): the 2-gram branch, the 5-gram
    // branch, and the final coverage fold each re-ran scan + split + the
    // residue concat as duplicated subtrees; the loadSpread runs the one
    // remaining tokenize pass cluster-wide
    val base = Materialize.once("q77.tokens",
      raw.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 3 && size(col("_w")) >= 5,
          concat(col("_w"), slice(col("_w"), lit(1), lit(5)), slice(col("_w"), lit(1), lit(5))))
          .otherwise(col("_w")).as("ws")))
    val g2 = base.filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ws")) - 2),
          i => concat_ws(" ", element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2)))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
    val wTop = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("g").asc)
    val top2 = g2.withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("doc_id"), col("g").as("top2_gram"), col("cnt").as("_cnt"))
    val inst5 = base.filter(size(col("ws")) >= 5)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("ws")) - 5),
          i => array_join(slice(col("ws"), i + 1, lit(5)), " "))).as(Seq("start", "g5")))
    val dupStarts = inst5.groupBy("doc_id", "g5")
      .agg(collect_list(col("start")).as("starts"))
      .filter(size(col("starts")) >= 2)
      .select(col("doc_id"), explode(col("starts")).as("start"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("start"))).as("ds"))
    val toks = transform(col("ws"), (w, i) => struct(i.as("p"), w.as("w")))
    val covered = filter(toks, t => exists(col("_ds"),
      s => s <= t.getField("p") && t.getField("p") <= s + 4))
    base
      .join(top2, Seq("doc_id"), "left")
      .join(dupStarts, Seq("doc_id"), "left")
      .withColumn("_ds", coalesce(col("ds"), array().cast("array<int>")))
      .withColumn("_jchars", length(array_join(col("ws"), " ")).cast("long"))
      .withColumn("_cchars",
        aggregate(covered, lit(0L), (acc, t) => acc + length(t.getField("w"))))
      .select(col("doc_id"), col("top2_gram"),
        when(size(col("ws")) >= 2,
          round((col("_cnt") * length(col("top2_gram")).cast("long"))
            .cast("double") / col("_jchars"), 6)).as("top2_frac"),
        when(size(col("ws")) >= 5,
          round(col("_cchars").cast("double") /
            (col("_jchars") - (size(col("ws")) - 1)), 6)).as("dup5_frac"))
  }

  /** Q75: temperature-scaled domain MIXTURE WEIGHTS — the reweighting
    * read every multi-domain training run makes before sampling (the
    * DoReMi/data-mixing family's α=0.5 square-root temperature: upweight
    * small domains, damp the head; α=1 reproduces natural sampling, α=0
    * uniform). Per source: exact token count, natural share, the
    * renormalized √share weight, and the token allocation a 1M-token
    * budget would plan (floor — the unambiguous rounding both engines
    * share). q42's quota thresholds are the per-DOC sampling mechanism;
    * this is the per-DOMAIN policy that chooses those thresholds.
    *
    * Determinism discipline (q64's): the weight denominator Σ√share is a
    * sum of DOUBLES whose order an engine is free to pick — so each √ is
    * rounded to 12 dp, cast DECIMAL(20,12), and summed EXACTLY (order-
    * independent), then the quotient runs in double against the full-
    * precision numerator. Both aggregation windows are source-cardinality
    * (a handful of rows), never corpus-sized.
    */
  def q75MixtureWeights(spark: SparkSession, dir: String): DataFrame =
    mixtureWeightsOn(Tables.load(spark, dir, "documents"))

  /** The q75 computation over any (source, text) frame — the
    * frame-parameterized form q84's executed sample reuses, so the
    * policy a deployment samples against is BY CONSTRUCTION the policy
    * the report publishes.
    */
  def mixtureWeightsOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val perSource = docs
      .select(col("source"), size(words(col("text"))).cast("long").as("_nt"))
      .groupBy("source").agg(sum("_nt").as("n_tokens"))
    perSource
      .withColumn("_share", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(w))
      .withColumn("_wraw", sqrt(col("_share")))
      .withColumn("_wsum",
        sum(round(col("_wraw"), 12).cast("decimal(20,12)")).over(w).cast("double"))
      .withColumn("_weight", col("_wraw") / col("_wsum"))
      .select(col("source"), col("n_tokens"),
        round(col("_share"), 6).as("share"),
        round(col("_weight"), 6).as("weight"),
        floor(col("_weight") * lit(1000000.0)).cast("long").as("planned_tokens"))
  }

  /** Q88: ADAPTIVE per-source quality gate — q65/q28 apply FIXED
    * thresholds; real corpus builds calibrate per source (FineWeb's
    * per-dump thresholding): each source's floor is its own quality
    * distribution's p25, selected by RANK (the value at ascending
    * position ceil(n/4) with doc_id tie-break — percentile_disc
    * semantics in ALL-INTEGER rank arithmetic, never an interpolated
    * quantile, which no two engines compute alike). `keep` compares the
    * 6-dp-rounded score against the floor; ungradeable docs (NULL score,
    * which under qualityScore's least-skips-nulls algebra means NULL
    * text — token-less text scores 0.5 and ranks normally) are excluded
    * from the ranked frame (engines disagree on NULL sort position) and
    * surface with NULL keep, the q65 report-WHY stance.
    *
    * Scale shape: scoring is narrow; ONE corpus-sized exchange (the
    * per-source rank window — count rides the same partition, so the
    * planner reuses the exchange); the per-source floor frame is
    * source-cardinality and broadcast back.
    */
  def q88AdaptiveQuality(spark: SparkSession, dir: String): DataFrame =
    adaptiveQualityOn(Tables.loadSpread(spark, dir, "documents"))

  /** The q88 gate over any (doc_id, source, text) frame; the floor is
    * the value at ascending rank ceil(n·num/den) per source.
    */
  def adaptiveQualityOn(docs: DataFrame, num: Int = 1, den: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("source"),
      qualityScore(col("text")).as("quality"))
    val ranked = scored.filter(col("quality").isNotNull)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("source").orderBy("quality", "doc_id")))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("source")))
    val floors = ranked
      .filter(col("_rn") === expr(s"(_n * $num + ${den - 1}) div $den"))
      .select(col("source"), col("quality").as("q_floor"))
    scored.join(broadcast(floors), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("quality"), col("q_floor"),
        when(col("quality").isNotNull,
          (col("quality") >= col("q_floor")).cast("int")).as("keep"))
  }

  /** Q87: token-window CHUNKING — split every document into fixed-size
    * overlapping token windows (the step that turns curated documents
    * into model-shaped examples: context-window packing for training,
    * passage windows for retrieval). Chunk i covers tokens
    * `[i·stride, i·stride + maxTokens)` with `stride = maxTokens −
    * overlap`; the chunk count is `1 + ceil(max(0, n − maxTokens) /
    * stride)` — all INTEGER arithmetic, so the window layout is exact on
    * any engine, and a would-be trailing window containing only overlap
    * is excluded by the formula (never emitted then special-cased).
    * Token-less documents stay visible with NULL chunk columns (q65's
    * report-WHY discipline, q82's explode_outer shape).
    *
    * Scale shape: pure narrow map + bounded explode — the token array is
    * materialized ONCE as its own column (the q67 lambda rule) and every
    * chunk is a `slice` of it; zero exchanges, fuses into the scan.
    */
  def q87ChunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunkDocsOn(Tables.load(spark, dir, "documents"))

  /** The q87 windowing over any (doc_id, text) frame. */
  def chunkDocsOn(docs: DataFrame, maxTokens: Int = 64,
                  overlap: Int = 16): DataFrame = {
    require(overlap < maxTokens, "overlap must leave a positive stride")
    val stride = maxTokens - overlap
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("n", coalesce(size(col("ws")), lit(0)))
      .withColumn("n_chunks", when(col("n") > 0,
        lit(1) + expr(s"(greatest(n - $maxTokens, 0) + ${stride - 1}) div $stride")))
      .withColumn("chunk_idx",
        explode_outer(when(col("n_chunks") >= 1,
          sequence(lit(0), (col("n_chunks") - 1).cast("int")))))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        size(slice(col("ws"), col("chunk_idx") * stride + 1, lit(maxTokens)))
          .cast("long").as("n_chunk_tokens"),
        array_join(
          slice(col("ws"), col("chunk_idx") * stride + 1, lit(maxTokens)), " ")
          .as("chunk_text"))
  }

  /** Q84: EXECUTE the mixture policy — q75 publishes per-source token
    * allocations; this draws the documents that fill them. Per source,
    * docs are ordered by the q42/q54/q80 salted-md5 priority (RNG-free,
    * independent of every other stage's draw) and kept while they FIT:
    * `keep = 1` iff the doc's exclusive running token total plus its own
    * tokens stays within `planned_tokens` — the budget is never
    * exceeded, and a too-big doc at the boundary is skipped in favor of
    * nothing (never a partial doc; packing split docs is q43/q50's job).
    * Every doc stays visible with its offset and verdict (q65's
    * report-WHY bit discipline).
    *
    * Scale shape: ONE corpus-sized exchange (the per-source priority
    * window — source-keyed, and within a source the cumsum is the same
    * per-partition-then-offset algebra q80 runs across buckets); the
    * policy side is source-cardinality and broadcast. All integer
    * arithmetic — token counts, running totals, budgets — so the verdict
    * is exact on any engine.
    */
  def q84MixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureSampleOn(Tables.load(spark, dir, "documents"))

  /** The q84 draw over any (doc_id, source, text) frame. */
  def mixtureSampleOn(docs: DataFrame, salt: String = "q84|"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planned = mixtureWeightsOn(docs).select("source", "planned_tokens")
    val t = docs.select(col("doc_id"), col("source"),
      coalesce(size(words(col("text"))), lit(0)).cast("long").as("n_tokens"),
      md5(concat(lit(salt), col("doc_id").cast("string"))).as("_h"))
    val w = Window.partitionBy("source").orderBy("_h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("sample_off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(broadcast(planned), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("sample_off"),
        (col("sample_off") + col("n_tokens") <= col("planned_tokens"))
          .cast("int").as("keep"))
  }

  /** Word-8-gram shingles: (doc_id, source, sh8). Same index-sequence
    * shape as Dedup's 3-gram shingler; the size filter comes FIRST —
    * sequence(0, size-8) on a short array would yield a descending
    * [0, -1, ...] range, not an empty one.
    */
  private[graft] def shingles8(docs: DataFrame): DataFrame =
    shingles8Ws(docs
      .select(col("doc_id"), col("source"), words(col("text")).as("ws")))

  /** [[shingles8]] over an already-tokenized (doc_id, source, ws) frame —
    * the r19 tokenize-once rewrites build the token frame once per query
    * (Materialize.once) and derive every shingle branch from it.
    */
  private[graft] def shingles8Ws(toks: DataFrame): DataFrame =
    toks
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), col("source"), explode(
        transform(sequence(lit(0), size(col("ws")) - 8),
          i => concat_ws(" ",
            (1 to 8).map(j => element_at(col("ws"), i + j)): _*))).as("sh8"))

  /** Q45: train/benchmark decontamination — the overlap-detection stage a
    * training pipeline runs before the corpus ships: any train document
    * sharing an 8-word shingle with the holdout (benchmark) partition is
    * flagged. Emits one row per TRAIN doc: (doc_id,
    * n_overlapping_shingles = distinct holdout-shared shingles,
    * contaminated = 0/1).
    *
    * Scale shape: the only wide operations are keyed by the shingle
    * string — uniformly distributed by construction (an 8-word n-gram
    * repeats only on genuinely duplicated passages, which is exactly the
    * signal) — and by doc_id. The holdout side is benchmark-sized
    * (orders of magnitude smaller than train at 100 TB), so its distinct
    * shingle set is broadcast; drop the hint and the same plan degrades
    * gracefully to a shuffle join if a deployment's holdout outgrows it.
    */
  /** Q46: PII redaction — the scrub stage a corpus runs before text ships
    * to training: emails and phone numbers are replaced with typed
    * placeholders and counted per document. The corpus text is synthetic
    * word soup, so (as q08/q32 do for the masking family) the PII is
    * synthesized deterministically from doc_id and appended — the
    * operator's regexes then run against real positive AND negative rows
    * (every doc has ≥1 of each; doc_id % 3 == 0 carries a second email).
    *
    * Pure per-row narrow work — no shuffle, scales with input splits.
    * Both regexes are RE2-safe (no backreferences, no lookaround), so the
    * same patterns run identically on Spark's Java engine and DuckDB's
    * RE2, and on any engine a deployment might scrub with.
    */
  private[operators] val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[operators] val phoneRe = "\\+1-555-[0-9]{4}"

  /** The q46 synthesized contact suffix — shared with the q51 pipeline's
    * scrub stage so the synthesis arithmetic cannot drift from the oracle.
    */
  private[operators] def synthContacts(id: Column, text: Column): Column =
    concat(text,
      lit(" contact user"), id, lit("@mail.example.com"),
      when(pmod(id, lit(3)) === 0,
        concat(lit(" cc admin"), id, lit("@ex.org")))
        .otherwise(lit("")),
      lit(" tel +1-555-"),
      lpad(pmod(id, lit(10000)).cast("string"), 4, "0"))

  /** RE2-safe email/phone redaction (see q46 doc) — shared with q51. */
  private[graft] def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, lit(emailRe), lit("<EMAIL>")),
      lit(phoneRe), lit("<PHONE>"))

  def q46PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val raw = synthContacts(col("doc_id"), col("text"))
    Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(raw, lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(raw, lit(phoneRe)).cast("long").as("n_phones"),
        scrubPii(raw).as("scrubbed"))
  }

  /** Q47: within-document repetition stats — the Gopher-style "duplicate
    * n-gram fraction" filter signal (rendered corpora repeat boilerplate;
    * high dup_frac flags them for removal). Counts word-3-grams per doc
    * and the distinct subset; dup_frac = 1 - distinct/total.
    *
    * One narrow explode feeding a single partial-agg groupBy(doc_id) —
    * count and count(distinct) share the shuffle. Docs under 3 words
    * report 0 grams and dup_frac 0.0 (nothing repeats in an empty set).
    */
  def q47RepNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // spread the EXPLODE branch only (r19): it is this query's one heavy
    // single-consumer pass (profiled 0.65 s single-task at sf0.1), so the
    // r18 multi-consumer spread-re-execution trap does not apply — the
    // doc_id spine keeps the plain pruned scan
    val grams = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3)))).as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))
    docs.select(col("doc_id")).join(grams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(lit(1.0) - coalesce(col("n_distinct").cast("double") /
          col("n_grams"), lit(1.0)), 6).as("dup_frac"))
  }

  /** Q48: per-source token-length distribution — the corpus-shape report
    * a mixing/packing stage reads (is src X long-form? did a re-crawl
    * shift the p99?). Exact interpolated percentiles (Spark `percentile`,
    * the same rank formula as DuckDB's `quantile_cont`), one shuffle.
    *
    * Scale note: exact percentile aggregates a value→count map per
    * partition, so memory is bounded by DISTINCT token lengths (small
    * ints — thousands at worst), not rows; safe at any corpus size. For
    * genuinely unbounded value domains the sketch twin is
    * `approx_percentile`, pinned within tolerance of this exact result in
    * CorpusOpsSpec (the q20↔q31 pattern).
    */
  def q48TokenPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"), size(words(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(expr("percentile(n, array(0.5D, 0.9D, 0.99D))").as("ps"),
        count(lit(1)).as("cnt"))
      .select(col("source"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p90"),
        round(element_at(col("ps"), 3), 6).as("p99"),
        col("cnt"))

  def q45Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val holdout = col("source").isin("src18", "src19")
    // tokenize ONCE (r18 verdict task #5): the holdout shingle branch,
    // the train shingle branch, and the final train-id spine each re-ran
    // the scan + word split per branch (subtree duplication — exchange
    // reuse never covered it); the loadSpread means the one tokenize
    // pass that remains runs cluster-wide, which is exactly where the
    // plain spread lost in r18 (it re-executed per branch)
    val toks = Materialize.once("q45.tokens",
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), words(col("text")).as("ws")))
    val sh = shingles8Ws(toks)
    val holdShingles = sh.filter(holdout).select("sh8").distinct()
    // distinct per (doc_id, shingle) BEFORE the join: n_overlapping counts
    // contaminated shingles, not their repetitions inside one doc
    val trainShingles = sh.filter(!holdout).select("doc_id", "sh8").distinct()
    val counts = trainShingles.join(broadcast(holdShingles), "sh8")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    toks.filter(!holdout).select("doc_id")
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_overlapping_shingles"),
        (coalesce(col("n"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** Q63: q45's decontamination re-planned for a holdout TOO BIG TO
    * BROADCAST — the shape a 100 TB deployment actually runs when the
    * benchmark suite holds hundreds of millions of shingles. Three stages:
    *
    *  1. distributed bloom build: the holdout's distinct shingles fold
    *     into per-partition `util.sketch.BloomFilter`s OR-merged by
    *     Spark's own [[graft.functions.SketchOps.bloomFilterAgg]]
    *     aggregate; ONE serialized-sketch row reaches the driver — the
    *     scalar-subquery substitution model Spark's runtime row-level
    *     filtering uses, bounded by the sketch size (1 MiB here), never
    *     by corpus rows;
    *  2. probe prefilter: every train shingle is tested against the
    *     sketch (a codegen'd bitset probe) BEFORE any wide operation, so
    *     the exact join's shuffle moves only the ~contaminated sliver of
    *     the corpus plus the sketch's false positives (~0.1% at these
    *     bounds) instead of every (doc_id, shingle) row;
    *  3. exact confirm: a SHUFFLED hash join (deliberately not broadcast
    *     — that is the premise) against the distinct holdout kills the
    *     false positives, so the result is EXACTLY q45's — the shared
    *     oracle, not a recall bound, checks it.
    *
    * Build and probe sides hash with `xxhash64` through the same helper,
    * so the pair cannot drift. An empty holdout yields a NULL sketch →
    * zero candidates → all-zero flags, the exact-semantics degenerate.
    */
  def q63BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchOps
    val holdout = col("source").isin("src18", "src19")
    // tokenize ONCE (r18 verdict task #5): the sketch build is a driver
    // ACTION, so before this the scan + word split ran once for the
    // sketch and again (twice — holdout AND train branches) in the final
    // plan; the checkpointed token frame pays the pass once
    val toks = Materialize.once("q63.tokens",
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), words(col("text")).as("ws")))
    val sh = shingles8Ws(toks)
    val holdShingles = sh.filter(holdout).select("sh8").distinct()
    val sketch = holdShingles
      .agg(SketchOps.bloomFilterAgg(xxhash64(col("sh8")), 1000000L, 8388608L)
        .as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val trainShingles = sh.filter(!holdout).select("doc_id", "sh8").distinct()
    val candidates =
      if (sketch == null) trainShingles.filter(lit(false))
      else trainShingles.filter(
        SketchOps.mightContain(sketch, xxhash64(col("sh8"))))
    val counts = candidates.join(holdShingles.hint("shuffle_hash"), "sh8")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    toks.filter(!holdout).select("doc_id")
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_overlapping_shingles"),
        (coalesce(col("n"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** Q64: corpus-trained unigram surprisal — the cheap statistical-LM
    * quality signal (CCNet-style perplexity filtering's unigram floor): a
    * document whose tokens are all corpus-frequent scores low, one full of
    * rare tokens scores high. Two passes over the token stream:
    *
    *  1. train: token frequencies `tf` (shuffle keyed by token — uniform
    *     by construction, with map-side partial aggregation), then the
    *     total count N stamped onto every vocabulary row by an
    *     UNPARTITIONED window — the window's single-partition exchange
    *     moves the vocabulary (millions of rows at 100 TB), never the
    *     corpus, and keeps the whole model in ONE subtree (a separate
    *     `agg(sum)` branch would re-tokenize the corpus a third time);
    *  2. score: every token instance joins its broadcast log-probability
    *     and folds into a per-document sum/mean of -ln(tf/N).
    *
    * Exactness discipline: the per-token surprisal is rounded to 6 dp and
    * cast DECIMAL(18,6) BEFORE the per-doc sum, so the sum is exact and
    * order-independent (a raw double sum would hash-drift under Spark's
    * nondeterministic aggregation order); the mean divides the exact sum
    * once at the end. `explode_outer` keeps token-less documents in the
    * frame (n_tokens 0, NULL mean) without a second corpus-sized join —
    * the whole query is two exchanges, both unavoidable.
    */
  def q64UnigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    // loadSpread (r19): the one tokenize pass that remains after the
    // q64.tokens checkpoint runs cluster-wide; the r18 spread regression
    // here was per-branch exchange re-execution, which the checkpoint
    // removed
    unigramSurprisalOn(Tables.loadSpread(spark, dir, "documents"))

  /** The q64 computation over any (doc_id, text) frame — the
    * frame-parameterized form scale tests and pipeline composition use.
    */
  def unigramSurprisalOn(docs: DataFrame): DataFrame = {
    // tokenize ONCE (r18 verdict task #5): the vocabulary branch and the
    // scoring join consumed the exploded token stream as two duplicated
    // subtrees — scan + split + explode each ran twice per query
    val toks = Materialize.once("q64.tokens",
      docs.select(col("doc_id"),
        explode_outer(words(col("text"))).as("tok")))
    val vocab = toks.filter(col("tok").isNotNull)
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .withColumn("n_total", sum("tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    toks
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("tok"),
        round(-log(col("tf").cast("double") / col("n_total")), 6)
          .cast("decimal(18,6)").as("s"))
      .groupBy("doc_id")
      .agg(count(col("tok")).as("n_tokens"), sum("s").as("sum_s"))
      .withColumn("_sm", (col("sum_s") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        // half-up integer mean on exact micro-units — q81's exact-half
        // discipline (round(double/n, 6) flips between engines when
        // sum_micros/n lands on a true .5; see bigramSurprisalOn)
        when(col("n_tokens") > 0,
          expr("CAST((2 * _sm + n_tokens) DIV (2 * n_tokens) AS DOUBLE) / 1e6"))
          .as("mean_surprisal"))
  }

  /** Q81: interpolated BIGRAM surprisal — the LM-quality ladder's next
    * rung above q64's unigram (CCNet scores documents with an n-gram LM
    * precisely because context makes "the the the" expensive where a
    * unigram model cannot see it). Per scored token (every token with a
    * predecessor):
    *
    *   s = -ln( wB * c(prev,cur)/c(prev,·)  +  wU * c(cur)/N )
    *
    * where c(prev,·) is the CONTEXT count (bigrams starting with prev —
    * the proper conditional denominator, not the unigram count, which
    * also counts document-final occurrences that predict nothing), and
    * the unigram term is q64's MLE. The weights are two explicit
    * parameters, not (λ, 1-λ): `1.0 - 0.7` is 0.30000000000000004 in
    * IEEE754, and a model constant that silently differs from the
    * oracle's literal in the 17th digit is exactly the drift the 6-dp
    * rounding discipline exists to kill.
    *
    * Scale shape: bigram pairs are built NARROW from the materialized
    * token array (`transform(sequence(...))` over an own-column `ws` —
    * the q67 lambda lesson; no per-doc lag window, so no doc-keyed
    * exchange), and the three model joins broadcast: unigram vocabulary
    * saturation is MEASURED (ScaleSpec q64), context counts key a subset
    * of the same vocabulary, and the bigram table is bounded by observed
    * adjacency (≤ V²; it saturates later than V — a deployment whose
    * bigram model outgrows the broadcast passes [[VocabMeet.Shuffle]] for
    * plain shuffled equi-joins with AQE skew handling; zipfian hot pairs
    * like "of the" make AQE's skew split mandatory there, and ScaleSpec
    * pins that it fires — note the measured deployment caveat: in this
    * CHAINED join the vanilla rule declines the split as "introducing an
    * extra shuffle", so `spark.sql.adaptive.forceOptimizeSkewedJoin` must
    * be set alongside the strategy).
    * Exactness is q64's: per-token surprisal rounded to 6 dp, cast
    * DECIMAL(18,6) before the per-doc sum, one final division.
    */
  def q81BigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    // loadSpread (r19): see q64 — one spread tokenize pass, checkpointed
    bigramSurprisalOn(Tables.loadSpread(spark, dir, "documents"))

  /** The q81 computation over any (doc_id, text) frame. `meet` picks how
    * the token/pair stream joins the three model tables: [[VocabMeet
    * .Broadcast]] while the model fits the driver, [[VocabMeet.Shuffle]]
    * (plain shuffled equi-joins + AQE skew split — a bloom cannot carry
    * the model VALUES) when it outgrows it. Value-identical by
    * MeetStrategySpec's pin; ScaleSpec pins the skew split fires on
    * zipfian hot pairs.
    */
  def bigramSurprisalOn(docs: DataFrame, wBigram: Double = 0.7,
                        wUnigram: Double = 0.3,
                        meet: VocabMeet = VocabMeet.Broadcast): DataFrame = {
    require(meet != VocabMeet.Bloom,
      "the model joins carry values; a bloom answers membership only")
    def modelJoin(l: DataFrame, r: DataFrame, k: Seq[String]): DataFrame =
      meet match {
        case VocabMeet.Broadcast => l.join(broadcast(r), k)
        case _ => l.join(r.hint("shuffle_hash"), k)
      }
    // tokenize ONCE (r18 verdict task #5): nt, the unigram model, and
    // the pair stream each re-ran scan + split as duplicated subtrees
    val base = Materialize.once("q81.tokens",
      docs.select(col("doc_id"), words(col("text")).as("ws")))
    val nt = base.select(col("doc_id"),
      coalesce(size(col("ws")), lit(0)).cast("long").as("n_tokens"))
    val uni = base.select(explode(col("ws")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
      .withColumn("n_total", sum("cu").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val pairs = base.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), " +
          "i -> struct(ws[i] AS prev, ws[i+1] AS cur))")).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val big = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    // cp = Σ_cur cb: derived from the bigram model table (vocabulary-
    // sized) instead of re-exploding the corpus — identical integers,
    // one fewer corpus pass + shuffle (guide §2.3)
    val ctx = big.groupBy("prev").agg(sum("cb").as("cp"))
    val scored = modelJoin(modelJoin(modelJoin(pairs,
        big, Seq("prev", "cur")),
        ctx, Seq("prev")),
        uni.withColumnRenamed("tok", "cur"), Seq("cur"))
      .select(col("doc_id"),
        round(-log(
          lit(wBigram) * col("cb").cast("double") / col("cp") +
            lit(wUnigram) * col("cu").cast("double") / col("n_total")), 6)
          .cast("decimal(18,6)").as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_scored"), sum("s").as("sum_s"))
    nt.join(scored, Seq("doc_id"), "left")
      .withColumn("_sm", (col("sum_s") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        // the mean is half-up INTEGER arithmetic on exact micro-units,
        // never round(double/n, 6): sum_micros/n lands on an EXACT .5
        // with probability ~1/2n per doc (observed: 141918063/42 =
        // 3379001.5), and there the engines' round() disagree — Spark
        // rounds the double's exact decimal expansion (just below .5),
        // DuckDB multiplies by 1e6 first (landing back on .5). Exact
        // floor((2a+n)/2n) is the same integer everywhere.
        when(col("n_scored") > 0,
          expr("CAST((2 * _sm + n_scored) DIV (2 * n_scored) AS DOUBLE) / 1e6"))
          .as("mean_surprisal"))
  }

  /** Q150: trigram stupid-backoff surprisal — the LM-quality ladder's
    * top rung (q64 unigram, q81 interpolated bigram): Brants et al.
    * 2007 ("Large Language Models in Machine Translation") showed
    * web-scale n-gram filtering runs on STUPID BACKOFF, not smoothed
    * interpolation — score the trigram if TRAINING saw it, else back
    * off to the bigram at a fixed alpha, else the unigram at alpha^2:
    *
    *   p(w3|w1 w2) = c3/k3            when c3 > 0
    *               | a  * c2/k2       when c2 > 0
    *               | a^2 * cu/N       when cu > 0       (a = 0.4)
    *
    * with k3/k2 the CONTEXT counts (trigram/bigram-prefix totals —
    * q81's proper-denominator discipline). Unlike q64/q81, the model
    * TRAINS on the even-doc_id HALF and scores every document — the
    * held-out half hits unseen trigrams, so the backoff ladder
    * actually fires (a model trained on what it scores never backs
    * off, which would leave the alpha path dead); an OOV token (no
    * unigram in training) is COUNTED, never smoothed into a guess.
    * Per-path counts are reported — the mixture is the model-health
    * read a perplexity-filter rollout watches.
    */
  def q150TrigramBackoff(spark: SparkSession, dir: String): DataFrame =
    // loadSpread (r19): see q64 — one spread tokenize pass, checkpointed
    trigramBackoffOn(Tables.loadSpread(spark, dir, "documents"))

  /** The q150 computation over any (doc_id, text) frame. Model joins
    * broadcast (vocabulary-sized — the q81 VocabMeet discipline
    * applies unchanged when the model outgrows the driver).
    */
  def trigramBackoffOn(docs: DataFrame, alpha: Double = 0.4): DataFrame = {
    // tokenize ONCE (r18 verdict task #5): five consumers — the unigram/
    // bigram/trigram model passes over the train half, nt, and the
    // scoring stream — each re-ran scan + split as duplicated subtrees
    val base = Materialize.once("q150.tokens",
      docs.select(col("doc_id"), words(col("text")).as("ws")))
    val train = base.filter(col("doc_id") % 2 === 0)
    val nt = base.select(col("doc_id"),
      coalesce(size(col("ws")), lit(0)).cast("long").as("n_tokens"))
    val uni = train.select(explode(col("ws")).as("w3"))
      .groupBy("w3").agg(count(lit(1)).as("cu"))
      .withColumn("n_total", sum("cu").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val bg = train.filter(size(col("ws")) >= 2)
      .select(explode(expr("transform(sequence(0, size(ws)-2), " +
        "i -> struct(ws[i] AS w2, ws[i+1] AS w3))")).as("p"))
      .select(col("p.w2").as("w2"), col("p.w3").as("w3"))
    val bi = bg.groupBy("w2", "w3").agg(count(lit(1)).as("c2"))
    // context counts DERIVE from the bigram table (k2 = Σ_w3 c2 — the
    // identical integer), a vocabulary-sized re-aggregation instead of a
    // second corpus-sized explode+shuffle (guide §2.3 "aggregate before
    // you shuffle"; r18: two fewer corpus passes here and two below)
    val ctx2 = bi.groupBy("w2").agg(sum("c2").as("k2"))
    def tgrams(df: DataFrame, withId: Boolean): DataFrame = {
      val cols = (if (withId) Seq(col("doc_id")) else Nil) ++ Seq(
        col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
      df.filter(size(col("ws")) >= 3)
        .select((if (withId) Seq(col("doc_id")) else Seq.empty) :+
          explode(expr("transform(sequence(0, size(ws)-3), " +
            "i -> struct(ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3))")).as("p"): _*)
        .select(cols: _*)
    }
    val tg = tgrams(train, withId = false)
    val tri = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val ctx3 = tri.groupBy("w1", "w2").agg(sum("c3").as("k3"))
    val stream = tgrams(base, withId = true)
    val joined = stream
      .join(broadcast(tri), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(ctx3), Seq("w1", "w2"), "left")
      .join(broadcast(bi), Seq("w2", "w3"), "left")
      .join(broadcast(ctx2), Seq("w2"), "left")
      .join(broadcast(uni), Seq("w3"), "left")
    val prob = when(col("c3").isNotNull, col("c3").cast("double") / col("k3"))
      .when(col("c2").isNotNull,
        lit(alpha) * col("c2").cast("double") / col("k2"))
      .when(col("cu").isNotNull,
        lit(alpha * alpha) * col("cu").cast("double") / col("n_total"))
    val path = when(col("c3").isNotNull, lit("tri"))
      .when(col("c2").isNotNull, lit("bi"))
      .when(col("cu").isNotNull, lit("uni"))
      .otherwise(lit("oov"))
    val scored = joined.select(col("doc_id"), path.as("path"),
      round(-log(prob), 6).cast("decimal(18,6)").as("s"))
    val agg = scored.groupBy("doc_id").agg(
      sum((col("path") === "tri").cast("long")).as("n_tri"),
      sum((col("path") === "bi").cast("long")).as("n_bi"),
      sum((col("path") === "uni").cast("long")).as("n_uni"),
      sum((col("path") === "oov").cast("long")).as("n_oov"),
      count(when(col("path") =!= "oov", 1)).as("n_scored"),
      sum(when(col("path") =!= "oov", col("s"))).as("sum_s"))
    nt.join(agg, Seq("doc_id"), "left")
      .withColumn("_sm", (col("sum_s") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        // q64/q81's exact-half discipline: half-up integer mean on
        // exact micro-units, never round(double/n, 6)
        when(col("n_scored") > 0,
          expr("CAST((2 * _sm + n_scored) DIV (2 * n_scored) AS DOUBLE) / 1e6"))
          .as("mean_surprisal"))
  }

  /** Q157: sentence segmentation — the unit boundary chunking (q87)
    * and per-sentence quality assume: terminator RUNS bound once,
    * only before whitespace/EOF (decimals free), single-dot
    * abbreviations block, closing quotes attach to the sentence, an
    * unterminated tail still counts ([[graft.functions.SentenceEval]]
    * — the stated limitation, spec-pinned: an abbreviation at a TRUE
    * sentence end joins two sentences, as every abbreviation-list
    * segmenter does).
    *
    * Residue classes (%5): 0 → the trap gauntlet (`Dr.` + `3.14` +
    * mid-sentence `e.g.` + quoted question + unterminated tail);
    * 1 → `?!` and `...` runs; 2 → the stated `etc.`-at-true-end
    * join; 3 → unterminated tail; 4 → raw text (one unterminated
    * sentence). Oracle spells every sentence from corpus words.
    * One narrow map, zero exchanges.
    */
  def q157SentenceSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SentenceOps
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = SentenceOps.sentSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    docs.select(id, payload.as("_p"))
      .select(id,
        SentenceOps.sentCount(col("_p")).as("n_sentences"),
        SentenceOps.sentTokens(col("_p")).as("n_tokens"),
        SentenceOps.sentLongest(col("_p")).as("longest"),
        md5(SentenceOps.sentJoined(col("_p")).cast("binary")).as("sent_md5"))
  }

  /** The ten most frequent English stopwords — the q65 rule's fixed
    * vocabulary, shared verbatim with the oracle SQL.
    */
  private[graft] val stopwords10 =
    Seq("the", "be", "to", "of", "and", "a", "in", "that", "have", "i")

  /** Q65: Gopher-style rule-based document filter (Rae et al. 2021, "Scaling
    * Language Models", Table A1's repetition-free subset) — the cheap
    * rule gate corpus pipelines run BEFORE any model-based scoring:
    *
    *  - `r_len`: 40 <= word count <= 100000 (too-short docs carry no
    *    signal; absurdly long ones are concatenation accidents);
    *  - `r_wlen`: mean word length in [3, 4.6] (gibberish and
    *    base64-ish blobs fall outside; thresholds fitted to the
    *    fixture's synthetic vocabulary the way a deployment fits its
    *    corpus — the operator parameterizes cleanly);
    *  - `r_alpha`: >= 80% of words contain an alphabetic character;
    *  - `r_stop`: >= 2 stopword instances (the classic
    *    natural-language-vs-listing discriminator).
    *
    * Every signal is per-row column arithmetic over ONE tokenization —
    * zero shuffles, scales with input splits. Ratios are rounded to 6 dp
    * and the RULES COMPARE THE ROUNDED VALUES, so the keep decision is
    * bit-identical in any engine computing the same rationals (the
    * oracle replays every rule). `keep` is the conjunction; the per-rule
    * bits ship alongside so a pipeline can report WHY a document died —
    * the operational difference between a filter and a black box.
    */
  def q65RuleFilter(spark: SparkSession, dir: String): DataFrame =
    ruleFrame(Tables.load(spark, dir, "documents"), Seq.empty)

  /** The q65 rule computation, parameterized with extra text-derived
    * columns carried through the same single narrow pass — how
    * [[docQuality]] composes rules + score signals without a second scan
    * or a doc-keyed join per signal.
    */
  private[graft] def ruleFrame(docs: DataFrame,
                               extra: Seq[(String, Column)]): DataFrame = {
    val carried = extra.map { case (n, _) => col(n) }
    docs.select(col("doc_id") +: words(col("text")).as("ws") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .select(Seq(col("doc_id"),
        coalesce(size(col("ws")), lit(0)).cast("long").as("n_words"),
        when(size(col("ws")) > 0,
          round(length(concat_ws("", col("ws"))).cast("double") /
            size(col("ws")), 6)).as("mean_word_len"),
        when(size(col("ws")) > 0,
          round(size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("double") /
            size(col("ws")), 6)).as("alpha_frac"),
        coalesce(size(filter(col("ws"), w => w.isin(stopwords10: _*))), lit(0))
          .cast("long").as("stop_hits")) ++ carried: _*)
      .select(Seq(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("alpha_frac"), col("stop_hits"),
        (col("n_words") >= 40 && col("n_words") <= 100000)
          .cast("int").as("r_len"),
        coalesce(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 4.6,
          lit(false)).cast("int").as("r_wlen"),
        coalesce(col("alpha_frac") >= 0.8, lit(false)).cast("int").as("r_alpha"),
        (col("stop_hits") >= 2).cast("int").as("r_stop")) ++ carried: _*)
      .withColumn("keep",
        (col("r_len") === 1 && col("r_wlen") === 1 &&
          col("r_alpha") === 1 && col("r_stop") === 1).cast("int"))
  }

  /** The composed per-document quality manifest behind `vw_doc_quality`:
    * every per-row signal — the q65 rule bits and `keep`, the q28
    * heuristic score, the q66 compression ratio — computed in ONE narrow
    * pass over `documents` (one tokenization, one deflate, no
    * signal-per-join fan-out), then the q64 LM surprisal (the only signal
    * that genuinely needs corpus-wide aggregation) left-joined on doc_id.
    * A SQL-only user filters a corpus with
    * `WHERE keep = 1 AND quality >= x AND ratio >= y AND mean_surprisal
    * <= z` — the full quality stack in one view, each column row-identical
    * to its standalone contract query (SqlSurfaceSpec pins all four).
    */
  def docQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CompressOps
    val narrow = ruleFrame(Tables.load(spark, dir, "documents"), Seq(
      "quality" -> qualityScore(col("text")),
      "ratio" -> when(octet_length(col("text")) > 0,
        round(CompressOps.deflateLen(col("text")).cast("double") /
          octet_length(col("text")), 6))))
    narrow.join(
      q64UnigramSurprisal(spark, dir).select("doc_id", "mean_surprisal"),
      Seq("doc_id"), "left")
  }

  /** Q66: compression-ratio quality signal — deflated/raw byte length per
    * document via the codegen'd [[graft.functions.DeflateLen]] kernel.
    * Boilerplate, template spam, and keyword stuffing compress far below
    * natural language; random blobs sit near (or above) 1.0 — the
    * repetitive-junk detector a token-level rule gate (q65) cannot
    * express, and the remaining Gopher-family signal. Pure per-row narrow
    * work: the kernel reuses one native zlib stream per executor thread.
    *
    * Spec-gated, not DuckDB-oracled: the deflated length is deterministic
    * for a given JVM's zlib but not a cross-engine constant, and the
    * signal is consumed by thresholding — CorpusOpsSpec pins the
    * discriminating properties (repetitive ≪ word-soup < shuffled-ish)
    * and the interpreted≡codegen parity; the driver records the weaker
    * rows-only check by design (the q26/q31/q36/q53 class).
    */
  def q66CompressRatio(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CompressOps
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("n_bytes", octet_length(col("text")).cast("long"))
      .withColumn("n_deflated",
        CompressOps.deflateLen(col("text")).cast("long"))
      .select(col("doc_id"), col("n_bytes"), col("n_deflated"),
        when(col("n_bytes") > 0,
          round(col("n_deflated").cast("double") / col("n_bytes"), 6))
          .as("ratio"))
  }

  /** The q67 synthesized multi-line rendering of a document: a boilerplate
    * header (7 rotating templates), the text re-wrapped into 8-word body
    * lines, and a boilerplate footer (5 templates) — the doc_id-residue
    * synthesis pattern q46 uses for PII, because the corpus's own texts
    * are single-line. Shared with the oracle's CTE so the line-building
    * arithmetic cannot drift.
    */
  /** [[synthLines]] over an ALREADY-MATERIALIZED token-array column.
    * The split: a HOF lambda body is re-evaluated per element with no
    * subexpression sharing across the lambda boundary, so handing
    * `transform` an inline `words(text)` re-runs the regex split once
    * PER BODY CHUNK — O(tokens²/8) per document. Callers must project
    * the token array into its own column first (the kernel pre-projection
    * rule from the multimodal family, applied to arrays).
    */
  private[graft] def synthLinesFromWs(id: Column, ws: Column): Column = {
    val body = when(size(ws) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), ceil(size(ws) / lit(8.0)).cast("int") - 1),
        i => array_join(slice(ws, i * 8 + 1, lit(8)), " ")))
    concat(
      array(concat(lit("boilerplate header variant "),
        pmod(id, lit(7)).cast("string"))),
      body,
      array(concat(lit("all rights reserved variant "),
        pmod(id, lit(5)).cast("string"))))
  }

  private[operators] def synthLines(id: Column, text: Column): Column =
    synthLinesFromWs(id, words(text))

  /** The q68 synthesized source URL — doc_id-residue hosts spanning
    * subdomains, multi-label public suffixes and an explicit port, so the
    * extraction rules all have something to bite on (the q46 synthesis
    * pattern: the corpus carries no URL column).
    */
  private[operators] def synthUrl(id: Column): Column = {
    val host = element_at(array(
      lit("example.com"), lit("docs.example.com"), lit("spam-mill.biz"),
      lit("cdn.spam-mill.biz"), lit("news.site.co.uk"),
      lit("tracker.adnet.io"), lit("blog.example.com"),
      lit("shop.example.org"), lit("adnet.io"), lit("papers.ac.uk")),
      pmod(id, lit(10)).cast("int") + 1)
    concat(lit("https://"), host,
      when(pmod(id, lit(3)) === 0, ":8443").otherwise(""),
      lit("/p/"), id.cast("string"))
  }

  /** Q68: URL/domain blocklist filtering — the curation stage every
    * web-scale corpus runs first (UT1-style adult/spam/tracker domain
    * lists in RefinedWeb/FineWeb): parse the source URL's host, derive
    * the REGISTERED domain (a mini public-suffix rule: `co.uk`/`ac.uk`
    * keep three labels, everything else two — so `cdn.spam-mill.biz`
    * blocks with `spam-mill.biz` but `news.site.co.uk` is judged as
    * `site.co.uk`, never `co.uk`), and flag it against the blocklist.
    *
    * Shape at scale: host/label arithmetic is pure narrow column work;
    * the blocklist meets the corpus as a BROADCAST left join (real
    * blocklists are a few million domains — tens of MB, comfortably
    * broadcastable; a larger one passes [[VocabMeet.Bloom]] — the
    * prefilter + shuffled-exact-confirm path, value-identical by
    * MeetStrategySpec's pin). Zero shuffles in the broadcast path,
    * plan-pinned. The flag (not a filter) is the contract: a pipeline
    * reports WHY a doc died (q65's bit discipline).
    */
  def q68UrlBlocklist(spark: SparkSession, dir: String): DataFrame =
    urlBlocklistOn(spark, Tables.load(spark, dir, "documents"))
      .select("doc_id", "url", "host", "registered_domain", "blocked")

  /** The q68 verdict over any doc_id-keyed frame, carrying `carry`
    * columns through unchanged — the frame form a composed pipeline
    * (q71) consumes. One broadcast join, otherwise narrow.
    */
  /** Host → registered domain under the mini public-suffix rule (co.uk /
    * ac.uk keep three labels, everything else two) — shared by q68, q71
    * and the ingest-time domain gate so the derivation cannot drift.
    */
  private[graft] def registeredDomainOf(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, n - 1), element_at(labels, n))
    when(last2.isin("co.uk", "ac.uk"),
      concat_ws(".", element_at(labels, n - 2), last2)).otherwise(last2)
  }

  /** URL → host (scheme, port, path, query and fragment stripped). */
  private[graft] def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/:?#]+)", 1)

  private[graft] def urlBlocklistOn(spark: SparkSession, docs: DataFrame,
                                    carry: Seq[String] = Nil,
                                    meet: VocabMeet = VocabMeet.Broadcast): DataFrame = {
    import spark.implicits._
    val blocklist = Seq("spam-mill.biz", "adnet.io", "site.co.uk")
      .toDF("registered_domain").withColumn("_hit", lit(1))
    val host = hostOf(col("url"))
    val registered = registeredDomainOf(col("host"))
    val framed = docs
      .select(col("doc_id") +: carry.map(col) :+
        synthUrl(col("doc_id")).as("url"): _*)
      .withColumn("host", host)
      .withColumn("registered_domain", registered)
    VocabMeet.membership(framed, blocklist, "registered_domain", "_hit", meet)
      .withColumn("blocked", coalesce(col("_hit"), lit(0)))
      .drop("_hit")
  }

  /** Q67: duplicate-line removal — the CCNet/RefinedWeb boilerplate
    * dedup stage: a line whose exact text appears in >= 3 DISTINCT
    * documents is navigation chrome / template furniture, not content,
    * and every copy is dropped; the survivors are re-joined into the
    * cleaned document. (Line-level dedup is what kills "subscribe to our
    * newsletter" corpus-wide where document-level dedup — q21/q22 —
    * cannot: the hosting documents are all different.)
    *
    * Shape at scale (three exchanges, all uniform):
    *  1. line document-frequency: groupBy(line) with countDistinct(doc_id)
    *     — Spark's distinct-agg rewrite shuffles first on the UNIFORM
    *     (line, doc_id) pair and only then on line with partial counts,
    *     so a line duplicated across half the corpus never lands raw on
    *     one reducer;
    *  2. the df >= 3 survivor set is the corpus's boilerplate vocabulary
    *     — tiny relative to the corpus (the q45 broadcast premise), so
    *     the keep-test is a BROADCAST left join back onto the exploded
    *     lines: the line table itself never shuffles to learn its fate.
    *     A deployment whose duplicate-line set outgrows the driver passes
    *     [[VocabMeet.Bloom]] — the prefilter + shuffled-exact-confirm
    *     path, value-identical by MeetStrategySpec's pin;
    *  3. reassembly: one groupBy(doc_id) folds (pos, kept, line) structs,
    *     capacity-bounded by document length (the q50 collect_list
    *     discipline); every document keeps its row because the header
    *     guarantees >= 1 line — no corpus-sized repair join afterwards.
    *
    * `cleaned_text` is NULL (not '') when every line was removed, and the
    * removed-char fraction folds exact BIGINT lengths before the single
    * final rounding, so the result is order-independent.
    */
  // r19 examined-and-reverted: materializing the (doc_id, lines) frame
  // (the tokenize-once shape — the df build and scoring stream do re-run
  // the synthesis as two ~0.25 s single-task jobs) measured 1.18 → 1.55 s
  // in the profiler: checkpointing the line-ARRAY rows costs more than
  // the duplicated synthesis it saves. Left on the plain loader.
  def q67LineDedup(spark: SparkSession, dir: String): DataFrame =
    lineDedupOn(Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("_ws"))
      .select(col("doc_id"),
        synthLinesFromWs(col("doc_id"), col("_ws")).as("lines")))

  /** The q67 dedup over any (doc_id, lines array) frame — document
    * frequency spans exactly the given frame (q51's TF-IDF framing
    * discipline: a pipeline scopes the rule to its own survivor set).
    * Extra `keys` ride the reassembly groupBy so doc-level attributes
    * (functionally dependent on doc_id) carry through WITHOUT a repair
    * join afterwards.
    */
  private[graft] def lineDedupOn(lined0: DataFrame,
                                 keys: Seq[String] = Seq("doc_id"),
                                 meet: VocabMeet = VocabMeet.Broadcast): DataFrame = {
    // posexplode_OUTER on purpose: plain posexplode makes the optimizer
    // infer a `size(lines) > 0` filter that re-inlines the whole line
    // synthesis (per-chunk lambda included) as a second per-row
    // evaluation below the Generate; the array here is never empty by
    // construction (header + footer), so outer semantics are identical
    // and the inferred filter never exists
    val lined = lined0.select(keys.map(col) :+
      posexplode_outer(col("lines")).as(Seq("pos", "line")): _*)
    val dup = lined.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") >= 3)
      .select(col("line"), lit(1).as("_dup"))
    val marked = VocabMeet.membership(lined, dup, "line", "_dup", meet)
      .withColumn("kept", col("_dup").isNull)
    val folded = marked.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_lines"),
      sum(when(!col("kept"), lit(1L)).otherwise(lit(0L))).as("n_removed"),
      sum(when(!col("kept"), length(col("line")).cast("long"))
        .otherwise(lit(0L))).as("_rm_chars"),
      sum(length(col("line")).cast("long")).as("_all_chars"),
      collect_list(struct(col("pos"), col("kept"), col("line"))).as("_ls"))
    val keptArr = transform(
      filter(array_sort(col("_ls")), x => x.getField("kept")),
      x => x.getField("line"))
    folded.select(keys.map(col) ++ Seq(col("n_lines"), col("n_removed"),
      round(col("_rm_chars").cast("double") / col("_all_chars"), 6)
        .as("removed_char_frac"),
      when(size(keptArr) === 0, lit(null).cast("string"))
        .otherwise(array_join(keptArr, "\n")).as("cleaned_text")): _*)
  }

  /** Q72: the boilerplate report — the top-20 duplicated lines by
    * document frequency, the observability read a curation team actually
    * makes against q67's duplicate vocabulary ("what exactly are we
    * stripping corpus-wide, and how much of it is there?"). Orders by
    * (df DESC, line ASC) so the contract is total and engine-portable.
    *
    * Shape: q67's two uniform df exchanges, then a global top-k that
    * must plan as TakeOrderedAndProject (per-partition heaps + one
    * driver-side merge of 20-row heads — q07's discipline), never a
    * global sort of the line vocabulary.
    */
  def q72TopBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val lined = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("_ws"))
      .select(col("doc_id"),
        posexplode_outer(synthLinesFromWs(col("doc_id"), col("_ws")))
          .as(Seq("pos", "line")))
    lined.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") >= 3)
      .orderBy(col("line_df").desc, col("line").asc)
      .limit(20)
  }

  /** Q71: the composed WEB-PRECLEAN front half every web-scale corpus
    * runs before anything content-aware (the RefinedWeb/FineWeb intake
    * order, q51's composition discipline applied to the q67/q68/q65
    * family):
    *
    *  1. domain gate — q68's verdict, and this stage FILTERS (a
    *     blocklisted doc never pays another stage's compute);
    *  2. line dedup over the SURVIVOR frame — document frequency scopes
    *     to what survived stage 1 (the q51 framing rule: a pipeline
    *     judges duplication among its own candidates, not the corpus it
    *     already rejected). `registered_domain` rides the reassembly
    *     groupBy key (functionally dependent on doc_id) so the manifest
    *     needs NO repair join;
    *  3. q65's rule gate re-judged on the CLEANED text — boilerplate
    *     removal changes word counts, so the bits must be computed after
    *     it (a fully-excised doc grades n_words 0, keep 0, NULL ratios —
    *     the same degenerate contract as q65 on empty text).
    *
    * One manifest row per SURVIVING doc: where it came from, what line
    * dedup took, every rule bit on what remains. Exchanges stay the
    * line-dedup three; stages 1 and 3 are narrow.
    */
  def q71WebPreclean(spark: SparkSession, dir: String): DataFrame = {
    val survivors = urlBlocklistOn(spark,
      Tables.load(spark, dir, "documents"), carry = Seq("text"))
      .filter(col("blocked") === 0)
    val cleaned = lineDedupOn(
      survivors.select(col("doc_id"), col("registered_domain"),
        words(col("text")).as("_ws"))
        .select(col("doc_id"), col("registered_domain"),
          synthLinesFromWs(col("doc_id"), col("_ws")).as("lines")),
      keys = Seq("doc_id", "registered_domain"))
    ruleFrame(
      cleaned.withColumn("text", col("cleaned_text")),
      extra = Seq(
        "registered_domain" -> col("registered_domain"),
        "n_lines" -> col("n_lines"),
        "n_removed" -> col("n_removed"),
        "removed_char_frac" -> col("removed_char_frac"),
        "cleaned_text" -> col("cleaned_text")))
  }

  /** Luhn (mod-10) validity of a card-number candidate (separators
    * stripped, 13-19 digits): doubling every second digit from the RIGHT,
    * folding >9 back by 9, sum divisible by 10. Pure column arithmetic —
    * the checksum runs inside whole-stage codegen, no UDF.
    */
  private[graft] def luhnValid(cand: Column): Column = {
    val ds = regexp_replace(cand, "[ -]", "")
    val rev = reverse(ds)
    val n = length(ds)
    val sum = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d = rev.substr(i, lit(1)).cast("int")
      val dd = when(pmod(i, lit(2)) === 0, d * 2).otherwise(d)
      acc + when(dd > 9, dd - 9).otherwise(dd)
    })
    n.between(13, 19) && pmod(sum, lit(10)) === 0
  }

  /** Fixture PANs for the q92 synthesis: Luhn-valid numbers at every
    * length 13-19 (check digits computed offline), plus their
    * last-digit+1 twins which fail the checksum by exactly one.
    */
  private[graft] val ValidPans = Seq(
    "0369258147031", "70369258147036", "470369258147032",
    "1470369258147030", "8147036925814700", "5814703692581477",
    "25814703692581475", "925814703692581476", "6925814703692581470",
    "3692581470369253")
  private[graft] val InvalidPans = ValidPans.map(p =>
    p.init + ((p.last - '0' + 1) % 10).toString)

  /** Q92: CHECKSUM-validated PII scrubbing — the classes where a pattern
    * alone over-redacts and the validation IS the operator: card numbers
    * (13-19 digit runs, optional space/dash grouping) redact ONLY when
    * the Luhn checksum holds — an order number that happens to be 16
    * digits survives — and dotted quads redact ONLY when all four octets
    * are <= 255 ("10.999.55.7" is not an address). Extends q46's
    * email/phone scrub exactly the way BigCode/RefinedWeb-style pipelines
    * extend theirs: per-candidate validation between the regex scan and
    * the redaction.
    *
    * Shape: candidates via `regexp_extract_all`, validation as pure
    * column arithmetic over the candidate array, redaction as a fold of
    * LITERAL replacements of the validated candidates — one narrow map,
    * zero exchanges, no UDF anywhere. The synthesis injects valid PANs
    * (plain and dash-grouped), their Luhn-broken twins, valid and
    * out-of-range quads, and a 23-digit decoy run (too long to match);
    * the oracle replays scan + checksum + fold independently in DuckDB.
    */
  def q92PiiChecksum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val validArr = array(ValidPans.map(lit): _*)
    val invalidArr = array(InvalidPans.map(lit): _*)
    val pan = element_at(validArr, pmod(id, lit(10)).cast("int") + 1)
    val badPan = element_at(invalidArr, pmod(id, lit(10)).cast("int") + 1)
    val tok = when(pmod(id, lit(4)) === 0, pan)
      .when(pmod(id, lit(4)) === 1,
        rtrim(regexp_replace(pan, "(\\d{4})", "$1-"), "-"))
      .otherwise(badPan)
    val cardPart = when(pmod(id, lit(4)) === 3, "")
      .otherwise(concat(lit(" pay "), tok,
        when(pmod(id, lit(7)) === 0, concat(lit(" again "), tok)).otherwise("")))
    val ipPart = when(pmod(id, lit(5)) === 0,
      concat(lit(" from 10."), pmod(id, lit(256)).cast("string"),
        lit("."), pmod(id, lit(200)).cast("string"),
        lit("."), pmod(id, lit(250)).cast("string")))
      .when(pmod(id, lit(5)) === 1,
        concat(lit(" from 10.999."), pmod(id, lit(100)).cast("string"), lit(".7")))
      .otherwise("")
    val decoy = when(pmod(id, lit(6)) === 0,
      " order 12345678901234567890123").otherwise("")
    val raw = concat(col("text"), cardPart, ipPart, decoy)
    val cardCands = regexp_extract_all(raw,
      lit("\\b\\d(?:[ -]?\\d){12,18}\\b"), lit(0))
    val validCards = filter(cardCands, luhnValid _)
    val afterCards = aggregate(array_distinct(validCards), raw,
      (acc, c) => replace(acc, c, lit("<CARD>")))
    val ipCands = regexp_extract_all(afterCards,
      lit("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"), lit(0))
    val validIps = filter(ipCands, ip =>
      forall(split(ip, "\\."), o => o.cast("int") <= 255))
    val scrubbed = aggregate(array_distinct(validIps), afterCards,
      (acc, c) => replace(acc, c, lit("<IP>")))
    docs.select(id,
      size(validCards).cast("long").as("n_cards"),
      size(validIps).cast("long").as("n_ips"),
      scrubbed.as("scrubbed"))
  }

  /** The canonical form of a crawl URL — the normalization every frontier
    * and URL-dedup stage agrees on before comparing two spellings:
    *
    *  - scheme and host LOWERCASED (RFC 3986 §6.2.2.1: both are
    *    case-insensitive; paths are NOT — `/A` and `/a` stay distinct);
    *  - default ports stripped (`:443` under https, `:80` under http),
    *    explicit non-default ports kept;
    *  - trailing `/` runs stripped from the path (the `/a/b` vs `/a/b/`
    *    re-crawl alias; the bare root collapses to no path, same rule, no
    *    special case);
    *  - tracking parameters dropped — `utm_*` and `fbclid` — with the
    *    SURVIVING parameters kept in their original order (sorting would
    *    merge `?a=1&b=2` with `?b=2&a=1`, which servers may distinguish);
    *    a query left empty loses its `?`;
    *  - the fragment dropped entirely (never sent to the server).
    *
    * Pure narrow regex/string column work — at 100 TB this fuses into the
    * scan that carried the URLs.
    */
  private[graft] def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostPort = regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)
    val host = lower(regexp_extract(hostPort, "^([^:]+)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portKeep = when(port === "" ||
      (scheme === "https" && port === "443") ||
      (scheme === "http" && port === "80"), "")
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid="))
    val queryCanon = array_join(kept, "&")
    concat(scheme, lit("://"), host, portKeep, path,
      when(queryCanon =!= "", concat(lit("?"), queryCanon)).otherwise(""))
  }

  /** Deterministically MESSY URL synthesis for q91 (the q39/q56 residue
    * technique): every alias class the canonicalizer must collapse —
    * scheme/host case, default vs explicit port, trailing slash,
    * tracking-parameter noise around a kept parameter, fragments. The
    * residue structure guarantees real cross-doc collisions: two ids
    * agreeing on (host, path, kept-query) residues canonicalize equal
    * through DIFFERENT spellings.
    */
  private[operators] def synthMessyUrl(id: Column): Column = {
    val scheme = when(pmod(id, lit(2)) === 0, "https").otherwise("HTTPS")
    val h = pmod(id, lit(40)).cast("string")
    val host = when(pmod(id, lit(3)) === 0, concat(lit("site"), h, lit(".example.com")))
      .when(pmod(id, lit(3)) === 1, concat(lit("SITE"), h, lit(".EXAMPLE.COM")))
      .otherwise(concat(lit("Site"), h, lit(".Example.Com")))
    val port = when(pmod(id, lit(4)) === 1, ":443")
      .when(pmod(id, lit(4)) === 2, ":8080").otherwise("")
    val path = concat(lit("/a/"), pmod(id, lit(20)).cast("string"),
      when(pmod(id, lit(5)) === 0, "/").otherwise(""))
    val qid = pmod(id, lit(10)).cast("string")
    val query = when(pmod(id, lit(6)) === 1, lit("?utm_source=feed"))
      .when(pmod(id, lit(6)) === 2, concat(lit("?id="), qid))
      .when(pmod(id, lit(6)) === 3, concat(lit("?id="), qid, lit("&utm_campaign=x")))
      .when(pmod(id, lit(6)) === 4, concat(lit("?utm_medium=e&id="), qid))
      .when(pmod(id, lit(6)) === 5, lit("?ref=rss"))
      .otherwise("")
    val frag = when(pmod(id, lit(7)) === 0, "#top").otherwise("")
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** Q91: URL canonicalization + frontier dedup — the stage a crawl runs
    * on every discovered link before deciding whether it was already
    * fetched: canonicalize ([[canonicalUrl]]), then collapse spellings of
    * the same resource to one representative (lowest doc_id), keeping the
    * evidence (`dup_of`) for the audit trail.
    *
    * Shape at scale: the canonicalization is pure narrow column work; the
    * dedup is ONE hash shuffle on the canonical key (the window's
    * partition key — exactly how a distributed frontier partitions its
    * seen-set), pinned in PlanAuditSpec. No sort beyond the per-key
    * window, no global structure.
    */
  def q91UrlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val framed = docs.select(col("doc_id"),
      synthMessyUrl(col("doc_id")).as("url"))
      .withColumn("canonical_url", canonicalUrl(col("url")))
    val w = Window.partitionBy("canonical_url")
    framed
      .withColumn("_rep", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("url"), col("canonical_url"),
        (col("doc_id") === col("_rep")).cast("int").as("keep"),
        when(col("doc_id") =!= col("_rep"), col("_rep")).as("dup_of"))
  }

  // ──────────────────────────────── q109 ────────────────────────────────

  /** The invisible code points a corpus cleaner strips BEFORE canonical
    * composition: zero-width space/non-joiner/joiner, the BOM-as-ZWNBSP,
    * and the soft hyphen — the characters web text carries that change
    * byte keys while displaying as nothing. A fixed literal set (never a
    * regex class): both engines replay the identical replace chain.
    */
  private val Invisibles =
    Seq("\u200B", "\u200C", "\u200D", "\uFEFF", "\u00AD")

  /** Q109: Unicode normalization — the text-side twin of q91's URL
    * canonicalization, and the precondition for every byte-keyed text
    * operator (q21 md5, q30 fingerprint, q67 line keys, every shingle
    * hash treat "café" with precomposed U+00E9 and with `e`+U+0301 as
    * DIFFERENT documents until this stage runs): strip the invisible
    * set, then NFC-compose via the codegen'd [[graft.functions
    * .NfcNormalize]] kernel. Strip-THEN-normalize, in that order — the
    * planted `%11==6` class puts a zero-width space BETWEEN a base and
    * its combining mark, where normalize-first leaves the pair
    * uncomposed and only the correct order yields the composed form.
    *
    * Synthesis plants every class by residue (combining acute, ring and
    * diaeresis sequences, zero-width/BOM runs, soft-hyphen + joiners,
    * the split-pair trap); the oracle replays synthesis, the SAME
    * literal replace chain, and DuckDB's own `nfc_normalize` — two
    * INDEPENDENT Unicode implementations (JDK vs utf8proc) must agree
    * byte-for-byte for the hash to match. Report-WHY: `changed`,
    * character counts before/after, and the invisible count stay beside
    * the normalized text.
    *
    * Scale shape: one narrow map, zero exchanges; the kernel's
    * `isNormalized` quick-check returns already-NFC rows (all-ASCII in
    * particular — the overwhelming case) untouched with no allocation.
    */
  def q109UnicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val raw = concat(col("text"),
      when(id % 5 === 1, " cafe\u0301").otherwise(""),
      when(id % 5 === 2, " A\u030Angstro\u0308m").otherwise(""),
      when(id % 3 === 0, " zero\u200Bwidth\uFEFF").otherwise(""),
      when(id % 7 === 4, " soft\u00ADhyphen\u200C\u200D").otherwise(""),
      when(id % 11 === 6, " e\u200B\u0301nd").otherwise(""))
    val stripped = Invisibles.foldLeft(col("_raw")) { (acc, ch) =>
      replace(acc, lit(ch), lit(""))
    }
    docs.select(id, raw.as("_raw"))
      .withColumn("_st", stripped)
      .withColumn("_norm", graft.functions.TextOps.nfc(col("_st")))
      .select(id, col("_norm").as("text_norm"),
        (col("_norm") =!= col("_raw")).cast("int").as("changed"),
        length(col("_raw")).cast("bigint").as("n_chars_raw"),
        length(col("_norm")).cast("bigint").as("n_chars_norm"),
        (length(col("_raw")) - length(col("_st"))).cast("bigint")
          .as("n_invisible"))
  }

  // ──────────────────────────────── q110 ────────────────────────────────

  /** Q110: per-LINE language ID — the mixed-document judgment q27's
    * whole-document argmax cannot make (CCNet segments documents and
    * identifies language per paragraph precisely because web pages
    * interleave languages: navigation in one, content in another; a
    * monolingual training mix needs the LINE verdicts). Each line runs
    * the SAME marker scoring as q27 ([[detectedLang]] — shared
    * spelling), then the document aggregates: `dominant_lang` (most
    * lines; ties resolve by q27's preference order via an integer
    * `cnt·8 + rank` key both engines replay), `n_dominant`, and the
    * `mixed` bit a corpus-mixing policy filters on.
    *
    * Scale shape: the line explode is bounded by lines-per-document;
    * scoring is narrow; all three windows ride ONE doc_id exchange —
    * the doc-level window runs first (hash(doc_id)), and the
    * (doc_id, detected) count is satisfied by the subset rule. Pinned.
    */
  def q110LineLangId(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val raw = concat(col("text"),
      when(id % 4 === 1, "\nder hund und die katze lief und der weg die")
        .otherwise(""),
      when(id % 4 === 2, "\nel gato la casa los perros el jardin la")
        .otherwise(""),
      when(id % 5 === 3, "\nle chat les maisons des amis le soir les")
        .otherwise(""),
      when(id % 6 === 5, "\nthe second line of the day a story the end")
        .otherwise(""))
    val rank = when(col("detected") === "en", 5)
      .when(col("detected") === "de", 4)
      .when(col("detected") === "es", 3)
      .when(col("detected") === "fr", 2).otherwise(1)
    val w2 = Window.partitionBy("doc_id")
    val w1 = Window.partitionBy("doc_id", "detected")
    docs.select(id, posexplode(split(raw, "\n")).as(Seq("line_idx", "line")))
      .withColumn("detected", detectedLang(col("line")))
      .withColumn("n_lines", count(lit(1)).over(w2))
      .withColumn("_cnt", count(lit(1)).over(w1))
      .withColumn("_dom",
        max(struct(col("_cnt"), rank.as("_r"), col("detected"))).over(w2))
      .select(id, col("line_idx").cast("int").as("line_idx"),
        col("detected"),
        col("_dom").getField("detected").as("dominant_lang"),
        col("n_lines").cast("bigint").as("n_lines"),
        col("_dom").getField("_cnt").cast("bigint").as("n_dominant"),
        (col("_dom").getField("_cnt") < col("n_lines")).cast("int")
          .as("mixed"))
  }

  // ---------------------------------------------------------------- q128

  /** Q128: HTML character-reference decoding — the cleaning pass that
    * follows structure extraction (q106's content blocks still spell
    * `&amp;` / `&#8212;`): `graft_html_unescape` decodes the stated
    * core named table plus numeric decimal/hex references, ONE level,
    * with verbatim pass-through for everything else (bare ampersands,
    * unknown names, malformed or surrogate/overflow numerics — the
    * HTML5 prose reality plus evidence preservation).
    *
    * Payloads splice a fixed reference gauntlet onto `[&;#]`-cleansed
    * base text (the q114/q117 framing discipline: the base cannot carry
    * references of its own, so expected output = base + the gauntlet's
    * decoded form, derivable in the oracle via chr() codepoints).
    * Residue classes (%5): 0 → named references; 1 → numeric
    * decimal + hex; 2 → the malformed/unknown gauntlet that must come
    * back VERBATIM (incl. a 12-char-window prose ampersand, a bad hex
    * digit, an empty numeric, beyond-Unicode, and a surrogate);
    * 3 → double-encoded `&amp;amp;` (exactly one level comes off);
    * 4 → no references at all (the fast-path control).
    * One narrow map, kernel once per row, zero exchanges.
    */
  def q128HtmlUnescape(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HtmlEntityOps
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val base = regexp_replace(coalesce(col("text"), lit("")), "[&;#]", "")
    val sfx = when(id % 5 === 0,
        " &amp; x &lt;b&gt; &quot;q&quot; &mdash; &eacute; &euro;")
      .when(id % 5 === 1, " &#65;&#x42; &#8212; &#x20AC; end")
      .when(id % 5 === 2,
        " &unknown; &amp x &#xG1; &#; &#x110000; &#xD800; tail")
      .when(id % 5 === 3, " &amp;amp; &amp;#65; z")
      .otherwise("")
    docs.select(id, concat(base, sfx).as("_p"))
      .withColumn("text_out", HtmlEntityOps.htmlUnescape(col("_p")))
      .select(id, col("text_out"),
        length(col("text_out")).cast("bigint").as("n_chars"),
        md5(encode(col("text_out"), "UTF-8")).as("text_md5"))
  }

  /** Q182: Luhn-validated card detection — the governance rung above
    * q46's pattern-only PII scrub (a 16-digit number is only a CARD if
    * its ISO/IEC 7812 check digit closes; pattern-only scrubbers both
    * over-redact order ids and under-flag real leakage): 4-4-4-4
    * candidates with optional separators behind DIGIT-BOUNDARY guards
    * (a 16-digit window inside a 19-digit run is NOT a candidate),
    * the real Luhn fold deciding validity, and redaction that
    * replaces VALID cards while leaving invalid candidates visible as
    * evidence ([[graft.functions.CardEval]]; the spec pins the
    * industry test number 4111-1111-1111-1111).
    *
    * The base text is digit-CLEANSED (the q128 framing discipline) so
    * every candidate below is planted: (%5) 0 → none; 1 → a VALID
    * card (check digit computed by the Luhn closure in-query);
    * 2 → the SAME digits with the check off by one (candidate, not
    * valid, stays visible); 3 → the valid card in dashed 4-4-4-4
    * layout (must redact); 4 → the card embedded in a 19-digit run
    * (no candidate at all). Oracle replays digits, check-digit
    * closure, layouts, and the redacted text in SQL arithmetic.
    * One narrow map, zero exchanges.
    */
  def q182CardScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CardOps
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val base = regexp_replace(coalesce(col("text"), lit("")), "[0-9]", "")
    // digits as ONE lambda over sequence(0,14) instead of 15 repeated
    // expression subtrees (r19): the unrolled spelling planned ~200
    // when/concat nodes and cost ~1.0 s of driver optimize+codegen per
    // invocation (profiled as a 1.04 s inter-job gap on a 0.3 s query).
    // Same integer arithmetic term for term: d(i) = (id·7 + 3i) mod 10,
    // even positions Luhn-doubled with the >9 fold, s15 their sum —
    // identical digits, check digit, and layouts (oracle hash-green).
    val digits = transform(sequence(lit(0), lit(14)),
      i => (id * 7 + i * 3) % 10)
    val s15 = aggregate(
      transform(sequence(lit(0), lit(14)), i => {
        val dI = (id * 7 + i * 3) % 10
        when(i % 2 === 0,
          when(dI * 2 > 9, dI * 2 - 9).otherwise(dI * 2)).otherwise(dI)
      }),
      lit(0L), (acc, x) => acc + x)
    val check = (lit(10) - s15 % 10) % 10
    val prefix = array_join(transform(digits, dd => dd.cast("string")), "")
    val card = concat(prefix, check.cast("string"))
    val dashed = concat(substring(card, 1, 4), lit("-"),
      substring(card, 5, 4), lit("-"), substring(card, 9, 4), lit("-"),
      substring(card, 13, 4))
    val invalid = concat(prefix, ((check + 1) % 10).cast("string"))
    val full = when(id % 5 === 1, concat(base, lit(" card "), card, lit(" end")))
      .when(id % 5 === 2, concat(base, lit(" card "), invalid, lit(" end")))
      .when(id % 5 === 3, concat(base, lit(" card "), dashed, lit(" end")))
      .when(id % 5 === 4, concat(base, lit(" num "), card, lit("123 end")))
      .otherwise(base)
    docs.select(id, CardOps.cardCounts(full).as("_c"),
      md5(encode(CardOps.cardRedact(full), "UTF-8")).as("redacted_md5"))
      .select(id,
        shiftright(col("_c"), 8).cast("int").as("n_candidates"),
        col("_c").bitwiseAND(lit(0xFFL)).cast("int").as("n_valid_cards"),
        col("redacted_md5"))
  }

  /** Q177: readability scoring — the audience-level read beside the
    * quality family (q65's rules judge junk, q64/q81 judge fluency;
    * readability grades judge LEVEL — a children's-content mixture
    * or an expert-text filter buckets by it): Flesch-Kincaid grade in
    * EXACT integer x100 arithmetic — `39·w div s + 1180·sy div w −
    * 1559` with each term floor-divided (the published 0.39/11.8/
    * 15.59 coefficients ×100; float spellings drift by engine, the
    * q81 lesson) — plus type-token ratio as the lexical-diversity
    * companion. Syllables are the stated VOWEL-RUN heuristic: runs
    * of `[aeiouy]+` per word, minimum one per word (a vowel-less
    * token still costs a syllable); sentences are `[.!?]+` runs in
    * the raw text, minimum one. Both sides count with the SAME
    * regexes, and the oracle recounts them independently in DuckDB.
    * One narrow pass, zero exchanges.
    */
  def q177Readability(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val id = col("doc_id")
    val ws = split(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+")
    val toks = filter(ws, w => length(w) > 0)
    val nWords = size(toks).cast("long")
    val nSent = greatest(
      size(expr("regexp_extract_all(coalesce(text, ''), '[.!?]+', 0)")),
      lit(1)).cast("long")
    // per-word vowel runs, min 1: total runs + zero-vowel word count
    val runs = size(expr(
      "regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+', 0)"))
      .cast("long")
    val zeroVowel = size(filter(toks,
      w => !w.rlike("[aeiouy]"))).cast("long")
    val nSyll = runs + zeroVowel
    val nDistinct = size(array_distinct(toks)).cast("long")
    docs.select(id, nSent.as("n_sentences"), nWords.as("n_words"),
      nSyll.as("n_syllables"), nDistinct.as("_nd"))
      .select(id, col("n_sentences"), col("n_words"), col("n_syllables"),
        when(col("n_words") > 0,
          expr("39 * n_words div n_sentences + " +
            "1180 * n_syllables div n_words - 1559")).as("fk_grade_x100"),
        when(col("n_words") > 0,
          expr("_nd * 100 div n_words")).as("ttr_x100"))
  }

  /** Q169: Unicode script mix — the language-MIX and SPOOFING read
    * beside q27/q110's language ID (scripts are the orthogonal axis a
    * multilingual mixing budget buckets by, and a WORD mixing scripts
    * is the UTS #39 homoglyph confusable — `pаypаl` with Cyrillic а
    * marks phishing and poisoning text in a crawl corpus): per-script
    * letter counts over five EXPLICIT code-point ranges
    * ([[graft.functions.ScriptMixEval]] — never the JDK's character
    * tables, so the buckets are engine-version-independent), the
    * dominant script by count with a fixed preference order on ties,
    * and the mixed-script word count as a first-class quality bit.
    *
    * The corpus text is pure ASCII (verified), so every non-Latin
    * letter below is PLANTED by residue (%6): 0 → base only;
    * 1 → + Cyrillic "привет"; 2 → + Greek "αβγδε"; 3 → + CJK
    * 中国語のは (han + kana fold into ONE bucket); 4 → + Arabic
    * "مرحبا"; 5 → + the homoglyph word `pаypаl` (4 Latin + 2
    * Cyrillic letters, exactly ONE mixed word). Oracle replays every
    * count from the base's `[A-Za-z]` tally + the planted chr()
    * arithmetic. One narrow map, zero exchanges.
    */
  def q169ScriptMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ScriptMixOps
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val base = coalesce(col("text"), lit(""))
    // explicit escapes: the planted letters must be EXACTLY these code
    // points (a lookalike Latin 'a' in the homoglyph word would
    // silently un-mix it)
    val planted = when(id % 6 === 1,
      "\u043f\u0440\u0438\u0432\u0435\u0442") // privet
      .when(id % 6 === 2, "\u03b1\u03b2\u03b3\u03b4\u03b5") // alpha..eps
      .when(id % 6 === 3,
        "\u4e2d\u56fd\u8a9e\u306e\u306f") // han x3 + kana x2
      .when(id % 6 === 4,
        "\u0645\u0631\u062d\u0628\u0627") // marhaba
      .when(id % 6 === 5, "p\u0430yp\u0430l") // the homoglyph word
      .otherwise("")
    val text = concat(base, lit(" "), planted)
    val staged = docs.select(id,
      ScriptMixOps.scriptPack1(text).as("_p1"),
      ScriptMixOps.scriptPack2(text).as("_p2"))
      .select(id,
        shiftright(col("_p1"), 40).bitwiseAND(lit(0xFFFFFFL)).as("n_latin"),
        shiftright(col("_p1"), 20).bitwiseAND(lit(0xFFFFFL)).as("n_cyrillic"),
        col("_p1").bitwiseAND(lit(0xFFFFFL)).as("n_greek"),
        shiftright(col("_p2"), 36).bitwiseAND(lit(0xFFFFFFL)).as("n_cjk"),
        shiftright(col("_p2"), 16).bitwiseAND(lit(0xFFFFFL)).as("n_arabic"),
        shiftright(col("_p2"), 4).bitwiseAND(lit(0xFFFL)).cast("int")
          .as("n_mixed_words"),
        col("_p2").bitwiseAND(lit(0xFL)).cast("int").as("n_scripts"))
    // dominant by count, ties to the fixed preference order
    staged.select(id, col("n_latin"), col("n_cyrillic"), col("n_greek"),
      col("n_cjk"), col("n_arabic"), col("n_scripts"),
      when(col("n_scripts") === 0, lit(null).cast("string"))
        .when(col("n_latin") >= greatest(col("n_cyrillic"), col("n_greek"),
          col("n_cjk"), col("n_arabic")), "latin")
        .when(col("n_cyrillic") >= greatest(col("n_greek"), col("n_cjk"),
          col("n_arabic")), "cyrillic")
        .when(col("n_greek") >= greatest(col("n_cjk"), col("n_arabic")),
          "greek")
        .when(col("n_cjk") >= col("n_arabic"), "cjk")
        .otherwise("arabic").as("dominant_script"),
      col("n_mixed_words"))
  }
}
