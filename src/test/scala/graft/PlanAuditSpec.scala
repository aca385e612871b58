package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Similarity}

/** Physical-plan regressions locked in CI: filters reach the parquet scan,
  * projections prune the read schema, small dims broadcast, top-k plans as
  * TakeOrderedAndProject. A future edit that silently loses one of these
  * turns a map-side operator into a full-table cost at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q03 filter is pushed to the parquet scan") {
    val p = plan(Relational.q03Filter(spark, TestSpark.Sf0001))
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"))
  }

  test("q01 projection prunes the read schema to the 3 selected columns") {
    val p = plan(Relational.q01Project(spark, TestSpark.Sf0001))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id"))
    assert(readSchema.contains("event_type"))
    assert(readSchema.contains("value"))
    assert(!readSchema.contains("props"), s"props not pruned: $readSchema")
    assert(!readSchema.contains("user_id"), s"user_id not pruned: $readSchema")
  }

  test("q10 dims broadcast; q07 top-k avoids a global sort") {
    assert(plan(Relational.q10JoinDims(spark, TestSpark.Sf0001))
      .contains("BroadcastHashJoin"))
    assert(plan(Relational.q07TopK(spark, TestSpark.Sf0001))
      .contains("TakeOrderedAndProject"))
  }

  test("q26 vector lookups broadcast and top-k is group-limited below the shuffle") {
    val p = plan(Similarity.annCosine(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("q39 runs the JPEG marker walk exactly once per row") {
    // the packed-dims pre-projection must survive optimization: if
    // CollapseProject ever inlines it, the scan expression reappears once
    // per referencing output column
    val p = plan(graft.operators.Multimodal.q39PngMeta(spark, TestSpark.Sf0001))
    val occurrences = "graft_jpeg_dims".r.findAllIn(p).length
    assert(occurrences === 1, s"expected 1 graft_jpeg_dims in the plan, found $occurrences")
  }

  test("q56 runs the MP4 box walk and WAV chunk walk exactly once per row") {
    // same pre-projection contract as the q39 JPEG pin: each packed long
    // is referenced 2-3 times (field splits), so the walks must live in
    // their own projected columns, not inline in each output field
    val p = plan(graft.operators.Multimodal.q56AvMeta(spark, TestSpark.Sf0001))
    for (kernel <- Seq("graft_mp4_dims", "graft_wav_fmt")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
  }

  test("q57 frame sampling is a pure narrow map with bounded fan-out") {
    val df = graft.operators.Multimodal.q57FrameSample(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "frame sampling grew a shuffle")
    // fan-out bound: stride = ceil(n/8) caps every video at 8 frame rows
    val perDoc = df.groupBy("doc_id").count().agg(
      org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(perDoc <= 8, s"fan-out bound violated: $perDoc frames for one doc")
  }

  test("q59 runs the BMP pixel walk exactly once per row") {
    // same pre-projection contract as the q39/q56 pins: the packed stats
    // long is referenced three times (min/max/mean splits)
    val p = plan(graft.operators.Multimodal.q59BmpPixels(spark, TestSpark.Sf0001))
    val occurrences = "graft_bmp_luma".r.findAllIn(p).length
    assert(occurrences === 1, s"expected 1 graft_bmp_luma in the plan, found $occurrences")
  }

  test("q58 media manifest is one narrow stage: zero exchanges, each walk once") {
    val df = graft.operators.Multimodal.q58MediaManifest(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "the composed media manifest grew a shuffle")
    val p = plan(df)
    for (kernel <- Seq("graft_jpeg_dims", "graft_mp4_dims", "graft_wav_fmt",
        "graft_bmp_luma", "graft_y4m_meta", "graft_wav_pcm_stats")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
  }

  test("q61 executed resize: zero exchanges, resample + fold once per row") {
    val df = graft.operators.Multimodal.q61BmpResample(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "the resample stage grew a shuffle")
    val p = plan(df)
    for (kernel <- Seq("graft_bmp_resize", "graft_bmp_luma")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
  }

  test("q62 audio decode: zero exchanges, fmt walk + sample fold once per row") {
    val df = graft.operators.Multimodal.q62WavPcm(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "the sample fold grew a shuffle")
    val p = plan(df)
    for (kernel <- Seq("graft_wav_fmt", "graft_wav_pcm_stats")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
  }

  test("q60 frame decode: zero exchanges, bounded fan-out, one walk per row") {
    val df = graft.operators.Multimodal.q60Y4mFrames(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "frame pixel decode grew a shuffle")
    val p = plan(df)
    // meta once per doc row, the frame fold once per exploded frame row
    for (kernel <- Seq("graft_y4m_meta", "graft_y4m_frame_luma")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
    val perDoc = df.groupBy("doc_id").count().agg(
      org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(perDoc <= 4, s"fan-out bound violated: $perDoc frames for one doc")
  }

  test("q90 MP4 frame decode: zero exchanges, bounded fan-out, one walk per row") {
    val df = graft.operators.Multimodal.q90Mp4Frames(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "MP4 frame pixel decode grew a shuffle")
    val p = plan(df)
    // sample-info once per doc row, the frame fold once per exploded row
    for (kernel <- Seq("graft_mp4_sample_info", "graft_mp4_frame_luma")) {
      val occurrences = kernel.r.findAllIn(p).length
      assert(occurrences === 1, s"expected 1 $kernel in the plan, found $occurrences")
    }
    val perDoc = df.groupBy("doc_id").count().agg(
      org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(perDoc <= 4, s"fan-out bound violated: $perDoc frames for one doc")
  }

  test("q80 ranks inside buckets and broadcasts the offsets") {
    // the corpus-sized window must be PARTITIONED by the hash-prefix
    // bucket — a refactor that drops the partition spec re-creates the
    // one-task global sort the operator exists to avoid — and the
    // per-bucket offsets (<= 256 rows) must come back as a broadcast,
    // never a corpus-keyed shuffle join
    val df = graft.operators.Scale.q80ShardAssign(spark, TestSpark.Sf0001)
    val p = plan(df)
    val corpusWin = p.linesIterator
      .filter(_.contains("row_number()")).mkString
    assert(corpusWin.contains("_bucket"),
      s"rank window lost its bucket partitioning: $corpusWin")
    assert(p.contains("BroadcastHashJoin"), s"offsets join not broadcast:\n$p")
    assert(shuffles(df) <= 3, s"q80 exchange budget exceeded:\n$p")
    // the offsets side derives its bucket counts from the RANKED frame,
    // so both join inputs hang off ONE shuffle of the corpus — a refactor
    // back to a separate aggregate over the source re-scans + re-md5s the
    // whole corpus for 256 counts. AQE reuses stages at RUNTIME, so the
    // pin reads the final adaptive plan after execution.
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("ReusedQueryStage"),
      s"q80 offsets side re-scans the corpus instead of reusing the rank exchange:\n$finalPlan")
  }

  test("q83 BM25 filters the token stream by broadcast before any exchange") {
    // selective retrieval's plan promise: the corpus-sized token stream
    // meets the tiny query-term dim in a BROADCAST join below the first
    // shuffle, so what shuffles is matched instances, not the corpus;
    // the per-query top-k plans as WindowGroupLimit
    val df = graft.operators.Retrieval.q83Bm25TopK(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"), s"top-k lost its group limit:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"a model-side join degraded from broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"a join went quadratic:\n$p")
    // the ONLY sort-merge/shuffled join allowed is the doc_id-keyed
    // tf ⋈ dl meet (matched instances against the narrow length column —
    // tf must NOT broadcast: a common query term matches a corpus
    // fraction); any term-keyed or query-keyed SMJ means a model frame
    // lost its broadcast
    val smj = p.linesIterator.filter(_.contains("SortMergeJoin")).mkString
    assert(!smj.contains("term#") && !smj.contains("query_id#"),
      s"a term/query-keyed join degraded from broadcast:\n$p")
    // budget: matched-instance exchanges (tf agg, tf⋈dl meet sides, the
    // per-(query,doc) sum, the per-query window) plus the tiny
    // query-table/global frames. The count pins regressions (e.g. the
    // broadcast term filter slipping above the tf exchange).
    assert(shuffles(df) <= 11, s"q83 exchange budget exceeded:\n$p")
    // and the token explode must meet the query-term dim in a broadcast
    // join BELOW the tf exchange: in the printed tree, everything under
    // the (doc_id, term) exchange appears after it — a BHJ must sit
    // between that exchange and the corpus token Generate
    val belowTf = p.split("Exchange hashpartitioning\\(doc_id", 2)(1)
    val toGenerate = belowTf.split("Generate explode", 2)(0)
    assert(toGenerate.contains("BroadcastHashJoin"),
      s"token stream not broadcast-filtered below the tf exchange:\n$p")
  }

  test("q42 reads only doc_id and lang; q41 pushes the doc_id bound to one scan") {
    val p42 = plan(graft.operators.Text.q42QuotaSample(spark, TestSpark.Sf0001))
    val rs = p42.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("lang"))
    assert(!rs.contains("text"), s"q42 reads text for a hash-of-id filter: $rs")
    val p41 = plan(graft.operators.Text.q41TfIdfTopTerms(spark, TestSpark.Sf0001))
    assert(p41.contains("LessThan(doc_id,100)"),
      "q41's tf-side doc_id bound must reach the parquet scan")
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    // count SHUFFLE exchange operators only: broadcasts ship the small
    // side and reuse references are free — the corpus-sized data
    // movements are the "Exchange <partitioning>" nodes
    plan(df).linesIterator.count(l =>
      l.contains("- Exchange ") && !l.contains("ReusedExchange"))

  test("q16 rollup keeps both dim joins broadcast") {
    val p = plan(Relational.q16Rollup(spark, TestSpark.Sf0001))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj === 2, s"expected both nation+region joins broadcast, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"), "a dim join degraded to sort-merge")
  }

  test("q10 joins both dims broadcast") {
    val p = plan(Relational.q10JoinDims(spark, TestSpark.Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length === 2, p)
  }

  test("q41 keeps n_docs broadcast, no cartesian, window keyed by doc_id") {
    val p = plan(graft.operators.Text.q41TfIdfTopTerms(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastExchange"), "the 1-row n_docs side lost its broadcast")
    assert(!p.contains("CartesianProduct"), "a join degraded to a real cartesian")
    // the single-row n_docs cross join legitimately plans as a broadcast
    // nested loop; any OTHER nested loop means the tf×df term join went
    // quadratic over the vocabulary
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1, s"term join went nested-loop ($bnlj BNLJ in plan):\n$p")
    // the top-3 window must partition by doc_id — a global (empty-key)
    // window would serialize the whole corpus through one task
    val winSpec = p.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(winSpec.contains("doc_id"), s"window not partitioned by doc_id: $winSpec")
  }

  test("q26/q36 shuffle budget is pinned") {
    // the ANN pipelines earn their speed by serving dedup + re-rank +
    // top-k from ONE exchange on the query id; a refactor that re-keys a
    // stage silently adds a corpus-sized shuffle — at 100 TB that is the
    // difference between one pass and two
    val e26 = shuffles(Similarity.annCosine(spark, TestSpark.Sf0001))
    assert(e26 <= 3, s"q26 grew to $e26 shuffle exchanges (budget 3)")
    // q36's budget is larger because the centroid TRAINING mini-pipeline
    // (hash-stratified seed + one Lloyd round) plans inline: most of its
    // exchanges move nCells-keyed aggregates, not the corpus. The
    // corpus-sized exchanges stay at three (probe-rank window, home-cell
    // join, query-id repartition feeding the re-rank + top-k).
    val e36 = shuffles(Similarity.ivfCosine(spark, TestSpark.Sf0001))
    assert(e36 <= 13, s"q36 grew to $e36 shuffle exchanges (budget 13)")
  }

  test("q52 bucketed join revenue moves no corpus-sized shuffle") {
    val df = graft.operators.Scale.q52JoinRevenueBucketed(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the join itself must be sort-merge over co-located buckets: no
    // exchange keyed by either join key anywhere in the plan
    assert(p.contains("SortMergeJoin"), s"bucketed join lost SMJ:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a fact table:\n$p")
    // the ONLY allowed shuffle is the 5-group priority aggregate
    assert(shuffles(df) <= 1, s"q52 exchange budget exceeded:\n$p")
    // and the layout changes nothing about the answer
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val want = Relational.q11JoinRevenue(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === want)
  }

  test("q51 survivor plan: holdout broadcast, windowed keep rule, nothing quadratic") {
    // stages 1-3 run behind q51's eager checkpoint, so the audit targets
    // the un-materialized survivor plan directly
    val p = plan(graft.operators.Pipeline.survivorPlan(
      Tables.load(spark, TestSpark.Sf0001, "documents")))
    // the holdout shingle set is benchmark-sized by definition — losing
    // its broadcast turns decontamination into a corpus-sized shuffle join
    assert(p.contains("BroadcastHashJoin"), "holdout shingle join lost its broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a pipeline stage went quadratic")
    // the exact-dedup keep rule is a content-hash-partitioned window —
    // one wide shuffle, one derivation of the decontamination stage.
    // Spark extracts the complex partition key into a `_w0` projection,
    // so the md5 lives one node below the windowspecdefinition
    assert(p.contains("windowspecdefinition"), "keep rule lost its window")
    assert(p.linesIterator.exists(l => l.contains("md5") && l.contains("_w0")),
      "keep-rule window no longer partitions by the content hash")
  }

  test("q55 partial aggregate is keyed by (hot_key, _salt); final by hot_key alone") {
    // the skew handling IS the physical shape: the corpus-sized exchange
    // must carry the salt (spreading the hot key over 16 sub-keys), and
    // only the 16-partials-per-key combine may re-key on hot_key alone. A
    // refactor that drops the salt from the first exchange silently
    // reverts to the one-reducer hot-key plan this query exists to avoid.
    val df = graft.operators.Scale.q55SkewedHotKey(spark, TestSpark.Sf0001)
    val p = plan(df)
    val exchanges = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")).toSeq
    assert(exchanges.size === 2, s"expected 2 exchanges, got:\n$p")
    assert(exchanges.exists(l => l.contains("hot_key") && l.contains("_salt")),
      s"the corpus-sized exchange lost its salt key:\n$p")
    assert(exchanges.exists(l => l.contains("hot_key") && !l.contains("_salt")),
      s"the partial-combine exchange should re-key on hot_key alone:\n$p")
    // and both aggregate phases exist with the right grouping
    val aggs = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(l => l.contains("hot_key") && l.contains("_salt")),
      "partial aggregate no longer groups by the salt")
  }

  test("a landed_date filter on the landing read prunes partitions physically") {
    // Landing writes landed_date= partitions so the curated layer's time
    // filters are PARTITION PRUNING, not data filtering (SURVEY §4). Pin
    // that a date predicate actually reaches the scan's PartitionFilters —
    // losing this turns every dated read into a full-history scan at 100 TB.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.streaming.Landing.landBatch(
      Seq("""{"_LOAD_ID":"a","n":1}""").toDF("value"), s"$base/landing",
      ingestionTime = lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    graft.streaming.Landing.landBatch(
      Seq("""{"_LOAD_ID":"b","n":2}""").toDF("value"), s"$base/landing",
      ingestionTime = lit(java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
    val read = spark.read.parquet(s"$base/landing")
      .filter(col("landed_date") === "2024-01-01")
    val pf = plan(read).linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("landed_date"),
      s"date predicate did not reach PartitionFilters: $pf")
    assert(pf.contains("="), s"no equality partition filter: $pf")
    // and the pruned read returns exactly the one partition's row
    assert(read.count() === 1)
  }

  test("vw_works_v parses the landing JSON exactly once per row") {
    // the VariantType twin EXISTS to parse once and variant_get many —
    // if CollapseProject ever inlines the parse into each of the ~12
    // projected columns, the plan re-parses the record per column and the
    // twin is strictly worse than vw_works (the q39 marker-walk pin
    // pattern)
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("graft_varpin").toString
    graft.streaming.Landing.landBatch(
      Seq("""{"_LOAD_ID":"v1","id":"W1","title":"T"}""").toDF("value"),
      s"$base/landing",
      ingestionTime = lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    Bootstrap.initLanding(spark, s"$base/landing")
    val p = plan(spark.sql("SELECT * FROM vw_works_v"))
    // try_parse_json plans as static_invoke(VariantExpressionEvalUtils
    // .parseJson(...)) — count the eval-utils marker, not the SQL name
    val parses = "parseJson\\(".r.findAllIn(p).length
    assert(parses === 1,
      s"expected exactly 1 parseJson in the physical plan, found $parses:\n$p")
    // and the single parse is materialized in its OWN projection, with
    // every typed column reading the variant through try_variant_get
    assert("try_variant_get".r.findAllIn(p).length >= 10,
      "typed columns no longer read through the shared variant")
  }

  test("the codegen'd graft_dot kernel carries the vector queries") {
    // a refactor that silently falls back to the interpreted HOF twin
    // re-opens the r2/r3 ~100x ANN regression (BENCH_NOTES.md) — pin the
    // kernel's presence in every vector query's physical plan
    for ((name, df) <- Seq(
      "q19" -> Similarity.q19CosineTopK(spark, TestSpark.Sf0001),
      "q25" -> Similarity.q25TopPairs(spark, TestSpark.Sf0001),
      "q26" -> Similarity.annCosine(spark, TestSpark.Sf0001),
      "q36" -> Similarity.ivfCosine(spark, TestSpark.Sf0001))) {
      assert(plan(df).contains("graft_dot"), s"$name lost the codegen'd kernel")
    }
  }

  test("q64 joins the vocabulary broadcast; only the two training shuffles") {
    // DEFAULT (materialized) shape first: tokens come from the r19
    // checkpoint, so the final plan must carry ZERO tokenization passes —
    // both consumers read the materialized (doc_id, tok) blocks
    val df = graft.operators.Text.q64UnigramSurprisal(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "a q64 join degraded to sort-merge")
    assert("Generate explode".r.findAllIn(p).isEmpty,
      s"a consumer re-tokenized past the q64.tokens checkpoint:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q64 lost the tokens checkpoint:\n$p")
    // the UNDERLYING audit on the pre-materialization plan (kill-switch
    // off-path, and what the checkpoint build itself executes upstream):
    // exactly two corpus passes (score stream + vocab build) and the
    // three training shuffles — a third tokenization or a doc_id-keyed
    // re-join with `documents` means a signal regrew its own subtree
    spark.conf.set("spark.graft.materialize", "off")
    try {
      val df0 = graft.operators.Text.q64UnigramSurprisal(spark, TestSpark.Sf0001)
      val p0 = plan(df0)
      assert(p0.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$p0")
      assert(!p0.contains("SortMergeJoin"), "a q64 join degraded to sort-merge")
      assert(shuffles(df0) === 3, s"q64 grew a shuffle:\n$p0")
      val scans = "Generate explode".r.findAllIn(p0).length
      assert(scans === 2, s"expected 2 tokenization passes, found $scans:\n$p0")
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("q65 rule filter is one narrow stage: zero exchanges") {
    val df = graft.operators.Text.q65RuleFilter(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "the rule gate grew a shuffle")
    // one tokenization feeding every signal — a per-rule re-split would
    // multiply the regex cost per row
    val p = plan(df)
    val splits = "split\\(lower".r.findAllIn(p).length
    assert(splits === 1, s"expected 1 tokenization, found $splits:\n$p")
  }

  test("q69 interval join extracts the equi-key; the range never degrades to NLJ") {
    val df = graft.operators.Relational.q69IntervalJoin(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the fatal plan for an interval join is the range condition eating
    // the user_id equi-key: a nested-loop/cartesian over two corpus-sized
    // sides — per-key merge state bounded by the 60-minute span is the
    // whole scale story
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"q69 lost its equi-key:\n$p")
    assert(shuffles(df) <= 2, s"q69 grew beyond one shuffle per side:\n$p")
  }

  test("q70 substring dedup: shuffled vocab join by design, no broadcast") {
    val df = graft.operators.Dedup.q70SubstringDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the duplicate-8-gram vocabulary is corpus-scaled — the premise is
    // that it does NOT broadcast (q67's boilerplate set does); the
    // instance⋈vocab meet must stay a shuffled hash join on the uniform
    // shingle key
    assert(p.contains("ShuffledHashJoin [sh"), s"vocab join shape changed:\n$p")
    assert(!p.contains("BroadcastHashJoin [sh"),
      "the corpus-scaled vocab must not claim broadcastability")
    // (the doc_id re-join is left to stats: broadcast at test scale,
    // SMJ at corpus scale — both are the right call for their inputs)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
    // exchanges: shingle-count agg + the two join sides on sh, the
    // per-doc start fold, and the doc_id re-join of `documents` — all
    // uniform keys; the reconstruction itself is pure narrow array work
    assert(shuffles(df) <= 6, s"q70 grew a shuffle:\n$p")
  }

  test("q71 web preclean keeps the line-dedup exchange budget; gates are narrow") {
    val df = graft.operators.Text.q71WebPreclean(spark, TestSpark.Sf0001)
    val p = plan(df)
    // stage 1 (blocklist) and stage 3 (rule bits) must add NO exchange:
    // the whole composition pays only q67's three uniform shuffles, with
    // registered_domain riding the reassembly key instead of a repair join
    assert(shuffles(df) === 3, s"a q71 gate stage grew a shuffle:\n$p")
    // blocklist + dup-vocab joins broadcast (the blocklist one replays on
    // both lineages of the exploded line frame — a broadcast is the cheap
    // thing to replay, which is rather the point)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"a q71 broadcast join disappeared, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"), "a q71 join degraded to sort-merge")
  }

  test("q72 boilerplate report plans a heap top-k, not a vocabulary sort") {
    val df = graft.operators.Text.q72TopBoilerplate(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"q72 lost the heap top-k:\n$p")
    assert(shuffles(df) === 2, s"q72 grew beyond the two df exchanges:\n$p")
  }

  test("q73 PQ: codebook broadcasts everywhere, no cartesian, bounded exchanges") {
    val df = Similarity.q73AnnPq(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "PQ grew a cartesian product")
    assert(p.contains("BroadcastHashJoin"), "codebook joins lost the broadcast")
    assert(p.contains("graft_pq_adc"), "ADC stage lost the codegen kernel")
    // 6 = LSH band cap ×2 sides + pair repartition/dedup + encode's two
    // uniform aggs + the LUT agg + ADC shortlist window + final top-k,
    // MINUS the two dense-regime broadcasts (r14: the 16-byte stored
    // frame and the LUT table broadcast below AnnDenseMax, so the
    // candidate stream flows from its dedup exchange straight into the
    // window sort); the codebook is a driver-trained LocalTableScan
    // (r15: the bounded slice trains on the driver), so training adds
    // NOTHING per consumer — growth here means the codebook grew a
    // lineage (or a lost broadcast) came back
    assert(shuffles(df) === 6, s"q73 exchange budget grew:\n$p")
  }

  test("q74 incremental dedup: hash-keyed equi-joins only, no cartesian") {
    val df = graft.operators.Dedup.q74IncrementalDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "q74 grew a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q74 degraded to NLJ")
    // 4 = the two minhash signature aggs (one per frame) + the band-meet /
    // fingerprint-meet verdict shuffles; every join key is an md5-uniform
    // hash or doc_id — growth here means a meet stopped being an equi-join
    assert(shuffles(df) <= 4, s"q74 exchange budget grew:\n$p")
  }

  test("q78 explicit-values pivot stays the two-phase aggregate, no discovery") {
    val df = graft.operators.Text.q78SplitMatrix(spark, TestSpark.Sf0001)
    // Spark rewrites pivot as a two-phase aggregate: a partial-aggregable
    // pre-agg on (source, split) — the intermediate is bounded by
    // sources × folds — then the matrix agg on source. Both exchanges are
    // uniform. pivot WITHOUT explicit values would additionally run a
    // distinct-discovery JOB over the corpus before planning at all —
    // growth past 2 means that job (or a sort) came back
    assert(shuffles(df) === 2, s"q78 exchange budget grew:\n${plan(df)}")
  }

  test("q67 line dedup: uniform shuffles only, broadcast keep-test") {
    val df = graft.operators.Text.q67LineDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the exploded line table learns its fate from a BROADCAST of the
    // (tiny) duplicate-line vocabulary — shuffling the corpus's lines
    // against it would move the whole corpus an extra time at 100 TB
    assert(p.contains("BroadcastHashJoin"), s"keep-test not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "the keep-test degraded to SMJ")
    // exchanges: the distinct-agg rewrite's uniform (line, doc_id) pair
    // shuffle, the vocabulary-sized line-df fold, and the doc_id
    // reassembly — a hot boilerplate line never lands raw on one reducer
    assert(shuffles(df) === 3, s"q67 grew a shuffle:\n$p")
  }

  test("q68 blocklist: zero shuffles, the domain list broadcasts") {
    val df = graft.operators.Text.q68UrlBlocklist(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the corpus must never shuffle to learn a domain verdict — the
    // blocklist (a few million domains in a real deployment, tens of MB)
    // comes to the data
    assert(p.contains("BroadcastHashJoin"), s"blocklist join not broadcast:\n$p")
    assert(shuffles(df) === 0, s"q68 grew a shuffle:\n$p")
  }

  test("q66 deflate kernel runs once per row in a zero-exchange plan") {
    val df = graft.operators.Text.q66CompressRatio(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, "the compression signal grew a shuffle")
    val p = plan(df)
    val kernels = "graft_deflate_len".r.findAllIn(p).length
    assert(kernels === 1, s"expected 1 deflate walk, found $kernels:\n$p")
  }

  test("vw_doc_quality composes signals without re-deriving scans") {
    // DEFAULT (materialized) shape: q64's two passes read the tokens
    // checkpoint, so only the narrow rule/score projection still scans
    // parquet — exactly ONE corpus scan in the final plan
    val df = graft.operators.Text.docQuality(spark, TestSpark.Sf0001)
    val p = plan(df)
    // one deflate for the ratio column — the carried-column pattern must
    // not let a later projection duplicate the kernel walk
    val kernels = "graft_deflate_len".r.findAllIn(p).length
    assert(kernels === 1, s"expected 1 deflate walk, found $kernels")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 corpus scan beside the tokens " +
      s"checkpoint, found $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"lost the tokens checkpoint:\n$p")
    // UNDERLYING audit (kill-switch off-path — the full unfolded plan):
    // the rule/score projection + q64's score stream and vocab build —
    // a fourth scan means some signal regrew its own subtree (textual
    // split() occurrences over-count here: qualityScore's two words()
    // uses inside ONE projection collapse via codegen subexpression
    // elimination, so scans are the honest metric)
    spark.conf.set("spark.graft.materialize", "off")
    try {
      val p0 = plan(graft.operators.Text.docQuality(spark, TestSpark.Sf0001))
      val scans0 = "FileScan parquet".r.findAllIn(p0).length
      assert(scans0 === 3, s"expected 3 corpus scans, found $scans0:\n$p0")
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("q63 probes the bloom sketch below a SHUFFLED exact-confirm join") {
    val df = graft.operators.Text.q63BloomDecontaminate(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the probe prunes the corpus side BEFORE the wide operation...
    assert(p.contains("might_contain"), "bloom probe fell out of the plan")
    // ...and the confirm join stays shuffled — broadcasting the holdout is
    // exactly what this query exists NOT to do (the at-scale premise); the
    // probe must sit deeper in the tree than the join it feeds
    assert(p.contains("ShuffledHashJoin"), s"exact confirm not shuffled:\n$p")
    assert(p.indexOf("might_contain") > p.indexOf("ShuffledHashJoin"),
      "bloom probe is not below the confirm join")
  }

  test("q93 HTML extraction is one narrow stage — zero exchanges") {
    // regex strip + entity decode + counts are pure column work; any
    // exchange here means the extraction grew a shuffle it cannot need
    val df = graft.operators.Crawl.q93HtmlExtract(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q94 seen-set meet stays shuffled and the frontier window reuses its key") {
    val df = graft.operators.Crawl.q94LinkFrontier(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the seen-set is every URL ever fetched — corpus-sized; a broadcast
    // here is the 100 TB mistake (q70's rule). The hint pins the shape.
    assert(p.contains("ShuffledHashJoin"), s"seen-set meet not shuffled:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"seen-set broadcast:\n$p")
    // links shuffle once per side for the join; the first-discoverer
    // window partitions by the SAME canonical key, so its exchange must
    // be satisfied by the join's partitioning: 3 shuffles total (link
    // side, seen side, window) is the budget — the window one is either
    // reused or absorbed
    assert(shuffles(df) <= 3, s"expected <= 3 shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q95 gzip codec: zero exchanges, each kernel once per row") {
    val df = graft.operators.Crawl.q95GzipMembers(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the corruption cases reference the encoded member 3 times and the
    // outputs reference the decode 3 times — the pre-projections must
    // survive CollapseProject or the native deflate runs 3x per row
    for (k <- Seq("graft_gzip(", "graft_gunzip(", "graft_gzip_name(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q97 crawl intake composes codec + container + extraction in one narrow stage") {
    val df = graft.operators.Crawl.q97CrawlIntake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the expensive walks each run once per row through the composition
    for (k <- Seq("graft_gzip(", "graft_gunzip(", "graft_warc_offsets(",
        "graft_warc_payload(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q98 robots dims broadcast; q99 envelope parse is narrow") {
    val p98 = plan(graft.operators.Crawl.q98RobotsGate(spark, TestSpark.Sf0001))
    // the graftbot-host dim and the rule table both broadcast (q68's
    // premise — parsed robots files are dim-sized); the rule meet keeps
    // its equi keys so the prefix test is a join condition, never an NLJ
    assert("BroadcastHashJoin".r.findAllIn(p98).length >= 2, p98)
    assert(!p98.contains("BroadcastNestedLoopJoin") &&
      !p98.contains("CartesianProduct"), p98)
    val df99 = graft.operators.Crawl.q99HttpEnvelope(spark, TestSpark.Sf0001)
    assert(shuffles(df99) === 0, s"expected 0 shuffles:\n${plan(df99)}")
  }

  test("q107 schedule: rank/rule dims broadcast, one new frontier exchange beyond q94") {
    val df = graft.operators.Crawl.q107FetchSchedule(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the rule table, the graftbot-host dim, AND the host-rank priority
    // dim all broadcast — the frontier never moves to meet a dim
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // corpus-sized exchange budget: q94's three + ONE new (the per-host
    // sequencing window keyed (host, allowed)). The robots judgment's
    // aggregation must ride q94's canonical_url partitioning (robotsJudge
    // groups by the URL alone for exactly this) — a 5th hash exchange
    // means that reuse broke. The host-priority window's
    // Exchange SinglePartition is over the HOST DIM only and is counted
    // separately.
    val corpusShuffles = p.linesIterator.count(l =>
      l.contains("- Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(corpusShuffles <= 4, s"expected <= 4 hash exchanges:\n$p")
  }

  test("q101 image dedup: one fingerprint shuffle, pixels never move twice") {
    val df = graft.operators.Multimodal.q101ImageDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the kernel runs once per row; the only exchange moves the 8-byte
    // hash (the window key) — image dedup at scale ships fingerprints,
    // not pixels
    val n = java.util.regex.Pattern.quote("graft_bmp_ahash(").r.findAllIn(p).length
    assert(n === 1, s"expected 1 graft_bmp_ahash in the plan, found $n:\n$p")
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("q103 sitemap ingest is narrow: zero exchanges, bounded fan-out") {
    val df = graft.operators.Crawl.q103SitemapIngest(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q106 block extraction is narrow: zero exchanges, bounded fan-out") {
    val df = graft.operators.Crawl.q106ContentBlocks(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q105 diffs snapshots with one equi-key full-outer join") {
    val df = graft.operators.Crawl.q105CrawlDiff(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) <= 2, s"expected <= 2 shuffles:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q104 profiles every column in ONE scan") {
    val df = graft.operators.Relational.q104ColumnProfile(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the naive spelling is one aggregate query PER column (the oracle's
    // shape, 5 scans); the operator must pay a single pass with Expand
    // carrying the multi-column distinct
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected 1 scan, got $scans:\n$p")
    assert(p.contains("Expand"), s"multi-distinct lost its expand:\n$p")
  }

  test("q104's sketched twin drops Expand, keeps one scan, agrees within 5%") {
    // the 100 TB swap shipped as tested code (r11 verdict task #7): the
    // exact profile's N countDistincts duplicate the input stream N ways
    // through Expand; the HLL twin must fold everything in ONE
    // un-duplicated pass — and every non-estimated column must be
    // IDENTICAL, with the estimates inside the sketch's 5% rsd
    val exact = graft.operators.Relational.q104ColumnProfile(spark, TestSpark.Sf0001)
    val sk = graft.operators.Relational.columnProfileSketched(spark, TestSpark.Sf0001)
    val pSk = plan(sk)
    assert(pSk.linesIterator.count(_.contains("Scan parquet")) === 1, pSk)
    assert(!pSk.contains("Expand"), s"sketched profile still expands:\n$pSk")
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val s = sk.collect().map(r => r.getString(0) -> r).toMap
    assert(e.keySet === s.keySet)
    for ((c, er) <- e) {
      val sr = s(c)
      for (i <- Seq(1, 2, 4, 5)) // n_rows, n_null, min_v, max_v
        assert(er.get(i) === sr.get(i), s"$c col $i drifted between twins")
      val (ed, sd) = (er.getLong(3), sr.getLong(3))
      assert(math.abs(sd - ed) <= math.max(2L, (0.05 * ed).toLong),
        s"$c n_distinct: exact $ed vs sketch $sd — outside 5%")
    }
  }

  test("q109 unicode normalize is one narrow stage; the kernel runs once per row") {
    val df = graft.operators.Text.q109UnicodeNormalize(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // _norm is referenced 3 times (output, changed, length) — the
    // pre-projection must survive CollapseProject or the normalizer
    // runs 3x per row (the q39/q95 once-per-row contract)
    val n = java.util.regex.Pattern.quote("graft_nfc(").r.findAllIn(p).length
    assert(n === 1, s"expected 1 graft_nfc in the plan, found $n:\n$p")
  }

  test("q110 line language ID rides ONE doc_id exchange for all three windows") {
    val df = graft.operators.Text.q110LineLangId(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the doc-level window exchanges hash(doc_id) FIRST; the
    // (doc_id, detected) count and the dominant struct-max must both be
    // satisfied by the subset rule on that same partitioning — a second
    // exchange means the window order regressed
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("q111 Q5 join: date filter reaches the orders scan, dims broadcast") {
    val df = graft.operators.Relational.q111RegionalRevenue(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the one-year window must prune at the ORDERS scan — an unfiltered
    // lineitem x orders join sees seven years of fact rows for nothing
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed to the orders scan:\n$p")
    // supplier/customer/nation/region are dims: four broadcasts, and the
    // local-supply predicate (c_nationkey = s_nationkey) must ride a
    // hash join's condition, never degrade the plan to an NLJ
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("q116 full-stack intake: one narrow stage, every kernel once per row") {
    val df = graft.operators.Crawl.q116FullStackIntake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // six layers of pre-projections must all survive CollapseProject —
    // any kernel appearing twice means a walk re-runs per referencing
    // output column
    for (k <- Seq("graft_gzip(", "graft_gunzip(", "graft_warc_offsets(",
        "graft_warc_payload(", "graft_http_sep(", "graft_dechunk(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q115 chunked decode: zero exchanges, the kernel once per row") {
    val df = graft.operators.Crawl.q115ChunkedDecode(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // _body feeds 3 output columns — the pre-projection must survive
    // CollapseProject or the walk runs 3x per row
    val n = java.util.regex.Pattern.quote("graft_dechunk(").r.findAllIn(p).length
    assert(n === 1, s"expected 1 graft_dechunk in the plan, found $n:\n$p")
  }

  test("q114 charset decode is a pure map — zero exchanges") {
    val df = graft.operators.Crawl.q114CharsetDecode(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q117 charset sniff is a pure map — zero exchanges") {
    val df = graft.operators.Crawl.q117CharsetSniff(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q119 funnel: one exchange serves the windows and the closing aggregate") {
    // the whole multi-step funnel pays ONE shuffle: the chained running
    // windows and the per-user aggregate all ride the same user
    // partitioning (the per-step join spelling pays one per step)
    val df = graft.operators.Relational.q119Funnel(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n${plan(df)}")
  }

  test("q120 cohorts: the corpus scans once, cohort math on dim keys") {
    val df = graft.operators.Relational.q120Cohorts(spark, TestSpark.Sf0001)
    val p = plan(df)
    // one corpus exchange (user agg) + the dim-sized matrix agg and
    // diagonal window; a second corpus scan (the sizes-as-separate-agg
    // spelling) would show as a second parquet scan in the plan
    assert(shuffles(df) <= 3, s"expected <= 3 shuffles:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 parquet scan, found $scans:\n$p")
  }

  test("q118 jpeg pixels: zero exchanges, decode walks once per row") {
    val df = graft.operators.Multimodal.q118JpegPixels(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the packed stats feed 4 output columns and the packed dims 4 — the
    // pre-projections must survive CollapseProject or the Huffman+IDCT
    // walk runs per referencing column
    for (k <- Seq("graft_jpeg_luma(", "graft_jpeg_synth(", "graft_jpeg_dims(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q121 png pixels: zero exchanges, decode walks once per row") {
    val df = graft.operators.Multimodal.q121PngPixels(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the packed stats feed 4 output columns — the pre-projection must
    // survive CollapseProject or the inflate + filter walk runs per
    // referencing column
    for (k <- Seq("graft_png_luma(", "graft_png_synth(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q124 gif pixels: zero exchanges, decode walks once per row") {
    val df = graft.operators.Multimodal.q124GifPixels(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_gif_luma(", "graft_gif_synth(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q125 pdf extract: zero exchanges, each walk once per row") {
    val df = graft.sources.Pdf.q125PdfExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_pdf_text(", "graft_pdf_synth(", "graft_pdf_pages(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q126 utf16 intake: zero exchanges, sniff once per row") {
    val df = graft.operators.Crawl.q126Utf16Intake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_sniff_charset(")
      .r.findAllIn(p).length
    assert(n === 1, s"expected 1 sniff in the plan, found $n:\n$p")
  }

  test("q127 image intake: zero exchanges, each decoder routed once") {
    val df = graft.operators.Multimodal.q127ImageIntake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the routing when-chain holds each family's decode exactly once —
    // a second occurrence means a pre-projection collapsed and some
    // column re-runs a full decode walk
    for (k <- Seq("graft_jpeg_luma(", "graft_png_luma(", "graft_gif_luma(",
      "graft_webp_luma(", "graft_jpeg_dims(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q135 webp pixels is a pure map — zero exchanges, kernel once") {
    val df = graft.operators.Multimodal.q135WebpPixels(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_webp_luma(", "graft_webp_synth(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q128 html unescape is a pure map — zero exchanges, kernel once") {
    val df = graft.operators.Text.q128HtmlUnescape(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_html_unescape(")
      .r.findAllIn(p).length
    assert(n === 1, s"expected 1 kernel in the plan, found $n:\n$p")
  }

  test("q129 tiff meta is a pure map — zero exchanges, kernel once") {
    val df = graft.operators.Multimodal.q129TiffMeta(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_tiff_dims(", "graft_tiff_synth(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q130 mp3 meta is a pure map — zero exchanges, kernel once") {
    val df = graft.operators.Multimodal.q130Mp3Meta(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_mp3_meta(", "graft_mp3_synth(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q131 exif intake is a pure map — zero exchanges, kernels once") {
    val df = graft.operators.Multimodal.q131ExifIntake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // the synth and each derived read must survive CollapseProject as a
    // single call — the plane decode is the expensive leg
    for (k <- Seq("graft_exif_synth(", "graft_exif_orient(",
      "graft_exif_ahash(", "graft_jpeg_dims(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q132 zip extract is a pure map — zero exchanges, synth once") {
    val df = graft.sources.Zip.q132ZipExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    // one synthesis; three member reads are three calls by design (each
    // verifies independently), but the SYNTH must not re-run per read
    val n = java.util.regex.Pattern.quote("graft_zip_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_zip_synth in the plan, found $n:\n$p")
  }

  test("q133 docx extract is a pure map — zero exchanges, kernels once") {
    val df = graft.sources.Docx.q133DocxExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    for (k <- Seq("graft_docx_synth(", "graft_docx_text(",
      "graft_docx_paras(")) {
      val n = java.util.regex.Pattern.quote(k).r.findAllIn(p).length
      assert(n === 1, s"expected 1 $k in the plan, found $n:\n$p")
    }
  }

  test("q136 tar extract is a pure map — zero exchanges, synth once") {
    val df = graft.sources.Tar.q136TarExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_tar_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_tar_synth in the plan, found $n:\n$p")
  }

  test("q137 mime extract is a pure map — zero exchanges, synth once") {
    val df = graft.sources.Mime.q137MimeExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_mime_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_mime_synth in the plan, found $n:\n$p")
  }

  test("q138 subtitle extract is a pure map — zero exchanges, synth once") {
    val df = graft.operators.Subtitles.q138SubtitleExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_sub_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_sub_synth in the plan, found $n:\n$p")
  }

  test("q139 flac meta is a pure map — zero exchanges, synth once") {
    val df = graft.operators.Multimodal.q139FlacMeta(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_flac_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_flac_synth in the plan, found $n:\n$p")
  }

  test("q140 markdown extract is a pure map — zero exchanges, synth once") {
    val df = graft.operators.Markdown.q140MarkdownExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_md_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_md_synth in the plan, found $n:\n$p")
  }

  test("q141 feed ingest is a pure map — zero exchanges, synth once") {
    val df = graft.operators.Feeds.q141FeedIngest(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_feed_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_feed_synth in the plan, found $n:\n$p")
  }

  test("q142 epub extract is a pure map — zero exchanges, synth once") {
    val df = graft.sources.Epub.q142EpubExtract(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_epub_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_epub_synth in the plan, found $n:\n$p")
  }

  test("q143 mojibake repair is a pure map — zero exchanges, synth once") {
    val df = graft.operators.Mojibake.q143MojibakeRepair(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n$p")
    val n = java.util.regex.Pattern.quote("graft_mojibake_synth(").r
      .findAllIn(p).length
    assert(n === 1, s"expected 1 graft_mojibake_synth in the plan, found $n:\n$p")
  }

  test("q113 recrawl policy is a pure map — zero exchanges") {
    val df = graft.operators.Crawl.q113RecrawlPolicy(spark, TestSpark.Sf0001)
    assert(shuffles(df) === 0, s"expected 0 shuffles:\n${plan(df)}")
  }

  test("q102 candidates ride the band-key shuffle; no all-pairs anywhere") {
    val df = graft.operators.Multimodal.q102ImageNearDup(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"pair meet went all-pairs:\n$p")
    // both meet sides derive from the same hash frame (the kernel may
    // appear once per side), and everything moves on (band, bval) /
    // dedup keys — small fixed budget
    assert(shuffles(df) <= 4, s"expected <= 4 shuffles:\n$p")
  }

  test("q100 broadcasts the holdout; one corpus exchange for the max") {
    val df = graft.operators.Similarity.q100SemanticDecon(spark, TestSpark.Sf0001)
    val p = plan(df)
    // the holdout is benchmark-sized BY NATURE — the train side must
    // stream map-side through the dot kernel (q45's premise in embedding
    // space); the only exchange is the per-train-vector aggregation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"holdout lost its broadcast:\n$p")
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("round-15 narrow kernels stay zero-exchange maps") {
    val zeroes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q144" -> graft.operators.Latex.q144LatexExtract(spark, TestSpark.Sf0001),
      "q145" -> graft.operators.Bibtex.q145BibtexParse(spark, TestSpark.Sf0001),
      "q146" -> graft.operators.Sitemap.q146SitemapParse(spark, TestSpark.Sf0001),
      "q147" -> graft.operators.HtmlTables.q147HtmlTables(spark, TestSpark.Sf0001),
      "q149" -> graft.operators.Multimodal.q149OggMeta(spark, TestSpark.Sf0001),
      "q152" -> graft.operators.Multimodal.q152AviMeta(spark, TestSpark.Sf0001),
      "q154" -> graft.operators.Crawl.q154PageVerdict(spark, TestSpark.Sf0001),
      "q155" -> graft.sources.Rtf.q155RtfExtract(spark, TestSpark.Sf0001),
      "q157" -> graft.operators.Text.q157SentenceSplit(spark, TestSpark.Sf0001),
      "q158" -> graft.operators.Multimodal.q158Id3Tags(spark, TestSpark.Sf0001),
      "q159" -> graft.operators.Multimodal.q159SvgMeta(spark, TestSpark.Sf0001),
      "q160" -> graft.sources.TfRecord.q160TfrecordIngest(spark, TestSpark.Sf0001),
      "q161" -> graft.sources.TfExample.q161TfExampleDecode(spark, TestSpark.Sf0001),
      "q162" -> graft.operators.Multimodal.q162EbmlMeta(spark, TestSpark.Sf0001),
      "q164" -> graft.sources.Avro.q164AvroIngest(spark, TestSpark.Sf0001),
      "q165" -> graft.sources.Zstd.q165ZstdTriage(spark, TestSpark.Sf0001),
      "q166" -> graft.operators.Lake.q166ParquetFooter(spark, TestSpark.Sf0001),
      "q167" -> graft.operators.Crawl.q167IdnHosts(spark, TestSpark.Sf0001),
      "q168" ->
        graft.operators.Multimodal.q168DataUriHarvest(spark, TestSpark.Sf0001),
      "q169" -> graft.operators.Text.q169ScriptMix(spark, TestSpark.Sf0001),
      "q171" -> graft.operators.Multimodal.q171G711Audio(spark, TestSpark.Sf0001),
      "q172" -> graft.operators.Multimodal.q172PnmPixels(spark, TestSpark.Sf0001),
      "q175" -> graft.sources.Cbor.q175CborDecode(spark, TestSpark.Sf0001),
      "q176" -> graft.operators.Multimodal.q176IcoMeta(spark, TestSpark.Sf0001),
      "q177" -> graft.operators.Text.q177Readability(spark, TestSpark.Sf0001),
      "q179" ->
        graft.operators.Crawl.q179CacheFreshness(spark, TestSpark.Sf0001),
      "q182" -> graft.operators.Text.q182CardScan(spark, TestSpark.Sf0001),
      "q184" ->
        graft.sources.Compress.q184CompressRouter(spark, TestSpark.Sf0001),
      "q185" ->
        graft.sources.ArrowIpc.q185ArrowIpcTriage(spark, TestSpark.Sf0001),
      "q186" -> graft.operators.Lake.q186OrcFooter(spark, TestSpark.Sf0001),
      "q187" -> graft.operators.Lake.q187LakeCensus(spark, TestSpark.Sf0001))
    zeroes.foreach { case (name, df) =>
      assert(shuffles(df) === 0, s"$name grew a shuffle:\n${plan(df)}")
    }
  }

  test("compression-family intakes (q188-q197) stay zero-exchange maps") {
    // the r16 family shipped value specs but no plan pins — this is the
    // repo's own bar: every decode is a narrow per-row kernel; payloads
    // never shuffle
    val zeroes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q188" -> graft.sources.Zstd.q188ZstdDecode(spark, TestSpark.Sf0001),
      "q190" -> graft.sources.Compress.q190Lz4Decode(spark, TestSpark.Sf0001),
      "q191" -> graft.sources.Compress.q191Bzip2Decode(spark, TestSpark.Sf0001),
      "q192" -> graft.sources.Compress.q192XzDecode(spark, TestSpark.Sf0001),
      "q193" ->
        graft.sources.Compress.q193UniversalDecode(spark, TestSpark.Sf0001),
      "q194" -> graft.sources.Wiki.q194WikiDump(spark, TestSpark.Sf0001),
      "q195" -> graft.sources.Tar.q195TarballIntake(spark, TestSpark.Sf0001),
      "q196" ->
        graft.operators.Multimodal.q196Vp8Pixels(spark, TestSpark.Sf0001),
      "q197" ->
        graft.operators.Multimodal.q197TiffPixels(spark, TestSpark.Sf0001))
    zeroes.foreach { case (name, df) =>
      val p = plan(df)
      assert(shuffles(df) === 0, s"$name grew a shuffle:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name NLJ:\n$p")
    }
  }

  test("intake capstones decompress each payload exactly once") {
    // the composed stacks (WARC wrap -> compress -> fetch-cut ->
    // decode -> record walk -> header split -> dechunk -> charset ->
    // extract) must run their decode kernel ONCE per row — a
    // CollapseProject slip that inlines the decode into each
    // referencing column re-decompresses the payload per output field
    val pins = Seq(
      ("q116", plan(graft.operators.Crawl
        .q116FullStackIntake(spark, TestSpark.Sf0001)), "graft_gunzip"),
      ("q189", plan(graft.operators.Crawl
        .q189ZstdIntake(spark, TestSpark.Sf0001)), "graft_zstd_decode_strict"),
      ("q194", plan(graft.sources.Wiki
        .q194WikiDump(spark, TestSpark.Sf0001)), "graft_bzip2_decode"),
      ("q195", plan(graft.sources.Tar
        .q195TarballIntake(spark, TestSpark.Sf0001)), "graft_bzip2_decode"))
    pins.foreach { case (name, p, kernel) =>
      val n = (kernel + "\\(").r.findAllIn(p).length
      assert(n === 1, s"$name: expected 1 $kernel in the plan, found $n")
    }
  }

  test("q107 host rank: both spellings keep their pinned shapes") {
    import org.apache.spark.sql.functions.col
    val prio = graft.operators.Crawl.q96LinkRank(spark, TestSpark.Sf0001)
      .select(col("host").as("rank_host"), col("rank_p5"))
      .localCheckpoint()
    // default (dim window): one single-partition window, no range
    val dimPlan = plan(graft.operators.Crawl.hostPriority(spark, prio))
    assert(!dimPlan.contains("rangepartitioning"),
      s"dim spelling grew a range exchange:\n$dimPlan")
    // forced two-phase: range partitioning present, and NO
    // single-partition window over the host frame — the only
    // SinglePartition left is the <=32-row offsets cumulative sum
    spark.conf.set("graft.crawl.estimatedHosts", "200000000")
    try {
      val df = graft.operators.Crawl.hostPriority(spark, prio)
      val p = plan(df)
      assert(p.contains("rangepartitioning"),
        s"two-phase spelling lost its range exchange:\n$p")
      assert(p.contains("BroadcastExchange"),
        s"offsets side lost its broadcast:\n$p")
    } finally spark.conf.unset("graft.crawl.estimatedHosts")
  }

  test("q189 warc.zst intake keeps q116's composed exchange budget") {
    val df = graft.operators.Crawl.q189ZstdIntake(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q189 NLJ:\n$p")
    assert(shuffles(df) <= 3, s"q189 exchange budget blown:\n$p")
  }

  test("q173 log replay: keyed aggregates, bounded exchange budget") {
    val df = graft.operators.Lake.q173DeltaLogReplay(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q173 NLJ:\n$p")
    assert(shuffles(df) <= 5, s"q173 exchange budget blown:\n$p")
  }

  test("q174 shard intake: ONE keyed assembly exchange, decode narrow") {
    val df = graft.operators.Wds.q174MediaShards(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n$p")
    assert(!p.contains("WindowExec"),
      s"assembly must be a group-by, never a streaming window:\n$p")
  }

  test("q183 MAD: every window rides ONE event_type exchange") {
    val df = graft.operators.Relational.q183MadOutliers(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) <= 2, s"q183 exchange budget blown:\n$p")
  }

  test("q181 quantifiers plan as semi/anti joins on the order key") {
    val df = graft.operators.Relational.q181ExistsWait(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"q181 must plan semi + anti joins:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q181 NLJ:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a heap, not a global sort:\n$p")
  }

  test("q170 fuzzy dedup: banded variant join, never a cartesian") {
    val df = graft.operators.Dedup.q170FuzzyTitleDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    // variant-keyed join (both sides) + the candidate DISTINCT; the
    // brute-force spelling the oracle runs would be a nested loop
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q170 must meet through band keys, never all-pairs:\n$p")
    assert(shuffles(df) <= 3, s"q170 exchange budget blown:\n$p")
  }

  test("q163 wds assembly is ONE keyed aggregate over an exploded walk") {
    val df = graft.operators.Wds.q163WdsSamples(spark, TestSpark.Sf0001)
    val p = plan(df)
    assert(shuffles(df) === 1, s"expected exactly 1 shuffle:\n$p")
    assert(!p.contains("WindowExec"),
      s"assembly must be a group-by, never a streaming window:\n$p")
  }

  test("q148 keeps its fixed exchange budget (agg-based, never a hot window)") {
    val df = graft.operators.Dedup.q148ParaDedup(spark, TestSpark.Sf0001)
    val p = plan(df)
    // min-struct winners + per-doc rollup + the n_paras join side; a
    // window over partitionBy(para) would still count the same but
    // ship hot boilerplate groups whole — pin the operator choice too
    assert(!p.contains("WindowExec"), s"q148 must not window over para:\n$p")
    assert(shuffles(df) <= 4, s"q148 exchange budget blown:\n$p")
  }

  test("q150 model tables all broadcast into the scoring stream") {
    val df = graft.operators.Text.q150TrigramBackoff(spark, TestSpark.Sf0001)
    val p = plan(df)
    val b = "BroadcastHashJoin".r.findAllIn(p).length
    assert(b >= 5, s"expected >= 5 broadcast model joins, found $b:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a model join fell back to sort-merge:\n$p")
  }

  test("q151/q153/q156 aggregate in two keyed exchanges, no windows") {
    val pairs = Seq(
      "q151" -> graft.operators.Crawl.q151AnchorText(spark, TestSpark.Sf0001),
      "q153" -> graft.operators.Relational.q153JsonShape(spark, TestSpark.Sf0001),
      "q156" -> graft.operators.Retrieval.q156PostingsBuild(spark, TestSpark.Sf0001))
    pairs.foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("WindowExec"),
        s"$name must majority-pick via min-struct, not a window:\n$p")
      assert(shuffles(df) === 2, s"$name expected exactly 2 shuffles:\n$p")
    }
  }

  test("q178 triangles: hash-keyed wedge joins, no cartesian, no window") {
    // the degree-ordered orientation's plan shape: every join is an
    // equi-join (the wedge join keys on the shared tail u; the closing
    // join on the (v, w) pair; degree attachment on the host) — a
    // BroadcastNestedLoopJoin anywhere means an inequality leaked into
    // a join CONDITION instead of a post-join filter, the quadratic
    // spelling the degree ordering exists to avoid. The four crossJoins
    // assembling the ONE-row result are broadcast singles.
    // force the DISTRIBUTED spelling: the r19 local finish would
    // otherwise collapse this sf0.001 graph to a LocalTableScan and the
    // audit would pass vacuously
    spark.conf.set("spark.graft.graph.localEdgeMax", "0")
    val df = try graft.operators.Crawl.q178HostGraph(spark, TestSpark.Sf0001)
    finally spark.conf.unset("spark.graft.graph.localEdgeMax")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"q178 must never cartesian corpus-sized sides:\n$p")
    assert(!p.contains("WindowExec"), s"q178 needs no window:\n$p")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    // only the 1-row result assembly may nested-loop (3 joins of
    // single-row aggregates)
    assert(nlj <= 3, s"q178 wedge/degree joins degraded to NLJ ($nlj):\n$p")
  }
}
