package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** The 100 TB techniques behave as advertised: salted aggregation is exact
  * under skew, and bucketed tables join without an exchange.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Load-robust ~linear gate (r18 verdict task #1): these decade ratios
    * are WALL-CLOCK, and one co-tenant burst landing inside a big-side
    * rep flipped a ratio over its limit on the driver's loaded run while
    * the same code measured green twice when quiet. Seeds are the call
    * site's existing min-of-two measurements — when they already satisfy
    * the limit nothing more runs (the quiet path is byte-identical to
    * before). On a breach, BOTH sides re-sample and min-fold up to three
    * more times: a transient burst is absorbed (min is monotone
    * non-increasing and the burst is not reproducible), while a genuinely
    * super-linear cost keeps every big-side sample over the limit and
    * still fails.
    */
  private def assertRatioLinear(label: String, t1First: Double,
                                t10First: Double, small: () => Double,
                                big: () => Double,
                                limit: Double = 10.0): Unit = {
    var t1 = t1First
    var t10 = t10First
    var extra = 0
    while (t10 / t1 > limit && extra < 3) {
      extra += 1
      info(f"$label: ratio ${t10 / t1}%.1fx > $limit%.0fx — re-sampling " +
        f"both decades (attempt $extra/3) under suspected co-tenant load")
      t1 = math.min(t1, small())
      t10 = math.min(t10, big())
    }
    assert(t10 / t1 <= limit,
      f"$label: 10x cost ${t10 / t1}%.1fx the time ($t1%.2fs -> $t10%.2fs, " +
        f"persisting through $extra re-samples)")
  }

  test("salted aggregation is exact on a pathologically skewed key") {
    import spark.implicits._
    // 90% of rows on one key — the hot-key shape
    val skewed = spark.range(100000)
      .select(
        when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
        (col("id") % 100).cast("double").as("m"))
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("m").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedSumCount(skewed, Seq("k"), "m", salt = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
    // and the hot key is genuinely spread in phase 1: >1 partial group
    val partials = skewed.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(partials > 1, s"hot key not spread: $partials partial group(s)")
  }

  test("salted aggregate: 10x the hot key stays ~linear, partitions bounded", Slow) {
    // the q55 scale proof (AnnScaleSpec/ComponentScaleSpec pattern):
    // measured, not asserted in comments
    def skewed(n: Long) = spark.range(n).select(
      when(col("id") % 2 === 0, "hot")
        .otherwise(concat(lit("k"), col("id") % 97)).as("k"),
      (col("id") % 100).cast("double").as("m"))
    // per-partition bound first: the partial aggregate is keyed by
    // (k, _salt), so no reducer sees more than ~1/16 of the hot key —
    // the property that kills the one-reducer-runs-for-hours failure
    val n = 400000L
    val groups = skewed(n)
      .withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "hot").groupBy("_salt").count()
      .collect().map(_.getLong(1))
    assert(groups.length === 16, s"hot key spread over ${groups.length}/16 salts")
    val hotRows = n / 2
    assert(groups.max <= hotRows / 16 * 3 / 2,
      s"one salt group holds ${groups.max} of $hotRows hot rows (cap ${hotRows / 16 * 3 / 2})")
    // wall time ~linear: 10x the rows (all growth on the hot key's side
    // of the residue map) within ~10x the time, generous slack for the
    // fixed job overhead at the small end biasing the ratio DOWN and
    // co-tenant noise pushing either way
    def timeOf(rows: Long): Double = {
      val t0 = System.nanoTime()
      Scale.saltedSumCount(skewed(rows), Seq("k"), "m", salt = 16).count()
      (System.nanoTime() - t0) / 1e9
    }
    timeOf(n) // warmup
    val t1 = math.min(timeOf(n), timeOf(n))
    val t10 = math.min(timeOf(n * 10), timeOf(n * 10))
    assertRatioLinear("q55 salted aggregate", t1, t10,
      () => timeOf(n), () => timeOf(n * 10))
  }

  test("unigram surprisal: 10x docs, saturating vocabulary, ~linear time", Slow) {
    // q64's broadcast-safety premise, measured: the model (vocabulary)
    // is bounded by the LANGUAGE, not the corpus — 10x the documents
    // must not grow the broadcast side — and the two-pass score stays
    // ~linear in the token stream
    import graft.operators.Text
    def synthDocs(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 60).map(j =>
        concat(lit("w"), pmod(col("id") * 31 + j * 7, lit(997)))): _*)
        .as("text"))
    def vocabOf(n: Long): Long = synthDocs(n)
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    val (v1, v10) = (vocabOf(20000), vocabOf(200000))
    assert(v1 === v10,
      s"vocabulary grew with the corpus ($v1 -> $v10): broadcast unsafe")
    assert(v1 <= 997L, s"synth vocabulary escaped its pool: $v1")
    def timeOf(n: Long): Double = {
      val t0 = System.nanoTime()
      Text.unigramSurprisalOn(synthDocs(n))
        .agg(sum("n_tokens"), sum("mean_surprisal")).head
      (System.nanoTime() - t0) / 1e9
    }
    timeOf(20000) // warmup
    val t1 = math.min(timeOf(20000), timeOf(20000))
    val t10 = math.min(timeOf(200000), timeOf(200000))
    assertRatioLinear("q64 unigram surprisal", t1, t10,
      () => timeOf(20000), () => timeOf(200000))
  }

  test("two-phase shard assignment reproduces the one-task global order") {
    import spark.implicits._
    // independent truth: JVM md5 sorted in one place — the spelling the
    // operator exists to avoid running distributed
    val ids = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id").as[Long].collect()
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expected = ids.map(id => (hex(s"q80|$id"), id)).sorted.zipWithIndex
      .map { case ((_, id), g) =>
        (id, g.toLong, g.toLong / 128L, g.toLong % 128L) }.toSet
    val got = Scale.q80ShardAssign(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // shards are dense and full: every shard except the last holds
    // exactly shardSize docs, and positions within a shard are 0..n-1
    val byShard = got.groupBy(_._3).toSeq.sortBy(_._1)
    byShard.init.foreach { case (s, rows) =>
      assert(rows.size === 128, s"shard $s holds ${rows.size} docs") }
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._4) === (0L until rows.size.toLong).toSet,
        s"shard $s positions not dense") }
  }

  test("shard assignment is invariant to the bucket fan-out") {
    import spark.implicits._
    // bucketing is an implementation detail of the two-phase rank: any
    // prefix width must yield the identical global order — a result that
    // changes with bucketChars means bucket boundaries leaked into the
    // ordering
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents").select("doc_id")
    val a = Scale.shardAssignOn(docs, bucketChars = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Scale.shardAssignOn(docs, bucketChars = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("shard assignment: 10x docs stays ~linear and stays a dense total order", Slow) {
    // the q80 scale proof (the q55/q64 measured-not-asserted pattern):
    // the two-phase rank must scale with the corpus, and its output must
    // remain a dense 0..n-1 enumeration at every size — a bucket-boundary
    // slip shows up as a hole or duplicate long before it shows up as
    // wrong wall-clock
    def ids(n: Long) = spark.range(n).select(col("id").as("doc_id"))
    def run(n: Long): Double = {
      val t0 = System.nanoTime()
      val agg = Scale.shardAssignOn(ids(n), bucketChars = 2)
        .agg(count(lit(1)).as("c"), min("shuffle_pos").as("lo"),
          max("shuffle_pos").as("hi"),
          countDistinct("shuffle_pos").as("d")).head()
      assert(agg.getLong(0) === n && agg.getLong(1) === 0L &&
        agg.getLong(2) === n - 1 && agg.getLong(3) === n,
        s"n=$n not a dense total order: $agg")
      (System.nanoTime() - t0) / 1e9
    }
    run(100000L) // warmup
    val t1 = math.min(run(100000L), run(100000L))
    val t10 = math.min(run(1000000L), run(1000000L))
    assertRatioLinear("q80 shard assignment", t1, t10,
      () => run(100000L), () => run(1000000L))
  }

  test("shard append continues the history layout without disturbing it") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents").select("doc_id")
    val hist = docs.filter(col("doc_id") % 5 < 4)
    val inc = docs.filter(col("doc_id") % 5 === 4)
    val hn = hist.count()
    val histPos = Scale.shardAssignOn(hist)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val appended = Scale.shardAppendOn(hist, inc)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // appended positions are dense exactly after the history block
    assert(appended.values.toSeq.sorted ===
      (hn until hn + inc.count()).toSeq)
    // and the union is one dense enumeration: history keeps every
    // position a training run already read (replay stability — the
    // documented trade vs re-interleaving)
    assert((histPos.values ++ appended.values).toSeq.sorted ===
      (0L until (hn + inc.count())).toSeq)
    assert(histPos.keySet.intersect(appended.keySet).isEmpty)
  }

  test("q81 shuffled meet: AQE splits the zipfian hot-pair partition") {
    // the q81 prose premise, pinned (the q55 measured-not-asserted
    // discipline): with VocabMeet.Shuffle the probe stream's ("of","the")
    // partition dwarfs the median, and AQE's skew split must bound what
    // any one task reads instead of letting the hot reducer run alone.
    // Thresholds are scaled to test data in an ISOLATED session clone —
    // the split semantics, not production sizes, are what's pinned.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "16")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // coalescing off so the skew read is the ONLY adaptive read in the
    // plan — and the repetitive hot pair compresses so well that the
    // thresholds must sit in the KB range at test scale
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    // MEASURED FINDING, not a default: in q81's chained model joins the
    // split join's output feeds another keyed join, so vanilla AQE
    // declines the skew split as "introducing an extra shuffle" (the
    // downstream join re-exchanges regardless — the check is
    // conservative). forceOptimizeSkewedJoin is the production knob a
    // q81-at-scale deployment must set; without it the hot reducer runs
    // alone and this assertion fails.
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // ~46% of all adjacent pairs are ("of","the") — one zipfian head over
    // a long varied tail, the "of the" shape the scaladoc names
    val docs = s2.range(12000).select(
      col("id").as("doc_id"),
      concat(lit("of the of the of the of the of the of the "),
        concat(lit("w"), col("id") % 997), lit(" "),
        concat(lit("v"), (col("id") * 3) % 991)).as("text"))
    val out = graft.operators.Text.bigramSurprisalOn(
      docs, meet = graft.operators.VocabMeet.Shuffle)
    // collect() drives THIS df's query execution, so the adaptive plan
    // below is the executed one (count() would build its own)
    assert(out.collect().length === 12000)
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE skew split did not fire on the hot pair:\n$finalPlan")
  }

  test("a foreign build sentinel makes ensureBucketed fail loudly, then recover") {
    val dir = TestSpark.Sf0001
    // simulate another process mid-materialization (or crashed): its
    // atomically-created sentinel is present, and a stale orphan twin
    // directory sits in the warehouse from the dead session
    val sentinel = Scale.twinSentinel(spark, dir, "customer")
    sentinel.getParentFile.mkdirs()
    val orphan = new java.io.File(sentinel.getParentFile,
      sentinel.getName.stripSuffix(".building"))
    orphan.mkdirs()
    new java.io.File(orphan, "part-stale").createNewFile()
    assert(sentinel.createNewFile(), "sentinel precondition failed")
    try {
      val e = intercept[IllegalStateException] {
        Scale.ensureBucketed(spark, dir, "customer",
          Seq("c_custkey", "c_name"), "c_custkey", 4)
      }
      assert(e.getMessage.contains("another process"))
      // fails loudly WITHOUT racing: the stale orphan was not touched
      assert(new java.io.File(orphan, "part-stale").exists(),
        "guarded call deleted the orphan it must not race")
    } finally sentinel.delete()
    // sentinel gone (the foreign build finished/was cleared): the build
    // proceeds, clearing the orphan and registering the twin
    val name = Scale.ensureBucketed(spark, dir, "customer",
      Seq("c_custkey", "c_name"), "c_custkey", 4)
    try {
      assert(spark.table(name).count() ===
        Tables.load(spark, dir, "customer").count())
      assert(!new java.io.File(orphan, "part-stale").exists(),
        "stale orphan survived the rebuild")
      assert(!sentinel.exists(), "sentinel leaked past a successful build")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = TestSpark.Sf0001
    Scale.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    Scale.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
      "b_orders", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // same join over the raw (unbucketed) parquet DOES shuffle
      val raw = Tables.load(spark, dir, "lineitem").select("l_orderkey")
        .join(Tables.load(spark, dir, "orders").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
      // and the numbers agree
      assert(joined.count() ===
        Tables.load(spark, dir, "lineitem")
          .join(Tables.load(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucketed seen-set: the frontier's lake side never re-shuffles") {
    // q52's pay-once trade applied to the crawl loop: the seen-set (every
    // URL ever fetched — the BIG side at deployment) buckets once on its
    // canonical key; only the delta of discovered links moves per batch
    import graft.operators.Crawl
    val dir = TestSpark.Sf0001
    try {
      val bucketed = Crawl.q94FrontierBucketed(spark, dir)
      val p = bucketed.queryExecution.executedPlan.toString
      // exactly ONE link-side exchange on the canonical key (the window
      // reuses it); the seen scan reads its buckets in place
      val seenSide = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(_seen_url"))
      assert(seenSide === 0, s"seen-set side still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected the bucket-aligned SMJ:\n$p")
      // value-identical to the plain q94 judgment, row for row
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(canon(bucketed) === canon(Crawl.q94LinkFrontier(spark, dir)))
    } finally {
      // the twin is per-dir content-addressed; drop to keep reruns clean
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("b_seen_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    }
  }

  // synthetic mixed-quality corpus for the classifier/BPE decade probes:
  // even ids pass every q65 rule (stopword-led 45-word sentences from a
  // 997-word pool), odd ids fail r_len (10 words) — labels split, and
  // the feature/pre-token VOCABULARY is bounded by the pool, not n
  private def synthMix(n: Long) = {
    val pool = (0 until 40).map(j =>
      concat(lit("w"), pmod(col("id") * 31 + j * 7, lit(997))))
    spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        concat_ws(" ", (lit("the of and a in") +: pool): _*))
        .otherwise(concat_ws(" ", pool.take(10): _*))
        .as("text"))
  }

  test("q122 classifier: 10x docs, constant model, ~linear train+score", Slow) {
    // the hashing trick's premise, measured: the trained table is AT
    // MOST NumBuckets rows at any corpus size (the training shuffle
    // moves kilobytes), and the whole train+score pipeline is ~linear
    // in the token stream
    import graft.operators.Classifier
    def timeOf(n: Long): Double = {
      val t0 = System.nanoTime()
      Classifier.classifierOn(synthMix(n))
        .agg(sum("n_feats"), sum("predicted")).head
      (System.nanoTime() - t0) / 1e9
    }
    // model-size invariant at the larger scale: distinct buckets bounded
    val buckets = synthMix(200000)
      .select(explode(graft.functions.TextOps.words(col("text"))).as("f"))
      .select((conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long")
        % Classifier.NumBuckets).as("b"))
      .distinct().count()
    assert(buckets <= Classifier.NumBuckets,
      s"bucket table escaped its bound: $buckets")
    timeOf(20000) // warmup
    val t1 = math.min(timeOf(20000), timeOf(20000))
    val t10 = math.min(timeOf(200000), timeOf(200000))
    assertRatioLinear("q122 classifier", t1, t10,
      () => timeOf(20000), () => timeOf(200000))
  }

  test("q170 fuzzy dedup: 10x titles, banding exact, ~linear", Slow) {
    // FastSS's reason to exist at scale: candidates come from band-key
    // buckets (len+1 keys per title), never all-pairs — so 10x titles
    // is ~10x work, and the EXACTNESS invariant holds at both decades:
    // every synthesized in-group pair (base~substitution, base~insert)
    // is found, and the (sub, insert) distance-2 pair never is
    import graft.operators.Dedup
    def frame(n: Long) =
      Dedup.fuzzyTitlesOn(spark.range(n).select(col("id").as("doc_id")))
    def run(n: Long): Long = Dedup.fuzzyPairsOn(frame(n)).count()
    def timeOf(n: Long): Double = {
      val t0 = System.nanoTime()
      run(n)
      (System.nanoTime() - t0) / 1e9
    }
    // exactness at the small decade: pair set == per-group truth
    val n1 = 3000L
    val pairs = Dedup.fuzzyPairsOn(frame(n1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until n1 / 3).foreach { g =>
      assert(pairs.contains((3 * g, 3 * g + 1)), s"group $g base~sub missing")
      assert(pairs.contains((3 * g, 3 * g + 2)), s"group $g base~ins missing")
      assert(!pairs.contains((3 * g + 1, 3 * g + 2)),
        s"group $g distance-2 pair fabricated")
    }
    timeOf(3000) // warmup
    val t1 = math.min(timeOf(3000), timeOf(3000))
    val t10 = math.min(timeOf(30000), timeOf(30000))
    assertRatioLinear("q170 fuzzy dedup", t1, t10,
      () => timeOf(3000), () => timeOf(30000))
  }

  test("q148 paragraph dedup: 10x docs, exact under the boilerplate hot key", Slow) {
    // the operator's reason to exist at scale: a boilerplate paragraph
    // carried by ~1/7 of ALL documents. Correctness invariant first —
    // kept paragraphs == DISTINCT paragraphs, exactly, at both decades
    // (the min-struct winner rule can neither drop nor double-keep) —
    // then ~linear wall time across the decade
    import graft.operators.Dedup
    def kept(n: Long): (Long, Long, Double) = {
      val docs = synthMix(n)
      val t0 = System.nanoTime()
      val agg = Dedup.paraDedupOn(docs)
        .agg(sum(col("n_paras") - col("n_dup")).as("kept")).head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      val distinctParas = docs.select(col("doc_id").as("doc_id"),
          graft.functions.TextOps.words(col("text")).as("ws"))
        .select(explode(expr(
          "transform(sequence(0, cast(ceil(size(ws) / 8.0) as int) - 1), " +
            "i -> array_join(slice(ws, i*8 + 1, 8), ' '))")).as("p"))
        .select(col("p")).distinct().count()
      (agg, distinctParas, dt)
    }
    kept(20000) // warmup
    val (k1, d1, t1a) = kept(20000)
    val (k1b, _, t1b) = kept(20000)
    val t1 = math.min(t1a, t1b)
    assert(k1 === k1b)
    // distinct chunk paragraphs + the 2 injected boilerplates + nothing
    // from the within-doc repeats (they always lose)
    assert(k1 === d1 + 2, s"kept $k1 != distinct $d1 + 2 boilerplates")
    val (k10, d10, t10a) = kept(200000)
    val (_, _, t10b) = kept(200000)
    val t10 = math.min(t10a, t10b)
    assert(k10 === d10 + 2)
    assertRatioLinear("q148 para dedup", t1, t10,
      () => kept(20000)._3, () => kept(200000)._3)
  }

  test("q150 trigram backoff: 10x docs, saturating model, ~linear", Slow) {
    // the stupid-backoff premise at scale: the MODEL is vocabulary-
    // bounded (synthMix's pool saturates), so 10x the corpus grows the
    // broadcast tables sub-linearly while scoring stays ~linear
    import graft.operators.Text
    def run(n: Long): (Long, Double) = {
      val docs = synthMix(n)
      val t0 = System.nanoTime()
      val scored = Text.trigramBackoffOn(docs)
        .agg(sum("n_scored")).head.getLong(0)
      ((scored, (System.nanoTime() - t0) / 1e9))
    }
    def triCount(n: Long): Long = synthMix(n)
      .filter(col("doc_id") % 2 === 0)
      .select(graft.functions.TextOps.words(col("text")).as("ws"))
      .select(explode(expr("transform(sequence(0, size(ws)-3), " +
        "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("t"))
      .distinct().count()
    val m1 = triCount(20000)
    val m10 = triCount(200000)
    assert(m10 <= m1 * 3,
      s"trigram model must saturate, grew $m1 -> $m10")
    run(20000) // warmup
    val (s1, t1a) = run(20000); val (_, t1b) = run(20000)
    val (s10, t10a) = run(200000); val (_, t10b) = run(200000)
    assert(s10 > s1 * 9, "the scoring stream itself is corpus-sized")
    assertRatioLinear("q150 trigram backoff",
      math.min(t1a, t1b), math.min(t10a, t10b),
      () => run(20000)._2, () => run(200000)._2)
  }

  test("q156 postings build: 10x docs, vocabulary-bounded terms, ~linear", Slow) {
    import graft.operators.Retrieval
    def run(n: Long): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val r = Retrieval.postingsOn(synthMix(n))
        .agg(count(lit(1)), sum("cf")).head
      ((r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9))
    }
    run(20000) // warmup
    val (terms1, cf1, t1a) = run(20000); val (_, _, t1b) = run(20000)
    val (terms10, cf10, t10a) = run(200000); val (_, _, t10b) = run(200000)
    assert(terms10 <= terms1 * 2,
      s"the term dimension must saturate: $terms1 -> $terms10")
    assert(cf10 > cf1 * 9, "cf counts every token: corpus-sized by design")
    assertRatioLinear("q156 postings build",
      math.min(t1a, t1b), math.min(t10a, t10b),
      () => run(20000)._3, () => run(200000)._3)
  }

  test("q122/q123 second decade: 100x docs, models still constant", Slow) {
    // the r13 discipline that caught three real breaks in the ANN
    // family: run the SECOND decade too. 2M synthetic docs (100x the
    // 20k base) — the classifier's bucket table and the BPE pre-token
    // vocabulary must still be corpus-size-independent, and each decade
    // must cost <= 10x (env-gated: minutes-scale).
    assume(sys.env.contains("GRAFT_SCALE100"),
      "set GRAFT_SCALE100=1 to run the 100x training-op probe")
    import graft.operators.{Bpe, Classifier}
    val n100 = 2000000L
    val buckets = synthMix(n100)
      .select(explode(graft.functions.TextOps.words(col("text"))).as("f"))
      .select((conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long")
        % Classifier.NumBuckets).as("b"))
      .distinct().count()
    assert(buckets <= Classifier.NumBuckets)
    val vocab100 = synthMix(n100)
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.functions.ByteBpeEval.PreTok), lit(0))).as("t"))
      .distinct().count()
    val vocab10 = synthMix(200000)
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.functions.ByteBpeEval.PreTok), lit(0))).as("t"))
      .distinct().count()
    assert(vocab100 === vocab10,
      s"pre-token vocabulary grew across the second decade ($vocab10 -> $vocab100)")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val c10 = t(Classifier.classifierOn(synthMix(200000))
      .agg(sum("n_feats")).head)
    val c100 = t(Classifier.classifierOn(synthMix(n100))
      .agg(sum("n_feats")).head)
    assert(c100 / c10 <= 10.0,
      f"classifier second decade cost ${c100 / c10}%.1fx ($c10%.1fs -> $c100%.1fs)")
    val b10 = t(Bpe.byteBpeTrainOn(synthMix(200000), 10).collect())
    val b100 = t(Bpe.byteBpeTrainOn(synthMix(n100), 10).collect())
    assert(b100 / b10 <= 10.0,
      f"byte BPE second decade cost ${b100 / b10}%.1fx ($b10%.1fs -> $b100%.1fs)")
  }

  test("q123 byte BPE: 10x docs, saturating pre-token vocab, ~linear", Slow) {
    // the q85 decomposition at the byte level, measured: the corpus
    // contributes ONE pass (the pre-token frequency frame) and every
    // merge round rides the VOCABULARY — 10x the documents must not
    // grow the round frames
    import graft.operators.Bpe
    def vocabOf(n: Long): Long = synthMix(n)
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.functions.ByteBpeEval.PreTok), lit(0))).as("t"))
      .distinct().count()
    val (v1, v10) = (vocabOf(20000), vocabOf(200000))
    assert(v1 === v10,
      s"pre-token vocabulary grew with the corpus ($v1 -> $v10)")
    def timeOf(n: Long): Double = {
      val t0 = System.nanoTime()
      Bpe.byteBpeTrainOn(synthMix(n), 10).collect()
      (System.nanoTime() - t0) / 1e9
    }
    timeOf(20000) // warmup
    val t1 = math.min(timeOf(20000), timeOf(20000))
    val t10 = math.min(timeOf(200000), timeOf(200000))
    assert(t10 / t1 <= 10.0,
      f"10x docs cost ${t10 / t1}%.1fx the time ($t1%.2fs -> $t10%.2fs)")
  }

  /** Decade harness for the r15 layout/graph families: correctness
    * invariant at both scales, then min-of-two wall times ~linear.
    * Scales are multiples of 420 (= lcm of the families' residue
    * moduli 3/4/5/7) so per-class populations scale EXACTLY 10x and
    * residue-sum invariants hold to the row. */
  private val D1 = 8400L
  private val D10 = 84000L
  private def decade(label: String, run: Long => Long,
                     expect: Long => Long): Unit = {
    def timed(n: Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val v = run(n)
      (v, (System.nanoTime() - t0) / 1e9)
    }
    timed(D1) // warmup
    val (v1a, t1a) = timed(D1)
    val (v1b, t1b) = timed(D1)
    assert(v1a === v1b, s"$label not deterministic at 1x")
    assert(v1a === expect(D1), s"$label 1x invariant: $v1a")
    val (v10, t10a) = timed(D10)
    val (_, t10b) = timed(D10)
    assert(v10 === expect(D10), s"$label 10x invariant: $v10")
    assertRatioLinear(label, math.min(t1a, t1b), math.min(t10a, t10b),
      () => timed(D1)._2, () => timed(D10)._2)
  }

  test("q163 WebDataset assembly: 10x shards, one keyed exchange, ~linear", Slow) {
    // correctness invariant: COMPLETE samples per corpus — every doc
    // contributes its residue-determined sample set, so the count is a
    // pure function of n (classes %4: modes 1 and 3 break completeness
    // for exactly one sample each)
    import graft.operators.Wds
    val complete1 = Wds.wdsSamplesOn(synthMix(D1))
      .agg(sum(col("complete"))).head.getLong(0)
    decade("q163",
      n => Wds.wdsSamplesOn(synthMix(n))
        .agg(sum(col("complete"))).head.getLong(0),
      n => complete1 * (n / D1))
  }

  test("q173 Delta-log replay: 10x tables, narrow per-row walk, ~linear", Slow) {
    import graft.operators.Lake
    val live1 = Lake.deltaLogReplayOn(synthMix(D1))
      .agg(sum(col("n_live"))).head.getLong(0)
    decade("q173",
      n => Lake.deltaLogReplayOn(synthMix(n))
        .agg(sum(col("n_live"))).head.getLong(0),
      n => live1 * (n / D1))
  }

  test("q151 anchor text: 10x pages under the hub hot-URL, ~linear", Slow) {
    // the hub URL is anchored by EVERY page — the two-stage groupBy's
    // map-side combine must crush it before the exchange, exactly
    // q148's hot-key discipline; invariant: the hub row's n_links
    // equals the page count at both decades
    import graft.operators.Crawl
    decade("q151",
      n => Crawl.anchorTextOn(synthMix(n))
        .filter(col("url") === "https://hub.example.com/home")
        .agg(sum(col("n_links"))).head.getLong(0),
      n => n)
  }

  test("q174 media shards: 10x shards, decode rides map-side, ~linear", Slow) {
    import graft.operators.Wds
    val img1 = Wds.mediaShardsOn(synthMix(D1))
      .agg(sum(col("has_image"))).head.getLong(0)
    decade("q174",
      n => Wds.mediaShardsOn(synthMix(n))
        .agg(sum(col("has_image"))).head.getLong(0),
      n => img1 * (n / D1))
  }

  // ---- the compression family's decade rows (the r16 gap: deep value
  // specs, no scale discipline). Every decode is a narrow per-row
  // kernel, so 10x docs must cost ~10x — and each run re-proves the
  // class invariant (a pure function of n) so the timing can't be
  // measuring a silently-refusing kernel.

  test("q188 zstd decode: 10x docs, narrow per-row kernel, ~linear", Slow) {
    import graft.sources.Zstd
    decade("q188",
      n => Zstd.q188ZstdDecodeOn(synthMix(n))
        .agg(sum(col("is_zstd"))).head.getLong(0),
      n => n * 6 / 7)
  }

  test("q190 lz4 decode: 10x docs, narrow per-row kernel, ~linear", Slow) {
    import graft.sources.Compress
    decade("q190",
      n => Compress.q190Lz4DecodeOn(synthMix(n))
        .agg(sum(col("is_lz4"))).head.getLong(0),
      n => n * 5 / 6)
  }

  test("q191 bzip2 decode: 10x docs, narrow per-row kernel, ~linear", Slow) {
    import graft.sources.Compress
    decade("q191",
      n => Compress.q191Bzip2DecodeOn(synthMix(n))
        .agg(sum(col("is_bzip2"))).head.getLong(0),
      n => n * 4 / 5)
  }

  test("q192 xz decode: 10x docs, narrow per-row kernel, ~linear", Slow) {
    import graft.sources.Compress
    decade("q192",
      n => Compress.q192XzDecodeOn(synthMix(n))
        .agg(sum(col("is_xz"))).head.getLong(0),
      n => n * 4 / 5)
  }

  test("q193 universal decode: 10x docs, five stacks routed, ~linear", Slow) {
    import graft.sources.Compress
    decade("q193",
      n => Compress.q193UniversalDecodeOn(synthMix(n))
        .agg(sum(col("decoded"))).head.getLong(0),
      n => n)
  }

  test("q194 wiki dump: 10x docs, bzip2+XML+cleaner composed, ~linear", Slow) {
    import graft.sources.Wiki
    decade("q194",
      n => Wiki.q194WikiDumpOn(synthMix(n))
        .agg(sum(col("is_dump"))).head.getLong(0),
      n => n * 4 / 5)
  }

  test("q195 tarball intake: 10x docs, wrapper routing composed, ~linear", Slow) {
    import graft.sources.Tar
    decade("q195",
      n => Tar.q195TarballIntakeOn(synthMix(n))
        .agg(sum(col("is_tar"))).head.getLong(0),
      n => n * 4 / 5)
  }

  test("q196 vp8 pixels: 10x docs, encode+decode per row, ~linear", Slow) {
    import graft.operators.Multimodal
    decade("q196",
      n => Multimodal.q196Vp8PixelsOn(synthMix(n))
        .agg(sum(col("width")) + count(col("min_luma"))).head.getLong(0),
      // %13 classes (r18 adds default-table, B_PRED, quant-index +
      // partitions, loop filter, segmentation, skip): per-class
      // widths below, and 11 of 13 classes carry a decoded luma plane
      // (the two truncation classes refuse); exact per-residue counts
      // because the decade sizes are not multiples of 13
      n => {
        val widths =
          Array(64L, 32, 16, 64, 16, 16, 32, 64, 8, 16, 32, 32, 32)
        val hasLuma = Array(true, true, true, false, false, true, true,
          true, true, true, true, true, true)
        (0 until 13).map { c =>
          val cnt = n / 13 + (if (c < n % 13) 1L else 0L)
          cnt * widths(c) + (if (hasLuma(c)) cnt else 0L)
        }.sum
      })
  }

  test("q197 tiff pixels: 10x docs, encode+decode per row, ~linear", Slow) {
    import graft.operators.Multimodal
    decade("q197",
      n => Multimodal.q197TiffPixelsOn(synthMix(n))
        .agg(count(col("min_luma"))).head.getLong(0),
      // %15 classes (r18 adds palette, 16-bit, bilevel, G4, 4-bit,
      // CCITT RLE, Group 3): all but the truncated class (4) carry a
      // decoded plane
      n => (0 until 15).map { c =>
        val cnt = n / 15 + (if (c < n % 15) 1L else 0L)
        if (c == 4) 0L else cnt
      }.sum)
  }

  test("intake capstones second decade: 100x docs through the full " +
    "composed stack, ~linear", Slow) {
    // q116/q189/q194/q195 compose 5-6 layers (WARC wrap, compression,
    // fetch truncation, decode, record walk, header split, dechunk,
    // charset, extract / tar walk / page walk). The kernels are
    // per-row, but composition is where a hidden re-materialization
    // would hide — so the SECOND decade is pinned too (env-gated:
    // minutes-scale), with exact row invariants proving the timing
    // measures real decodes, not refusals.
    assume(sys.env.contains("GRAFT_SCALE100"),
      "set GRAFT_SCALE100=1 to run the 100x intake-capstone probe")
    val n10 = D10
    val n100 = 840000L
    def fetchOkExpect(n: Long): Long = n - ((n - 10) / 13 + 1) // id%13==9 cut
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(label: String, run: Long => Long, expect: Long => Long): Unit = {
      var v10 = 0L; var v100 = 0L
      val a = t { v10 = run(n10) }
      val b = t { v100 = run(n100) }
      assert(v10 === expect(n10), s"$label 10x invariant: $v10")
      assert(v100 === expect(n100), s"$label 100x invariant: $v100")
      assert(b / a <= 10.0,
        f"$label second decade cost ${b / a}%.1fx ($a%.1fs -> $b%.1fs)")
    }
    probe("q116",
      n => graft.operators.Crawl.q116FullStackIntakeOn(synthMix(n))
        .agg(sum(col("fetch_ok"))).head.getLong(0), fetchOkExpect)
    probe("q189",
      n => graft.operators.Crawl.q189ZstdIntakeOn(synthMix(n))
        .agg(sum(col("fetch_ok"))).head.getLong(0), fetchOkExpect)
    probe("q194",
      n => graft.sources.Wiki.q194WikiDumpOn(synthMix(n))
        .agg(sum(col("is_dump"))).head.getLong(0), n => n * 4 / 5)
    probe("q195",
      n => graft.sources.Tar.q195TarballIntakeOn(synthMix(n))
        .agg(sum(col("is_tar"))).head.getLong(0), n => n * 4 / 5)
  }
}
