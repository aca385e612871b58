package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, Text}

/** Corpus-pipeline operators q41 (TF-IDF top terms) and q42 (quota
  * sampling): value-level parity is the DuckDB oracle's job; these pin the
  * semantic invariants that a green hash can't articulate.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q41: per-doc groups are capped at 3, ranked by score, ties by term") {
    val rows = Text.q41TfIdfTopTerms(spark, TestSpark.Sf0001)
      .select("doc_id", "term", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 3, s"doc $doc has ${rs.length} top terms")
      // the selected terms must be the maximal ones: descending score
      // within the group, deterministic term order on equal scores
      val ordered = rs.sortBy(r => (-r._3, r._2)).toSeq
      assert(ordered === rs.toSeq.sortBy(r => (-r._3, r._2)))
    }
  }

  test("q41: a ubiquitous high-tf term cannot displace rarer terms (exact)") {
    import spark.implicits._
    // synthetic corpus with a known displacement hazard: in doc 0 the
    // term 'common' has the highest tf (4) but df = N → idf = 0, so true
    // tf-idf must rank all four df=1 terms above it and the top-3 cut
    // must exclude it; a regression to tf-ranking (or ranking on
    // unrounded scores with inverted order) surfaces as a wrong row set
    val dir = java.nio.file.Files.createTempDirectory("q41fixture").toString
    Seq(
      (0L, "common common common common alpha beta gamma rare", "en", "s1", 48L),
      (1L, "common zeta", "en", "s1", 11L),
      (2L, "common common eta theta", "en", "s2", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val ln3 = BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Text.q41TfIdfTopTerms(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val expected = Set(
      (0L, "alpha", 1L, 1L, ln3), (0L, "beta", 1L, 1L, ln3), (0L, "gamma", 1L, 1L, ln3),
      (1L, "zeta", 1L, 1L, ln3), (1L, "common", 1L, 3L, 0.0),
      (2L, "eta", 1L, 1L, ln3), (2L, "theta", 1L, 1L, ln3), (2L, "common", 2L, 3L, 0.0))
    assert(got === expected)
  }

  test("q42: quota sampling keeps ~25% of en, ~75% of the rest, deterministically") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val kept = Text.q42QuotaSample(spark, TestSpark.Sf0001)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = sampled.getOrElse("en", 0L).toDouble / total("en")
    val restTotal = (total - "en").values.sum
    val restKept = (sampled - "en").values.sum
    val restRate = restKept.toDouble / restTotal
    // md5 is uniform; at a few hundred docs the rate sits within ±0.15
    assert(math.abs(enRate - 0.25) < 0.15, s"en keep rate $enRate")
    assert(math.abs(restRate - 0.75) < 0.15, s"non-en keep rate $restRate")
    // pure hash threshold ⇒ bit-identical on re-evaluation
    val again = Text.q42QuotaSample(spark, TestSpark.Sf0001)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }

  test("q43: packing reconstructs from per-shard token sums, bins monotone") {
    val rows = Text.q43PackBins(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, shard) =>
      val ordered = shard.sortBy(_._2)
      var running = 0L
      var lastBin = 0L
      ordered.foreach { case (_, id, nTok, binOff, bin) =>
        assert(bin * 512 + binOff === running,
          s"doc $id offset mismatch: bin=$bin off=$binOff running=$running")
        assert(bin >= lastBin, s"doc $id bin went backwards")
        lastBin = bin
        running += nTok
      }
    }
  }

  test("q42: the keep decision matches the salted-hash contract row by row") {
    import java.security.MessageDigest
    def h8(id: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"q42|$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.collect {
      case (id, lang) if h8(id) < (if (lang == "en") "40000000" else "c0000000") =>
        id
    }.toSet
    val got = Text.q42QuotaSample(spark, TestSpark.Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("q46: every synthesized PII token is found, counted, and scrubbed") {
    val rows = Text.q46PiiScrub(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 500)
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    rows.foreach { case (id, nEmails, nPhones, scrubbed) =>
      assert(nEmails === (if (id % 3 == 0) 2L else 1L), s"doc $id email count")
      assert(nPhones === 1L, s"doc $id phone count")
      // the scrub must be complete: no residual match for either pattern
      assert(emailRe.findFirstIn(scrubbed).isEmpty, s"doc $id leaked an email")
      assert(!scrubbed.contains("+1-555-"), s"doc $id leaked a phone")
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
    }
  }

  test("q47: duplicate 3-gram fraction matches a hand-computed fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q47fixture").toString
    Seq(
      // grams: "a b a","b a b","a b a","b a b" -> 4 total, 2 distinct
      (0L, "a b a b a b", "en", "s1", 11L),
      // 2 words: no 3-grams, dup_frac 0 by contract
      (1L, "x y", "en", "s1", 3L),
      // all distinct grams
      (2L, "one two three four", "en", "s2", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Text.q47RepNgrams(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      (0L, 4L, 2L, 0.5),
      (1L, 0L, 0L, 0.0),
      (2L, 2L, 2L, 0.0)))
  }

  test("q48: the approx_percentile sketch stays within 5% of the exact result") {
    // the oracle pins the EXACT percentiles; this pins the scale twin
    // (same pattern as q31-vs-q20 for distinct counts): a corpus whose
    // value domain outgrows the exact map switches to the sketch and
    // inherits a verified error bound
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("source"),
        size(graft.functions.TextOps.words(col("text"))).cast("long").as("n"))
    val joined = Text.q48TokenPercentiles(spark, TestSpark.Sf0001)
      .join(docs.groupBy("source")
        .agg(expr("approx_percentile(n, array(0.5D, 0.9D, 0.99D), 10000)").as("ap")),
        "source")
      .select(col("source"), col("p50"), col("p90"), col("p99"),
        element_at(col("ap"), 1).cast("double").as("a50"),
        element_at(col("ap"), 2).cast("double").as("a90"),
        element_at(col("ap"), 3).cast("double").as("a99"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      for ((e, a) <- Seq((r.getDouble(1), r.getDouble(4)),
        (r.getDouble(2), r.getDouble(5)), (r.getDouble(3), r.getDouble(6)))) {
        assert(math.abs(a - e) <= math.max(0.05 * e, 1.0),
          s"${r.getString(0)}: approx $a vs exact $e")
      }
    }
  }

  test("q49: purchases with no prior view report null ts and zero count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q49fixture").toString
    // the corpus stores events.ts as INT64 nanos (Tables.load converts);
    // the fixture mimics that physical format
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ns(mins: Int): Long = (t0.getTime + mins * 60000L) * 1000000L
    def tss(mins: Int): String =
      new java.sql.Timestamp(t0.getTime + mins * 60000L).toString
    Seq(
      // u1: view, view, purchase (sees 2 views, last at +20), purchase at
      // +40 still sees the same last view
      (1L, 100L, "view", ns(0), 5.0, "{}"),
      (2L, 100L, "view", ns(20), 5.0, "{}"),
      (3L, 100L, "purchase", ns(30), 9.99, "{}"),
      (4L, 100L, "purchase", ns(40), 1.0, "{}"),
      // u2: purchase BEFORE its only view -> null/0; later purchase sees it
      (5L, 200L, "purchase", ns(10), 2.0, "{}"),
      (6L, 200L, "view", ns(15), 0.0, "{}"),
      (7L, 200L, "purchase", ns(25), 3.0, "{}"),
      // noise event types are excluded entirely
      (8L, 100L, "error", ns(35), 0.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.q49AsOfLastView(spark, dir)
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)).map(_.toString), r.getLong(3)))
      .toSet
    assert(got === Set(
      (3L, Some(tss(20)), 2L),
      (4L, Some(tss(20)), 2L),
      (5L, None, 0L),
      (7L, Some(tss(15)), 1L)))
  }

  test("q51: every surviving doc passes every stage's gate, offsets reconstruct") {
    // value-level parity with the composed CTE chain is the DuckDB
    // oracle's job; this pins the CROSS-STAGE invariants a green hash
    // can't articulate — each survivor individually satisfies the gate
    // its stage-family's standalone query defines
    import spark.implicits._
    val out = Pipeline.q51CorpusPipeline(spark, TestSpark.Sf0001).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.size === out.length, "duplicate doc_id in the manifest")
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")

    // stages 1+2: survivors are train-split docs with q28 quality >= 0.7,
    // and the manifest's quality column is exactly q28's value
    val q28 = Text.q28Quality(spark, TestSpark.Sf0001)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(!Set("src18", "src19").contains(srcOf(id)), s"doc $id is holdout")
      assert(q28(id) >= 0.7, s"doc $id quality ${q28(id)}")
      assert(r.getDouble(3) === q28(id), s"doc $id quality drifted from q28")
    }

    // stage 2: no survivor is q45-contaminated (q45's train side is the
    // full split, a superset of the quality-gated one — same shingles,
    // same holdout, so its flag transfers)
    val contaminated = Text.q45Decontaminate(spark, TestSpark.Sf0001)
      .filter(col("contaminated") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated doc survived")

    // stage 3: exact dedup — survivor texts are pairwise distinct
    val survivors = docs.join(ids.toSeq.toDF("doc_id"), "doc_id")
    assert(survivors.select(md5(col("text"))).distinct().count() === ids.size)

    // stage 4: no two survivors share any LSH band (two docs sharing a
    // band are in one component, and only the component minimum is kept —
    // an empty candidate-pair set over the survivors is the fixed point a
    // dedup pass must reach)
    assert(Dedup.bandPairs(
      Dedup.minHashBandsOn(survivors.select("doc_id", "text"))).isEmpty)

    // stage 6: every survivor passes the salted quota threshold (JVM md5
    // recompute, independent of Spark's)
    import java.security.MessageDigest
    def h8(id: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"q51|$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    out.foreach { r =>
      val bound = if (r.getString(2) == "en") "40000000" else "c0000000"
      assert(h8(r.getLong(0)) < bound, s"doc ${r.getLong(0)} fails quota")
    }

    // stage 7: bin assignments reconstruct from the per-source running
    // token sum (q43's invariant, here over the SCRUBBED token counts)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      var running = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(6) * 512 + r.getLong(5) === running,
          s"$src doc ${r.getLong(0)} offset mismatch")
        running += r.getLong(4)
      }
    }

    // stage 8: top_terms rank with df and N spanning the SURVIVOR frame
    // (survivorPlan's output — every exact-dedup survivor), NOT the
    // quota-sampled manifest subset. Recomputed here from scratch: JVM
    // tokenization, explicit df map over the survivor frame, explicit N,
    // q41's score formula with the same 6-place rounding.
    val frame = Pipeline.survivorPlan(docs)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val dfMap = frame.values.toSeq.flatMap(t => toks(t).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    val nDocs = frame.size
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      val id = r.getLong(0)
      val expected = toks(frame(id)).groupBy(identity)
        .map { case (t, xs) =>
          t -> round6(xs.size * math.log(nDocs.toDouble / dfMap(t)))
        }.toSeq
        .sortBy { case (t, s) => (-s, t) }
        .take(3).map(_._1).mkString(",")
      assert(r.getString(7) === expected, s"doc $id top_terms drifted")
    }
  }

  test("tfIdfTopTermsOn parameterizes frame, k and the tf-side bound") {
    // the library form a composed pipeline consumes (the minHashBandsOn
    // pattern): df/N must span the WHOLE given frame while k and the
    // tf-side bound vary freely
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .filter(col("source") =!= "src19")
    val out = Text.tfIdfTopTermsOn(docs, k = 2, tfBound = col("doc_id") < 40)
      .collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet.forall(_ < 40), "tf bound leaked")
    byDoc.values.foreach { rows =>
      assert(rows.length <= 2, "k=2 violated")
      // rank order: scores non-increasing with the term tiebreak
      val sorted = rows.sortBy(r => (-r.getDouble(4), r.getString(1)))
      assert(rows.map(_.getString(1)).toSeq === sorted.map(_.getString(1)).toSeq)
    }
    // df spans the FULL frame, not the tf-bounded slice: every df must
    // equal the frame-wide distinct-doc count for that term
    val dfOf = docs
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextOps.words(col("text")))).as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(3) === dfOf(r.getString(1)),
      s"df for '${r.getString(1)}' not frame-wide"))
  }

  test("q51 survivor checkpoints do not accumulate across re-invocations") {
    // Bench runs the builder 1 warmup + reps + variance-retry times per
    // sweep; Dataset.unpersist cannot free localCheckpoint storage, so
    // without the retire-on-reinvoke path each run would pin another
    // survivor-sized block for the session lifetime. Pin: N sequential
    // corpusPipelineOn runs leave the persistent-RDD count bounded by one
    // invocation's footprint, and the explicit handle releases its block.
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val first = Pipeline.corpusPipelineOn(docs)
    first.write.format("noop").mode("overwrite").save()
    val afterFirst = spark.sparkContext.getPersistentRDDs.keySet -- before
    (1 to 2).foreach { _ =>
      Pipeline.corpusPipelineOn(docs).write.format("noop").mode("overwrite").save()
    }
    val afterThird = spark.sparkContext.getPersistentRDDs.keySet -- before
    // each invocation materializes the survivor set plus the contraction
    // loop's final star; only the survivor block is retired on re-invoke,
    // so 3 runs may leave at most first-run footprint + 2 stars — NOT
    // 3 x first-run (the leak shape ADVICE flagged)
    assert(afterThird.size <= afterFirst.size + 2,
      s"survivor checkpoints accumulate: run1 left ${afterFirst.size}, " +
        s"3 runs left ${afterThird.size}")
    // the explicit handle drains its survivor block eagerly
    val beforeH = spark.sparkContext.getPersistentRDDs.keySet
    val (manifest, release) = Pipeline.corpusPipelineHandled(docs)
    manifest.write.format("noop").mode("overwrite").save()
    release()
    val leftH = spark.sparkContext.getPersistentRDDs.keySet -- beforeH
    // what survives the release is the contraction loop's star backing
    // (owned by the manifest plan), never the survivor set
    assert(leftH.size <= 1,
      s"handle release left ${leftH.size} persistent RDDs (expected <= 1)")
  }

  test("q54: split is exhaustive, ~80/10/10, independent of q42's draw") {
    val rows = Text.q54Split(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.length === 500)
    val bySplit = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // md5 is uniform; 500 docs put the rates within a few sd of nominal
    assert(math.abs(bySplit("train") / 500.0 - 0.8) < 0.08, bySplit.toString)
    assert(math.abs(bySplit("val") / 500.0 - 0.1) < 0.06, bySplit.toString)
    assert(math.abs(bySplit("test") / 500.0 - 0.1) < 0.06, bySplit.toString)
    // row-by-row JVM recompute of the salted-hash contract
    import java.security.MessageDigest
    def h8(id: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"split|$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    rows.foreach { case (id, split) =>
      val want = if (h8(id) < "cccccccc") "train"
        else if (h8(id) < "e6666666") "val" else "test"
      assert(split === want, s"doc $id")
    }
    // independence from q42: the q42-kept set must not be contained in
    // (or disjoint from) any one split — distinct salts decorrelate
    val kept = Text.q42QuotaSample(spark, TestSpark.Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptSplits = rows.filter(r => kept(r._1)).map(_._2).distinct
    assert(keptSplits.length === 3, s"q42 sample collapsed into $keptSplits")
  }

  test("q50 assembles exactly q43's bins: same membership, same token sums") {
    // the two queries recompute the same window independently — pin that
    // they cannot drift apart (a budget or ordering edit to one alone
    // breaks this before it breaks the oracle)
    val bins = Text.q43PackBins(spark, TestSpark.Sf0001)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val packs = Text.q50PackAssemble(spark, TestSpark.Sf0001).collect()
    assert(packs.length === bins.size)
    packs.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (nDocs, totTok) = bins(key)
      assert(r.getLong(4) === nDocs, s"$key member count")
      assert(r.getLong(3) === totTok, s"$key token sum")
      // the packed string carries every member: its whitespace token
      // count is the bin's token total (texts concatenate with ' ')
      val tokens = r.getString(2).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
      assert(tokens === totTok, s"$key packed token count")
    }
  }

  test("q63 bloom-prefiltered decontamination equals q45 row for row") {
    // the sketch admits false positives by design; the exact confirm join
    // must kill every one of them, so the two plans — broadcast exact vs
    // sketch-probe + shuffled confirm — are indistinguishable by value
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(2))
    val exact = Text.q45Decontaminate(spark, TestSpark.Sf0001)
      .collect().map(key).sortBy(_._1)
    val bloom = Text.q63BloomDecontaminate(spark, TestSpark.Sf0001)
      .collect().map(key).sortBy(_._1)
    assert(bloom.length === exact.length)
    assert(bloom.sameElements(exact), "bloom path drifted from the exact path")
    assert(exact.exists(_._3 === 1), "fixture has no contaminated doc — vacuous")
  }

  test("q63 sketch prefilter is selective: measured FP rate under 0.5%") {
    // the scale claim behind q63 is that the probe admits ~only the
    // genuinely contaminated sliver into the shuffled confirm join —
    // measure it instead of asserting it: build the same sketch at the
    // same bounds, probe every train shingle, and compare against exact
    // membership
    import graft.functions.SketchOps
    import graft.operators.Text
    val docs = graft.Tables.load(spark, TestSpark.Sf0001, "documents")
    val holdout = col("source").isin("src18", "src19")
    val sh = Text.shingles8(docs)
    val holdShingles = sh.filter(holdout).select("sh8").distinct()
    val sketch = holdShingles
      .agg(SketchOps.bloomFilterAgg(xxhash64(col("sh8")), 1000000L, 8388608L))
      .head.getAs[Array[Byte]](0)
    val train = sh.filter(!holdout).select("sh8").distinct()
    val probes = train.count()
    val admitted = train
      .filter(SketchOps.mightContain(sketch, xxhash64(col("sh8")))).count()
    val exactHits = train.join(holdShingles, "sh8").count()
    val fp = admitted - exactHits
    assert(fp >= 0, "probe missed a true member — bloom filters cannot FN")
    assert(probes > 1000, s"fixture too small to measure selectivity: $probes")
    assert(fp.toDouble / probes < 0.005,
      s"FP rate ${fp.toDouble / probes} over $probes probes ($admitted admitted, $exactHits exact)")
  }

  test("q66 compression ratio discriminates repetition from natural text") {
    import graft.functions.CompressOps
    import spark.implicits._
    val probe = Seq(
      ("rep", "spam link buy now " * 200),
      ("soup", (1 to 200).map(i => s"w${i * 7919 % 997}x${i % 13}").mkString(" ")),
      ("empty", ""))
      .toDF("kind", "text")
      .withColumn("n_bytes", octet_length(col("text")).cast("long"))
      .withColumn("n_deflated", CompressOps.deflateLen(col("text")).cast("long"))
      .withColumn("ratio",
        when(col("n_bytes") > 0,
          round(col("n_deflated").cast("double") / col("n_bytes"), 6)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    // template spam collapses; varied text does not; the gap is the signal
    assert(probe("rep")._2 < 0.05, s"repetition did not collapse: $probe")
    assert(probe("soup")._2 > 0.2, s"varied text over-compressed: $probe")
    assert(probe("soup")._2 > probe("rep")._2 * 4, "signal gap too narrow")
    // empty text: 0 bytes in, NULL ratio, and the kernel still answers
    assert(probe("empty")._1 >= 0 && probe("empty")._2.isNaN)

    // the full fixture: every document answers, every ratio is positive
    // and below the stored-block ceiling (raw + ~5 bytes per 64 KiB block)
    val q66 = graft.operators.Text.q66CompressRatio(spark, TestSpark.Sf0001)
      .collect()
    assert(q66.length === 500)
    q66.foreach { r =>
      assert(!r.isNullAt(2), s"kernel refused doc ${r.getLong(0)}")
      val ratio = r.getDouble(3)
      assert(ratio > 0 && ratio < 1.1, s"doc ${r.getLong(0)} ratio $ratio")
    }

    // interpreted eval agrees with the codegen'd path (the zero-parity
    // claim is only real if both routes run the same body)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val sample = "the quick brown fox " * 40
    val interp = graft.functions.DeflateLen(
      Literal(sample.getBytes("UTF-8"), BinaryType)).eval(null)
    val gen = spark.range(1)
      .select(CompressOps.deflateLen(lit(sample))).head.getInt(0)
    assert(interp === gen, "interpreted and codegen deflate lengths differ")
  }

  test("q65 rules each discriminate on the fixture (no vacuous gate)") {
    val rows = graft.operators.Text.q65RuleFilter(spark, TestSpark.Sf0001)
      .collect()
    def vals(c: String) = rows.map(r => r.getInt(r.fieldIndex(c))).toSet
    // r_alpha is constant-true here (the synthetic vocabulary is purely
    // alphabetic) — that rule earns its keep on real corpora; the other
    // three must actually split this fixture or the oracle proves nothing
    for (rule <- Seq("r_len", "r_wlen", "r_stop", "keep"))
      assert(vals(rule) === Set(0, 1), s"$rule does not discriminate")
    assert(vals("r_alpha") === Set(1))
    // the conjunction is consistent row-by-row
    rows.foreach { r =>
      val bits = Seq("r_len", "r_wlen", "r_alpha", "r_stop")
        .map(c => r.getInt(r.fieldIndex(c)))
      assert(r.getInt(r.fieldIndex("keep")) === bits.min, s"keep drift: $r")
    }
  }

  test("q67 line dedup matches a full independent Scala replay") {
    val docs = graft.Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent line synthesis (plain Scala, no Column arithmetic)
    def linesOf(id: Long, text: String): Seq[String] = {
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val body = ws.grouped(8).map(_.mkString(" ")).toSeq
      (s"boilerplate header variant ${id % 7}" +: body) :+
        s"all rights reserved variant ${id % 5}"
    }
    val all = docs.toSeq.flatMap { case (id, t) =>
      linesOf(id, t).map(id -> _)
    }
    val dup = all.groupBy(_._2).collect {
      case (line, hits) if hits.map(_._1).distinct.size >= 3 => line
    }.toSet
    val rows = graft.operators.Text.q67LineDedup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === docs.size)
    // the synthesized boilerplate is dup by construction at this corpus
    // size (~71 docs per header variant, ~100 per footer variant)
    assert(dup.exists(_.startsWith("boilerplate header")) &&
      dup.exists(_.startsWith("all rights reserved")))
    for ((id, text) <- docs) {
      val lines = linesOf(id, text)
      val kept = lines.filterNot(dup)
      val removed = lines.filter(dup)
      val r = rows(id)
      assert(r.getLong(r.fieldIndex("n_lines")) === lines.size, s"doc $id")
      assert(r.getLong(r.fieldIndex("n_removed")) === removed.size, s"doc $id")
      val frac = BigDecimal(removed.map(_.length).sum.toDouble /
        lines.map(_.length).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(r.fieldIndex("removed_char_frac")) === frac,
        s"doc $id frac")
      val cleaned = Option(r.getString(r.fieldIndex("cleaned_text")))
      assert(cleaned === (if (kept.isEmpty) None else Some(kept.mkString("\n"))),
        s"doc $id reassembly")
    }
    // the rule must bite beyond boilerplate somewhere (real cross-doc
    // body-line dups exist in this corpus) or the fixture is vacuous
    assert(dup.exists(l => !l.startsWith("boilerplate header") &&
      !l.startsWith("all rights reserved")),
      "no organic duplicate body line in the fixture")
  }

  test("q70 substring dedup matches a full independent Scala replay") {
    val docs = graft.Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Vector[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector
    // corpus-wide 8-gram occurrence counts (plain Scala, no Spark)
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val starts = docs.toSeq.map { case (id, t) =>
      val ws = toks(t)
      val sh = (0 to ws.length - 8).map(i => ws.slice(i, i + 8).mkString(" "))
      sh.foreach(s => counts(s) = counts.getOrElse(s, 0) + 1)
      id -> sh
    }.toMap
    val rows = graft.operators.Dedup.q70SubstringDedup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === docs.size)
    var totalRemoved = 0L
    for ((id, t) <- docs) {
      val ws = toks(t)
      val dupStarts = starts(id).zipWithIndex.collect {
        case (s, i) if counts(s) >= 2 => i
      }
      val kept = ws.zipWithIndex.collect {
        case (w, p) if !dupStarts.exists(s => s <= p && p <= s + 7) => w
      }
      val r = rows(id)
      assert(r.getLong(r.fieldIndex("n_tokens")) === ws.length, s"doc $id")
      assert(r.getLong(r.fieldIndex("n_removed")) === ws.length - kept.length,
        s"doc $id removed")
      assert(Option(r.getString(r.fieldIndex("cleaned_text"))) ===
        (if (kept.isEmpty) None else Some(kept.mkString(" "))),
        s"doc $id reassembly")
      totalRemoved += ws.length - kept.length
    }
    // the excision must bite (word-soup corpora carry organic 8-gram
    // repeats) and must not degenerate to removing everything
    assert(totalRemoved > 0, "no duplicate span in the fixture")
    assert(rows.values.exists(r =>
      r.getString(r.fieldIndex("cleaned_text")) != null),
      "every doc was fully excised — fixture degenerate")
  }

  test("q71 stages compose consistently and the frame-scoped df differs from q67's") {
    val pre = graft.operators.Text.q71WebPreclean(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val verdicts = graft.operators.Text.q68UrlBlocklist(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getString(3), r.getInt(4))).toMap
    // stage 1 filters: exactly the unblocked docs survive, domains agree
    assert(pre.keySet === verdicts.collect {
      case (id, (_, 0)) => id
    }.toSet)
    pre.foreach { case (id, r) =>
      assert(r.getString(r.fieldIndex("registered_domain")) === verdicts(id)._1)
    }
    // stage 3 judges the CLEANED text: n_words is the cleaned token
    // count, and the keep conjunction holds row-by-row
    pre.values.foreach { r =>
      val cleaned = Option(r.getString(r.fieldIndex("cleaned_text")))
      val n = cleaned.map(_.toLowerCase.split("[^a-z0-9]+")
        .count(_.nonEmpty)).getOrElse(0)
      assert(r.getLong(r.fieldIndex("n_words")) === n)
      val bits = Seq("r_len", "r_wlen", "r_alpha", "r_stop")
        .map(c => r.getInt(r.fieldIndex(c)))
      assert(r.getInt(r.fieldIndex("keep")) === bits.min)
    }
    // the line-df frame really is the SURVIVOR set: q67 (corpus-wide df)
    // removes strictly more line mass than q71 does on its survivors for
    // at least one doc — blocked docs' headers no longer push a variant
    // over the threshold, or body dups lose a contributor
    val q67 = graft.operators.Text.q67LineDedup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_removed"))).toMap
    val diffs = pre.collect {
      case (id, r) if q67(id) != r.getLong(r.fieldIndex("n_removed")) => id
    }
    pre.foreach { case (id, r) =>
      assert(r.getLong(r.fieldIndex("n_removed")) <= q67(id),
        s"doc $id: survivor-frame df removed MORE than corpus-wide df")
    }
    assert(diffs.nonEmpty,
      "frame scoping is unobservable on this fixture — df sets identical")
  }

  test("q68 blocklist: every extraction rule discriminates on the fixture") {
    val rows = graft.operators.Text.q68UrlBlocklist(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    assert(rows.length === 500)
    for ((id, url, host, reg, blocked) <- rows) {
      // the port never leaks into the host, the scheme never survives
      assert(!host.contains(":") && !host.contains("/"), s"doc $id: $host")
      assert(url.startsWith(s"https://$host"), s"doc $id: $url vs $host")
      // a subdomain collapses to its registered domain
      if (host == "cdn.spam-mill.biz") assert(reg === "spam-mill.biz")
      // the multi-label suffix keeps three labels, never judging bare co.uk
      if (host == "news.site.co.uk") assert(reg === "site.co.uk")
      // a 2-label-plus-suffix host IS its own registered domain
      if (host == "papers.ac.uk")
        assert(reg === "papers.ac.uk" && blocked === 0)
      // blocking is by registered domain: the bare apex and its
      // subdomains fall together
      assert((blocked == 1) ===
        Set("spam-mill.biz", "adnet.io", "site.co.uk").contains(reg),
        s"doc $id: $reg -> $blocked")
    }
    // both outcomes and the ported/unported variants are present
    assert(rows.map(_._5).toSet === Set(0, 1))
    assert(rows.exists(_._2.contains(":8443/")) &&
      rows.exists(!_._2.contains(":8443")))
  }

  test("q74 incremental dedup: re-crawls flagged against history, fresh docs keep") {
    val rows = graft.operators.Dedup.q74IncrementalDedup(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    val (recrawls, fresh) = rows.partition(_._1 >= 1000000L)
    assert(recrawls.nonEmpty && fresh.nonEmpty)
    // every re-crawl is an exact hit on its own source (identical text ->
    // identical fingerprint AND identical minhash signature)
    for ((id, ex, nr, keep, src) <- recrawls) {
      assert(ex === 1 && nr === 1 && keep === 0, s"re-crawl $id: ex=$ex nr=$nr")
      assert(src <= id - 1000000L, s"re-crawl $id matched $src above its source")
    }
    // the batch is not vacuous in either direction: genuinely-new docs
    // overwhelmingly keep, and keep is exactly the two bits' complement
    assert(fresh.count(_._4 == 1) > fresh.length / 2)
    rows.foreach { case (id, ex, nr, keep, _) =>
      assert((keep == 1) === (ex == 0 && nr == 0), s"doc $id verdict drifted") }
  }

  test("q75 mixture weights: √-temperature flattens the mix, budget is conserved") {
    val rows = graft.operators.Text.q75MixtureWeights(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares must sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "weights must sum to 1")
    // α = 0.5 damps the head and lifts the tail: every below-average
    // domain gains weight over its natural share, every above-average
    // domain loses — and the ordering of domains is preserved
    val avg = 1.0 / rows.length
    rows.foreach { case (src, _, share, weight, _) =>
      if (share < avg - 1e-9) assert(weight > share, s"$src not upweighted")
      if (share > avg + 1e-9) assert(weight < share, s"$src not damped")
    }
    assert(rows.sortBy(_._3).map(_._1).toSeq === rows.sortBy(_._4).map(_._1).toSeq)
    // floor allocation never overspends the 1M budget, and spends most of it
    val planned = rows.map(_._5).sum
    assert(planned <= 1000000L && planned >= 1000000L - rows.length)
  }

  test("q77 char repetition: both signals discriminate, bounds hold") {
    val rows = graft.operators.Text.q77RepetitionChars(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length === 500)
    rows.foreach { case (id, t2, d5) =>
      t2.foreach(v => assert(v > 0 && v <= 1, s"doc $id top2_frac $v"))
      d5.foreach(v => assert(v >= 0 && v <= 1, s"doc $id dup5_frac $v"))
    }
    // the synthesized repetition (doc_id % 10 = 3 with >= 5 words) trips
    // the dup5 rule — and ONLY those docs do on this corpus, so a coverage
    // slip in either direction is visible
    val hit = rows.filter(_._3.exists(_ > 0)).map(_._1).toSet
    assert(hit.nonEmpty && hit.forall(_ % 10 == 3), s"unexpected dup5 hits: $hit")
    val eligible = rows.filter(r => r._1 % 10 == 3 && r._3.isDefined).map(_._1).toSet
    assert(hit === eligible, "a synthesized repeat escaped the dup5 rule")
    // top2 varies across docs (not a constant artifact of the generator)
    assert(rows.flatMap(_._2).distinct.length > 10)
  }

  test("q81 bigram surprisal: self-trained coverage, context beats unigram on repeats") {
    import spark.implicits._
    // model trained on the scored corpus itself => every adjacent pair
    // exists in the model, so exactly the first token of each doc goes
    // unscored — an inner-join dropping pairs would break this invariant
    val rows = Text.q81BigramSurprisal(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("n_tokens"), col("n_scored"),
        col("mean_surprisal"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nt, ns, m) =>
      assert(ns === math.max(nt - 1, 0L), s"doc $id: $ns scored of $nt")
      assert(m.isDefined === (ns > 0), s"doc $id: mean/NULL contract broken")
    }
    // the context term is doing real work: a document that is one token
    // repeated is maximally predictable to the bigram model (P(cur|prev)
    // ~ 1 inside the doc) but can stay expensive to the unigram mix —
    // its bigram surprisal must undercut a natural-text doc's even when
    // the repeated token is corpus-rare
    val synth = Seq(
      (1L, Array.fill(50)("zq").mkString(" ")),
      (2L, "the cat sat on the mat and the dog ran off to town")
    ).toDF("doc_id", "text")
    val m = Text.bigramSurprisalOn(synth)
      .select("doc_id", "mean_surprisal").as[(Long, Double)].collect().toMap
    assert(m(1L) < m(2L),
      s"repetition not cheaper under context: rep=${m(1L)} nat=${m(2L)}")
  }

  test("q83 BM25: dense descending ranks, matched terms only, rare beats common") {
    import graft.operators.Retrieval
    val rows = Retrieval.q83Bm25TopK(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq,
        s"query $q ranks not dense")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(-_).toSeq,
        s"query $q scores not descending")
      assert(rs.length <= 10)
    }
    // every ranked doc really contains >= 1 query term (no score leakage
    // through a join misalignment)
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    val qterms = Retrieval.Queries.toMap
    rows.foreach { case (q, _, d, s) =>
      assert(s > 0, s"non-positive BM25 score for $q/$d")
      val terms = qterms(q).split(" ")
      val docToks = docs(d).split("[^a-z0-9]+").toSet
      assert(terms.exists(docToks.contains),
        s"doc $d ranked for query $q without any of its terms")
    }
  }

  test("qualityScore: degenerate text scores, never a division error") {
    import spark.implicits._
    // the zero-token division must be guarded in the expression itself:
    // Spark 4 defaults to ANSI mode, where an unguarded x/0 THROWS mid
    // corpus. The guarded NULL then flows through `least`, which SKIPS
    // nulls, so token-less text scores exactly the avg-length term's
    // ceiling contribution (0.5) — the q28 oracle computes the same 0.5
    // (DuckDB also nulls the division and also skips nulls in least), so
    // this is the cross-engine contract, not an accident
    val rows = Seq((1L, ""), (2L, "?!."), (3L, "   "), (4L, "real words here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === Some(0.5) && rows(2L) === Some(0.5) &&
      rows(3L) === Some(0.5))
    assert(rows(4L).exists(q => q > 0.0 && q != 0.5))
    // a NULL text is the genuinely ungradeable case — q88 carries it
    // through as a NULL verdict
    val k = Text.adaptiveQualityOn(
      Seq((1L, "s", null.asInstanceOf[String]),
        (2L, "s", "real words here for quality"),
        (3L, "s", "more real words here too"))
        .toDF("doc_id", "source", "text"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(k(1L) === None, "ungradeable doc must report NULL keep")
    assert(k(2L).isDefined && k(3L).isDefined)
  }

  test("q87 chunking: counts, overlap stitching, full coverage, NULL empties") {
    import spark.implicits._
    def doc(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, ""), (1L, doc(1)), (64L, doc(64)), (65L, doc(65)),
      (200L, doc(200))).toDF("doc_id", "text")
    val rows = Text.chunkDocsOn(docs, maxTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getString(3))))
    val byDoc = rows.groupBy(_._1)
    // layout: 1 + ceil(max(0, n-64)/48) chunks; a token-less doc stays
    // visible as a single NULL row
    assert(byDoc(0L).toSeq === Seq((0L, None, None, None)))
    assert(byDoc(1L).map(_._3).toSeq === Seq(Some(1L)))
    assert(byDoc(64L).map(_._3).toSeq === Seq(Some(64L)))
    assert(byDoc(65L).length === 2 && byDoc(200L).length === 4)
    Seq(65, 200).foreach { n =>
      val chunks = byDoc(n.toLong).sortBy(_._2.get)
        .map(_._4.get.split(" ").toSeq).toSeq
      // consecutive windows stitch: chunk i's tail IS chunk i+1's head
      chunks.sliding(2).foreach { case Seq(a, b) =>
        assert(a.drop(48) === b.take(a.length - 48), s"n=$n overlap broken")
      case _ => ()
      }
      // and the union of windows covers every token exactly in order
      val stitched = chunks.head ++ chunks.tail.flatMap(_.drop(16))
      assert(stitched === (0 until n).map(i => s"w$i").toSeq, s"n=$n coverage")
    }
    // the contract shape is narrow: zero exchanges
    val p = Text.q87ChunkDocs(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("- Exchange "), s"q87 shuffles a narrow chunker:\n$p")
  }

  test("q91 canonicalization rules, pinned on handcrafted URLs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def canon(urls: String*): Seq[String] =
      urls.toDF("url").select(Text.canonicalUrl(col("url"))).as[String].collect().toSeq
    // scheme + host case-fold; PATH case is preserved (RFC 3986)
    assert(canon("HTTPS://WWW.Example.COM/Path/A") ===
      Seq("https://www.example.com/Path/A"))
    // default ports strip per scheme; explicit non-defaults survive
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "http://a.com:443/x", "https://a.com:8080/x") ===
      Seq("https://a.com/x", "http://a.com/x",
        "http://a.com:443/x", "https://a.com:8080/x"))
    // trailing-slash runs strip; the bare root collapses by the same rule
    assert(canon("https://a.com/x/", "https://a.com/x///", "https://a.com/") ===
      Seq("https://a.com/x", "https://a.com/x", "https://a.com"))
    // tracking params drop wherever they sit; survivors keep their ORDER
    // (never sorted), and a query left empty loses its '?'
    assert(canon(
      "https://a.com/x?utm_source=f&id=3&utm_campaign=c&b=2",
      "https://a.com/x?b=2&id=3",
      "https://a.com/x?fbclid=abc",
      "https://a.com/x?utm_medium=e") ===
      Seq("https://a.com/x?id=3&b=2", "https://a.com/x?b=2&id=3",
        "https://a.com/x", "https://a.com/x"))
    // fragments never reach the canonical form; an utm-LOOKALIKE value is
    // content, not a parameter name, and survives
    assert(canon("https://a.com/x?id=utm_source#frag") ===
      Seq("https://a.com/x?id=utm_source"))
  }

  test("q91 dedup structure: every group has one keeper, dup_of points at it") {
    val rows = Text.q91UrlCanonicalize(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    val groups = rows.groupBy(_._2)
    // the synthesis residues guarantee real collisions at sf0.001
    assert(groups.exists(_._2.length > 1), "no canonical collisions synthesized")
    groups.foreach { case (cu, members) =>
      val keepers = members.filter(_._3 == 1)
      assert(keepers.length === 1, s"$cu has ${keepers.length} keepers")
      val rep = keepers.head._1
      assert(rep === members.map(_._1).min, s"$cu keeper is not the min id")
      members.filter(_._3 == 0).foreach { m =>
        assert(m._4 === Some(rep), s"$cu dup ${m._1} points at ${m._4}, not $rep")
      }
      assert(keepers.head._4 === None, s"$cu keeper carries a dup_of")
    }
    // one hash shuffle on the canonical key, nothing else
    val plan = Text.q91UrlCanonicalize(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    val n = "- Exchange ".r.findAllIn(plan).length
    assert(n === 1, s"q91 should shuffle exactly once (canonical key), found $n:\n$plan")
  }

  test("q92 Luhn gate: checksum decides redaction, not the pattern") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def luhn(cands: String*): Seq[Boolean] =
      cands.toDF("c").select(Text.luhnValid(col("c"))).as[Boolean].collect().toSeq
    // the classic test PAN, its dashed/spaced spellings, and every
    // fixture PAN validate; the +1 twins all fail
    assert(luhn("4111111111111111", "4111-1111-1111-1111",
      "4111 1111 1111 1111") === Seq(true, true, true))
    assert(luhn(Text.ValidPans: _*).forall(identity))
    assert(!luhn(Text.InvalidPans: _*).exists(identity))
    // length bounds: 12 digits never validates even with a good checksum
    assert(luhn("123456789012") === Seq(false))
  }

  test("q92 scrubs only validated candidates, zero exchanges") {
    val rows = Text.q92PiiChecksum(spark, TestSpark.Sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (nCards, nIps, scrubbed)) =>
      val expCards = if (id % 4 == 3) 0L else if (id % 4 == 2) 0L
        else if (id % 7 == 0) 2L else 1L
      val expIps = if (id % 5 == 0) 1L else 0L
      assert(nCards === expCards, s"doc $id n_cards")
      assert(nIps === expIps, s"doc $id n_ips")
      // valid classes got redacted; the Luhn-broken twin SURVIVES
      if (id % 4 == 0 || id % 4 == 1)
        assert(scrubbed.contains("<CARD>"), s"doc $id valid card not scrubbed")
      if (id % 4 == 2) {
        assert(!scrubbed.contains("<CARD>"), s"doc $id scrubbed an invalid card")
        assert(scrubbed.contains(Text.InvalidPans((id % 10).toInt)),
          s"doc $id lost its Luhn-broken twin")
      }
      if (id % 5 == 0) assert(scrubbed.contains("<IP>"), s"doc $id ip not scrubbed")
      if (id % 5 == 1) assert(scrubbed.contains("10.999."),
        s"doc $id redacted an out-of-range quad")
      // the 23-digit decoy is too long for a card and survives whole
      if (id % 6 == 0) assert(scrubbed.contains("12345678901234567890123"),
        s"doc $id mangled the long-run decoy")
    }
    val plan = Text.q92PiiChecksum(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("- Exchange "), s"q92 shuffles a narrow scrubber:\n$plan")
  }
}
