package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Marker for the minutes-scale proofs (run by default; filterable with
  * `testOnly -- -l graft.Slow` when iterating).
  */
object Slow extends Tag("graft.Slow")

/** The 10× scale proof for the ANN path: on a corpus ten times sf0.1's
  * embedding count, the bucketCap must BIND — candidate pairs and wall
  * time may not grow anywhere near quadratically. This is the mechanism
  * that keeps q26's plan alive at 100 TB (a hot LSH bucket is the one
  * place the pipeline could go O(n²)); proven here with numbers over the
  * exact operator path q26 runs, not asserted in comments.
  */
class AnnScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Deterministic pseudo-random 64-dim vectors in [-1, 1): murmur3 of
    * (id, dim) — same near-random shape as the testdata embeddings, no
    * driver-side RNG, generated distributed (no collect, no parallelize
    * of driver arrays).
    */
  private def synth(n: Int, dims: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(hash(col("id"), d), lit(100000)).cast("double") / 50000.0 - 1.0)
        .as("v"))

  // sf0.1 carries 2k embeddings; the scale corpus is 10× that
  private val nBase = 2000
  private val nBig = 20000
  private val cap = 256 // ~bucket occupancy at nBase, so it binds at nBig

  test("100x recall retention: LSH, IVF, and sample-trained PQ under auto-config", Slow) {
    // r13 (r12 verdict task #4): the auto-config policy is proven at the
    // first decade by the gates below; this probe measures the SECOND
    // decade (SynthScale 100x — 200k jittered-replica embeddings, cluster
    // structure preserved) for the trio the policy governs. Env-gated:
    // the 100x corpus walk is minutes-scale and belongs to the on-demand
    // scale runs (BENCH_NOTES records the measured values), not to every
    // suite invocation.
    assume(sys.env.contains("GRAFT_SCALE100"),
      "set GRAFT_SCALE100=1 to run the 100x recall probe")
    import graft.functions.VectorOps._
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val big = graft.tools.SynthScale
      .scaledEmbeddings(spark, "/root/testdata/sf0.1", 100)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .localCheckpoint()
    val n = big.count()
    val stride = 2000000L
    val qmod = 311 // ~640 queries spread across replicas
    val queries = big.filter(pmod(col("vec_id"), lit(qmod)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val nq = queries.count()
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("cand_id").asc)
    val brute = queries
      .crossJoin(big.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(pmod(col("q_id"), lit(stride)) =!= pmod(col("cand_id"), lit(stride)))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("cand_id"))
      .localCheckpoint()
    def recallOf(ann: DataFrame): Double = {
      val wa = Window.partitionBy("vec_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      val approx = ann
        .filter(pmod(col("vec_id"), lit(qmod)) === 0)
        .filter(pmod(col("vec_id"), lit(stride)) =!= pmod(col("cand_id"), lit(stride)))
        .withColumn("rn", row_number().over(wa)).filter(col("rn") <= k)
        .select("vec_id", "cand_id")
      brute.intersect(approx).count().toDouble / (k * nq)
    }
    // exactly the auto-config entry-point parameters at this n. The ANN
    // k must clear the REPLICA FAMILY first: at 100x every query has 99
    // jitter-twins at cosine ~0.999 that the family exclusion removes,
    // so top-(4k) would be all family and judge recall 0 vacuously —
    // oversample past the family (100) plus the judged top-k
    val annK = 100 + 4 * k
    val lsh = recallOf(Similarity.annCosineOn(big,
      nbits = Similarity.autoLshBits(n, 3), bands = 8,
      k = annK, bucketCap = Similarity.autoBucketCap(n)))
    val (nCells, nProbe, cellCap) = Similarity.autoIvfParams(n)
    val ivf = recallOf(Similarity.ivfCosineOn(big, nCells, nProbe, k = annK,
      cellCap = cellCap))
    val pq = recallOf(Similarity.annCosinePQOn(big,
      nbits = Similarity.autoLshBits(n, 3), k = annK,
      bucketCap = Similarity.autoBucketCap(n), n = n))
    // the quantized SCALE path: PQ-ADC over the IVF candidate stage
    // (FAISS's IVFPQ shape; the LSH-candidate q73 spelling is the
    // contract query, this is what a 100 TB deployment runs)
    val pqIvf = recallOf(Similarity.rerankTopKPQ(
      Similarity.ivfCandidatePairs(big, nCells, nProbe, cellCap),
      big, k = annK, n = n))
    info(f"100x top-$k recall over $nq queries: LSH $lsh%.3f, IVF $ivf%.3f, " +
      f"LSH-PQ $pq%.3f, IVFPQ $pqIvf%.3f")
    // the q44 candidate stage at 100x, split by what "near-dup" means at
    // this density: the measured first run (0.34 sweep) counted ~650
    // partners per query — at 100x the contract threshold sweeps in the
    // MID-similarity band, and an epsilon-neighborhood ALL-PAIRS at low
    // similarity is inherently near-quadratic (no sub-quadratic
    // candidate generator retains it — the no-free-lunch, reported, not
    // gated). True near-DUPLICATES (cos >= 0.9 — re-encodes, jitter
    // twins, the class dedup exists for) must stay collided under
    // autoLshBits: that is the gated floor.
    val simPairs = queries
      .crossJoin(big.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .filter(col("sim") >= 0.34)
      .select(col("q_id").as("vec_id"), col("cand_id"), col("sim"))
      .localCheckpoint()
    val cand44 = Similarity.annCandidatePairs(big,
      nbits = Similarity.autoLshBits(n, 2), bands = 24,
      bucketCap = Similarity.autoBucketCap(n))
      .filter(pmod(col("vec_id"), lit(qmod)) === 0)
      .select("vec_id", "cand_id")
      .localCheckpoint()
    def retention(thresh: Double): (Long, Long) = {
      val t = simPairs.filter(col("sim") >= thresh).select("vec_id", "cand_id")
      (t.intersect(cand44).count(), t.count())
    }
    val (dupF, dupT) = retention(0.9)
    val (midF, midT) = retention(0.34)
    val dupRetention = dupF.toDouble / math.max(1L, dupT)
    info(f"100x candidate retention: near-dups (>=0.9) $dupF/$dupT = " +
      f"$dupRetention%.3f; 0.34 sweep $midF/$midT = ${midF.toDouble / math.max(1L, midT)}%.3f (reported, not gated)")
    // floors: the IVF family carries top-k retrieval at scale; the LSH
    // family must keep finding near-DUPLICATES (its contract class)
    assert(ivf >= 0.5, f"IVF recall collapsed at 100x: $ivf%.3f")
    assert(pqIvf >= 0.5, f"IVFPQ recall collapsed at 100x: $pqIvf%.3f")
    assert(dupRetention >= 0.8,
      f"near-dup retention collapsed at 100x: $dupRetention%.3f")
  }

  test("bucketCap bounds LSH candidate growth at 10x the corpus", Slow) {
    val c1 = Similarity.annCandidatePairs(synth(nBase), nbits = 3, bands = 8,
      bucketCap = cap).count()
    val c2 = Similarity.annCandidatePairs(synth(nBig), nbits = 3, bands = 8,
      bucketCap = cap).count()
    assert(c1 > 0 && c2 > 0)
    val ratio = c2.toDouble / c1
    // uncapped, pairs grow ~(10x)^2 = 100x; with the cap binding, each
    // (band, bucket) group is bounded so the candidate set stays ~flat.
    // <= 10x is the "no worse than linear" line the plan must hold.
    assert(ratio <= 10.0,
      s"candidate pairs grew ${ratio}x from n=$nBase ($c1) to n=$nBig ($c2) — bucketCap not binding")
  }

  test("cellCap bounds IVF candidate growth to ~linear at 10x the corpus", Slow) {
    // cellCap 64 binds at both sizes (strata are ~n/32 members), so each
    // query's candidate set is <= nProbe * cellCap regardless of n — total
    // candidates grow ~linearly in n, never with n^2
    val c1 = Similarity.ivfCandidatePairs(synth(nBase), nCells = 32,
      nProbe = 4, cellCap = 64).count()
    val c2 = Similarity.ivfCandidatePairs(synth(nBig), nCells = 32,
      nProbe = 4, cellCap = 64).count()
    assert(c1 > 0 && c2 > 0)
    val ratio = c2.toDouble / c1
    assert(ratio <= 15.0,
      s"candidate pairs grew ${ratio}x from n=$nBase ($c1) to n=$nBig ($c2) — cellCap not binding")
  }

  test("q26-shape wall time within 10x at 10x the corpus", Slow) {
    def timeOnce(n: Int): Double = {
      val t0 = System.nanoTime()
      Similarity.annCosineOn(synth(n), nbits = 3, bands = 8, k = 5,
        bucketCap = cap).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timeOnce(nBase) // warmup: JIT + codegen cache for the shared plan shape
    val tBase = timeOnce(nBase)
    val tBig = timeOnce(nBig)
    // the 2s floor keeps the bound meaningful when the base run is so fast
    // that scheduler noise dominates the ratio
    val bound = 10.0 * math.max(tBase, 2.0)
    assert(tBig <= bound,
      f"10x corpus took $tBig%.1fs vs $tBase%.1fs at base — over the ${bound}%.1fs bound")
  }

  test("LSH and IVF recall hold at 10x the corpus with unchanged parameters", Slow) {
    // the r10 verdict's open question: AnnRecallSpec gates recall at a
    // FIXED n — nothing showed the same nbits/bands/caps survive a
    // decade of corpus growth. The 10x corpus comes from SynthScale's
    // jittered replication of the REAL embeddings (cluster structure
    // preserved — ±0.025 jitter is far below inter-cluster distances),
    // and ground truth is brute force over a SAMPLED query set so the
    // proof stays seconds-scale.
    import graft.functions.VectorOps._
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val big = graft.tools.SynthScale
      .scaledEmbeddings(spark, "/root/testdata/sf0.1", 10)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    // a replica family (same base id under SynthScale's 2e6 stride) sits
    // at jitter distance from itself — including it makes 10x recall a
    // free 1.000 (replicas hash identically); ground truth and the ANN
    // list both EXCLUDE the query's own family so the gate measures
    // genuinely-near OTHER vectors at 10x density
    val stride = 2000000L
    def recallOf(corpus: DataFrame,
                 ann: DataFrame => DataFrame): (Double, Long) = {
      // ~64 queries spread across replicas (and so across clusters)
      val queries = corpus.filter(pmod(col("vec_id"), lit(31)) === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      val brute = queries
        .crossJoin(corpus.select(col("vec_id").as("cand_id"), col("v").as("cv")))
        .filter(pmod(col("q_id"), lit(stride)) =!= pmod(col("cand_id"), lit(stride)))
        .withColumn("sim", cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("q_id").as("vec_id"), col("cand_id"))
      // oversample the approximate list, drop the family, keep its top-k
      val wa = Window.partitionBy("vec_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      val approx = ann(corpus)
        .filter(pmod(col("vec_id"), lit(31)) === 0)
        .filter(pmod(col("vec_id"), lit(stride)) =!= pmod(col("cand_id"), lit(stride)))
        .withColumn("rn", row_number().over(wa)).filter(col("rn") <= k)
        .select("vec_id", "cand_id")
      val nq = queries.count()
      (brute.intersect(approx).count().toDouble / (k * nq), nq)
    }
    // q26's LSH parameters and q36's IVF parameters, both sizes; k is
    // oversampled ×4 so dropping the ≤9-member family leaves a full
    // top-k list to judge
    def lsh(c: DataFrame) =
      Similarity.annCosineOn(c, nbits = 3, bands = 8, k = 4 * k,
        bucketCap = 4096)
    def ivf(c: DataFrame) =
      Similarity.ivfCosineOn(c, nCells = 32, nProbe = 20, k = 4 * k,
        cellCap = 4096)
    val (lsh1, nq1) = recallOf(base, lsh)
    val (lsh10, nq10) = recallOf(big, lsh)
    val (ivf1, _) = recallOf(base, ivf)
    val (ivf10, _) = recallOf(big, ivf)
    info(f"LSH recall@$k: $lsh1%.3f at 1x ($nq1 queries) -> $lsh10%.3f at 10x ($nq10 queries)")
    info(f"IVF recall@$k: $ivf1%.3f at 1x -> $ivf10%.3f at 10x")
    assert(lsh1 >= 0.8 && lsh10 >= 0.8,
      f"LSH recall degraded across the decade: $lsh1%.3f -> $lsh10%.3f")
    assert(ivf1 >= 0.8 && ivf10 >= 0.8,
      f"IVF recall degraded across the decade: $ivf1%.3f -> $ivf10%.3f")
  }

  /** Deterministic CLUSTERED vectors — the real-embedding regime (encoder
    * outputs concentrate on semantic clusters), as opposed to [[synth]]'s
    * near-random shape: point i belongs to cluster i % centers, at the
    * cluster's hash-derived center plus ±10% noise. Cluster membership is
    * the ground-truth neighborhood structure.
    */
  private def synthClustered(n: Int, centers: Int = 64,
                             dims: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), d => {
        val c = pmod(col("id"), lit(centers))
        val center = pmod(hash(c, d), lit(100000)).cast("double") / 50000.0 - 1.0
        val noise = (pmod(hash(col("id"), d, lit(7)), lit(100000))
          .cast("double") / 50000.0 - 1.0) * 0.1
        center + noise
      }).as("v"))

  test("IVF with density-scaled cells: linear candidates AND recall, clustered data", Slow) {
    // The round-11 sf0.1→10x bench names q36's 29x growth: at the BENCH
    // parameters (nCells=32, nProbe=20, cap non-binding — recall-tuned
    // for the corpus's near-random vectors) per-cell density grows with
    // n, so probe work is Θ(n²·nProbe/nCells) by construction. The SCALE
    // configuration holds nCells ∝ n (fixed expected cell size) with
    // nProbe fixed — per-query candidates stay constant, total work
    // linear. On near-random vectors that trade costs recall (no free
    // lunch: nothing is near anything); on CLUSTERED data — the regime
    // real embeddings live in — it must cost nothing, because a query's
    // true neighbors share its cluster and nearest-centroid probing
    // follows the density. This test pins BOTH halves of that claim.
    import graft.functions.VectorOps._
    import org.apache.spark.sql.expressions.Window
    val k = 5
    def run(n: Int): (Long, Double) = {
      val corpus = synthClustered(n)
      val nCells = n / 32 // density-scaled: ~32 expected members per cell
      val cands = Similarity.ivfCandidatePairs(corpus, nCells = nCells,
        nProbe = 8, cellCap = 64)
      val nCands = cands.count()
      val queries = corpus.filter(pmod(col("vec_id"), lit(31)) === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      val brute = queries
        .crossJoin(corpus.select(col("vec_id").as("cand_id"), col("v").as("cv")))
        .filter(col("q_id") =!= col("cand_id"))
        .withColumn("sim", cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("q_id").as("vec_id"), col("cand_id"))
      val approx = Similarity.ivfCosineOn(corpus, nCells = nCells,
        nProbe = 8, k = k, cellCap = 64)
        .filter(pmod(col("vec_id"), lit(31)) === 0)
        .select("vec_id", "cand_id")
      val nq = queries.count()
      val recall = brute.intersect(approx).count().toDouble / (k * nq)
      (nCands, recall)
    }
    val (c1, r1) = run(nBase)
    val (c10, r10) = run(nBig)
    info(f"density-scaled IVF: candidates $c1 -> $c10 (${c10.toDouble / c1}%.1fx), recall $r1%.3f -> $r10%.3f")
    assert(c10.toDouble / c1 <= 13.0,
      f"candidates grew ${c10.toDouble / c1}%.1fx at 10x — density scaling not linear")
    assert(r1 >= 0.8 && r10 >= 0.8,
      f"clustered recall fell under density scaling: $r1%.3f -> $r10%.3f")
  }

  test("auto-scale policy: dense params at contract SFs, binding caps above") {
    // r12 (r11 verdict task #3): the linear-scale configurations must be
    // the ENGAGED default above the dense ceiling — a deployment cannot
    // silently carry the ~n² dense config. The contract SFs (sf0.001–
    // sf0.1, ≤ 2k embeddings) stay on the dense recall-tuned parameters,
    // so every oracle row and recall gate is untouched by the policy.
    assert(Similarity.autoBucketCap(200) === 4096)
    assert(Similarity.autoBucketCap(2000) === 4096)
    assert(Similarity.autoIvfParams(2000) === ((32, 20, 4096)))
    // above the ceiling: binding LSH cap; density-scaled cells (~32
    // expected members), fixed probes, binding cellCap — the exact
    // configuration the linear-candidates + clustered-recall tests above
    // measure
    assert(Similarity.autoBucketCap(4097) === 256)
    assert(Similarity.autoBucketCap(20000) === 256)
    assert(Similarity.autoIvfParams(20000) === ((625, 8, 64)))
    assert(Similarity.autoIvfParams(1000000) === ((31250, 8, 64)))
    // n/32 overflows Int above ~68.7B vectors — the clamp must keep the
    // cell count positive (a wrapped-negative would silently revert to
    // the 32-cell dense config the policy exists to prevent)
    assert(Similarity.autoIvfParams(Long.MaxValue)._1 === Int.MaxValue)
    assert(Similarity.autoIvfParams(100_000_000_000L)._1 > 1_000_000_000)
    // the PQ training bound (r12 verdict task #1): the codebook trains
    // on the whole corpus in the dense regime and on a hash-stratified
    // ~PqTrainTarget slice above it — the training term stops scaling
    // with the corpus while encode/ADC stay linear
    assert(Similarity.pqTrainSet(synth(nBase), nBase).count() === nBase)
    val s = Similarity.pqTrainSet(synth(nBig), nBig).count()
    assert(s >= Similarity.PqTrainTarget / 2 && s <= 3 * Similarity.PqTrainTarget,
      s"sampled training set has $s rows — stride not tracking PqTrainTarget")
    // the stride is exact integer math at any scale (no Int overflow)
    assert(Similarity.PqTrainTarget === 4096L)
    // LSH signature width tracks the corpus (r13: fixed 2-3-bit buckets
    // hold n/2^w members, and a binding cap keeps an arbitrary slice —
    // measured recall 0.000 at 100x before this policy): contract SFs
    // keep their dense widths, above the ceiling width holds expected
    // bucket occupancy at ~64
    assert(Similarity.autoLshBits(2000, 3) === 3)
    assert(Similarity.autoLshBits(4096, 2) === 2)
    assert(Similarity.autoLshBits(20000, 2) === 9) // ceil(log2(312.5))
    assert(Similarity.autoLshBits(200000, 3) === 12) // ceil(log2(3125))
    assert(Similarity.autoLshBits(1L << 40, 3) === 34)
  }

  test("PQ with the bounded training sample: recall holds at 10x, clustered data", Slow) {
    // r13 (r12 verdict task #1): above the dense ceiling q73's codebook
    // trains on the PqTrainTarget sample, not the corpus. The
    // sample-trained ADC must keep end recall on clustered data (the
    // real-embedding regime) — if ks=8 centroids per subspace needed
    // more than ~4k training rows, the bound itself would be wrong
    // (FAISS's train-on-a-sample practice says it isn't). Candidates
    // come from the density-scaled IVF stage — the FAISS IVFPQ shape,
    // and the candidate generator already proven recall-safe on
    // clustered data above (the capped LSH stage is recall-blind to
    // cluster structure at this density and would hide the comparison).
    import graft.functions.VectorOps._
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val corpus = synthClustered(nBig)
    val queries = corpus.filter(pmod(col("vec_id"), lit(31)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("cand_id").asc)
    val brute = queries
      .crossJoin(corpus.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("cand_id"))
    val nq = queries.count()
    val cands = Similarity.ivfCandidatePairs(corpus, nCells = nBig / 32,
      nProbe = 8, cellCap = 64)
    // oversample 64 (shortlist 320 of ~512 candidates/query): global
    // 48-bit PQ spends its resolution on the CLUSTER structure, so
    // ranking WITHIN a cluster needs a deep shortlist (measured: 0.29 at
    // 16, 0.55 at 32, 0.92 at 64 — FAISS's residual-encoding IVFPQ is
    // the finer-resolution upgrade, a different codebook contract). The
    // pin here is about the TRAINING SAMPLE, and the comparison is
    // at matched oversample.
    def recallOf(n: Long): Double = {
      val approx = Similarity.rerankTopKPQ(cands, corpus, k, n = n,
        oversample = 64)
        .filter(pmod(col("vec_id"), lit(31)) === 0)
        .select("vec_id", "cand_id")
      brute.intersect(approx).count().toDouble / (k * nq)
    }
    // n = nBig engages the sample; lying n ≤ AnnDenseMax forces the
    // full-corpus retrain this bound replaces — the honest comparison
    val sampled = recallOf(nBig)
    val full = recallOf(1000L)
    info(f"IVFPQ recall@$k at 10x: sample-trained $sampled%.3f vs full-trained $full%.3f ($nq queries)")
    assert(sampled >= 0.8,
      f"sample-trained IVFPQ recall $sampled%.3f at 10x — the training bound broke recall")
    assert(sampled >= full - 0.05,
      f"sample-trained recall $sampled%.3f fell more than 0.05 under full-trained $full%.3f")
  }

  test("q44's auto-capped candidate volume stays ~flat at 10x", Slow) {
    // q44's band scheme (2 bits x 24 bands) under the auto cap: per band
    // at most 4 buckets x cap² pairs — constant in n, so the 10x corpus
    // may not generate more than a small multiple of the base volume
    val cap10 = Similarity.autoBucketCap(nBig)
    val c1 = Similarity.annCandidatePairs(synth(nBase), nbits = 2,
      bands = 24, bucketCap = Similarity.autoBucketCap(nBase)).count()
    val c2 = Similarity.annCandidatePairs(synth(nBig), nbits = 2,
      bands = 24, bucketCap = cap10).count()
    assert(c1 > 0 && c2 > 0)
    val ratio = c2.toDouble / c1
    assert(ratio <= 10.0,
      s"auto-capped q44 candidates grew ${ratio}x from $c1 to $c2 at 10x")
  }

  /** Resident bytes of a cached frame, measured from the block manager
    * (storage-info delta around a MEMORY_ONLY persist + materialize).
    */
  private def residentBytes(df: DataFrame): Long = {
    val sc = spark.sparkContext
    val before = sc.getRDDStorageInfo.map(_.id).toSet
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      df.count()
      sc.getRDDStorageInfo.filterNot(i => before(i.id)).map(_.memSize).sum
    } finally df.unpersist(blocking = true)
  }

  test("int8 quantization shrinks the resident re-rank corpus toward 8x", Slow) {
    // the q53 memory claim (BENCH_NOTES), measured: the quantized copy is
    // what lives in executor memory at 100 TB. The ratio's ceiling is set
    // by the fixed 16-byte UnsafeArrayData header (count + null bitmap)
    // amortizing over the payload: at the corpus's 64 dims the ideal is
    // (16 + 64*8) / (16 + 64*1) ≈ 6.6x, approaching the full 8x as
    // dimensions grow — both regimes pinned.
    import graft.functions.VectorOps.quantizeI8
    def ratioAt(n: Int, dims: Int): Double = {
      val base = synth(n, dims)
      val dbl = residentBytes(base)
      val qnt = residentBytes(
        base.select(col("vec_id"), quantizeI8(col("v")).as("qv")))
      assert(dbl > 0 && qnt > 0, s"storage not measured: dbl=$dbl qnt=$qnt")
      dbl.toDouble / qnt
    }
    val corpus = ratioAt(nBig, 64) // 10x the sf0.1 embedding count
    assert(corpus >= 5.0,
      f"64-dim resident ratio $corpus%.1fx — quantization not paying (ideal ≈ 6.6x)")
    val wide = ratioAt(nBase, 1024) // production-embedding widths
    assert(wide >= 7.0,
      f"1024-dim resident ratio $wide%.1fx — below the ~8x claim's 7x floor")
  }

  test("PQ encoding shrinks the resident corpus by an order of magnitude", Slow) {
    // q73's memory claim, measured like q53's: the PQ frame (packed long
    // + norm, 16 payload bytes) is what the ADC stage keeps resident.
    // Fixed per-row overhead (UnsafeRow null bits + the id) dilutes the
    // 512B→16B payload ratio; the gates sit under the measured values the
    // way the int8 gates do. At production widths the payload dominates
    // and the ratio goes superlinear in dim — PQ's whole point.
    def ratioAt(n: Int, dims: Int, m: Int): Double = {
      val base = synth(n, dims)
      val dbl = residentBytes(base)
      val pq = residentBytes(Similarity.pqEncode(base, m = m, dim = dims))
      assert(dbl > 0 && pq > 0, s"storage not measured: dbl=$dbl pq=$pq")
      dbl.toDouble / pq
    }
    val corpus = ratioAt(nBig, 64, 16) // 10x the sf0.1 embedding count
    val wide = ratioAt(nBase, 1024, 16) // production-embedding widths
    info(f"resident PQ ratio: $corpus%.1fx at 64 dims, $wide%.1fx at 1024 dims")
    assert(corpus >= 10.0,
      f"64-dim resident PQ ratio $corpus%.1fx — below the order-of-magnitude claim")
    assert(wide >= 50.0,
      f"1024-dim resident PQ ratio $wide%.1fx — payload should dominate at width")
  }
}
