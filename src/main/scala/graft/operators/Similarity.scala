package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps._

/** Similarity search over the `embeddings` table (Array[Float] x 64).
  *
  * All vector math is composed from codegen'd higher-order functions
  * (zip_with/aggregate) — no UDF, no serialization of vectors through the
  * driver. The brute-force paths broadcast the (small) query side so the
  * big side streams through map tasks with zero shuffle before the final
  * top-k.
  */
object Similarity {

  /** Q19: exact cosine top-k of every vector against vec_id=0.
    * Query vector is broadcast (1 row); candidates stream map-side;
    * orderBy+limit plans as TakeOrderedAndProject.
    */
  def q19CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .withColumn("sim_raw", cosine(col("v"), col("qv")))
      .orderBy(col("sim_raw").desc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("sim_raw"), 6).as("sim"))
  }

  /** Q25: top-20 most-similar pairs among vec_id<200 — the exact-pairwise
    * building block behind embedding near-dup detection. Bounded candidate
    * set keeps the O(n²) pair join constant-size at any scale factor; the
    * scale path for the full table is LSH bucketing (see AnnLsh).
    */
  def q25TopPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim_raw", cosine(col("va"), col("vb")))
      .orderBy(col("sim_raw").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(20)
      .select(col("vec_a"), col("vec_b"), round(col("sim_raw"), 6).as("sim"))
  }

  /** (band, bucket, vec_id) assignment across `bands` independent LSH
    * tables — the narrow fan-out table the candidate join runs on.
    * Random-hyperplane sign-bits: hyperplane weights are ±1 from a murmur3
    * hash of (plane, dim), so the scheme needs no driver-side randomness
    * and both sides of any join bucket identically. Vectors themselves are
    * NOT carried through the fan-out; they're re-joined by id after pair
    * dedup, so the shuffled band rows stay a few bytes wide.
    *
    * `bucketCap` bounds any one (band, bucket) group: a hot bucket (skewed
    * hash region — the 100 TB failure mode, where one bucket goes quadratic)
    * deterministically keeps only the `bucketCap` lowest-hashed members.
    *
    * NULL-vector contract (ADVICE r6, intentional divergence from the
    * pre-kernel concat_ws formulation): a NULL vector's signature is NULL,
    * so its bucket is NULL and it drops out of the candidate equi-join —
    * NULL vectors are never near-dup candidates. The old concat_ws bucket
    * was "" (equi-joinable), which paired every NULL vector with every
    * other — garbage candidates that only looked harmless because the
    * corpus has no NULL embeddings.
    */
  def bandAssignments(vectors: DataFrame, vecCol: String, nbits: Int,
                      bands: Int, bucketCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // all bands in ONE pass over the vectors via the codegen'd
    // graft_lsh_bits kernel (functions/LshKernel.scala) — the interpreted
    // transform/aggregate/zip_with formulation it replaced (kept as
    // VectorOps.lshBitsHof, parity-pinned in LshKernelSpec) walked generic
    // ArrayData per (row × plane × dim) and profiled at 2.2 s PER SIDE of
    // the q44 band self-join at sf0.1 — the single largest cost in the
    // bench sweep. Same Murmur3 chain, so buckets (and every pinned
    // recall) are bit-for-bit unchanged.
    val withBits = vectors.select(col("vec_id"),
      graft.functions.VectorOps.lshBits(col(vecCol), bands * nbits).as("_bits"))
    val bucketCols = (0 until bands).map(b =>
      substring(col("_bits"), b * nbits + 1, nbits))
    val banded = withBits.select(col("vec_id"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
    val w = Window.partitionBy("band", "bucket")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    // PIN the (band, bucket) exchange's partition count (r19, guide §2.6):
    // AQE's coalescer sizes partitions from the exchange's OWN bytes —
    // ~40 B/row of (vec_id, band, bucket), well under minPartitionSize —
    // and folds the whole stage to ONE task; but every consumer of this
    // frame ENUMERATES in-bucket pairs directly above it (a ~40×
    // fan-out), so the window + self-join + explosion all ran serially
    // (profiled on q26/q53/q73: a single-task 714 KiB→26.5 MB job of
    // ~1 s each). An explicit count is exactly the non-AQE planner's
    // shuffle.partitions and AQE must honor it; the window's required
    // clustering is satisfied, so the plan still carries ONE exchange
    // here. Row_number's (md5, vec_id) order is a total order within
    // every bucket, so the kept members — and every result downstream —
    // are identical under any partitioning.
    val sp = vectors.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    banded.repartition(sp, col("band"), col("bucket"))
      .withColumn("rnb", row_number().over(w))
      .filter(col("rnb") <= bucketCap)
      .drop("rnb")
  }

  /** ANN top-k per query over multi-band LSH (approximate — verified by a
    * ScalaTest recall gate against the brute-force top-k, not a SQL
    * oracle; see AnnRecallSpec). Defaults tuned for the corpus's
    * near-orthogonal embeddings: 8 bands × 3 bits ⇒ measured recall ≥ 0.8.
    *
    * Candidate-set caveat: the corpus vectors are near-random (mean
    * pairwise cosine ≈ 0), so recall 0.8 forces ~2/3 pair coverage — LSH
    * cannot beat brute force on data with no similarity structure. On
    * clustered real-world embeddings the same parameters prune sharply;
    * tune nbits/bands to the corpus's neighbor-similarity distribution.
    *
    * Pipeline: narrow band fan-out → per-bucket self-join → pair dedup
    * across bands → re-join vectors by id → exact cosine re-rank → per-query
    * top-k window. Every shuffle key (band+bucket, vec_id) is
    * uniformly-distributed-by-construction except bucket skew, which
    * `bucketCap` bounds.
    */
  def annCosine(spark: SparkSession, dir: String, nbits: Int = 3, bands: Int = 8,
                k: Int = 5, bucketCap: Int = 4096): DataFrame =
    annCosineOn(
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), toDoubleArray(col("embedding")).as("v")),
      nbits, bands, k, bucketCap)

  /** The deduped LSH candidate-pair set over any (vec_id, v) frame — split
    * out so the scale spec can measure candidate growth on a synthesized
    * corpus through the exact operator path q26 runs.
    */
  def annCandidatePairs(vectors: DataFrame, nbits: Int, bands: Int,
                        bucketCap: Int): DataFrame = {
    val assign = bandAssignments(vectors, "v", nbits, bands, bucketCap)
    val cand = assign.select(col("band"), col("bucket"), col("vec_id").as("cand_id"))
    // dedup AFTER repartitioning by vec_id: HashPartitioning(vec_id)
    // satisfies the (vec_id, cand_id) dedup's clustering requirement, so
    // this one exchange serves the dedup, spreads the heavy dot-product
    // stage uniformly over queries, AND pre-satisfies the final top-k
    // window — vs a two-key distinct + a second exchange for the window.
    assign.join(cand, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("cand_id"))
      .select("vec_id", "cand_id")
      .repartition(col("vec_id"))
      .dropDuplicates(Seq("vec_id", "cand_id"))
  }

  /** Exact cosine re-rank of a candidate-pair set, shared by the LSH and
    * IVF pipelines: join the vectors back by id on both pair ends, score,
    * and keep each query's top-k via a group-limited window. Norms are
    * precomputed once per vector — cosine per pair is then a single dot
    * product, not dot + two norms (3× less array work on the candidate
    * set, which is the dominant cost).
    */
  private def rerankTopK(pairIds: DataFrame, vectors: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val en = vectors.withColumn("nrm", norm(col("v")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    pairIds
      .join(en, "vec_id")
      .join(en.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cnrm")), "cand_id")
      .withColumn("sim", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("cand_id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** q26's pipeline over an arbitrary (vec_id, v: Array[Double]) frame. */
  def annCosineOn(vectors: DataFrame, nbits: Int, bands: Int,
                  k: Int, bucketCap: Int): DataFrame =
    rerankTopK(annCandidatePairs(vectors, nbits, bands, bucketCap), vectors, k)

  /** Quantize-then-rerank: stage 1 scores EVERY candidate pair with the
    * int8 kernel (`graft_dot_i8`) over symmetric per-vector-quantized
    * copies — 8× smaller than the doubles, which is the memory-bandwidth
    * currency of the re-rank stage at 100 TB (the quantized corpus is what
    * lives in executor memory; scale cancellation means no dequantization)
    * — keeping an oversampled top-(k·oversample) per query; stage 2 pays
    * the exact double cosine only for that short-list. Quantized-vs-exact
    * recall is pinned in AnnRecallSpec (the q26/q36 gate pattern).
    */
  def rerankTopKQuantized(pairIds: DataFrame, vectors: DataFrame, k: Int,
                          oversample: Int = 4, n: Long = -1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = vectors.select(col("vec_id"), quantizeI8(col("v")).as("qv"))
      .withColumn("qnrm", sqrt(dotI8(col("qv"), col("qv")).cast("double")))
    val wq = Window.partitionBy("vec_id")
      .orderBy(col("qsim").desc, col("cand_id").asc)
    // dense regime: the int8 frame is ~72 B/vector — broadcast both meet
    // sides so the candidate stream never re-shuffles before the window
    // sort (the rerankTopKPQ discipline); at scale the frame is
    // corpus-sized and the exchanges are the honest cost
    val dense = n >= 0 && n <= AnnDenseMax
    val qc = q.select(col("vec_id").as("cand_id"), col("qv").as("cqv"),
      col("qnrm").as("cqnrm"))
    val shortlist = pairIds
      .join(if (dense) broadcast(q) else q, "vec_id")
      .join(if (dense) broadcast(qc) else qc, "cand_id")
      .withColumn("qsim",
        dotI8(col("qv"), col("cqv")).cast("double") / (col("qnrm") * col("cqnrm")))
      .withColumn("rq", row_number().over(wq))
      .filter(col("rq") <= k * oversample)
      .select("vec_id", "cand_id")
    rerankTopK(shortlist, vectors, k)
  }

  /** The quantized twin of [[annCosineOn]] — same LSH candidate stage,
    * int8 short-list, exact top-k re-rank of the short-list only.
    */
  def annCosineQuantizedOn(vectors: DataFrame, nbits: Int = 3, bands: Int = 8,
                           k: Int = 5, bucketCap: Int = 4096,
                           oversample: Int = 4, n: Long = -1L): DataFrame =
    rerankTopKQuantized(annCandidatePairs(vectors, nbits, bands, bucketCap),
      vectors, k, oversample, n)

  // ──────────────────── auto-scale parameter policy ────────────────────

  /** Corpus-size ceiling for the DENSE recall-tuned ANN parameters.
    *
    * The r11 sf0.1→10× decade named the failure mode this policy closes:
    * at bench parameters (bucketCap/cellCap non-binding — recall-tuned
    * for the 2k near-random corpus vectors) candidate generation is ~n²
    * BY DESIGN, and nothing stopped a deployment from silently carrying
    * that config into a 10× corpus (q36 measured 28.9×, q44 21.8×, q73
    * 16.7× across the decade). The linear-scale configurations existed
    * but only AnnScaleSpec ran them. Now every ANN entry point counts
    * its corpus and switches itself:
    *
    *  - at or below `AnnDenseMax` (covers sf0.001–sf0.1, where the
    *    contract gates are measured) the dense parameters run unchanged
    *    — recall gates and oracle rows are untouched;
    *  - above it, the AnnScaleSpec-pinned linear configuration engages:
    *    a BINDING bucket cap for the LSH family (measured: candidates
    *    ≤ 10× at 10×), density-scaled cells with fixed probes and a
    *    binding cellCap for IVF (measured: ~linear candidates, recall
    *    0.935→0.917 on clustered vectors — the real-embedding regime;
    *    on near-random vectors the same trade costs recall, the no-free-
    *    lunch the scaladocs state).
    *
    * The count is one metadata-cheap job per invocation — nothing next
    * to the candidate stage it bounds.
    */
  val AnnDenseMax: Long = 4096L

  /** LSH bucket cap by corpus size: non-binding 4096 in the dense regime,
    * binding 256 above it (≈ per-bucket occupancy at the 2k base corpus
    * under 3 bits — AnnScaleSpec's measured binding cap).
    */
  def autoBucketCap(n: Long): Int = if (n <= AnnDenseMax) 4096 else 256

  /** LSH signature WIDTH by corpus size — the r13 100× probe measured
    * the failure fixed widths hit: a 2–3-bit band bucket holds n/2^w
    * members (50k at 200k vectors), so a binding cap keeps an arbitrary
    * ~0.5% slice of each bucket and even true near-DUPLICATE pairs stop
    * colliding in any kept slice — capped-LSH recall collapsed to 0.000
    * not from hashing but from bucket GRANULARITY. Bucket count must
    * track n: width ⌈log2(n/64)⌉ holds expected occupancy at ~64 at any
    * corpus size, so the cap binds only on genuinely hot buckets.
    * Near-dup pairs sit at tiny angles — per-band collision (1−θ/π)^w
    * stays high at any practical width and the multi-band OR keeps
    * near-dup recall (the q44/q40 contract class). Mid-similarity TOP-K
    * retrieval on near-random structure is NOT rescued by any width —
    * that regime belongs to the IVF family (measured at 100×: IVF
    * 0.832; the capped-LSH top-k rows are recorded as the no-free-lunch
    * they are, BENCH_NOTES r13).
    */
  def autoLshBits(n: Long, denseBits: Int): Int =
    if (n <= AnnDenseMax) denseBits
    else math.max(denseBits,
      math.ceil(math.log(n / 64.0) / math.log(2.0)).toInt)

  /** IVF (nCells, nProbe, cellCap) by corpus size: the dense recall-tuned
    * triple in the dense regime; density-scaled cells (~32 expected
    * members each), fixed 8 probes, binding cellCap 64 above it —
    * exactly the configuration AnnScaleSpec pins linear-with-recall on
    * clustered vectors.
    */
  def autoIvfParams(n: Long): (Int, Int, Int) =
    if (n <= AnnDenseMax) (32, 20, 4096)
    // clamp BEFORE toInt: n/32 overflows Int above ~68.7B vectors and a
    // wrapped-negative count would silently fall back to 32 dense cells
    // — the exact regime this policy exists to prevent
    else (math.max(32L, math.min(n / 32, Int.MaxValue.toLong)).toInt, 8, 64)

  /** Bounded PQ TRAINING-set target (FAISS practice: ks centroids per
    * subspace saturate on a few thousand training rows; k-means over
    * more buys nothing but wall time — the per-invocation full-corpus
    * retrain was the last >2× decade term in q73's bench). In the dense
    * regime the corpus trains whole (the AnnRecallSpec gates are
    * measured there — untouched); above [[AnnDenseMax]] the trainer
    * reads a hash-stratified ~`PqTrainTarget`-row slice, so the training
    * term is O(target) at any corpus size while encode/ADC stay linear.
    */
  val PqTrainTarget: Long = 4096L

  /** The training slice: every ⌊n/target⌋-th vec_id residue class under
    * murmur3 — deterministic, order-free, stratified across the id space
    * (the same election discipline as the centroid seeds), no RNG, no
    * driver round-trip.
    */
  private[graft] def pqTrainSet(vectors: DataFrame, n: Long): DataFrame =
    if (n <= AnnDenseMax) vectors
    else vectors.where(
      pmod(hash(col("vec_id")), lit(math.max(1L, n / PqTrainTarget))) === 0)

  private def loadVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))

  /** Materialize-once vectors + exact count for the TRAINING-LOOP entry
    * points (r18 verdict task #3). These operators consume the vector
    * frame from MANY driver actions — the corpus count, centroid seeding,
    * each Lloyd round's collect, the PQ training-slice collect, and the
    * final query's own branches — and exchange reuse never crosses an
    * action, so every action re-ran the scan (+ decode) from parquet.
    * That re-execution is also exactly why the r18 scan spread REGRESSED
    * here (q73 +0.43 s, q26 +0.26 s measured) and was left off: each
    * action re-ran the spread exchange too. Materializing once removes
    * the re-execution AND lets the parallelism floor finally apply (the
    * spread rides BELOW the checkpoint, so consumers read
    * already-spread blocks). The count comes from the checkpointed
    * blocks — a metadata-cheap job instead of a second scan.
    */
  private def loadVectorsOnce(spark: SparkSession, dir: String, tag: String,
                              spread: Boolean = true): (DataFrame, Long) = {
    val v = Materialize.once(tag, loadVectors(spark, dir),
      if (spread) Some(col("vec_id")) else None)
    (v, v.count())
  }

  /** queries()-shaped wrapper for the quantized ANN path (rows-only check;
    * recall spec-gated in AnnRecallSpec like q26/q36). Auto-scale: the
    * bucket cap binds above [[AnnDenseMax]].
    */
  def q53AnnQuantized(spark: SparkSession, dir: String): DataFrame = {
    // count + ONE final action only — the count is footer-metadata-cheap,
    // so there is no re-execution worth a checkpoint here (measured r19:
    // materialize+spread regressed 2.17 → 2.79; ck-only 2.17 → 2.38)
    val v = loadVectors(spark, dir)
    val n = v.count()
    annCosineQuantizedOn(v, nbits = autoLshBits(n, 3),
      bucketCap = autoBucketCap(n), n = n)
  }

  /** queries()-shaped wrapper for the ANN path (rows-only check — results
    * are approximate by construction). Auto-scale: the bucket cap binds
    * above [[AnnDenseMax]].
    */
  def q26AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    // count + ONE final action only — see q53AnnQuantized (measured r19:
    // materialize+spread regressed 2.04 → 2.80)
    val v = loadVectors(spark, dir)
    val n = v.count()
    annCosineOn(v, nbits = autoLshBits(n, 3), bands = 8, k = 5,
      bucketCap = autoBucketCap(n))
  }

  /** IVF-style ANN: vectors are assigned to Voronoi cells around seed
    * centroids; each query probes its `nProbe` nearest cells and re-ranks
    * exactly within them. The complementary scale path to LSH: cells adapt
    * to data density (strong on clustered embeddings), the centroid table
    * broadcasts, and every vector lives in exactly ONE cell so the
    * candidate set needs no dedup shuffle.
    *
    * Centroids: a deterministic hash-stratified sample (`seedCentroids`)
    * refined by `kmeansRounds` Lloyd iterations (`kmeansRound`). Both
    * stages are aggregation trees — no global sort, no single-partition
    * top-N anywhere in seeding, so the 100 TB plan shape is safe.
    */
  def ivfCosine(spark: SparkSession, dir: String, nCells: Int = 32,
                nProbe: Int = 20, k: Int = 5, cellCap: Int = 4096,
                kmeansRounds: Int = 1): DataFrame =
    ivfCosineOn(
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), toDoubleArray(col("embedding")).as("v")),
      nCells, nProbe, k, cellCap, kmeansRounds)

  /** The IVF probe-join candidate set over any (vec_id, v) frame — split
    * out so the scale spec can measure cellCap's linear bound on a
    * synthesized corpus through the exact operator path q36 runs.
    */
  /** The seed-then-Lloyd centroid fold, shared by the IVF candidate path
    * and SemDeDup's cell assignment.
    */
  private[operators] def trainedCentroids(vectors: DataFrame, nCells: Int,
                                          kmeansRounds: Int): DataFrame =
    (1 to kmeansRounds)
      .foldLeft(seedCentroids(vectors, nCells))((c, _) => kmeansRound(vectors, c))

  /** Collect a trained centroid frame into the kernel-side table the
    * `graft_top_cells` meet scans (see [[graft.functions.CellKernel]]'s
    * scaladoc for why the meet is a kernel and not a crossJoin+window:
    * the r12 100× run measured the n·nCells row materialization at 490 s
    * for q36). The collect is dim-sized BY THE SAME PREMISE that let the
    * replaced plan `broadcast(centroids)` — a centroid table too big to
    * collect was already too big to broadcast.
    */
  private def centroidTable(centroids: DataFrame): graft.functions.CentroidTable = {
    val rows = centroids.select(col("cell_id"), col("cv")).collect()
    new graft.functions.CentroidTable(
      rows.map(_.getLong(0)),
      rows.map(_.getSeq[Double](1).toArray))
  }

  /** The per-vector top-`nProbe` centroid meet as (vec_id, rn, cell_id,
    * csim) rows — `rn` 1-based in (csim desc, cell_id asc) order, the
    * exact sort key of the window this replaces.
    */
  private def probedCells(vectors: DataFrame,
                          table: graft.functions.CentroidTable,
                          nProbe: Int): DataFrame =
    vectors
      .select(col("vec_id"),
        posexplode(graft.functions.CellOps.topCells(col("v"), table, nProbe))
          .as(Seq("_r0", "pc")))
      .select(col("vec_id"), (col("_r0") + 1).cast("int").as("rn"),
        col("pc.cell_id").as("cell_id"), col("pc.csim").as("csim"))

  /** Each vector's HOME cell (its nearest trained centroid) plus the
    * centroid similarity, cellCap-bounded exactly as the IVF path bounds
    * it — the clustering primitive SemDeDup (Dedup.semDedupOn) prunes
    * within. One broadcast of the centroid table, one window per vector.
    */
  private[graft] def homeCells(vectors: DataFrame, nCells: Int,
                               cellCap: Int, kmeansRounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val table = centroidTable(trainedCentroids(vectors, nCells, kmeansRounds))
    val wCap = Window.partitionBy("cell_id")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    probedCells(vectors, table, nProbe = 1)
      .withColumn("rc", row_number().over(wCap))
      .filter(col("rc") <= cellCap)
      .select("vec_id", "cell_id", "csim")
  }

  def ivfCandidatePairs(vectors: DataFrame, nCells: Int, nProbe: Int,
                        cellCap: Int, kmeansRounds: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the top-nProbe centroid meet runs INSIDE graft_top_cells — rn=1 is
    // the vector's home cell, rn<=nProbe the cells its queries probe; the
    // kernel emits only those rows (n·nProbe), never the n·nCells
    // crossJoin the r12 100× run measured at 490 s for q36.
    // NOTE on defaults: probing 20 of 32 cells is tuned for the corpus's
    // near-random vectors, where recall 0.8 forces dense coverage (same
    // caveat as the LSH path); real clustered embeddings want
    // nProbe << nCells for the candidate set to stay sub-quadratic.
    val table = centroidTable(trainedCentroids(vectors, nCells, kmeansRounds))
    val ranked = probedCells(vectors, table, nProbe)
    // cellCap bounds a hot Voronoi cell (dense region on clustered data)
    // exactly like the LSH bucketCap — deterministic keep of the
    // lowest-hashed members
    val wCap = Window.partitionBy("cell_id")
      .orderBy(md5(col("cand_id").cast("string")), col("cand_id"))
    val home = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("cand_id"), col("cell_id"))
      .withColumn("rc", row_number().over(wCap))
      .filter(col("rc") <= cellCap)
      .drop("rc")
    val probes = ranked.filter(col("rn") <= nProbe)
      .select(col("vec_id"), col("cell_id"))
    probes.join(home, "cell_id")
      .filter(col("vec_id") =!= col("cand_id"))
      .select("vec_id", "cand_id") // one home cell per cand ⇒ no dup pairs
      // the cell_id join leaves pairs clustered on nCells keys — far fewer
      // than cores; spread the heavy dot-product stage by query id (which
      // the final top-k window needs anyway)
      .repartition(col("vec_id"))
  }

  /** q36's pipeline over an arbitrary (vec_id, v: Array[Double]) frame —
    * scored CELL-LOCALLY, the way an inverted index is actually visited
    * (FAISS probes lists in place; it never materializes query×candidate
    * vector pairs). The generic `rerankTopK(ivfCandidatePairs(...))`
    * spelling is pair-volume×vector-width through the join exchanges:
    * at the 100× corpus (200k vectors, density-scaled cells) that is
    * ~100M pairs × 512-byte vectors ≈ 50 GB of shuffle, measured at
    * ~450 s. Here the capped members co-locate by cell ONCE (corpus-
    * sized, vector-width), queries meet them at the cell key
    * (query-volume × nProbe, vector-width), the member explode and the
    * cosines stay inside the stage, and only (query, cand, sim) triples
    * — pair-volume but 24 bytes — move to the per-query top-k. Same
    * pairs (the identical md5 cellCap keep), same sims (the identical
    * dot/(norm·norm) spelling), same tie order as rerankTopK — pinned
    * by the unchanged AnnRecallSpec/AnnScaleSpec gates.
    */
  def ivfCosineOn(vectors: DataFrame, nCells: Int, nProbe: Int, k: Int,
                  cellCap: Int, kmeansRounds: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val table = centroidTable(trainedCentroids(vectors, nCells, kmeansRounds))
    val probed = probedCells(vectors, table, nProbe)
      .select(col("vec_id"), col("cell_id"))
    val wCap = Window.partitionBy("cell_id")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    val homeCapped = probedCells(vectors, table, nProbe = 1)
      .withColumn("rc", row_number().over(wCap))
      .filter(col("rc") <= cellCap)
      .select(col("vec_id").as("cand_id"), col("cell_id"))
    val en = vectors.withColumn("nrm", norm(col("v")))
    val cells = homeCapped
      .join(en.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cnrm")), "cand_id")
      .groupBy("cell_id")
      .agg(collect_list(struct(col("cand_id"), col("cv"), col("cnrm")))
        .as("members"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cand_id").asc)
    probed
      .join(en, "vec_id")
      .join(cells, "cell_id")
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(col("members")).as("m"))
      .select(col("vec_id"), col("m.cand_id").as("cand_id"),
        (dot(col("v"), col("m.cv")) / (col("nrm") * col("m.cnrm"))).as("sim"))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("cand_id"), round(col("sim"), 6).as("sim"),
        col("rn"))
  }

  /** Deterministic hash-stratified centroid seed: the id space is split
    * into `nCells` hash strata and each stratum elects its lowest-md5
    * member. One partial+final aggregation over `nCells` keys — every
    * partition contributes local candidates, nothing funnels through a
    * single-partition top-N (the failure mode of a global
    * `orderBy(hash).limit(n)` sample at 100 TB). Deterministic regardless
    * of physical partitioning, so both sides of any downstream join seed
    * identically. (A stratum of a tiny table can be empty → fewer cells;
    * with n ≫ nCells the strata are ~n/nCells each.)
    */
  private def seedCentroids(vectors: DataFrame, nCells: Int): DataFrame =
    vectors
      .groupBy(pmod(hash(col("vec_id")), lit(nCells)).as("g"))
      .agg(min_by(struct(col("vec_id"), col("v")),
        struct(md5(col("vec_id").cast("string")), col("vec_id"))).as("c"))
      .select(col("c.vec_id").as("cell_id"), col("c.v").as("cv"))

  /** One Lloyd iteration: assign every vector to its nearest centroid
    * (broadcast join — the vectors never shuffle), then average each
    * cell's members element-wise. The mean is computed by exploding to
    * (cell, dim, x) and aggregating — a 64× narrow fan-out feeding a
    * partial-agg tree over nCells×dim keys, which scales where a
    * collect-and-average on the driver would not. A cell that captures no
    * vectors disappears (standard Lloyd degeneracy; with stratified seeds
    * every seed starts with its own member, so it is rare).
    */
  private def kmeansRound(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val table = centroidTable(centroids)
    val assigned = vectors
      .select(col("v"),
        explode(graft.functions.CellOps.topCells(col("v"), table, 1)).as("pc"))
      .select(col("pc.cell_id").as("cell_id"), col("v"))
    assigned
      .select(col("cell_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell_id", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cell_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        _.getField("m")).as("cv"))
  }

  /** queries()-shaped wrapper for the IVF path (rows-only check; recall
    * gated in AnnRecallSpec like the LSH path). Auto-scale: density-
    * scaled cells + binding cellCap above [[AnnDenseMax]].
    */
  def q36AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val (v, n) = loadVectorsOnce(spark, dir, "q36.vectors", spread = false)
    val (nCells, nProbe, cellCap) = autoIvfParams(n)
    ivfCosineOn(v, nCells, nProbe, k = 5, cellCap)
  }

  // ───────────────────────── product quantization ─────────────────────────

  // PQ codebooks (Jégou et al. 2011): the d-dim space splits into `m`
  // subspaces; per subspace, `ks` centroids seed by hash-stratified
  // election and refine through Lloyd rounds under L2. Training runs ON
  // THE DRIVER over the bounded slice — see [[pqTrain]]; the r14
  // aggregation-tree trainer (and its eager-checkpoint registry) was
  // ~7 sequential cluster exchanges spent on an at-most-4096-row
  // problem, the dominant term of q73's bench time.

  private def withCn2(codebook: DataFrame): DataFrame =
    codebook.withColumn("cn2", dot(col("cv"), col("cv")))

  /** Nearest-codeword assignment per (vector, subspace): broadcast the
    * m·ks codebook, keep the argmin by the L2-monotone partial distance.
    * A `min_by` aggregate, not a window — the ks-way fan-out collapses in
    * the map-side partial before the one uniform (vec_id, sub) shuffle.
    * Ties break toward the lowest code via the struct ordering. The
    * subvector RIDES THE AGGREGATE (any group member carries it), so the
    * Lloyd mean needs no (vec_id, sub) re-join back to the fan-out — one
    * shuffle of vector-volume rows instead of a shuffle join of two.
    */
  private def pqAssign(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), "sub")
      .withColumn("d2", col("cn2") - lit(2.0) * dot(col("sv"), col("cv")))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("code"), col("sv")),
        struct(col("d2"), col("code"))).as("a"))
      .select(col("vec_id"), col("sub"),
        col("a.code").as("code"), col("a.sv").as("sv"))

  /** The (vec_id, sub, sv) subvector fan-out — m narrow slices per row. */
  private def pqSubvectors(vectors: DataFrame, m: Int, dsub: Int): DataFrame =
    vectors.select(col("vec_id"),
      posexplode(array((0 until m).map(s =>
        slice(col("v"), s * dsub + 1, dsub)): _*)).as(Seq("sub", "sv")))

  /** PQ-ADC re-rank: stage 1 scores every candidate pair against the
    * CODES ONLY — each candidate is represented by `pq_packed` (m 4-bit
    * codewords packed little-endian into one long) plus its stored true
    * norm, 16 bytes against the doubles' 8·d. That 32× ratio is the
    * memory-bandwidth currency of the re-rank stage at 100 TB: the packed
    * corpus is what lives in executor memory (q53's int8 argument taken
    * to its asymmetric-distance conclusion). Each query precomputes one
    * flat LUT — `⟨q_sub, cv⟩` for all m·ks codewords, keyed by
    * `sub·ks + code` — so ADC ≈ ⟨q, x̂⟩ is m map lookups per pair, no
    * array math at all; dividing by (‖q‖·stored ‖x‖) makes it an
    * approximate COSINE (reconstruction error lives only in the numerator).
    * Stage 2 pays the exact double cosine for the oversampled short-list
    * alone (`rerankTopK`). Approximate — recall pinned in AnnRecallSpec.
    *
    * Cost shape: the contract query RETRAINS the codebook per invocation
    * (self-contained, like q36's Lloyd round) — ~10 sequential tiny-stage
    * latencies that dominate its bench time at small SF. Above the dense
    * ceiling the retrain reads only the [[pqTrainSet]] sample, so the
    * training term is corpus-size-independent. A deployment still does
    * better: train once, store `pqEncode`'s packed frame, and amortize
    * the training across every query batch; the per-batch cost is then
    * just the LUT build (m·ks dots per query) and the ADC scan.
    */
  /** Trained (subvector fan-out, checkpointed codebook) over a vector
    * frame; every public PQ entry point goes through here so the
    * checkpoint-release registry sees exactly one handle per invocation.
    */
  private def pqTrain(vectors: DataFrame, m: Int, ks: Int, rounds: Int,
                      dim: Int, n: Long = -1L): (DataFrame, DataFrame) = {
    // base-ks positional packing must stay inside a signed long
    require(m * (math.log(ks) / math.log(2)) <= 62, s"m=$m ks=$ks overflows the packed long")
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val size = if (n >= 0) n else vectors.count()
    val subs = pqSubvectors(vectors, m, dim / m)
    // The training slice is BOUNDED BY CONSTRUCTION (pqTrainSet caps it
    // at ~PqTrainTarget rows; the dense regime is smaller still), so its
    // Lloyd refinement is a driver-local computation like any
    // broadcast-table build — the CLUSTER's job is encoding the corpus,
    // never training the m·ks-row codebook. The previous distributed
    // trainer spent ~7 sequential exchanges + an eager checkpoint on an
    // at-most-4096-row problem; at 100 TB the collected slice is the
    // same fixed few MB (corpus-size-independent), while the per-round
    // shuffles it replaced would still be cluster jobs. Seeding, the
    // (d2, code) tie-break, and empty-cluster drops replicate the old
    // aggregation-tree arithmetic step for step (PqDriverParitySpec
    // would-be: the AnnRecallSpec gates pin the result).
    // sortBy(vec_id): driverLloyd's mean accumulation folds in array
    // order, and float addition is order-sensitive in the last ulp — the
    // single-split scan collected ascending by construction, but the r19
    // materialized/spread frame collects in partition order. Sorting
    // restores the exact pre-spread fold order, so the codebook (and
    // every ADC ranking derived from it) is bit-identical either way.
    val train = pqTrainSet(vectors, size)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val rows = driverLloyd(train, m, ks, rounds, dim / m)
    val spark = vectors.sparkSession
    import spark.implicits._
    val codebook = rows.toSeq.toDF("sub", "code", "cv")
    (subs, withCn2(codebook))
  }

  /** Driver-side PQ Lloyd over the collected training slice — the same
    * arithmetic the distributed trainer ran: hash-stratified seeding
    * (murmur3(vec_id) mod ks groups, md5-then-id election), `rounds`
    * refinements assigning by the L2-monotone `cn2 − 2·⟨sv,cv⟩` with
    * ties toward the lowest code, per-position means, and empty codes
    * dropping out of later rounds exactly as an aggregation tree drops
    * groups with no members.
    */
  private def driverLloyd(train: Array[(Long, Array[Double])], m: Int,
                          ks: Int, rounds: Int,
                          dsub: Int): Array[(Int, Int, Seq[Double])] = {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Seq[Double])]()
    var sub = 0
    while (sub < m) {
      val svs = train.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      }
      // seed: per hash-stratum, the member with the lowest (md5, id)
      var cb: Map[Int, Array[Double]] = svs
        .groupBy { case (id, _) =>
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(id, 42)
          ((h % ks) + ks) % ks
        }
        .map { case (code, members) =>
          code -> members.minBy { case (id, _) => (md5Hex(id.toString), id) }._2
        }
      var round = 0
      while (round < rounds) {
        val codes = cb.keys.toArray.sorted
        val cn2 = codes.map(c => {
          val cv = cb(c); var s = 0.0; var i = 0
          while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
          c -> s
        }).toMap
        val assigned = svs.map { case (_, sv) =>
          var bestCode = -1
          var bestD2 = Double.MaxValue
          var ci = 0
          while (ci < codes.length) {
            val c = codes(ci)
            val cv = cb(c)
            var d = 0.0; var i = 0
            while (i < dsub) { d += sv(i) * cv(i); i += 1 }
            val d2 = cn2(c) - 2.0 * d
            if (d2 < bestD2 || (d2 == bestD2 && c < bestCode)) {
              bestD2 = d2; bestCode = c
            }
            ci += 1
          }
          (bestCode, sv)
        }
        cb = assigned.groupBy(_._1).map { case (code, members) =>
          val mean = new Array[Double](dsub)
          members.foreach { case (_, sv) =>
            var i = 0; while (i < dsub) { mean(i) += sv(i); i += 1 }
          }
          var i = 0
          while (i < dsub) { mean(i) /= members.length; i += 1 }
          code -> mean
        }
        round += 1
      }
      cb.toSeq.sortBy(_._1).foreach { case (code, cv) =>
        out += ((sub, code, cv.toSeq))
      }
      sub += 1
    }
    out.toArray
  }

  /** The STORED PQ representation of a (vec_id, v) frame: one base-ks
    * packed long of m codewords plus the true norm — 16 payload bytes per
    * vector regardless of dimensionality, vs 8·dim for the doubles. This
    * is the frame that lives in executor memory at 100 TB (AnnScaleSpec
    * measures the resident ratio); `rerankTopKPQ` scores candidates
    * against it alone.
    */
  def pqEncode(vectors: DataFrame, m: Int = 16, ks: Int = 8,
               rounds: Int = 2, dim: Int = 64, n: Long = -1L): DataFrame = {
    val (subs, codebook) = pqTrain(vectors, m, ks, rounds, dim, n)
    pqEncodeWith(subs, codebook, vectors, ks,
      pin = n >= 0 && n <= AnnDenseMax)
  }

  private def pqEncodeWith(subs: DataFrame, codebook: DataFrame,
                           vectors: DataFrame, ks: Int,
                           pin: Boolean): DataFrame = {
    // DENSE-regime pin of the packing fold's exchange (the
    // bandAssignments rationale): its input is ~25 B/row so AQE folds it
    // to 1–3 tasks, serializing the norm join and everything above. The
    // pin is a USER repartition, which forfeits the map-side partial sum
    // (m pre-agg rows per vector cross the wire instead of 1) — free at
    // dense scale, a 16× shuffle-byte regression at corpus scale, so the
    // caller gates it on the same n <= AnnDenseMax switch as the
    // broadcast regime. The packed sum is integer arithmetic: identical
    // under any partitioning.
    val agged = if (pin) {
      val sp = subs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      pqAssign(subs, codebook).repartition(sp, col("vec_id"))
    } else pqAssign(subs, codebook)
    agged
      .groupBy("vec_id")
      .agg(sum(col("code").cast("long") *
        pow(lit(ks.toDouble), col("sub")).cast("long")).as("pq_packed"))
      .join(vectors.select(col("vec_id"), norm(col("v")).as("nrm")), "vec_id")
  }

  /** Candidate width, MEASURED (r15): the 16× oversample is
    * recall-load-bearing, not slack — 3-bit codewords mis-rank this
    * near-random corpus so badly that narrowing the shortlist window
    * collapses the AnnRecallSpec gates (6× → 0.651/0.745, 12× →
    * 0.778/0.904, vs 0.811/0.945 at 16× against 0.8/0.9 gates), so a
    * regime-aware width has no room to move at contract SF. The real
    * q73 cost was the RETRAIN's sequential exchange chain, now a
    * driver-local computation over the bounded slice (see [[pqTrain]]):
    * quiet medians 5.1 → ~2.1-2.7 s at sf0.01 with the width untouched.
    */
  def rerankTopKPQ(pairIds: DataFrame, vectors: DataFrame, k: Int,
                   m: Int = 16, ks: Int = 8, rounds: Int = 2,
                   oversample: Int = 16, n: Long = -1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (subs, codebook) = pqTrain(vectors, m, ks, rounds, 64, n)
    val dense = n >= 0 && n <= AnnDenseMax
    // the stored representation: one packed long of m codes + the norm
    val enc = pqEncodeWith(subs, codebook, vectors, ks, pin = dense)
    // one FLAT m·ks-entry LUT per query (position = sub·ks + code): built
    // once per query via a map detour — the per-query 128-step transform
    // is noise; what must never be interpreted is the per-PAIR walk, which
    // the graft_pq_adc kernel keeps in whole-stage codegen
    // pinned like pqEncodeWith: AQE folded this exchange to ~3 tasks and
    // the m·ks dot products per query ran there; collect_list order feeds
    // map_from_entries over UNIQUE keys read back positionally by
    // element_at, so the LUT array is insertion-order-independent
    val spLut = subs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val luts = subs.join(broadcast(codebook), "sub")
      .repartition(spLut, col("vec_id"))
      .groupBy("vec_id")
      .agg(map_from_entries(collect_list(struct(
        col("sub") * ks + col("code"), dot(col("sv"), col("cv"))))).as("lutm"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(m * ks - 1)),
          p => element_at(col("lutm"), p.cast("int"))).as("lut"))
      .join(vectors.select(col("vec_id"), norm(col("v")).as("qnrm")), "vec_id")
    val wq = Window.partitionBy("vec_id")
      .orderBy(col("qsim").desc, col("cand_id").asc)
    // join ORDER is load-bearing: candidates pick up the 16-byte encoding
    // through the cand_id exchange first and meet the KB-wide query LUT
    // only at the window's own vec_id partitioning — a lut-first join
    // would ship m·ks doubles per PAIR through the cand_id shuffle
    // (measured 2x the whole query).
    // Regime switch (the autoBucketCap discipline): at or below
    // AnnDenseMax the stored frame (16 B/vector) and the LUT table
    // (~1 KB/query) are a few MB — BROADCAST both, so the pair-volume
    // candidate stream flows from its dedup exchange straight into the
    // window sort, two full exchanges cheaper (r14: q73 quiet median
    // 8.5 -> ~6 s). At scale both tables are corpus-sized and the
    // exchanges are the honest cost of cap-bounded candidate volume.
    val encSel = enc.select(col("vec_id").as("cand_id"), col("pq_packed"),
      col("nrm").as("cnrm"))
    val shortlist = pairIds
      .join(if (dense) broadcast(encSel) else encSel, "cand_id")
      .join(if (dense) broadcast(luts) else luts, "vec_id")
      .withColumn("adc", pqAdc(col("lut"), col("pq_packed"), m, ks))
      .withColumn("qsim", col("adc") / (col("qnrm") * col("cnrm")))
      .withColumn("rq", row_number().over(wq))
      .filter(col("rq") <= k * oversample)
      .select("vec_id", "cand_id")
    rerankTopK(shortlist, vectors, k)
  }

  /** The PQ twin of [[annCosineQuantizedOn]] — same LSH candidate stage,
    * ADC short-list over the 16-byte packed corpus, exact top-k re-rank
    * of the short-list only.
    */
  def annCosinePQOn(vectors: DataFrame, nbits: Int = 3, bands: Int = 8,
                    k: Int = 5, bucketCap: Int = 4096, m: Int = 16,
                    ks: Int = 8, rounds: Int = 2,
                    oversample: Int = 16, n: Long = -1L): DataFrame =
    rerankTopKPQ(annCandidatePairs(vectors, nbits, bands, bucketCap),
      vectors, k, m, ks, rounds, oversample, n)

  /** queries()-shaped wrapper for the PQ-ADC ANN path (rows-only check;
    * recall spec-gated in AnnRecallSpec like q26/q36/q53). Auto-scale:
    * the bucket cap binds above [[AnnDenseMax]], so the ADC stage's
    * candidate volume stays linear.
    */
  def q73AnnPq(spark: SparkSession, dir: String): DataFrame = {
    val (v, n) = loadVectorsOnce(spark, dir, "q73.vectors", spread = false)
    annCosinePQOn(v, nbits = autoLshBits(n, 3), bucketCap = autoBucketCap(n),
      n = n)
  }

  /** Q100: SEMANTIC decontamination — the embedding-space sibling of
    * q45/q63's n-gram overlap (a paraphrased benchmark item shares no
    * 8-gram with its source; it DOES sit next to it in embedding space —
    * the leakage class lexical decontamination cannot see): every train
    * vector scored by its maximum cosine against the holdout set
    * (`vec_id % 10 == 7` — the held-out benchmark embeddings), flagged
    * `contaminated` when the 6-dp-ROUNDED max meets the q44-convention
    * 0.34 threshold (rounded-compare, the q65 rule), with the
    * nearest holdout id as evidence (ties total by lowest id via the
    * struct-max key — the oracle replays the same tie rule as a
    * max-then-min-join).
    *
    * Scale shape: the holdout is a benchmark suite — DIM-SIZED BY NATURE
    * (thousands of items, not corpus-scale), so it BROADCASTS and the
    * train side streams map-side with the codegen'd dot kernel paying
    * one corpus-sized aggregation keyed by vec_id; exactly q45's
    * broadcast-holdout premise lifted to embedding space. A holdout too
    * big to broadcast swaps in the q26 LSH-band meet (the q63
    * discipline), trading the exact max for a recall-gated one.
    */
  def q100SemanticDecon(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val train = e.filter(col("vec_id") % 10 =!= 7)
    val hold = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("h_id"), col("v").as("hv"))
    val sims = train.crossJoin(broadcast(hold))
      .select(col("vec_id"),
        round(cosine(col("v"), col("hv")), 6).as("s"), col("h_id"))
    sims.groupBy("vec_id")
      .agg(max(struct(col("s").as("s"), (-col("h_id")).as("nh"))).as("m"))
      .select(col("vec_id"), col("m.s").as("max_sim"),
        (-col("m.nh")).cast("long").as("src_holdout"),
        (col("m.s") >= 0.34).cast("int").as("contaminated"))
  }

  /** The holdout-too-big-to-broadcast swap for [[q100SemanticDecon]] —
    * the q63 discipline as TESTED CODE: both sides hash into the SAME
    * LSH band tables (the shared murmur3 hyperplane scheme, so train and
    * holdout bucket identically by construction), candidates are the
    * (band, bucket) meets, and the exact kernel re-ranks only
    * candidates. The trade is explicit: the banded max is a LOWER bound
    * on the exact max (a missed pair can only lower it), so every banded
    * `contaminated` flag is also an exact flag — containment pinned in
    * DecontaminateSpec, recall gated there too. Train vectors with no
    * candidate at all stay visible with NULL similarity evidence
    * (report-WHY), flagged 0.
    */
  def semanticDeconBandedOn(train: DataFrame, hold: DataFrame,
                            nbits: Int = 2, bands: Int = 24,
                            bucketCap: Int = 4096): DataFrame = {
    val ta = bandAssignments(train, "v", nbits, bands, bucketCap)
      .select(col("band"), col("bucket"), col("vec_id"))
    val ha = bandAssignments(
      hold.select(col("h_id").as("vec_id"), col("hv").as("v")),
      "v", nbits, bands, bucketCap)
      .select(col("band"), col("bucket"), col("vec_id").as("h_id"))
    val cand = ta.join(ha, Seq("band", "bucket"))
      .select("vec_id", "h_id").distinct()
    val sims = cand
      .join(train.select(col("vec_id"), col("v")), Seq("vec_id"))
      .join(hold, Seq("h_id"))
      .select(col("vec_id"),
        round(cosine(col("v"), col("hv")), 6).as("s"), col("h_id"))
    val agg = sims.groupBy("vec_id")
      .agg(max(struct(col("s").as("s"), (-col("h_id")).as("nh"))).as("m"))
      .select(col("vec_id"), col("m.s").as("max_sim"),
        (-col("m.nh")).cast("long").as("src_holdout"))
    train.select("vec_id").join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("max_sim"), col("src_holdout"),
        coalesce((col("max_sim") >= 0.34).cast("int"), lit(0))
          .as("contaminated"))
  }
}
