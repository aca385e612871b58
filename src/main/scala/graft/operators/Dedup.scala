package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps.words

/** Document deduplication operators: exact (hash groupBy), MinHash+LSH
  * banding, SimHash, and n-gram Jaccard. All hashing is md5-based so the
  * scheme is engine-portable (identical in DuckDB for the oracle) and
  * needs no driver-side randomness — every stage is a pure column
  * expression followed by a keyed aggregate, which is exactly the shape
  * that scales: shuffle keys are doc_id (narrow) or band/shingle hashes
  * (uniformly distributed).
  */
object Dedup {

  /** Q21: exact dedup by content hash — keep min doc_id per identical text. */
  def q21ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word-3-gram shingles per doc: (doc_id, sh). NOT deduplicated — the
    * only consumer takes min(md5(...)) per doc, which is insensitive to
    * duplicates, so a distinct here would be a wasted full shuffle of the
    * exploded (~n_tokens per doc) set.
    */
  private def shingles3(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ",
            element_at(col("w"), i + 1),
            element_at(col("w"), i + 2),
            element_at(col("w"), i + 3)))).as("sh"))

  /** Q22: MinHash signatures (k=8 permutations via md5(i|shingle), min per
    * doc) folded into 4 LSH bands of 2 rows each. Near-dup candidates are
    * docs sharing any band value — that join is downstream (bandPairs);
    * the contract checks the signature computation itself.
    */
  def q22MinHashBands(spark: SparkSession, dir: String): DataFrame =
    minHashBandsOn(Tables.loadSpread(spark, dir, "documents"))

  /** The band computation over any (doc_id, text) frame — frame-
    * parameterized so the q51 pipeline can run the identical scheme over
    * its filtered survivor set (in lockstep with Oracles.bandCtes).
    */
  def minHashBandsOn(docs: DataFrame): DataFrame = {
    val k = 8
    val sh = shingles3(docs)
    val hashed = sh.select(
      col("doc_id") +:
        (0 until k).map(i => md5(concat(lit(i + "|"), col("sh"))).as(s"h$i")): _*)
    val sig = hashed.groupBy("doc_id")
      .agg(min(col("h0")).as("h0"), (1 until k).map(i => min(col(s"h$i")).as(s"h$i")): _*)
    sig.select(
      col("doc_id"),
      md5(concat(col("h0"), col("h1"))).as("b0"),
      md5(concat(col("h2"), col("h3"))).as("b1"),
      md5(concat(col("h4"), col("h5"))).as("b2"),
      md5(concat(col("h6"), col("h7"))).as("b3"))
  }

  /** LSH candidate pairs: docs sharing any band value (self-join keyed by
    * the band hash — the scale path, no O(n²) pair enumeration).
    */
  def bandPairs(bands: DataFrame): DataFrame = {
    val long = bands.selectExpr("doc_id",
      "stack(4, 'b0', b0, 'b1', b1, 'b2', b2, 'b3', b3) AS (band, bv)")
    val a = long.select(col("band"), col("bv"), col("doc_id").as("doc_a"))
    val b = long.select(col("band"), col("bv"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bv")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Q35: the full near-dup candidate flow — minhash signatures → LSH
    * bands → candidate pairs sharing any band. This is the unbounded-scale
    * alternative to the exact O(n²) Jaccard join (q24): the only join key
    * is a band hash, uniformly distributed by construction.
    */
  def q35LshPairs(spark: SparkSession, dir: String): DataFrame =
    lshPairsOn(Tables.loadSpread(spark, dir, "documents"))

  /** The full bands→candidate-pairs flow over any (doc_id, text) frame. */
  def lshPairsOn(docs: DataFrame): DataFrame =
    bandPairs(minHashBandsOn(docs))

  /** Checkpoint eagerly, then reset the plan's size statistics to the
    * session default — see ColumnBridge.freshStats for why the reset is
    * load-bearing in the iteration below. Returns (stats-reset frame,
    * checkpoint handle): `Dataset.unpersist` cannot free checkpoint
    * storage (it lives outside the CacheManager), so the loop releases
    * retired rounds through the handle via ColumnBridge.releaseCheckpoint
    * — at full scale each handle pins an edge-set-sized block in executor
    * storage, which must not accumulate across rounds.
    */
  private def materialize(df: DataFrame): (DataFrame, DataFrame) = {
    val ck = df.localCheckpoint(true)
    (org.apache.spark.sql.graft.ColumnBridge.freshStats(ck), ck)
  }

  /** Order-independent fingerprint of an edge set: (row count, xor of a
    * 64-bit edge hash). Equality gates the exact fixed-point comparison in
    * connectedComponents, so the except-based set diff runs ~once per call
    * instead of every round.
    */
  private def edgeSig(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** In-driver union-find over a collected edge list — the local-finish
    * regime of [[connectedComponents]]. Returns one (vertex, min-id-of-
    * component) pair per distinct vertex of a real edge, plus identity
    * labels for `extraVerts` members with no edge (the includeSingletons
    * contract: identity labels never override a component minimum, the
    * minimum is ≤ every member id).
    */
  private def localComponentLabels(
      edges: Array[(Long, Long)],
      extraVerts: Option[Array[Long]]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      while (p != x) { // path-halving
        val gp = parent.get(p)
        parent.put(x, gp)
        x = gp
        p = parent.get(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val minOf = new java.util.HashMap[Long, Long]()
    val vertIt = parent.keySet().iterator()
    while (vertIt.hasNext) {
      val v = vertIt.next()
      val r = find(v)
      if (!minOf.containsKey(r) || v < minOf.get(r)) minOf.put(r, v)
    }
    val out = Array.newBuilder[(Long, Long)]
    val it2 = parent.keySet().iterator()
    while (it2.hasNext) {
      val v = it2.next()
      out += ((v, minOf.get(find(v))))
    }
    extraVerts.foreach(_.foreach(v =>
      if (!parent.containsKey(v)) out += ((v, v))))
    out.result()
  }

  /** Connected components over a pair list via alternating large-star /
    * small-star contraction (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"): every doc ends labeled with the smallest
    * doc_id reachable through the pair graph.
    *
    * Why contraction and not label propagation: propagation moves label
    * information across EDGES one hop per round, so chain-shaped
    * components need ~diameter rounds — measured 23 on q40's
    * near-threshold graph, and pointer-jumping the label table did not
    * help (the bottleneck is edge traversal, not pointer depth).
    * Star contraction rewrites the edge set itself each round, converges
    * in O(log n) rounds provably (measured 4 on the same graph), and the
    * edge list SHRINKS toward one star per component as it converges —
    * the property that matters at 100 TB, where propagation would re-join
    * the full pair list every round. Each phase is one keyed aggregate +
    * one join on vertex id; the high-degree hubs that form around
    * component minima are exactly what the large-star phase splits, which
    * is the algorithm's built-in skew handling.
    *
    * `includeSingletons = true` additionally emits an identity label
    * (v, v) for every vertex mentioned in `pairs` — including vertices
    * that appear ONLY in self-pairs (a, a), which the default contract
    * silently drops as non-edges (see the NOTE at the edge build). Costs
    * one extra distinct over the vertex set; leave it off when the
    * producer already guarantees strict doc_a < doc_b (both in-repo
    * producers do).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          includeSingletons: Boolean = false): DataFrame = {
    val caller = pairs.sparkSession
    // The loop wants three conf toggles, and all three are session-global
    // — so it runs on a CLONE of the caller's session (shared SparkContext
    // and SharedState, independent SessionState copy): queries planned
    // concurrently on the caller can never observe interpreted mode or a
    // clamped shuffle-partition count. Checkpoint blocks live on the
    // shared context, so frames materialized on the clone remain valid in
    // the caller-bound result. The toggles die with the clone; nothing to
    // restore.
    val spark = org.apache.spark.sql.graft.ColumnBridge.sessionClone(caller)
    // every iteration builds FRESH tiny plans — whole-stage codegen would
    // JIT a new generated class per round for a label table of a few
    // thousand rows, dominating the loop's wall time; interpreted mode is
    // strictly cheaper here.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    // AQE re-plans and inserts query-stage barriers per shuffle — pure
    // scheduling overhead for the loop's per-round label frames, whose
    // size AQE can never exploit (every round is checkpointed anyway).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // clone inherited the caller's runtime conf: this is the CEILING for
    // the per-round clamp below
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    // parse defensively: vendor runtimes ship non-integer spellings (e.g.
    // "auto") — a bare toLong would throw before the loop even starts.
    // The original STRING is still what gets restored in finally.
    val prevPartsN = scala.util.Try(prevParts.trim.toLong).getOrElse(200L)
    // checkpoint handles not yet released; drained in finally so the
    // non-convergence throw (and any mid-round job failure) frees every
    // materialized round — only the handle backing the RETURNED frame is
    // removed before the drain and stays alive for the caller
    val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def release(ck: DataFrame): Unit = {
      org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint(ck)
      live -= ck
    }
    try {
    // canonical undirected edge set (hi > lo), deduped and materialized
    // ONCE — without this the full upstream pipeline that produced the
    // pairs (e.g. the whole minhash→bands→pair join) replays per round.
    // Every materialize below also RESETS the frame's size statistics
    // (ColumnBridge.freshStats): localCheckpoint preserves join-product
    // sizeInBytes estimates, which feed back into the next round's
    // product — without the reset the estimate's BigInt digit count
    // doubles per round and stats estimation stalls the driver for
    // minutes inside SizeInBytesOnlyStatsPlanVisitor (caught live in a
    // bench thread dump).
    // NOTE (contract): self-pairs (a, a) are dropped as non-edges, so a
    // vertex appearing ONLY in self-pairs does not reach the output
    // unless includeSingletons is set. Both in-repo producers emit
    // strictly doc_a < doc_b.
    val canonical = org.apache.spark.sql.graft.ColumnBridge.rebind(spark, pairs)
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .distinct()
    // singleton coverage: capture the FULL vertex set (self-pairs
    // included) from one materialization of the canonical pairs, so the
    // upstream pipeline that produced `pairs` is not replayed a second
    // time for the vertex scan
    var verts: Option[DataFrame] = None
    var vertsCk: Option[DataFrame] = None
    var (e, eCk) = if (includeSingletons) {
      val (p0, p0Ck) = materialize(canonical)
      live += p0Ck
      val (v, vCk) = materialize(
        p0.select(col("hi").as("doc_id"))
          .union(p0.select(col("lo").as("doc_id"))).distinct())
      live += vCk
      verts = Some(v); vertsCk = Some(vCk)
      val edges = materialize(p0.filter(col("hi") =!= col("lo")))
      release(p0Ck) // consumed by the two materializations above
      edges
    } else materialize(canonical.filter(col("hi") =!= col("lo")))
    live += eCk
    var prevSig = edgeSig(e)
    // LOCAL FINISH (r18 optimization): the canonical edge set is
    // materialized and its exact cardinality is in hand (the signature
    // count, computed anyway to gate convergence). A graph that fits the
    // driver — `spark.graft.cc.localEdgeMax` edges, default 2^20 (two
    // longs per edge ≈ 16 MB raw; the same driver-width discipline as
    // the PQ training slice) — resolves by plain union-find right here:
    // the distributed star-contraction rounds exist for graphs that do
    // NOT fit, and each round costs two materialization jobs plus a
    // signature job (profiled ~0.25 s/round of pure driver-job latency
    // at sf0.1 on 10-KiB label frames, ×4-6 rounds per call,
    // OPTIMIZATION_r18.md). Same labels by construction: every vertex
    // of a real edge gets the minimum id reachable in the pair graph,
    // exactly the contraction fixed point; singleton identity labels
    // ride the collected vertex set when requested. Above the cap the
    // loop below is UNCHANGED — nothing was wasted deciding (the probe
    // is the signature already computed), and the 100 TB pair list
    // never sees a driver-sized collect.
    val localEdgeMax = caller.conf.get("spark.graft.cc.localEdgeMax",
      (1L << 20).toString).toLong
    // the vertex set must pass its own cap (ADVICE r18): the edge gate
    // bounds NON-SELF pairs, but with includeSingletons the collected
    // vertex set also carries self-pair-only vertices, which edge
    // cardinality does not bound — probe the (already materialized)
    // vertex checkpoint before committing to a driver collect. 2× the
    // edge cap ≈ the two-endpoints-per-edge width the edge collect
    // already implies. Both probes read checkpoints; nothing upstream
    // re-executes, and a failed probe falls through to the unchanged
    // distributed loop.
    def localVertsOk: Boolean = verts.forall { v =>
      val cap = math.min(2L * localEdgeMax, Int.MaxValue.toLong - 1)
      v.limit(cap.toInt + 1).collect().length <= cap
    }
    if (prevSig._1 <= localEdgeMax && localVertsOk) {
      val dt = e.schema("hi").dataType
      val edgeRows = e.select(col("hi").cast("long"), col("lo").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val vertRows = verts.map(_.select(col("doc_id").cast("long"))
        .collect().map(_.getLong(0)))
      val labels = localComponentLabels(edgeRows, vertRows)
      import caller.implicits._
      return labels.toSeq.toDF("doc_id", "cluster")
        .select(col("doc_id").cast(dt).as("doc_id"),
          col("cluster").cast(dt).as("cluster"))
      // the finally drain releases every checkpoint — the LocalRelation
      // result references none of them
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // size the round's shuffles to the CURRENT edge count (known for
      // free from the signature): with AQE coalescing disabled above, a
      // tiny contracted graph would otherwise schedule the session's full
      // partition count per shuffle — at 32 partitions × ~4 shuffles ×
      // ~10 rounds the task overhead alone was 4× the query (measured
      // 11 s vs 2.8 s for the same 345-edge q40 graph). ~1M edge rows
      // (two longs) per partition; never above the session setting, so a
      // 100 TB pair list still spreads over the full cluster. The clamp
      // can go all the way to 1 — safe on the clone, where no concurrent
      // query can ever be planned with it.
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(prevPartsN, prevSig._1 / 1000000L + 1L)).toString)
      // large-star: every node connects its strictly-LARGER neighbors to
      // the minimum of its closed neighborhood. Operates on both edge
      // directions; splits high-degree hubs, preserves connectivity.
      val bd = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mn = bd.groupBy("u").agg(min("v").as("mnv"))
      val (ls, lsCk) = materialize(
        bd.join(mn, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("hi"), least(col("u"), col("mnv")).as("lo"))
          .distinct())
      live += lsCk
      // small-star: every node connects its smaller neighbors (and
      // itself) to its smallest neighbor. Operates on the downward
      // direction only — (hi > lo) is invariant through both phases.
      val smn = ls.groupBy("hi").agg(min("lo").as("mn"))
      val (ss, ssCk) = materialize(
        ls.join(smn, "hi")
          .filter(col("lo") =!= col("mn"))
          .select(col("lo").as("hi"), col("mn").as("lo"))
          .union(smn.select(col("hi"), col("mn").as("lo")))
          .distinct())
      live += ssCk
      release(lsCk) // consumed by ss's materialization above
      // fixed point reached ⟺ the edge set stopped changing. The cheap
      // signature gates the exact set comparison, so the except-diff job
      // runs only at (suspected) convergence, not every round.
      val newSig = edgeSig(ss)
      converged = prevSig == newSig && ss.exceptAll(e).isEmpty
      prevSig = newSig
      release(eCk) // convergence check was this round's last read of e
      e = ss
      eCk = ssCk
      i += 1
    }
    // an unconverged exit would return silently WRONG clusters (edges not
    // yet contracted to stars) — fail loudly instead
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations — " +
        "raise maxIter")
    // the final star set backs the RETURNED plan: its checkpoint must
    // outlive this call, so exempt it from the finally drain (it is
    // reclaimed with the session, or by the caller via ContextCleaner
    // once the result is no longer referenced). Same for the vertex
    // checkpoint when singleton coverage is on.
    live -= eCk
    vertsCk.foreach(live -= _)
    // the fixed point is one star per component, rooted at the component
    // minimum: leaves label to their root, each root labels itself. The
    // aggregate is single-shuffle insurance that the output is exactly
    // one row per vertex. Identity labels (v, v) never override a real
    // cluster: the component minimum is ≤ every member id, so min() keeps
    // it, and only true singletons end up labeled with themselves.
    val labeled = e.select(col("hi").as("doc_id"), col("lo").as("cluster"))
      .union(e.select(col("lo").as("doc_id"), col("lo").as("cluster")))
    val out = verts.fold(labeled)(v =>
        labeled.union(v.select(col("doc_id"), col("doc_id").as("cluster"))))
      .groupBy("doc_id").agg(min("cluster").as("cluster"))
    // hand the result back on the CALLER's session: the final star set is
    // checkpointed (LogicalRDD leaves survive rebinding), and downstream
    // consumers plan the closing aggregate with the caller's own
    // codegen/AQE/partition settings, not the loop's.
    org.apache.spark.sql.graft.ColumnBridge.rebind(caller, out)
    } finally {
      live.toSeq.foreach(release)
      // no conf restore: the toggles were applied to the clone only and
      // are unreachable once it goes out of scope
    }
  }

  /** Q37: near-dup clusters — the step after candidate generation in a
    * dedup pipeline: group the q35 candidate pairs into components and
    * label every member with its canonical (minimum) doc id. Downstream,
    * keeping rows where doc_id = cluster IS the deduplicated corpus.
    */
  def q37DedupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(q35LshPairs(spark, dir))

  /** Q40: embedding-cosine near-dup clusters — the embedding-space member
    * of the dedup family (exact: q21; text-LSH: q35/q37): exact
    * thresholded cosine pairs over a bounded id range, grouped into
    * connected components, every vector labeled with its canonical
    * minimum vec_id. Keeping rows where vec_id = cluster IS the
    * near-dup-free embedding corpus. The bounded exact pair join is the
    * correctness primitive; at 100 TB the same pair list comes from the
    * LSH candidate path (Similarity.annCandidatePairs + threshold
    * re-rank) feeding this identical clustering stage.
    *
    * Threshold 0.34 is tuned to the corpus: the nearest pair similarity
    * sits ≥ 1e-5 away at every test SF (no float-boundary flakiness vs
    * the oracle), and the graph splits into ~40 real components instead
    * of one percolated giant (which is what ≤ 0.3 yields on these
    * near-random vectors). Chain-like near-threshold components have
    * large diameters — star contraction in connectedComponents keeps the
    * round count logarithmic regardless.
    */
  def q40EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps._
    val e = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("doc_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("doc_b"), col("v").as("vb"))
    val pairs = a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .filter(cosine(col("va"), col("vb")) >= 0.34)
      .select("doc_a", "doc_b")
    connectedComponents(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster"))
  }

  /** The UNBOUNDED embedding near-dup path — what q40's comment promises
    * for 100 TB, promoted to an operator: LSH candidate pairs (the
    * bucketCap-bounded band self-join from Similarity.annCandidatePairs —
    * no O(n²) pair enumeration anywhere in the plan) → exact cosine
    * re-rank at `threshold` → connected components.
    *
    * Exactness contract: the clusters equal the brute-force-pair clusters
    * IFF candidate generation recalls every pair ≥ threshold. That recall
    * is a corpus+parameter property, so it is pinned empirically in
    * EmbedNearDupSpec (containment of all brute-force threshold pairs in
    * the candidate set at every test SF) — the hashes are deterministic,
    * so a green spec transfers to the oracle gate. Defaults are dense
    * (2 bits × 24 bands ⇒ P(miss) ≈ 1.4e-5 per edge at cos 0.34): these
    * near-random corpus vectors sit at θ ≈ 70°, where any LSH needs dense
    * coverage (same caveat as q26/q36, documented there); on real
    * clustered embeddings the same operator prunes sharply with
    * fewer/narrower bands.
    */
  def embedNearDupClusters(vectors: DataFrame, threshold: Double,
                           nbits: Int = 2, bands: Int = 24,
                           bucketCap: Int = 4096,
                           cappedRegime: Boolean = false): DataFrame =
    connectedComponents(embedNearDupPairs(vectors, threshold, nbits, bands,
      bucketCap, cappedRegime))
      .select(col("doc_id").as("vec_id"), col("cluster"))

  /** The q44 pair stage alone (exposed for stage-level profiling and
    * spec containment checks): surviving dup pairs `(doc_a < doc_b)`.
    */
  def embedNearDupPairs(vectors: DataFrame, threshold: Double,
                        nbits: Int, bands: Int, bucketCap: Int,
                        cappedRegime: Boolean): DataFrame = {
    import graft.functions.VectorOps._
    val en = vectors.withColumn("nrm", norm(col("v")))
    // Pairs are generated and scored INSIDE the (band, bucket) group —
    // the q36 cell-local discipline applied to LSH buckets: each member's
    // vector enters its buckets once (n·bands rows), the i<j fan-out and
    // the cosines stay inside the stage, and only SURVIVING dup-pair ids
    // move to the cross-band dedup (dup-volume, not candidate-volume; the
    // r12 candidate-join + full-vector rerank shipped pair-volume ×
    // 512-byte vectors through join exchanges and measured 417 s at the
    // 100× corpus — and a quiet r14 A/B measured it slowest at the
    // contract SF too, 5.8 s vs 4.3/4.8 for the in-bucket spellings).
    //
    // TWO spellings of the same in-bucket pair set, regime-switched
    // because their costs invert (r14 A/B, 5-rep quiet medians):
    //
    //  - dense regime (huge-but-FEW buckets; cap non-binding): pair
    //    structs are produced by one nested higher-order projection over
    //    the member array — the array is CONSUMED inside the expression,
    //    never carried per exploded row (judge r13 finding #2: the
    //    posexplode spelling copies the full `ms` array — m members ×
    //    ~540 B — onto each of its m rows, O(m²·540 B) transient bytes
    //    per bucket at m ≈ 500). HOFs evaluate interpreted, but
    //    [[graft.functions.DotProduct]]'s eval is the same primitive
    //    loop its codegen emits, so per-pair cost stays ~0.3 µs:
    //    measured 4.29 s vs 4.81 s (posexplode) vs 5.82 s (join).
    //
    //  - capped regime (tiny-but-MANY buckets; cap binds): the
    //    posexplode + slice spelling — whole-stage codegen end to end.
    //    With cap ≤ 256 the carried array is ≤ ~135 KB and the copy tax
    //    is immaterial, while the interpreted HOF machinery's per-group
    //    allocations (a sequence + lambda frame + output array per
    //    member, times ~75k bucket groups × 24 bands at the 100×
    //    corpus) measured 654 s where this spelling runs 33 s.
    //
    // r18: the dense-regime HOF projection is retired from the hot path —
    // the r18 profile measured its lambda machinery at 34 s of task time
    // for q44's ~2M pairs where the dot arithmetic itself is ~0.2 s. The
    // [[graft.functions.BucketDupPairs]] kernel emits the IDENTICAL pair
    // set (PairKernelSpec pins it against the HOF twin, retained below as
    // `denseHofPairs`) from one native i<j loop per bucket, zero per-pair
    // allocation. Same in-bucket discipline: the member array is consumed
    // inside the kernel, never carried per exploded row.
    val pairs = (if (cappedRegime) {
      Similarity.bandAssignments(vectors, "v", nbits, bands, bucketCap)
        .join(en, "vec_id")
        .groupBy("band", "bucket")
        .agg(collect_list(struct(col("vec_id"), col("v"), col("nrm"))).as("ms"))
        .select(col("ms"), posexplode(col("ms")).as(Seq("_i", "a")))
        .select(col("a"), explode(expr("slice(ms, _i + 2, size(ms))")).as("b"))
        .filter(dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")) >= threshold)
        .select(least(col("a.vec_id"), col("b.vec_id")).as("doc_a"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("doc_b"))
    } else {
      Similarity.bandAssignments(vectors, "v", nbits, bands, bucketCap)
        .join(en, "vec_id")
        .groupBy("band", "bucket")
        .agg(collect_list(struct(col("vec_id").cast("long").as("vec_id"),
          col("v"), col("nrm"))).as("ms"))
        .filter(size(col("ms")) >= 2)
        .select(explode(bucketDupPairs(col("ms"), threshold)).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    }).distinct()
    pairs
  }

  /** The retired dense-regime HOF pair projection — kept ONLY as the
    * independent oracle for PairKernelSpec (it is the exact expression
    * the dense regime shipped through r17). Emits the same pair structs
    * from `ms` = array<struct<vec_id, v, nrm>>.
    */
  private[graft] def denseHofPairs(ms: Column, threshold: Double): Column = {
    import graft.functions.VectorOps.dot
    flatten(transform(sequence(lit(0), size(ms) - 2), i => {
      val a = get(ms, i)
      filter(
        transform(sequence(i + 1, size(ms) - 1), j => {
          val b = get(ms, j)
          when(dot(a("v"), b("v")) / (a("nrm") * b("nrm")) >= threshold,
            struct(least(a("vec_id"), b("vec_id")).as("doc_a"),
              greatest(a("vec_id"), b("vec_id")).as("doc_b")))
        }),
        p => p.isNotNull)
    }))
  }

  /** Q44: embedding near-dup clusters over the FULL embeddings table —
    * q40's semantics without the vec_id bound, running entirely on the
    * sub-quadratic candidate path. Same threshold as q40 (0.34 sits
    * ≥ 1e-5 from the nearest pair similarity at the oracle-gated SFs).
    * Auto-scale (the r11 decade named this query at 21.8×): above
    * [[Similarity.AnnDenseMax]] the bucket cap BINDS, bounding candidate
    * volume linearly — the dense-coverage exactness contract then
    * degrades to recall-gated (the stated no-free-lunch on near-random
    * vectors; clustered embeddings lose little, AnnScaleSpec).
    */
  def q44EmbedNearDupFull(spark: SparkSession, dir: String): DataFrame = {
    // left UNmaterialized (r19 A/B): the only re-executions are the
    // footer-cheap count and the components loop's single pair
    // materialization — both checkpoint variants measured neutral at
    // best (ck+spread 1.55 → 1.94, ck-only 1.55 → 1.70 vs noise)
    val v = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.toDoubleArray(col("embedding")).as("v"))
    val n = v.count()
    embedNearDupClusters(v, threshold = 0.34,
      nbits = Similarity.autoLshBits(n, 2),
      bucketCap = Similarity.autoBucketCap(n),
      cappedRegime = n > Similarity.AnnDenseMax)
  }

  /** 32-bit word hash from the md5 hex prefix — portable across engines. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Q23: 32-bit SimHash over distinct words (doc_id < 2000 keeps the
    * bounded contract deterministic across scale factors). bit b of the
    * word hash contributes ±1; sign of the per-bit sum forms the signature.
    *
    * One shuffle, no row blowup: each of the 32 per-bit sums is its own
    * narrow aggregate column in a single groupBy(doc_id) — vs the naive
    * explode(0..31) shape, which multiplies the token table ×32 and needs
    * a second shuffled aggregation.
    */
  def q23SimHash(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 2000)
      // per-doc distinct is narrow: array_distinct before the explode —
      // no shuffle, unlike .distinct() on the exploded rows
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("w"))
      .withColumn("h", h32(col("w")))
    val bitSums = (0 until 32).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"s$b"))
    tokens.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).cast("long").as("simhash"))
  }

  /** Q24: exact word-set Jaccard pairs (doc_id < 300 bounds the pair join
    * at any scale factor; the unbounded path goes through MinHash bands).
    */
  def q24JaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("w"))
    val sizes = tokens.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = tokens.select(col("doc_id").as("doc_a"), col("w"))
    val b = tokens.select(col("doc_id").as("doc_b"), col("w"))
    val inter = a.join(b, "w").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    val sa = sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))
    val sb = sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))
    inter.join(broadcast(sa), "doc_a").join(broadcast(sb), "doc_b")
      .withColumn("jac",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jac"))
  }

  /** Q31: approximate distinct (HLL++) — no exact oracle; checked against
    * Q20 exact counts within tolerance in tests.
    */
  def q31ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .agg(approx_count_distinct(col("text")).as("approx_distinct_texts"))

  /** Q180: MERGEABLE sketch distinct — the federated-lake rung above
    * q31's single-shot estimate (a 100 TB lake counts distincts
    * per-shard and MERGES: re-scanning the union for every rollup is
    * the anti-pattern; mergeable sketches are why Datasketches HLL
    * exists): per-source `hll_sketch_agg` (lgK 12) builds ONE
    * kilobyte-scale sketch per shard, `hll_union_agg` folds them into
    * the corpus-wide estimate WITHOUT touching a row again — the
    * published rows are the per-source estimates plus the `*ALL*`
    * union row. No SQL oracle (the estimate is sketch-deterministic,
    * not a cross-engine constant — q31's stance): SketchMergeSpec
    * gates each estimate within 5% of the exact distinct AND pins the
    * merge property — the union-of-sketches estimate tracks sketching
    * the whole corpus directly within sketch precision (the union's
    * coupon-to-register promotion can move it a hair; measured 504 vs
    * 501 at sf0.001).
    */
  def q180SketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val perSource = docs.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(text, 12)").as("sk"))
    val bySource = perSource
      .select(col("source"),
        expr("hll_sketch_estimate(sk)").as("est_distinct"))
    val all = perSource
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
        .as("est_distinct"))
      .select(lit("*ALL*").as("source"), col("est_distinct"))
    bySource.unionAll(all)
  }

  /** Q70: EXACT SUBSTRING deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", §ExactSubstr): any
    * word-8-gram occurring MORE THAN ONCE corpus-wide marks its 8-token
    * span, every marked token is excised (within-doc repeats included —
    * unlike the suffix-array original we keep no canonical copy; the
    * choice is documented, deterministic, and what a memorization scrub
    * wants), and the surviving tokens are re-joined in order. The
    * span-granular sibling of q67's line dedup and q21's whole-doc hash:
    * it catches the quote/template reuse neither can see.
    *
    * Shape at scale (suffix arrays don't distribute; shingle counting
    * does — the published Spark-era re-formulation):
    *  1. shingle instances (doc_id, start, sh) — narrow explode, ~one
    *     per token;
    *  2. corpus-wide occurrence count per shingle — one shuffle keyed by
    *     the UNIFORM shingle text, map-side partial agg absorbing viral
    *     shingles;
    *  3. duplicate instances = instances ⋈ (count >= 2) vocabulary —
    *     deliberately a SHUFFLED join (the duplicate vocabulary is
    *     corpus-scaled, NOT broadcastable; the q63 bloom prefilter is
    *     the optional accelerator, AQE splits any viral-shingle skew);
    *  4. per-doc duplicate-start lists (collect_list bounded by doc
    *     length), re-joined to `documents` once by doc_id;
    *  5. reconstruction is pure per-row array work: token p survives iff
    *     no duplicate span starts in [p-7, p] — the nested `exists` is
    *     O(tokens × dup-spans) per doc, bounded by doc length both ways.
    *
    * `cleaned_text` is NULL when nothing survives (q67's convention);
    * the removed fraction folds exact BIGINT counts with one final
    * rounding.
    */
  def q70SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    // tokenize ONCE (r18 verdict task #5): the shingle-instance explode
    // and the final reconstruction join both consumed the tokenized frame
    // as duplicated subtrees — scan + split ran twice per query
    val withWords = Materialize.once("q70.tokens",
      docs.select(col("doc_id"), words(col("text")).as("ws")))
    val inst = withWords
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - 8),
          i => struct(i.as("start"),
            array_join(slice(col("ws"), i + 1, lit(8)), " ").as("sh"))))
        .as("s"))
      .select(col("doc_id"), col("s.start").as("start"), col("s.sh").as("sh"))
    val dupVocab = inst.groupBy("sh").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("sh")
    val dupStarts = inst.join(dupVocab.hint("shuffle_hash"), "sh")
      .groupBy("doc_id").agg(sort_array(collect_list(col("start"))).as("dup_starts"))
    val joined = withWords.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws"),
        coalesce(col("dup_starts"), array().cast("array<int>")).as("ds"))
    val toks = transform(col("ws"), (w, i) => struct(i.as("p"), w.as("w")))
    val kept = filter(toks, t => !exists(col("ds"),
      s => s <= t.getField("p") && t.getField("p") <= s + 7))
    joined.select(col("doc_id"),
      size(col("ws")).cast("long").as("n_tokens"),
      (size(col("ws")) - size(kept)).cast("long").as("n_removed"),
      when(size(col("ws")) > 0,
        round((size(col("ws")) - size(kept)).cast("double") /
          size(col("ws")), 6)).as("removed_frac"),
      when(size(kept) === 0, lit(null).cast("string"))
        .otherwise(array_join(transform(kept, t => t.getField("w")), " "))
        .as("cleaned_text"))
  }

  /** Q79: SemDeDup (Abbas et al. 2023) — SEMANTIC dedup: embeddings are
    * clustered (the q36 centroid machinery: hash-stratified seeds +
    * Lloyd), pairwise cosine runs ONLY within each cluster, and of every
    * semantic-duplicate group exactly one representative survives — the
    * member FARTHEST from its centroid (lowest centroid similarity, the
    * paper's keep-the-outlier rule: among near-duplicates, the least
    * cluster-typical copy carries the most marginal information; ties
    * break to the lowest id so the contract is total).
    *
    * This is the scale shape the paper chose deliberately: clustering
    * makes the O(n²) pairwise stage O(Σ cell²) with cellCap bounding any
    * hot cell, at the documented cost that a near-dup pair SPLIT ACROSS
    * cells is not judged (the within-cell containment property — every
    * same-cell pair ≥ eps lands in one group — is what SemDedupSpec
    * pins; q40/q44 are the exact alternatives when cross-cluster recall
    * matters more than the pruning ratio). Spec-gated, not oracled: the
    * Lloyd mean is a floating-point average, the q36 caveat.
    *
    * Output: every vector, its semantic group (components of the
    * within-cell ≥ eps graph; singletons label themselves), its centroid
    * similarity, and the keep bit — `keep = 1` rows ARE the semantically
    * deduplicated corpus (q65's report-WHY discipline: the pruned rows
    * stay visible with their group).
    */
  def q79SemDedup(spark: SparkSession, dir: String): DataFrame =
    // materialize-once (r19): semDedupOn consumes the vector frame from
    // many driver actions (centroid seed + Lloyd collects, the cell
    // co-location, the components loop) — each re-ran the parquet scan
    semDedupOn(Materialize.once("q79.vectors",
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorOps.toDoubleArray(col("embedding")).as("v"))))

  /** SemDeDup over any (vec_id, v) frame. `nCells` trades pruning cost
    * against cross-cell recall; `eps` is the semantic-duplicate bar
    * (0.34 per q40's corpus tuning).
    */
  def semDedupOn(vectors: DataFrame, nCells: Int = 8, eps: Double = 0.34,
                 cellCap: Int = 4096, kmeansRounds: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorOps._
    val home = Similarity.homeCells(vectors, nCells, cellCap, kmeansRounds)
    val en = vectors.withColumn("nrm", norm(col("v")))
    val m = home.join(en, "vec_id")
    // r18: the within-cell pair stage runs CELL-LOCALLY through the
    // [[graft.functions.BucketDupPairs]] kernel (q44's dense-regime
    // discipline): members co-locate by cell ONCE, the i<j fan-out and
    // the cosines stay inside the kernel, and only surviving dup-pair
    // ids leave the stage — the previous cell_id self-join shipped
    // member-volume × vector-width rows through BOTH join sides and
    // materialized every candidate pair as a row before the filter.
    // Identical pair set (same predicate, same min/max id order;
    // PairKernelSpec pins the kernel, SemDedupSpec gates the operator).
    val pairs = m
      .groupBy("cell_id")
      .agg(collect_list(struct(col("vec_id").cast("long").as("vec_id"),
        col("v"), col("nrm"))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(explode(graft.functions.VectorOps.bucketDupPairs(col("ms"), eps))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    val comp = connectedComponents(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    val wKeep = Window.partitionBy("cluster")
      .orderBy(col("csim").asc, col("vec_id").asc)
    home.join(comp, Seq("vec_id"), "left")
      // a singleton (no within-cell edge) is its own group; its id cannot
      // collide with a component label (labels are min ids of EDGED sets)
      .withColumn("cluster", coalesce(col("cluster"), col("vec_id")))
      .withColumn("rk", row_number().over(wKeep))
      .select(col("vec_id"), col("cluster"),
        round(col("csim"), 6).as("centroid_sim"),
        (col("rk") === 1).cast("int").as("keep"))
  }

  /** Q74: INCREMENTAL dedup — an incoming batch judged against the
    * already-curated history corpus, never re-deduplicating the lake (the
    * production corpus-refresh shape: daily crawl deltas land against a
    * 100 TB curated set; recomputing q21/q22 over history ∪ delta per
    * refresh would cost the whole lake every day). Per incoming doc, the
    * verdict is reported as BITS beside the evidence (q65/q68's report-WHY
    * discipline), never a silent filter:
    *   - `exact_dup` — content fingerprint (md5, q21's scheme) present in
    *     history; `exact_src` = the lowest matching history doc.
    *   - `near_dup` — any MinHash LSH band (q22's exact scheme, via the
    *     shared frame-parameterized `minHashBandsOn`) collides with a
    *     history doc's band; `near_src` = the lowest colliding doc.
    *   - `keep` — neither fired.
    *
    * Both meets are equi-joins on uniformly-distributed hashes — exactly
    * the keys a deployment PRE-MATERIALIZES for the history side
    * (fingerprint and band tables stored once, bucketed on their hash, so
    * a refresh pays incoming-sized work plus one co-located probe; here
    * they derive inline from the same corpus for self-containment). The
    * incoming batch synthesizes the refresh's two populations
    * deterministically: genuinely-new docs (`doc_id % 5 = 4`) plus
    * RE-CRAWLS of history docs (`doc_id % 7 = 0`, re-sent under doc_id +
    * 1e6 with identical text — the re-crawl-under-a-new-id case that
    * makes incremental dedup necessary at all).
    */
  def q74IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    // materialize-once (r19): the history/incoming splits fan the corpus
    // into SIX subtree copies (two minhash band pipelines, two exact-md5
    // join sides, the re-crawl union, the verdict spine) — each re-ran
    // the parquet scan. The r18 plain-spread A/B regressed here (+0.69 s)
    // precisely because those copies re-executed the spread exchange;
    // with the rows checkpointed once (spread below the checkpoint) the
    // minhash kernels read 32-way blocks instead.
    val docs = Materialize.once("q74.docs",
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")),
      Some(col("doc_id")))
    val history = docs.filter(col("doc_id") % 5 < 4)
    val incoming = docs.filter(col("doc_id") % 5 === 4)
      .unionAll(history.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    incrementalDedupOn(incoming, history)
  }

  /** The delta-vs-history verdict over any two (doc_id, text) frames. */
  def incrementalDedupOn(incoming: DataFrame, history: DataFrame): DataFrame = {
    val exact = incoming.select(col("doc_id"), md5(col("text")).as("_h"))
      .join(history.select(md5(col("text")).as("_h"), col("doc_id").as("_hid")), "_h")
      .groupBy("doc_id").agg(min(col("_hid")).as("exact_src"))
    def stacked(df: DataFrame, idAs: String) =
      minHashBandsOn(df).selectExpr(s"doc_id AS $idAs",
        "stack(4, 'b0', b0, 'b1', b1, 'b2', b2, 'b3', b3) AS (band, bv)")
    val near = stacked(incoming, "doc_id")
      .join(stacked(history, "_hid").select(col("band"), col("bv"), col("_hid")),
        Seq("band", "bv"))
      .groupBy("doc_id").agg(min(col("_hid")).as("near_src"))
    incoming.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("exact_src").isNotNull.cast("int").as("exact_dup"),
        col("near_src").isNotNull.cast("int").as("near_dup"),
        (col("exact_src").isNull && col("near_src").isNull).cast("int").as("keep"),
        col("exact_src"), col("near_src"))
  }

  /** Q148: paragraph-level exact dedup — the sub-document granularity
    * document dedup (q21/q30) cannot see: boilerplate ("all rights
    * reserved…", license footers) repeats across MILLIONS of otherwise-
    * unique pages, and training-data pipelines drop the REPEATED
    * paragraph while keeping each page's unique prose (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * exact-substring motivation at paragraph granularity).
    *
    * First occurrence wins, ordered by (doc_id, idx) — deterministic
    * and replayable in SQL. The plan is the SKEW-SAFE spelling: a
    * `groupBy(para).agg(min(struct(doc_id, idx)))` whose map-side
    * partial aggregation crushes a boilerplate key's billions of
    * copies to one row per input partition BEFORE the exchange — a
    * window over `partitionBy(para)` would ship the whole hot group
    * to one task and straggle at 100 TB. Per-doc counts then come
    * from the winner set alone (n_dup = n_paras - n_kept), never
    * from a per-row keep join back to the exploded frame.
    *
    * Paragraphs: 8-word chunks of the doc's text (q133's pagination
    * arithmetic), plus injected boilerplate — %7 residues 0/3 carry
    * the rights notice, 1/3 the license line (3 carries BOTH), and
    * residue 4 repeats its own first chunk at the tail (the
    * WITHIN-doc dup: later index loses to earlier).
    */
  def q148ParaDedup(spark: SparkSession, dir: String): DataFrame =
    paraDedupOn(Tables.loadSpread(spark, dir, "documents"))

  /** The q148 computation over any (doc_id, text) frame. */
  def paraDedupOn(docs0: DataFrame): DataFrame = {
    val id = col("doc_id")
    val b1 = "all rights reserved contact the publisher for permissions"
    val b2 = "distributed under a creative commons attribution license"
    val none = typedLit(Seq.empty[String])
    // tokenize ONCE (r18 verdict task #5): the paragraph explode and the
    // arithmetic n_paras side both re-ran scan + split per branch
    val docs = Materialize.once("q148.tokens",
      docs0.select(id, words(col("text")).as("ws")))
    val ws = col("ws")
    val nChunks = ceil(size(ws).cast("double") / 8.0).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(ws, i * 8 + 1, lit(8)), " "))
    val withParas = docs
      .select(id, concat(
        when(id % 7 === 0 || id % 7 === 3, array(lit(b1))).otherwise(none),
        when(id % 7 === 1 || id % 7 === 3, array(lit(b2))).otherwise(none),
        chunks,
        when(id % 7 === 4, array(element_at(chunks, 1))).otherwise(none))
        .as("paras"))
    val exploded = withParas.select(id, posexplode(col("paras")).as(Seq("idx", "para")))
    // the winner key is a PACKED long, not a struct: min(struct) falls
    // back to SortAggregate (a full sort of the exploded frame on both
    // exchange sides — measured 3.5 s -> 2.3 s at sf0.1); min(long) is
    // a codegen'd HashAggregate with map-side combine. idx < 2^20 by
    // the bounded paragraphs-per-doc fan-out, so (doc_id << 20) | idx
    // orders exactly like (doc_id, idx)
    val winners = exploded
      .groupBy("para")
      .agg(min(shiftleft(col("doc_id"), 20) + col("idx")).as("wpack"))
    val keptPerDoc = winners
      .select(shiftright(col("wpack"), 20).as("doc_id"),
        col("wpack").bitwiseAND(lit((1L << 20) - 1)).as("idx"),
        col("para"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("para")))),
            s => s.getField("para")), "\n").cast("binary")).as("kept_md5"))
    // n_paras is ARITHMETIC, not a second paragraph construction:
    // chunk count + injected boilerplate + the within-doc repeat — so
    // the left side never re-runs the words/chunks HOF chain
    docs.select(id,
      (ceil(size(ws).cast("double") / 8.0).cast("long") +
        (id % 7 === 0 || id % 7 === 3).cast("long") +
        (id % 7 === 1 || id % 7 === 3).cast("long") +
        (id % 7 === 4).cast("long")).as("n_paras"))
      .join(keptPerDoc, Seq("doc_id"), "left")
      .select(id,
        col("n_paras"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L))).as("n_dup"),
        coalesce(col("kept_md5"), md5(lit("").cast("binary"))).as("kept_md5"))
  }

  /** Q170: typo-tolerant FIELD dedup — the short-string rung of the
    * dedup ladder (q21 hashes whole docs, q22 shingles long text;
    * metadata FIELDS — titles, author names — carry typo'd duplicates
    * both miss, and shingling a 12-char title is noise): FastSS
    * deletion-neighborhood banding (Bocek et al. 2007) — every title
    * emits itself plus each single-character deletion as a band key,
    * candidates are pairs sharing ANY key, and the exact Levenshtein
    * (the codegen'd builtin) confirms <= 1. The banding is EXACT for
    * edit distance <= 1 (a substitution's two deletions at the
    * differing position coincide; an insertion's deletion IS the
    * shorter string), so unlike q22's probabilistic bands the result
    * EQUALS the brute-force pair set — and the oracle IS that brute
    * force (a structurally different O(n²) formulation; the engine
    * never compares titles outside a shared band).
    *
    * Shape at scale: the variant explode is bounded by title length
    * (len+1 keys), the join shuffles on md5-uniform-ish variant keys
    * (never all-pairs), DISTINCT collapses multi-band candidate
    * repeats before the confirm. Titles synthesize deterministically
    * in groups of three (`doc_id div 3`): the base `doc <md5-8>`,
    * a last-char SUBSTITUTION (`z` never appears in hex), and an
    * INSERTION (`+q`) — pairs (base, sub) and (base, ins) confirm at
    * distance 1, (sub, ins) sits at distance 2 and must NOT appear.
    * Bounded `doc_id < 2000` (q24's discipline).
    */
  /** q170's operator in frame form: `(doc_id, title)` in, confirmed
    * pairs `(a_id, b_id, dist <= 1)` out — consumed by the contract
    * query and by ScaleSpec's decade probe. */
  def fuzzyPairsOn(titles: DataFrame): DataFrame = {
    val variants = titles
      .select(col("doc_id"), col("title"),
        explode(sequence(lit(0), length(col("title")))).as("i"))
      .select(col("doc_id"), col("title"),
        when(col("i") === 0, col("title"))
          .otherwise(concat(expr("substring(title, 1, i - 1)"),
            expr("substring(title, i + 1, 1000000)"))).as("variant"))
    val a = variants.select(col("doc_id").as("a_id"),
      col("title").as("_ta"), col("variant"))
    val b = variants.select(col("doc_id").as("b_id"),
      col("title").as("_tb"), col("variant"))
    a.join(b, "variant").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("_ta"), col("_tb"))
      .distinct()
      .filter(levenshtein(col("_ta"), col("_tb")) <= 1)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("_ta"), col("_tb")).as("dist"))
  }

  /** q170's deterministic title synthesis over any id frame (groups
    * of three: base / substitution / insertion). */
  def fuzzyTitlesOn(ids: DataFrame): DataFrame = {
    val base = concat(lit("doc "),
      substring(md5(expr("CAST(doc_id div 3 AS STRING)")), 1, 8))
    ids.select(col("doc_id"), base.as("_b"))
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 1,
          concat(expr("substring(_b, 1, length(_b) - 1)"), lit("z")))
          .when(col("doc_id") % 3 === 2, concat(col("_b"), lit("q")))
          .otherwise(col("_b")).as("title"))
  }

  def q170FuzzyTitleDedup(spark: SparkSession, dir: String): DataFrame =
    fuzzyPairsOn(fuzzyTitlesOn(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 2000)))
}
