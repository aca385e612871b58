package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Connected-components semantics on constructed graphs (the corpus pair
  * graph is whatever LSH finds; these pin the algorithm itself).
  */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Force the distributed star-contraction loop (r18: graphs within
    * `spark.graft.cc.localEdgeMax` finish by in-driver union-find, which
    * every sf0.001 test graph otherwise takes) for the tests that pin the
    * LOOP itself.
    */
  private def forcingDistributed[T](body: => T): T = {
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    try body finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }

  test("local union-find finish equals the distributed contraction labels") {
    // chain + triangle + pair + a redundant edge — run BOTH regimes over
    // the same pair list and require identical label maps
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (2L, 4L))
    val local = cc(pairs: _*)
    val dist = forcingDistributed(cc(pairs: _*))
    assert(local === dist)
    // and through the real producer: q40's pair graph at sf0.001
    val viaLocal = Dedup.q40EmbedNearDup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDist = forcingDistributed(
      Dedup.q40EmbedNearDup(spark, TestSpark.Sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(viaLocal === viaDist)
  }

  test("chains, triangles and singleton pairs resolve to min-id components") {
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    val labels = cc((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L))
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("q40 embedding near-dup clusters: labels are canonical member minima") {
    val rows = Dedup.q40EmbedNearDup(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // deterministic corpus → deterministic structure (cross-checked in
    // DuckDB: 358 paired vectors in 39 components at threshold 0.34)
    assert(rows.length === 358)
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.size === 39)
    // every label is the component's minimum member id
    byCluster.foreach { case (label, members) =>
      assert(members.map(_._1).min === label)
    }
  }

  test("log-round scale proof: a diameter-4095 path converges within 14 rounds") {
    // A 4096-node path is the adversarial case for label propagation
    // (~2000 rounds to move the min across). Star contraction must close
    // it in O(log n): measured exactly log2(4096)+1 = 13 rounds, and
    // maxIter = 14 makes the bound an ASSERTION — the require inside
    // connectedComponents fails the test if contraction ever regresses
    // toward linear rounds. Ids are bit-reversed so the path order
    // carries no helpful monotone id structure.
    def rev12(i: Long): Long =
      (0 until 12).foldLeft(0L)((a, b) => a | (((i >> b) & 1L) << (11 - b)))
    val edges = (0L until 4095L).map(i => (rev12(i), rev12(i + 1)))
    val labels = forcingDistributed(Dedup.connectedComponents(
      edges.toDF("doc_a", "doc_b"), maxIter = 14)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(labels.values.toSet === Set(0L))
    assert(labels.size === 4096)
  }

  test("intermediate round storage is released; only the result's backing survives") {
    // Dataset.unpersist cannot free localCheckpoint storage, so the loop
    // releases retired rounds explicitly (ColumnBridge.releaseCheckpoint).
    // At 100 TB each leaked round pins an edge-set-sized block in executor
    // memory — pin the per-call delta at exactly 1 (the returned frame's
    // backing checkpoint).
    // set difference of RDD ids, not a count delta: the ContextCleaner may
    // concurrently reap persisted RDDs left by EARLIER tests, which would
    // skew a count comparison
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = forcingDistributed {
      val l = Dedup.connectedComponents(
        (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b"))
      l.collect()
      l
    }
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.size === 1,
      s"expected 1 surviving checkpoint, got ${fresh.size}")
    // the LOCAL regime must leak NOTHING: the union-find result is a
    // LocalRelation and every loop checkpoint is drained on return
    val before2 = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.connectedComponents(
      (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")).collect()
    val fresh2 = spark.sparkContext.getPersistentRDDs.keySet -- before2
    assert(fresh2.isEmpty,
      s"local-finish regime leaked checkpoints: $fresh2")
  }

  test("canonical-keeper property: exactly one member per cluster keeps itself") {
    val labels = cc((5L, 6L), (6L, 7L), (30L, 31L))
    val keepers = labels.filter { case (d, c) => d == c }.keySet
    assert(keepers === Set(5L, 30L))
  }

  test("conf toggles run on a session clone; the caller session is never touched") {
    // The loop disables codegen/AQE and clamps shuffle.partitions (as low
    // as 1). All three are session-global, so they must land on a CLONE:
    // sample the caller's conf at every job start across the loop's
    // lifetime, and plan a concurrent query mid-loop whose shuffle must
    // keep the session's partition count.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.jdk.CollectionConverters._
    val origCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        samples.add((
          spark.conf.get("spark.sql.codegen.wholeStage", "true"),
          spark.conf.get("spark.sql.adaptive.enabled", "true"),
          spark.conf.get("spark.sql.shuffle.partitions")))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the diameter-4095 path: ~13 contraction rounds, several jobs each
      // — plenty of mid-loop lifetime to observe
      def rev12(i: Long): Long =
        (0 until 12).foldLeft(0L)((a, b) => a | (((i >> b) & 1L) << (11 - b)))
      val edges = (0L until 4095L).map(i => (rev12(i), rev12(i + 1)))
      // localEdgeMax=0 via the caller conf INSIDE the future would race
      // the concurrent-planning assertion below; set it around the whole
      // test body instead
      spark.conf.set("spark.graft.cc.localEdgeMax", "0")
      val fut = Future(
        Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"), maxIter = 14))
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (samples.size < 6 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(samples.size >= 6, "contraction loop produced no observable jobs")
      // concurrent planning on the caller, while the loop is mid-flight
      val concurrent = spark.range(1000).toDF("id")
        .groupBy(org.apache.spark.sql.functions.col("id") % 7).count()
      val exch = concurrent.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("Exchange hashpartitioning")).getOrElse("")
      assert(exch.contains(s", $origParts)"),
        s"concurrent query lost the session partition count ($origParts): $exch")
      val labels = Await.result(fut, 2.minutes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.values.toSet === Set(0L))
      assert(labels.size === 4096)
    } finally {
      spark.conf.unset("spark.graft.cc.localEdgeMax")
      spark.sparkContext.removeSparkListener(listener)
    }
    // every sample of the caller's conf taken during the run must equal
    // the originals — the toggles were never visible outside the clone
    val seen = samples.iterator().asScala.toSet
    assert(seen.subsetOf(Set((origCodegen, origAqe, origParts))),
      s"caller conf observed with foreign values mid-loop: $seen")
    assert(spark.conf.get("spark.sql.codegen.wholeStage", "true") === origCodegen)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === origAqe)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === origParts)
  }
}
