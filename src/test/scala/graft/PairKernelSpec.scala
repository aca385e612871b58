package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import graft.operators.Dedup

/** [[graft.functions.BucketDupPairs]] against its retained HOF twin
  * (`Dedup.denseHofPairs`, the exact dense-regime expression shipped
  * through r17): identical pair SETS on adversarial member lists —
  * mismatched dimensions, NULL vectors, NULL elements, exact-threshold
  * ties, antipodal vectors — and on a deterministic pseudo-random bucket.
  * Order may differ (both feed a `.distinct()`), so sets are compared.
  */
class PairKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairSets(vecs: Seq[(Long, Option[Seq[Double]])],
                       thresholds: Seq[Double]): Unit = {
    val en = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    // the production guard: both spellings run behind filter(size >= 2)
    // (the bare HOF's sequence(0, size-2) turns DESCENDING on a single
    // member — sequence(0,-1) = [0,-1] — and emits a self-pair the real
    // path can never produce)
    val ms = en.agg(collect_list(struct(col("vec_id"), col("v"), col("nrm")))
      .as("ms"))
      .filter(size(col("ms")) >= 2)
    thresholds.foreach { t =>
      val kernel = ms
        .select(explode(VectorOps.bucketDupPairs(col("ms"), t)).as("p"))
        .select("p.doc_a", "p.doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hof = ms
        .select(explode(Dedup.denseHofPairs(col("ms"), t)).as("p"))
        .select("p.doc_a", "p.doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kernel === hof, s"pair sets diverged at threshold $t")
    }
  }

  test("kernel equals the HOF twin on the adversarial bucket") {
    pairSets(Seq(
      1L -> Some(Seq(1.0, 0.0)),
      2L -> Some(Seq(0.9, 0.1)),
      3L -> Some(Seq(-1.0, 0.0)),      // antipodal: cos = -1 with id 1
      4L -> Some(Seq(0.0, 1.0)),       // orthogonal: cos = 0
      5L -> Some(Seq(1.0)),            // dimension mismatch: never pairs
      6L -> None,                      // NULL vector: never pairs
      7L -> Some(Seq(0.6, 0.8)),
      8L -> Some(Seq(1.0, 0.0))        // exact duplicate of id 1: cos = 1
    ), Seq(-2.0, -1.0, 0.0, 0.34, 0.8, 1.0, 1.1))
  }

  test("kernel equals the HOF twin on NaN-element cosines") {
    // ADVICE r18: Spark compares doubles NaN-as-largest, so a NaN cosine
    // whose divisor is NOT zero (NaN vector elements make both the dot
    // and the norm NaN) satisfies the SQL `>= threshold` and the HOF
    // emits the pair — the kernel must too, at every threshold.
    pairSets(Seq(
      1L -> Some(Seq(Double.NaN, 1.0)),        // NaN dot AND NaN norm
      2L -> Some(Seq(1.0, 0.0)),
      3L -> Some(Seq(0.6, 0.8))
    ), Seq(-1.0, 0.0, 0.34, 1.0, 1.1))
  }

  test("kernel refuses a zero-norm member exactly like the HOF twin (ANSI)") {
    // under ANSI mode (the Spark 4 default every graft session runs)
    // Catalyst's Divide throws DIVIDE_BY_ZERO on the 0/0 cosine before
    // any comparison — the kernel must raise the same error, not
    // silently drop (r17 kernel) or emit the pair
    val en = Seq(1L -> Some(Seq(0.0, 0.0)), 2L -> Some(Seq(1.0, 0.0)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val ms = en.agg(collect_list(struct(col("vec_id"), col("v"), col("nrm")))
      .as("ms")).filter(size(col("ms")) >= 2)
    def msg(t: Throwable): String = {
      var c = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    val eKernel = intercept[Throwable] {
      ms.select(explode(VectorOps.bucketDupPairs(col("ms"), 0.34)).as("p"))
        .collect()
    }
    val eHof = intercept[Throwable] {
      ms.select(explode(Dedup.denseHofPairs(col("ms"), 0.34)).as("p"))
        .collect()
    }
    assert(msg(eKernel).contains("DIVIDE_BY_ZERO"), msg(eKernel).take(300))
    assert(msg(eHof).contains("DIVIDE_BY_ZERO"), msg(eHof).take(300))
  }

  test("kernel equals the HOF twin on a pseudo-random 60-member bucket") {
    // deterministic pseudo-vectors (no RNG): dims from a hash recurrence
    val vecs = (0L until 60L).map { id =>
      id -> Some((0 until 6).map(d =>
        (((id * 2654435761L + d * 40503L) % 1000L) - 500L) / 500.0))
    }
    pairSets(vecs, Seq(0.0, 0.2, 0.34, 0.6, 0.95))
  }

  test("degenerate buckets: empty and single-member emit no pairs") {
    val empty = spark.sql(
      "SELECT array() AS ms").select(
      size(VectorOps.bucketDupPairs(
        col("ms").cast("array<struct<vec_id:bigint,v:array<double>,nrm:double>>"),
        0.5)).as("n")).head.getInt(0)
    assert(empty === 0)
    // single member: the KERNEL emits no pairs even without the
    // production size guard (no self-pairs, unlike the bare HOF)
    val one = spark.sql("SELECT 1").select(
      size(VectorOps.bucketDupPairs(
        expr("array(named_struct('vec_id', 9L, 'v', array(1.0d, 2.0d), " +
          "'nrm', 2.2360679774997896d))")
          .cast("array<struct<vec_id:bigint,v:array<double>,nrm:double>>"),
        0.0)).as("n")).head.getInt(0)
    assert(one === 0)
  }
}
