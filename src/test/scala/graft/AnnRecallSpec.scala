package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorOps._

/** Recall gate for the approximate-NN path: multi-band LSH top-k vs the
  * exact brute-force top-k over every query vector. Also pins the
  * per-bucket cap (the 100 TB hot-bucket bound).
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val k = 5

  test("ANN (8 bands x 3 bits) recall >= 0.8 vs brute-force top-k") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    // exact top-k per query via the same window shape, all pairs
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    val brute = e.crossJoin(e.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "cand_id")
    val ann = Similarity.annCosine(spark, TestSpark.Sf0001, k = k)
      .select("vec_id", "cand_id")
    val nQueries = e.count()
    val hits = brute.intersect(ann).count()
    val recall = hits.toDouble / (k * nQueries)
    info(f"ANN recall@$k = $recall%.3f over $nQueries queries")
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8")
  }

  test("IVF (32 cells, probe 20) recall >= 0.8 vs brute-force top-k") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    val brute = e.crossJoin(e.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "cand_id")
    val ivf = Similarity.ivfCosine(spark, TestSpark.Sf0001, k = k)
      .select("vec_id", "cand_id")
    val nQueries = e.count()
    val recall = brute.intersect(ivf).count().toDouble / (k * nQueries)
    info(f"IVF recall@$k = $recall%.3f over $nQueries queries")
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8")
  }

  test("quantized rerank (int8 kernel): recall holds vs brute force AND vs the exact path") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    val brute = e.crossJoin(e.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "cand_id")
    val quant = Similarity.q53AnnQuantized(spark, TestSpark.Sf0001)
      .select("vec_id", "cand_id")
    val exact = Similarity.annCosine(spark, TestSpark.Sf0001, k = k)
      .select("vec_id", "cand_id")
    val nQueries = e.count()
    val recallBrute = brute.intersect(quant).count().toDouble / (k * nQueries)
    // the int8 short-list sees the same candidates as the exact path; with
    // 4x oversampling the only loss is quantization noise reordering
    // near-ties OUT of the short-list — gate it tighter than the LSH gate
    val recallExact = exact.intersect(quant).count().toDouble / exact.count()
    info(f"quantized recall@$k vs brute = $recallBrute%.3f, vs exact path = $recallExact%.3f")
    assert(recallBrute >= 0.8, f"vs brute force: $recallBrute%.3f < 0.8")
    assert(recallExact >= 0.95, f"vs exact rerank: $recallExact%.3f < 0.95")
  }

  test("PQ-ADC rerank: recall holds vs brute force AND vs the exact path") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    val brute = e.crossJoin(e.select(col("vec_id").as("cand_id"), col("v").as("cv")))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "cand_id")
    val pq = Similarity.q73AnnPq(spark, TestSpark.Sf0001)
      .select("vec_id", "cand_id")
    val exact = Similarity.annCosine(spark, TestSpark.Sf0001, k = k)
      .select("vec_id", "cand_id")
    val nQueries = e.count()
    val recallBrute = brute.intersect(pq).count().toDouble / (k * nQueries)
    // 3-bit codewords are far lossier than q53's int8 lanes, but the ADC
    // short-list still sees the exact path's candidates and oversamples 16x;
    // the near-random corpus is PQ's worst case, so the exact-path gate
    // sits below q53's 0.95 (measured 0.945 at m=16/ks=8/rounds=2)
    val recallExact = exact.intersect(pq).count().toDouble / exact.count()
    info(f"PQ recall@$k vs brute = $recallBrute%.3f, vs exact path = $recallExact%.3f")
    assert(recallBrute >= 0.8, f"vs brute force: $recallBrute%.3f < 0.8")
    assert(recallExact >= 0.9, f"vs exact rerank: $recallExact%.3f < 0.9")
  }

  test("IVF seeding has no single-partition top-N anywhere in the plan") {
    // the old seed was orderBy(md5).limit(nCells) — a global sort funneling
    // every partition's sample through one task; the stratified min_by seed
    // plus the k-means round must plan as aggregation trees only
    val plan = Similarity.ivfCosine(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("GlobalLimit"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("IVF candidate pairs need no dedup: every pair appears once") {
    val pairs = Similarity.ivfCosine(spark, TestSpark.Sf0001)
      .select("vec_id", "cand_id")
    assert(pairs.count() === pairs.distinct().count())
  }

  test("bucketCap bounds every (band, bucket) group") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val capped = Similarity.bandAssignments(e, "v", nbits = 2, bands = 2, bucketCap = 10)
    val maxBucket = capped.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= 10, s"bucket of size $maxBucket exceeds cap 10")
  }

  test("band assignment is deterministic across invocations") {
    val e = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val a = Similarity.bandAssignments(e, "v", 3, 2, 4096).collect().toSet
    val b = Similarity.bandAssignments(e, "v", 3, 2, 4096).collect().toSet
    assert(a === b)
  }
}
