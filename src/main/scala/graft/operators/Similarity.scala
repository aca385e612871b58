package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Approximate NN via deterministic random-hyperplane LSH: `nbits`
    * sign-bits per vector form a bucket key; candidates = same-bucket
    * vectors; exact cosine re-rank inside the bucket. Hyperplanes are
    * derived from a hash of (plane, dim) so the scheme needs no driver-side
    * randomness and both sides of a join bucket identically.
    *
    * Scale path: bucket key is a shuffle key — same-bucket co-location
    * replaces the O(n²) pair join with per-bucket joins.
    */
  def lshBuckets(vectors: DataFrame, vecCol: String, nbits: Int): DataFrame = {
    // plane p, dim d weight = ±1 from murmur3 hash parity — deterministic.
    val bits = (0 until nbits).map { p =>
      val proj = aggregate(
        zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
          (x, i) => when(pmod(hash(lit(p), i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)).as(s"bit$p")
    }
    val withBits = vectors.select(col("*") +: bits: _*)
    withBits.withColumn("bucket",
      concat_ws("", (0 until nbits).map(p => col(s"bit$p")): _*))
      .drop((0 until nbits).map(p => s"bit$p"): _*)
  }

  /** ANN top-k per query within shared LSH buckets (approximate —
    * verified by recall tests against brute force, not a SQL oracle).
    */
  def annCosine(spark: SparkSession, dir: String, nbits: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val bucketed = lshBuckets(e, "v", nbits)
    val cand = bucketed.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("bucket"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand_id").asc)
    bucketed.join(cand, Seq("bucket"))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("cand_id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** queries()-shaped wrapper for the ANN path (rows-only check — results
    * are approximate by construction).
    */
  def q26AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annCosine(spark, dir)
}
