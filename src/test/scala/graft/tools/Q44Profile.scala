package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q44 at a given SF dir — times the pair
  * stage and the contraction separately (not part of any suite).
  */
object Q44Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("q44profile").getOrCreate()
    import graft.operators.{Dedup, Similarity}
    import graft.functions.VectorOps
    val v = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("v"))
    val n = v.count()
    println(s"[q44prof] n=$n")
    def time(label: String)(f: => Long): Unit = {
      // warm once, time 3
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        (s, r)
      }
      println(f"[q44prof] $label: ${ts.map(_._1).sorted.apply(1)}%.2f s (rows ${ts.head._2})")
    }
    def pairsOnly(): Long =
      Dedup.embedNearDupPairs(v, 0.34,
        nbits = Similarity.autoLshBits(n, 2), bands = 24,
        bucketCap = Similarity.autoBucketCap(n),
        cappedRegime = n > Similarity.AnnDenseMax).count()
    // pair stage only (dense spelling as q44 picks it)
    time("pairs only A") { pairsOnly() }
    // full query
    time("full q44") { Dedup.q44EmbedNearDupFull(spark, dir).count() }
    time("pairs only B") { pairsOnly() }
    spark.stop()
  }
}
