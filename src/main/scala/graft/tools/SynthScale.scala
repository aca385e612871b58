package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N× scale-up of the driver corpus for SCALING
  * measurements (the sf0.1 → sf1 bench table in BENCH_NOTES): every
  * round's published numbers are sf0.1, and a 100 TB design claim needs
  * at least one measured decade of growth behind it.
  *
  * The scale-up must preserve WORKLOAD SHAPE, not just row count —
  * naive replication breaks both directions:
  *
  *  - exact copies (same text, new doc_id) inflate every duplicate
  *    group N× — dedup operators then measure a DIFFERENT problem
  *    (group-quadratic work that the real corpus doesn't have);
  *  - light perturbation (append a token) makes every replica a
  *    NEAR-duplicate of its source — minhash/LSH candidate density
  *    explodes N², again a different problem.
  *
  * So each replica r > 0 applies a deterministic POSITION permutation
  * σ_r to every document's words, keyed by (r, position) only — never
  * by doc_id or content. Consequences, by construction:
  *
  *  - bag-of-words per doc is unchanged → token/vocab statistics
  *    (q64/q83/q86) scale exactly linearly;
  *  - two identical texts stay identical WITHIN a replica (same σ_r)
  *    → each duplicate group reappears per replica at its ORIGINAL
  *    size: N× the groups, same group-size distribution;
  *  - across replicas the 8-shingle overlap of a doc with its own
  *    copy is ~0 (consecutive positions land nowhere near each other
  *    under an md5-keyed sort) → no synthetic near-dup density.
  *
  * Embeddings get a small deterministic per-(replica, dim) jitter —
  * copies at distance exactly 0 would make brute-force/ANN ties
  * degenerate — and labels/cluster structure survive because the
  * jitter (±0.025) is far below inter-cluster distances. Events offset
  * ids and shift timestamps by r seconds (sub-window, so windowed
  * aggregates keep their per-window row counts N×).
  */
object SynthScale {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val mult = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, src, dst, mult)
    spark.stop()
  }

  def writeAll(spark: SparkSession, src: String, dst: String, mult: Int): Unit = {
    new java.io.File(dst).mkdirs()
    scaledDocuments(spark, src, mult)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaledEmbeddings(spark, src, mult)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    scaledEvents(spark, src, mult)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")
    // the star-schema tables ride along unscaled (the heavy family under
    // measurement is documents/embeddings-bound; a TPC-H scale-up is the
    // driver generator's job, not this tool's)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[synthscale] wrote ${mult}x corpus to $dst")
  }

  /** σ_r word permutation: sort positions by md5(r | position). Keyed by
    * (replica, position) ONLY, so identical texts permute identically.
    */
  private def permuted(text: org.apache.spark.sql.Column,
                       r: org.apache.spark.sql.Column) = {
    val ws = split(text, " ")
    val keyed = transform(sequence(lit(0), size(ws) - 1),
      i => struct(md5(concat_ws("|", r, i)).as("k"), element_at(ws, i + 1).as("w")))
    array_join(transform(array_sort(keyed), x => x.getField("w")), " ")
  }

  def scaledDocuments(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = 5000L * 1000 // id stride: far above any source doc_id
    docs.crossJoin(
        spark.range(mult).select(col("id").cast("int").as("_r")))
      .select(
        (col("doc_id") + col("_r") * n).as("doc_id"),
        when(col("_r") === 0, col("text"))
          .otherwise(permuted(col("text"), col("_r"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
  }

  def scaledEmbeddings(spark: SparkSession, src: String, mult: Int): DataFrame = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val m = 2000L * 1000
    emb.crossJoin(
        spark.range(mult).select(col("id").cast("int").as("_r")))
      .select(
        (col("vec_id") + col("_r") * m).as("vec_id"),
        when(col("_r") === 0, col("embedding"))
          .otherwise(transform(col("embedding"),
            (x, i) => x + (pmod(xxhash64(col("vec_id"), col("_r"), i), lit(1000))
              .cast("double") / 1000.0 - 0.5).cast("float") * 0.05f))
          .as("embedding"),
        col("label"))
  }

  def scaledEvents(spark: SparkSession, src: String, mult: Int): DataFrame = {
    // Tables.load normalizes the generator's two observed ts encodings
    // (INT64 nanos vs TIMESTAMP_NTZ micros) to a session TimestampType
    val ev = graft.Tables.load(spark, src, "events")
    val e = 100000L * 1000
    ev.crossJoin(
        spark.range(mult).select(col("id").cast("int").as("_r")))
      .select(
        (col("event_id") + col("_r") * e).as("event_id"),
        expr("ts + _r * INTERVAL '1' SECOND").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }
}
