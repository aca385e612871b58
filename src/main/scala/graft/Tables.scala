package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * One parquet file per table; vectorized scan, column pruning and filter
  * pushdown come from Spark's built-in parquet source — every query should
  * show `PushedFilters`/pruned `ReadSchema` in `.explain("formatted")`.
  *
  * At 100 TB these would be partitioned/bucketed lake tables; the loaders
  * keep the access path behind one function so the physical layout can
  * change without touching operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan-parallelism floor for the KERNEL-PIPELINE tables (guide §2.5
    * "input skew: one huge unsplittable file", §6 `minPartitionNum`):
    * `documents`/`embeddings` feed per-row CPU (hash/codec/pixel kernels,
    * shingle md5s, vector math), and a scan with fewer partitions than the
    * cluster has cores serializes ALL of it — measured at sf0.1: every
    * corpus table is ONE single-row-group file, so the q35 minhash stage
    * ran its full 2.2 s of md5 work on one of 32 cores (q102: 5.9 s, q73:
    * ~4 s, profiled in OPTIMIZATION_r18.md). A single row group cannot be
    * range-split (`spark.sql.files.maxPartitionBytes` / `minPartitionNum`
    * assign byte ranges, but the one task holding the row-group midpoint
    * reads everything), so the floor must be a repartition after the read.
    *
    * Scale-adaptive, not local-tuned: the spread fires ONLY when the
    * scan's estimated split count cannot fill `defaultParallelism` — at
    * lake scale these tables are thousands of splits and the plan is
    * byte-identical to before; on any cluster it is the generic "file
    * layout under-parallelizes the machine" repair. Deterministic hash
    * partitioning on the table's primary key (never round-robin: no
    * sort-before-repartition pass, and re-run tasks reproduce the exact
    * assignment, SPARK-38388). Conf: `spark.graft.scan.spread=off`
    * disables; `spark.graft.scan.spreadMinBytes` (default 512 KiB) keeps
    * broadcast-bound dims out.
    */
  private val SpreadKeys = Map("documents" -> "doc_id", "embeddings" -> "vec_id")

  private def spread(spark: SparkSession, dir: String, name: String,
                     df: DataFrame): DataFrame =
    SpreadKeys.get(name) match {
      case Some(key) if !spark.conf.get("spark.graft.scan.spread", "auto")
          .equalsIgnoreCase("off") =>
        val target = spark.sparkContext.defaultParallelism
        // env fallback so harness mains (Verify) can force the spread at
        // tiny SFs for an oracle equivalence run without a code change
        val floor = spark.conf.get("spark.graft.scan.spreadMinBytes",
          sys.env.getOrElse("SPARK_GRAFT_SPREAD_MIN",
            (512L * 1024).toString)).toLong
        val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
          .takeWhile(_.isDigit) match { case "" => 134217728L; case s => s.toLong }
        // NonFatal only (ADVICE r18): a Throwable catch would swallow
        // OutOfMemoryError/InterruptedException into "spread skipped"
        val len = try {
          val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(p).getLen
        } catch { case scala.util.control.NonFatal(_) => 0L }
        val estSplits = math.max(1L, (len + maxSplit - 1) / maxSplit)
        // DETACHED deterministic spread key (xxhash64 of the primary key,
        // not the key itself): partitioning by the raw key would SATISFY a
        // downstream groupBy(key)'s required distribution and delete that
        // aggregation's exchange — which is exactly the exchange identical
        // self-join sides reuse (measured on q35: key-aligned spread made
        // both band-join sides recompute the whole minhash pipeline,
        // 28 s + 19 s of task time where the baseline computed it once).
        // A detached key keeps every downstream exchange (and its reuse
        // semantics) byte-identical to the unspread plan.
        if (len >= floor && estSplits < target)
          df.repartition(target, xxhash64(col(key)))
        else df
      case _ => df
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loadRaw(spark, dir, name)

  /** Opt-in spread variant — callers whose downstream is ONE heavy
    * narrow pass (kernel decode, shingle hashing) opt in; iterative
    * trainers (every driver action would re-execute the exchange),
    * multi-branch consumers, and cheap aggregations must not (measured
    * regressions, OPTIMIZATION_r18.md).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spread(spark, dir, name, loadRaw(spark, dir, name))

  private def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The corpus generator has stored events.ts two ways across driver
      // versions: INT64 TIMESTAMP(NANOS) — which Spark 4 rejects outright
      // (PARQUET_TYPE_ILLEGAL) unless read as raw nanos via the legacy
      // conf — and plain TIMESTAMP(MICROS) without a timezone, which reads
      // as TIMESTAMP_NTZ. Normalize BOTH to a session-tz TimestampType
      // column here so every consumer (and the DuckDB oracle, which reads
      // the same naive values) sees identical semantics regardless of
      // which generator produced the files. Runtime-settable SQLConf, so
      // the fix lives in the loader regardless of who built the session.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-int64 corpus
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // micros corpus: NTZ → session-tz timestamp (UTC session)
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  private val RegisteredDirKey = "spark.graft.tables.registeredDir"

  /** Register every corpus table as a temp view.
    *
    * Idempotent AND cheap: a second call for the same dir is a no-op (no
    * parquet footer re-reads — queries that call this defensively, q16/q34,
    * were paying a footer read per invocation). Switching dirs re-registers.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val already = spark.conf.getOption(RegisteredDirKey).contains(dir) &&
      names.forall(spark.catalog.tableExists)
    if (!already) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(RegisteredDirKey, dir)
    }
  }

  /** Deterministic "now" for contract queries — replaces CURRENT_TIMESTAMP
    * per SURVEY.md §4.4 (reference uses wall-clock at
    * sql/04_views_curated.sql:23,54-60; we inject the anchor instead).
    */
  val Anchor = "2024-02-01 00:00:00"
}
