package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Layout and skew techniques for the 100 TB regime. These are the knobs a
  * deployment turns when a shuffle key stops being uniform or a join is hot
  * enough to pre-pay its co-location.
  */
object Scale {

  /** Two-phase salted sum+count: spread a skewed grouping key over `salt`
    * sub-keys for the partial aggregate, then combine the partials in a
    * (now uniform) final aggregate. Exact, because sum-of-sums and
    * sum-of-counts are the same algebra the partial computed.
    *
    * Use when one key holds a disproportionate share of rows — the classic
    * hot-key failure where a single reducer runs for hours while the rest
    * of the cluster idles. The salt column derives from physical position
    * (partition id + row id), so a hot key's rows really do spread across
    * `salt` partial groups regardless of their values.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], measure: String,
                     salt: Int = 16): DataFrame =
    df.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_c"), sum(col(measure)).as("_s"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_c").as("cnt"), sum("_s").as("total"))

  /** Q55: keyed sum+count over a HOT key, through the salted two-phase
    * plan. The key is a residue map that collapses ~half the events table
    * onto ONE value (`hot` when event_id is even, else `k<event_id % 97>`)
    * — the classic skew shape where a plain groupBy sends 50% of all rows
    * to a single reducer. saltedSumCount spreads the hot key over 16
    * sub-keys for the partial aggregate (the corpus-sized shuffle is keyed
    * by (hot_key, _salt) — at most 1/16th of the hot key per partition),
    * then combines at most `salt` partial rows per key in the final
    * aggregate. Exact by the algebra (sum-of-sums / sum-of-counts); the
    * measure goes through DECIMAL so partial order can't change the sum,
    * and the oracle is the plain one-phase GROUP BY.
    */
  def q55SkewedHotKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(
        when(col("event_id") % 2 === 0, lit("hot"))
          .otherwise(concat(lit("k"), (col("event_id") % 97).cast("string")))
          .as("hot_key"),
        col("value").cast(DecimalType(18, 4)).as("v"))
    saltedSumCount(ev, Seq("hot_key"), "v", salt = 16)
      .select(col("hot_key"), col("cnt"),
        round(col("total").cast("double"), 4).as("total"))
  }

  /** Bucketed layout: pre-shuffle a table ONCE by its join key so every
    * later equi-join on that key reads co-located buckets and skips the
    * exchange entirely — the pay-once-join-forever trade a 100 TB fact
    * table wants. (bucketBy requires a catalog table, hence saveAsTable.)
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Catalog name for a corpus table's bucketed twin — one twin set per
    * source directory, shared by every consumer. The name carries a hash
    * of the FULL directory path, not just its basename: two corpora that
    * share a basename (/a/sf01 and /b/sf01) must not collide, or the
    * exists-check in ensureBucketed would silently serve the first
    * corpus's data to the second.
    */
  private def bucketTwin(dir: String, table: String): String = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    "b_" + (dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("d") +
      "_" + dirHash + "_" + table).replaceAll("[^A-Za-z0-9_]", "_")
  }

  /** Materialize the bucketed twin once (pay-once); later calls reuse the
    * catalog table. Synchronized: test suites share one session and two
    * concurrent materializations of the same twin would race the
    * warehouse directory. The JVM lock cannot see another PROCESS, so the
    * cross-process window is guarded by an atomically-created sentinel
    * marker next to the twin directory: a second materializer fails
    * LOUDLY instead of racing the orphan-delete/write sequence (and a
    * sentinel left by a crashed process keeps failing loudly until an
    * operator removes it — the conservative choice for a shared
    * warehouse, where "assume the other writer died and barge in" is how
    * two processes end up interleaving file writes under one table).
    */
  def ensureBucketed(spark: SparkSession, dir: String, table: String,
                     cols: Seq[String], key: String, buckets: Int): String =
    ensureBucketedFrame(spark, bucketTwin(dir, table), key, buckets)(
      Tables.load(spark, dir, table).selectExpr(cols: _*))

  /** [[ensureBucketed]] for a DERIVED frame (q94's seen-set, any
    * pre-computed dimension): same sentinel-guarded pay-once
    * materialization, but the caller names the twin and supplies the
    * frame to bucket. `build` is by-name — it only evaluates when the
    * twin is actually missing.
    */
  def ensureBucketedFrame(spark: SparkSession, name: String, key: String,
                          buckets: Int)(build: => DataFrame): String =
    synchronized {
      if (!spark.catalog.tableExists(name)) {
        // Hadoop Path, not java.net.URI: the warehouse conf is usually a
        // PLAIN PATH (possibly with spaces or other URI-illegal chars),
        // which URI.getPath would reject or mangle; Path handles both the
        // plain and the file:-scheme spellings.
        val wh = new java.io.File(new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath)
        wh.mkdirs()
        // File.createNewFile is atomic on the underlying filesystem —
        // exactly one of N racing processes wins the right to build
        val sentinel = new java.io.File(wh, name + ".building")
        if (!sentinel.createNewFile())
          throw new IllegalStateException(
            s"bucketed twin '$name' is being materialized by another " +
              s"process (sentinel ${sentinel.getAbsolutePath} exists); " +
              "wait for that build to finish — or remove the sentinel if " +
              "the process holding it crashed")
        try {
          // a previous SESSION's twin can survive as an orphan warehouse
          // directory the in-memory catalog no longer knows; saveAsTable
          // refuses to claim an existing location, so clear it first.
          // (The bucketing spec lives only in the catalog — re-registering
          // the files as an external table would silently lose it.)
          val orphan = new java.io.File(wh, name)
          if (orphan.exists()) deleteRecursively(orphan)
          writeBucketed(build, name, key, buckets)
        } finally sentinel.delete()
      }
      name
    }

  /** The sentinel file guarding a twin's materialization window — exposed
    * for the stale-sentinel drill in ScaleSpec (and for operators clearing
    * a crashed build by hand).
    */
  private[graft] def twinSentinel(spark: SparkSession, dir: String,
                                  table: String): java.io.File = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath
    new java.io.File(wh, bucketTwin(dir, table) + ".building")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Deterministic global shuffle + fixed-size shard assignment — the
    * "last mile" a training-data pipeline runs after curation: give every
    * document a reproducible pseudo-random global position, then cut the
    * ordering into equal shards (`shard`, `shard_pos`) a downstream
    * loader streams sequentially (GPT/Megatron-style data prep shuffles
    * once at corpus-build time precisely so training never pays a random
    * read). The shuffle key is the q42/q54 salted-md5 primitive, so the
    * order is engine-independent, RNG-free, and independent of every
    * other sampling stage's draw.
    *
    * The scale problem is the RANK: `row_number() OVER (ORDER BY hash)`
    * is a textbook spelling that serializes the entire corpus through ONE
    * task (Spark warns "No Partition Defined for Window operation"). This
    * operator is the two-phase spelling that doesn't:
    *
    *  1. range-bucket by the hash's leading `bucketChars` hex chars —
    *     buckets are PREFIX ranges of the sort key, so bucket order IS
    *     global order and md5 uniformity makes bucket sizes even (no
    *     planted hot key can skew a position-derived... a CONTENT-derived
    *     hash; uniformity is md5's, not the data's);
    *  2. rank within each bucket (`row_number` partitioned by bucket —
    *     the corpus-sized exchange, even by construction);
    *  3. turn per-bucket counts into exclusive running offsets — a frame
    *     of at most 16^bucketChars rows, where a single-partition window
    *     is the RIGHT plan — and broadcast them back so
    *     global_pos = bucket_offset + local_rank.
    *
    * 16^2 = 256 buckets suit local[32]; a 1000-executor deployment raises
    * `bucketChars` to 3-4 (4096/65536 range-partitions) without touching
    * the algebra. Every output column is exact integer arithmetic.
    */
  def shardAssignOn(docs: DataFrame, salt: String = "q80|",
                    shardSize: Long = 128L, bucketChars: Int = 2): DataFrame =
    shardColumns(globalRank(docs, salt, bucketChars), shardSize)

  /** The two-phase rank alone: (doc_id, shuffle_pos) with shuffle_pos a
    * dense 0..n-1 enumeration of the salted-hash order — q80's phase 1-3,
    * exposed so q89's append can offset it before the shard math.
    */
  private[graft] def globalRank(docs: DataFrame, salt: String,
                                bucketChars: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = docs.select(col("doc_id"),
        md5(concat(lit(salt), col("doc_id").cast("string"))).as("_hk"))
      .withColumn("_bucket", substring(col("_hk"), 1, bucketChars))
      // the inner join below infers isnotnull(_bucket) and pushes it into
      // the PROBE side's scan only; planting it here keeps both branches
      // byte-identical below the bucket exchange so ReuseExchange fires
      .filter(col("_bucket").isNotNull)
    val local = h.withColumn("_lr",
      (row_number().over(
        Window.partitionBy("_bucket").orderBy("_hk", "doc_id")) - 1)
        .cast("long"))
    // bucket counts come from the RANKED side (max local rank + 1), not
    // from a second aggregate over `h`: the agg's required distribution
    // (_bucket) is already satisfied by the window exchange, so both the
    // join's probe side and this offsets side hang off ONE shuffle of the
    // corpus (ReuseExchange) instead of scanning + md5-ing it twice
    val offs = local.groupBy("_bucket").agg((max("_lr") + 1).as("_n"))
      .withColumn("_off", coalesce(
        sum("_n").over(Window.orderBy("_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_bucket", "_off")
    local.join(broadcast(offs), "_bucket")
      .select(col("doc_id"), (col("_off") + col("_lr")).as("shuffle_pos"))
  }

  /** Cut a position column into fixed shards. */
  private def shardColumns(ranked: DataFrame, shardSize: Long): DataFrame =
    ranked.select(col("doc_id"), col("shuffle_pos"),
      floor(col("shuffle_pos") / shardSize).cast("long").as("shard"),
      (col("shuffle_pos") % shardSize).as("shard_pos"))

  /** Q89: INCREMENTAL shard append — the corpus-refresh contract for the
    * q80 layout (q74's delta discipline applied to positions): a crawl
    * delta is appended AFTER the already-published layout, never by
    * re-shuffling the lake. Incoming docs get the two-phase rank among
    * THEMSELVES, offset by the history's cardinality (a 1-row
    * broadcast), so every existing (shard, shard_pos) stays EXACTLY
    * where a training run already read it — replay stability is the
    * point. The trade is explicit and documented: appended data
    * concentrates in tail shards rather than interleaving, and a
    * deployment re-shuffles (plain q80 over the union) at epoch
    * boundaries when global mixing matters more than stability.
    */
  def q89ShardAppend(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
    shardAppendOn(docs.filter(col("doc_id") % 5 < 4),
      docs.filter(col("doc_id") % 5 === 4))
  }

  /** Append `incoming`'s layout after `history`'s. */
  def shardAppendOn(history: DataFrame, incoming: DataFrame,
                    salt: String = "q80|", shardSize: Long = 128L,
                    bucketChars: Int = 2): DataFrame = {
    val hn = history.agg(count(lit(1)).as("_hn"))
    shardColumns(
      globalRank(incoming, salt, bucketChars)
        .crossJoin(broadcast(hn))
        .select(col("doc_id"),
          (col("shuffle_pos") + col("_hn")).as("shuffle_pos")),
      shardSize)
  }

  /** Q80: the contract instantiation over `documents` — defaults
    * everywhere; the oracle is the one-task `row_number() OVER (ORDER BY
    * hash, doc_id)` spelling this operator exists to avoid, so the
    * two-phase rank is value-checked against the global truth.
    */
  def q80ShardAssign(spark: SparkSession, dir: String): DataFrame =
    shardAssignOn(Tables.load(spark, dir, "documents").select("doc_id"))

  /** Q52: q11's join-revenue over the bucketed layout — the bench proof
    * that writeBucketed's pay-once trade buys a zero-exchange join. Both
    * fact tables are bucketed 32 ways on the join key (paid once, in the
    * bench's untimed warmup; amortized across every later key-equi-join in
    * a real deployment), so the SortMergeJoin reads co-located buckets and
    * the ONLY shuffle left in the plan is the 5-group priority aggregate —
    * vs q11's two corpus-sized hash exchanges. The merge hint pins the
    * sort-merge strategy: at bench SFs the orders side fits a broadcast
    * (which would hide the exchange question entirely); at 100 TB it does
    * not, and SMJ-over-buckets IS the plan being demonstrated.
    * PlanAuditSpec pins the exchange budget; the q11 oracle pins values.
    */
  def q52JoinRevenueBucketed(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.table(ensureBucketed(spark, dir, "lineitem",
      Seq("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey", 32))
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .as("disc_price"))
    val ord = spark.table(ensureBucketed(spark, dir, "orders",
      Seq("o_orderkey", "o_orderpriority"), "o_orderkey", 32))
    li.hint("merge").join(ord.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("disc_price")).cast("double"), 2).as("revenue"))
  }
}
