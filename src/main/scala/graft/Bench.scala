package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every contract query executed for real (written to
  * the `noop` sink, which drives the full physical plan — a bare `.count()`
  * on a pure projection would collapse to parquet footer metadata).
  *
  * Timing discipline: one untimed warmup execution (JIT, code cache, parquet
  * footer cache) followed by three timed executions per query; the headline
  * per-query number is the MEDIAN of the three, with {min,median,max}
  * recorded alongside and the machine's load average sampled before and
  * after the run. A single un-warmed measurement is hostage to co-tenant
  * load — round 2 recorded one query at 14× its true cost that way.
  *
  * Failures are never swallowed into a timing: a query that throws is
  * recorded in `failed` with its error, excluded from per-query seconds,
  * and the run exits non-zero so a broken query can't masquerade as fast.
  */
object Bench {
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore = loadAvg
    var failed = Vector.empty[(String, String)]
    // name -> (min, median, max) over `reps` timed runs after one warmup
    // SPARK_GRAFT_BENCH_ONLY=q37_dedup_clusters,q40_embed_neardup narrows
    // the run for targeted iteration; unset = full contract sweep
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def measure(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Option[(Double, Double, Double)] = {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once() // warmup — untimed
        // drain garbage accumulated by PREVIOUS queries before timing:
        // a stop-the-world collection of the whole sweep's driver-side
        // plans otherwise lands inside one random rep — measured as a
        // reproducible 4-7x max/min outlier on q37, the query with the
        // most driver jobs (iterative), and none when run alone
        System.gc()
        val times = Vector.fill(reps)(once()).sorted
        Some((times.head, times(times.size / 2), times.last))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed :+= (name -> String.valueOf(e.getMessage).take(200))
          None
      }
    }
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val resultsMap = scala.collection.mutable.LinkedHashMap.empty[
      String, (Double, Double, Double)]
    sweep.foreach { case (name, fn) =>
      measure(name, fn).foreach(resultsMap(name) = _)
    }
    // Variance guard with retry: a max/min spread over the threshold means
    // the median was measured under unstable load (a co-tenant burst, one
    // STW pause). That is usually TRANSIENT — so re-measure just the
    // violating queries (fresh warmup + reps) up to twice before refusing
    // to publish; rounds 4/5 shipped no official bench because a one-shot
    // guard turned a recoverable blip into rc!=0.
    val varThreshold = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXVAR", "3.0").toDouble
    def violations: Seq[(String, Double)] = resultsMap.toSeq.collect {
      case (k, (mn, _, mx)) if mx / math.max(mn, 1e-9) > varThreshold =>
        k -> mx / math.max(mn, 1e-9)
    }
    var retries = 0
    while (violations.nonEmpty && retries < 2) {
      retries += 1
      violations.foreach { case (k, r) =>
        System.err.println(
          f"[bench] variance retry $retries: $k max/min = $r%.2fx > ${varThreshold}x")
      }
      val toRetry = violations.map(_._1).toSet
      sweep.filter { case (name, _) => toRetry.contains(name) }
        .foreach { case (name, fn) =>
          measure(name, fn).foreach(resultsMap(name) = _)
        }
    }
    val results: Seq[(String, (Double, Double, Double))] = resultsMap.toSeq
    // streaming SLO analog (BASELINE.md: p50 <= 20s / p95 <= 60s rolling):
    // push envelopes through the real source->producer->landing->curated
    // path on wall-clock time and read the KPI percentiles back.
    val slo: String = if (only.nonEmpty) "null" else try {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("bench_slo").toString
      val in = s"$base/in"; new java.io.File(in).mkdirs()
      val n = 500
      var put = 0
      ingest.Producer.run(spark,
        Iterator.tabulate(n)(i => s"""{"id":"W$i","title":"T$i"}"""),
        batchSize = 100,
        sink = df => {
          put += 1
          // driver-side collect is fine ONLY here: a fixed 500-event harness
          // emulating the reference's single-threaded producer. Never copy
          // this pattern into a query path.
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$in/put$put.ndjson"),
            df.as[String].collect().mkString("\n").getBytes("UTF-8"))
        })
      val q = streaming.Landing.landStream(spark, in, s"$base/landing", s"$base/ckpt")
      val finished = q.awaitTermination(120000)
      if (!finished) {
        q.stop()
        // a partial landing would yield plausible-looking but WRONG
        // percentiles — fail the measurement instead
        throw new RuntimeException("landing query did not finish within 120s")
      }
      Bootstrap.initLanding(spark, s"$base/landing")
      val kpi = spark.sql(
        "SELECT p50_sec_5m, p95_sec_5m, samples_5m FROM vw_latency").head()
      s"""{"p50_sec":${kpi.get(0)},"p95_sec":${kpi.get(1)},"events":${kpi.get(2)}}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] streaming SLO measurement failed: ${e.getMessage}")
        failed :+= ("streaming_slo" -> String.valueOf(e.getMessage).take(200))
        "null"
    }
    val loadAfter = loadAvg
    def f(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (_, med, _)) => "\"" + k + "\":" + f(med) }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, (mn, med, mx)) =>
      "\"" + k + "\":{\"min\":" + f(mn) + ",\"median\":" + f(med) + ",\"max\":" + f(mx) + "}"
    }.mkString("{", ",", "}")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ")
    val failedJson = failed.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._2).sum
    // Violations that SURVIVED the retries: the spread is persistent
    // (sustained co-tenant load or a nondeterministic plan), so the run
    // still fails loudly rather than publishing a number the next round
    // would regress against.
    val varViolations = violations
    val guardJson = varViolations.map { case (k, r) => "\"" + k + "\":" + f(r) }
      .mkString(
        s"""{"threshold":$varThreshold,"retries":$retries,"violations":{""",
        ",", "}}")
    varViolations.foreach { case (k, r) =>
      System.err.println(
        f"[bench] VARIANCE GUARD (after $retries retries): $k max/min = $r%.2fx > ${varThreshold}x")
    }
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"detail":$detail,"reps":$reps,"load_avg":{"before":$loadBefore,"after":$loadAfter},"failed":$failedJson,"variance_guard":$guardJson,"streaming_slo":$slo,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
    if (varViolations.nonEmpty) sys.exit(3)
  }
}
