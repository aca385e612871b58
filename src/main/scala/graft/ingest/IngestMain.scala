package graft.ingest

import org.apache.spark.sql.SparkSession
import graft.streaming.Landing

/** The ingestion composition root — the analog of running the reference as
  * `python -m ingestion.producer` (reference ingestion/producer.py:31-49,
  * 171-173): validated env settings, CLI flags layered on top, and the
  * tested parts wired end-to-end:
  *
  *   HttpFetcher (or the offline stub) -> CursorSource -> Producer
  *     -> Landing.landBatch (parquet landing + DLQ)
  *
  * Flags mirror the reference's typer options; engine-specific additions
  * are --base-url / --landing-dir / --dlq-dir (the reference outsources
  * those to Firehose config) and --stub-pages, which swaps the HTTP edge
  * for a deterministic in-memory fetcher so the full path can run with
  * zero network (the test/demo mode; reference dry-run only counts).
  * A leading literal `run` argument is accepted and ignored, like the
  * reference's legacy `producer run ...` alias (producer.py:163-168).
  */
object IngestMain {

  final case class Options(
      baseUrl: Option[String] = None,
      perPage: Option[Int] = None,
      updatedSince: Option[String] = None,
      maxPages: Option[Int] = None,
      batchSize: Option[Int] = None,
      batchSleep: Option[Int] = None,
      dryRun: Boolean = false,
      landingDir: Option[String] = None,
      dlqDir: Option[String] = None,
      stubPages: Option[Int] = None)

  def usage: String =
    """usage: graft.ingest.IngestMain [run] [flags]
      |  --base-url URL       API root (or env GRAFT_BASE_URL); required unless --stub-pages
      |  --per-page N         page size (default env GRAFT_PER_PAGE or 50)
      |  --updated-since D    only works updated since YYYY-MM-DD
      |  --max-pages N        stop after N pages (default env GRAFT_MAX_PAGES)
      |  --batch-size N       landing batch size <= 500 (default env GRAFT_BATCH_SIZE or 50)
      |  --batch-sleep N      seconds between page fetches (default env GRAFT_SLEEP_SECONDS or 2)
      |  --landing-dir DIR    parquet landing root (required unless --dry-run)
      |  --dlq-dir DIR        dead-letter parquet root (optional)
      |  --stub-pages N       no-network mode: N deterministic synthetic pages
      |  --dry-run            pull + count only, skip the landing write
      |env (validated at startup): GRAFT_SOURCE, GRAFT_MAILTO required.""".stripMargin

  /** Pure flag parser — throws IllegalArgumentException with the offending
    * token so startup fails loudly, like the env validation.
    */
  def parse(args: Seq[String]): Options = {
    def int(k: String, v: String): Int = v.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"$k must be an int, got '$v'"))
    @annotation.tailrec
    def go(rest: List[String], o: Options): Options = rest match {
      case Nil => o
      case "run" :: t if o == Options() => go(t, o) // legacy alias, first token only
      case "--base-url" :: v :: t => go(t, o.copy(baseUrl = Some(v)))
      case "--per-page" :: v :: t => go(t, o.copy(perPage = Some(int("--per-page", v))))
      case "--updated-since" :: v :: t => go(t, o.copy(updatedSince = Some(v)))
      case "--max-pages" :: v :: t => go(t, o.copy(maxPages = Some(int("--max-pages", v))))
      case "--batch-size" :: v :: t => go(t, o.copy(batchSize = Some(int("--batch-size", v))))
      case "--batch-sleep" :: v :: t => go(t, o.copy(batchSleep = Some(int("--batch-sleep", v))))
      case "--landing-dir" :: v :: t => go(t, o.copy(landingDir = Some(v)))
      case "--dlq-dir" :: v :: t => go(t, o.copy(dlqDir = Some(v)))
      case "--stub-pages" :: v :: t => go(t, o.copy(stubPages = Some(int("--stub-pages", v))))
      case "--dry-run" :: t => go(t, o.copy(dryRun = true))
      case bad :: _ => throw new IllegalArgumentException(s"unknown flag: $bad\n$usage")
    }
    go(args.toList, Options())
  }

  /** CLI flags override the validated env settings (the reference's typer
    * options shadow Settings the same way, producer.py:50-60); the result
    * re-validates through the case-class invariants.
    */
  def effectiveConfig(base: IngestConfig, o: Options): IngestConfig =
    base.copy(
      perPage = o.perPage.getOrElse(base.perPage),
      batchSize = o.batchSize.getOrElse(base.batchSize),
      sleepSeconds = o.batchSleep.getOrElse(base.sleepSeconds),
      maxPages = o.maxPages.orElse(base.maxPages))

  /** Deterministic offline fetcher: `pages` pages of `perPage` synthetic
    * works each, cursor-chained exactly like the live endpoint so the
    * whole CursorSource/Producer/Landing path is exercised bit-for-bit.
    */
  def stubFetch(perPage: Int, pages: Int)(cursor: String): FetchResult = {
    val pageNo = if (cursor == "*") 0 else cursor.stripPrefix("c").toInt
    val start = pageNo * perPage
    val results = (start until start + perPage).map(i =>
      s"""{"id":"W$i","title":"Stub work $i","publication_year":2024}""")
    val next = if (pageNo + 1 < pages) Some(s"c${pageNo + 1}") else None
    Got(Page(results, next))
  }

  /** The wired pipeline, session-injected for tests. Returns the producer
    * totals (sent/failed/batches).
    */
  def run(spark: SparkSession, cfg: IngestConfig, o: Options): Producer.Totals = {
    val fetch: String => FetchResult = o.stubPages match {
      case Some(n) => stubFetch(cfg.perPage, n)
      case None =>
        val base = o.baseUrl.orElse(sys.env.get("GRAFT_BASE_URL")).getOrElse(
          throw new IllegalArgumentException(
            "--base-url (or GRAFT_BASE_URL) is required unless --stub-pages is set"))
        new HttpFetcher(base, cfg.mailto, cfg.perPage,
          updatedSince = o.updatedSince).fetch _
    }
    val source = CursorSource.fromConfig(fetch, cfg)
    val sink: org.apache.spark.sql.DataFrame => Unit =
      if (o.dryRun) _ => ()
      else {
        val landing = o.landingDir.getOrElse(throw new IllegalArgumentException(
          "--landing-dir is required unless --dry-run"))
        wired => Landing.landBatch(wired, landing, o.dlqDir)
      }
    Producer.run(spark, source.records, cfg.batchSize, sink,
      source = cfg.source, dryRun = o.dryRun)
  }

  def main(args: Array[String]): Unit = {
    val o = parse(args.toSeq)
    val cfg = effectiveConfig(IngestConfig.fromEnv(sys.env), o)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ingest")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sys.exit does not unwind a finally block — compute the code first,
    // stop the session, THEN exit, so cleanup runs on the failure path too.
    val code =
      try {
        val t = run(spark, cfg, o)
        println(s"[ingest] sent=${t.sent} failed=${t.failed} batches=${t.batches}" +
          (if (o.dryRun) " (dry-run)" else ""))
        if (t.failed > 0) 2 else 0
      } finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
