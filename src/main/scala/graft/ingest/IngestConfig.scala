package graft.ingest

/** Ingestion settings with environment-backed construction (reference
  * ingestion/config.py:10-29): required keys must be present, numeric
  * knobs have validated defaults, and a bad value fails fast at startup —
  * not at first use three stages into the pipeline.
  */
final case class IngestConfig(
    source: String,
    mailto: String,
    batchSize: Int = 50,
    perPage: Int = 50,
    sleepSeconds: Int = 2,
    maxPages: Option[Int] = None) {
  require(source.nonEmpty, "source must not be empty")
  require(mailto.contains("@"), s"mailto must be an email address, got '$mailto'")
  require(batchSize > 0 && batchSize <= Producer.MaxPut,
    s"batchSize must be in 1..${Producer.MaxPut}, got $batchSize")
  require(perPage > 0 && perPage <= 200, s"perPage must be in 1..200, got $perPage")
  require(sleepSeconds >= 0, s"sleepSeconds must be >= 0, got $sleepSeconds")
  maxPages.foreach(m =>
    require(m > 0, s"maxPages must be positive when set, got $m"))
}

object IngestConfig {
  /** Build from an environment map. Missing required keys and unparseable
    * numbers raise with the offending key named.
    */
  def fromEnv(env: Map[String, String]): IngestConfig = {
    def required(k: String): String =
      env.getOrElse(k, throw new IllegalArgumentException(s"missing required env: $k"))
    def intOr(k: String, default: Int): Int =
      env.get(k).map(v => v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"env $k must be an int, got '$v'"))).getOrElse(default)
    IngestConfig(
      source = required("GRAFT_SOURCE"),
      mailto = required("GRAFT_MAILTO"),
      batchSize = intOr("GRAFT_BATCH_SIZE", 50),
      perPage = intOr("GRAFT_PER_PAGE", 50),
      sleepSeconds = intOr("GRAFT_SLEEP_SECONDS", 2),
      maxPages = env.get("GRAFT_MAX_PAGES").map(v => v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"env GRAFT_MAX_PAGES must be an int, got '$v'"))))
  }
}
