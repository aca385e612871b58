package graft.ingest

/** One page of a cursor-paginated pull (reference
  * ingestion/openalex_client.py:48-70: cursor advance at 60-64, max_pages
  * at 66-68).
  */
final case class Page(results: Seq[String], nextCursor: Option[String])

/** What a fetch attempt can yield: a page, or a rate-limit push-back
  * (HTTP 429 + Retry-After in the reference, openalex_client.py:50-53).
  */
sealed trait FetchResult
final case class Got(page: Page) extends FetchResult
final case class RetryAfter(seconds: Int) extends FetchResult

/** Driver-side cursor-paginated source with politeness semantics:
  * a RetryAfter response sleeps then retries the SAME cursor; a successful
  * page is followed by the `interPageSleep` pause before the next fetch
  * (the reference sleeps between every page, not only on 429s); the cursor
  * only advances on a successful page; iteration stops when the cursor is
  * exhausted or `maxPages` is reached.
  *
  * The fetcher is pluggable (tests stub it per FIXTURES.md A6; a live
  * deployment plugs an HTTP client). Records stream lazily — feed them to
  * the engine in chunks (`grouped(batchSize)`) and hand each chunk to
  * `Landing.landBatch`, which is exactly the reference's
  * producer→Firehose→landing loop re-expressed as micro-batches.
  */
final class CursorSource(
    fetch: String => FetchResult,
    startCursor: String = "*",
    maxPages: Option[Int] = None,
    interPageSleep: Int = 0,
    sleeper: Int => Unit = s => Thread.sleep(s * 1000L)) {

  def pages: Iterator[Page] = new Iterator[Page] {
    private var cursor: Option[String] = Some(startCursor)
    private var fetched = 0

    def hasNext: Boolean = cursor.isDefined && maxPages.forall(fetched < _)

    def next(): Page = {
      // politeness pause BEFORE the follow-up fetch, not after the previous
      // one — data already in hand is returned immediately, and a consumer
      // that stops early never pays a sleep for pages it won't request
      if (interPageSleep > 0 && fetched > 0) sleeper(interPageSleep)
      @annotation.tailrec
      def pull(c: String): Page = fetch(c) match {
        case RetryAfter(s) => sleeper(s); pull(c)
        case Got(p) => p
      }
      val p = pull(cursor.getOrElse(throw new NoSuchElementException("cursor exhausted")))
      fetched += 1
      cursor = p.nextCursor
      p
    }
  }

  /** Lazily yields one raw record per element, in page order. */
  def records: Iterator[String] = pages.flatMap(_.results)
}

object CursorSource {
  /** Config-driven construction: page cap and inter-page politeness come
    * from the validated settings object.
    */
  def fromConfig(fetch: String => FetchResult, cfg: IngestConfig): CursorSource =
    new CursorSource(fetch, maxPages = cfg.maxPages,
      interPageSleep = cfg.sleepSeconds)

  /** For fetchers that honor a page-size parameter (the reference passes
    * per_page on every request): cfg.perPage is partially applied so the
    * validated knob actually reaches the HTTP layer.
    */
  def fromConfig(fetch: (String, Int) => FetchResult, cfg: IngestConfig): CursorSource =
    fromConfig(c => fetch(c, cfg.perPage), cfg)
}
