package graft.ingest

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** Live HTTP implementation of the pluggable fetch function (reference
  * ingestion/openalex_client.py:22-70): GET `{base}/works` with `per_page`,
  * `mailto` and `cursor` query params, a `mailto`-bearing User-Agent
  * (headers_template, openalex_client.py:9-10), HTTP 429 surfaced as
  * `RetryAfter(Retry-After, default 2)` so the caller retries the SAME
  * cursor (openalex_client.py:50-53), and any other non-2xx fatal
  * (raise_for_status, openalex_client.py:54).
  *
  * Sleeping lives in the caller (`CursorSource` / the DSv2 admission
  * control), not here — the fetcher only reports the push-back, which is
  * what lets the streaming source account the wait instead of blocking a
  * fetch thread blindly.
  *
  * The response page is returned as raw per-record JSON strings: parsing
  * into the typed envelope happens in the Spark plane (`Envelope.parseWorks`
  * with a permissive schema), keeping the HTTP edge schema-agnostic exactly
  * like the reference, which yields untyped dicts.
  */
final class HttpFetcher(
    baseUrl: String,
    mailto: String,
    perPage: Int,
    updatedSince: Option[String] = None,
    extraParams: Seq[(String, String)] = Nil,
    client: HttpClient = HttpFetcher.defaultClient) {

  require(mailto.contains("@"),
    s"a contact email (mailto) is required for polite API access, got '$mailto'")
  require(perPage > 0, s"perPage must be positive, got $perPage")

  private val mapper = new ObjectMapper
  private val endpoint = baseUrl.stripSuffix("/") + "/works"

  /** Pinned by HttpFetcherSpec against the wire (reference
    * openalex_client.py:9-10 sends "ScholarStream/0.1 (+mailto:...)").
    */
  def userAgent: String = s"graft/0.1 (+mailto:$mailto)"

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** One page fetch; plugs into `CursorSource` and
    * `sources.CursorPagedSource.register` unchanged.
    */
  def fetch(cursor: String): FetchResult = {
    val params =
      Seq("per_page" -> perPage.toString, "mailto" -> mailto, "cursor" -> cursor) ++
        updatedSince.map("from_updated_date" -> _) ++ extraParams
    val qs = params.map { case (k, v) => enc(k) + "=" + enc(v) }.mkString("&")
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint?$qs"))
      .timeout(Duration.ofSeconds(HttpFetcher.RequestTimeoutSeconds))
      .header("User-Agent", userAgent)
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 429 =>
        val after = resp.headers().firstValue("Retry-After")
          .map[Option[Int]](v => v.toIntOption).orElse(None)
          .getOrElse(HttpFetcher.DefaultRetryAfterSeconds)
        RetryAfter(after)
      case ok if ok >= 200 && ok < 300 =>
        val root = mapper.readTree(resp.body())
        val arr = root.path("results")
        val results = (0 until arr.size()).map(i => mapper.writeValueAsString(arr.get(i)))
        val nextNode = root.path("meta").path("next_cursor")
        val next = if (nextNode.isTextual && nextNode.asText.nonEmpty) Some(nextNode.asText) else None
        Got(Page(results, next))
      case bad =>
        throw new java.io.IOException(
          s"GET $endpoint returned HTTP $bad: ${resp.body().take(200)}")
    }
  }
}

object HttpFetcher {
  val RequestTimeoutSeconds = 30L // reference DEFAULT_TIMEOUT, openalex_client.py:6
  val DefaultRetryAfterSeconds = 2 // reference's Retry-After fallback, openalex_client.py:51

  lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(RequestTimeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** Config-driven construction: `cfg.mailto` and `cfg.perPage` reach the
    * wire (UA + query params). Pair with `CursorSource.fromConfig(f.fetch _, cfg)`
    * for the page cap / politeness sleeps.
    */
  def fromConfig(baseUrl: String, cfg: IngestConfig,
                 client: HttpClient = defaultClient): HttpFetcher =
    new HttpFetcher(baseUrl, cfg.mailto, cfg.perPage, client = client)
}
