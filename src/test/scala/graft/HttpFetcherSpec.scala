package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CursorSource, Got, HttpFetcher, IngestConfig, RetryAfter}

/** Wire-level test of the live HTTP fetcher against a local stub server:
  * pins the User-Agent (mailto consumed), the per_page/mailto/cursor query
  * params, cursor URL-encoding, 429 Retry-After pass-through (same cursor
  * retried), pagination to exhaustion, and non-2xx failure.
  */
class HttpFetcherSpec extends AnyFunSuite {

  private case class Req(query: String, userAgent: String)

  /** Serves the scripted responses in order; records every request. */
  private def withServer(script: Seq[(Int, Map[String, String], String)])(
      body: (String, () => Seq[Req]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Req]
    var i = 0
    server.createContext("/api/works", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        seen.synchronized {
          seen += Req(ex.getRequestURI.getRawQuery,
            ex.getRequestHeaders.getFirst("User-Agent"))
        }
        val (code, headers, payload) = script(math.min(i, script.size - 1))
        i += 1
        headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api",
      () => seen.synchronized(seen.toSeq))
    finally server.stop(0)
  }

  private val cfg = IngestConfig(source = "openalex", mailto = "dev@example.com",
    perPage = 2, sleepSeconds = 0)

  test("full pull: UA + params on the wire, 429 retries same cursor, cursor encoded, stops at exhaustion") {
    val script = Seq(
      (429, Map("Retry-After" -> "1"), ""),
      (200, Map.empty[String, String],
        """{"results":[{"id":"W1"},{"id":"W2"}],"meta":{"next_cursor":"C+2"}}"""),
      (200, Map.empty[String, String],
        """{"results":[{"id":"W3"}],"meta":{"next_cursor":null}}"""))
    withServer(script) { (base, reqs) =>
      val f = HttpFetcher.fromConfig(base, cfg)
      var slept = Vector.empty[Int]
      val src = new CursorSource(f.fetch _, maxPages = cfg.maxPages,
        interPageSleep = cfg.sleepSeconds, sleeper = s => slept :+= s)
      val records = src.records.toVector

      assert(records ===
        Vector("""{"id":"W1"}""", """{"id":"W2"}""", """{"id":"W3"}"""))
      assert(slept === Vector(1)) // the 429's Retry-After, honored by the caller

      val rs = reqs()
      assert(rs.size === 3)
      // mailto consumed in BOTH places the reference uses it
      assert(rs.forall(_.userAgent === "graft/0.1 (+mailto:dev@example.com)"))
      assert(rs.forall(_.query.contains("per_page=2")))
      assert(rs.forall(_.query.contains("mailto=dev%40example.com")))
      // the 429'd cursor is retried verbatim; the next cursor is URL-encoded
      assert(rs(0).query.contains("cursor=*"))
      assert(rs(1).query.contains("cursor=*"))
      assert(rs(2).query.contains("cursor=C%2B2"))
    }
  }

  test("missing Retry-After falls back to 2s; bad Retry-After too") {
    withServer(Seq((429, Map.empty[String, String], ""))) { (base, _) =>
      assert(HttpFetcher.fromConfig(base, cfg).fetch("*") === RetryAfter(2))
    }
    withServer(Seq((429, Map("Retry-After" -> "soon"), ""))) { (base, _) =>
      assert(HttpFetcher.fromConfig(base, cfg).fetch("*") === RetryAfter(2))
    }
  }

  test("non-2xx non-429 is fatal (raise_for_status analog)") {
    withServer(Seq((500, Map.empty[String, String], "boom"))) { (base, _) =>
      val e = intercept[java.io.IOException] {
        HttpFetcher.fromConfig(base, cfg).fetch("*")
      }
      assert(e.getMessage.contains("HTTP 500"))
    }
  }

  test("empty results and absent meta terminate cleanly") {
    withServer(Seq((200, Map.empty[String, String], """{"results":[]}"""))) { (base, _) =>
      val Got(page) = HttpFetcher.fromConfig(base, cfg).fetch("*"): @unchecked
      assert(page.results.isEmpty && page.nextCursor.isEmpty)
    }
  }

  test("fetcher requires a contact email, like the reference client") {
    val e = intercept[IllegalArgumentException] {
      new HttpFetcher("http://x", mailto = "not-an-email", perPage = 1)
    }
    assert(e.getMessage.contains("mailto"))
  }
}
