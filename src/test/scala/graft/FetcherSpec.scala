package graft

import java.time.Instant
import scala.collection.mutable

import graft.sources._

/** In-memory HTTP transport scripted with url → reply. */
final class FakeTransport(pages: Map[String, HttpReply]) extends HttpTransport {
  val requests: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
  def get(url: String, headers: Map[String, String]): HttpReply = {
    requests += url
    pages.getOrElse(url, throw new RuntimeException(s"connection refused: $url"))
  }
  def post(url: String, body: String, headers: Map[String, String]): HttpReply =
    throw new UnsupportedOperationException
}

/** Mirrors the reference's fetcher suite
  * (pkg/fetchers/cf_audit_event_fetcher_test.go): pagination order,
  * pushdown query string, channel close, error on network failure and on
  * any non-200 (even 201). */
class FetcherSpec extends SparkSpec {

  private val api = "https://cf.example.com"

  private def pageBody(guids: Seq[String], next: String): String = {
    val resources = guids.map { g =>
      s"""{"metadata":{"guid":"$g","created_at":"2019-10-04T12:41:00Z"},
         |"entity":{"type":"audit.app.update","actor":"a","actor_type":"at",
         |"actor_name":"an","actor_username":"au","actee":"e","actee_type":"et",
         |"actee_name":"en","organization_guid":"og","space_guid":"sg","metadata":{"k":1}}}""".stripMargin
    }.mkString(",")
    s"""{"total_results":${guids.size},"total_pages":1,"next_url":"$next","resources":[$resources]}"""
  }

  private val since = Instant.parse("2019-10-04T12:40:43Z")

  it("builds the exact pushdown start URL (fetcher_test.go:90-91)") {
    val f = new CfAuditEventFetcher(new FakeTransport(Map.empty), api, paginationWaitMillis = 0)
    f.startPageUrl(since) shouldBe "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"
  }

  it("walks pages in order, flattening the metadata envelope (S3), and stops at empty next_url") {
    val p1 = "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"
    val p2 = "/v2/events?page=2"
    val transport = new FakeTransport(Map(
      api + p1 -> HttpReply(200, pageBody(Seq("g1", "g2"), p2)),
      api + p2 -> HttpReply(200, pageBody(Seq("g3"), ""))))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0)
    val pages = f.fetchPages(since).toSeq
    pages.map(_.error) shouldBe Seq(None, None)
    pages.map(_.events.map(_.guid)) shouldBe Seq(Seq("g1", "g2"), Seq("g3"))
    pages.head.events.head.created_at shouldBe "2019-10-04T12:41:00Z"
    pages.head.events.head.event_type shouldBe "audit.app.update"
    pages.head.events.head.metadata shouldBe """{"k":1}"""
    transport.requests.toSeq shouldBe Seq(api + p1, api + p2)
  }

  it("malformed JSON bodies become a terminal error page") {
    val p1 = "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"
    val transport = new FakeTransport(Map(api + p1 -> HttpReply(200, "{not json")))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0)
    val pages = f.fetchPages(since).toSeq
    pages.size shouldBe 1
    pages.head.error.isDefined shouldBe true
  }

  it("propagates network errors as a terminal page (fetcher_test.go:124-161)") {
    val f = new CfAuditEventFetcher(new FakeTransport(Map.empty), api, paginationWaitMillis = 0)
    val pages = f.fetchPages(since).toSeq
    pages.size shouldBe 1
    pages.head.error.get.getMessage should include("connection refused")
  }

  it("async prefetch preserves page order and terminal close (ST3)") {
    val p1 = "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"
    val p2 = "/v2/events?page=2"
    val transport = new FakeTransport(Map(
      api + p1 -> HttpReply(200, pageBody(Seq("g1"), p2)),
      api + p2 -> HttpReply(200, pageBody(Seq("g2"), ""))))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0)
    val pages = f.fetchPagesAsync(since, bufferPages = 2).toSeq
    pages.map(_.events.map(_.guid)) shouldBe Seq(Seq("g1"), Seq("g2"))
  }

  it("treats any non-200 — even 201 — as an error (fetcher.go:66-68)") {
    val p1 = "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"
    val transport = new FakeTransport(Map(api + p1 -> HttpReply(201, "{}")))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0)
    val pages = f.fetchPages(since).toSeq
    pages.head.error.get.getMessage should include("status code 201")
  }
}
