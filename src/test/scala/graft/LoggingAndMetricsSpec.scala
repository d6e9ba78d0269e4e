package graft

import java.time.Instant
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import graft.logging.Lager
import graft.metrics.{MetricsRegistry, MetricsServer}
import graft.sources.{CfAuditEventFetcher, HttpReply}

/** Structured-logging shape (lager-style JSON lines with session-scoped
  * message names, fetcher.go:36-52) and the /metrics exposition including
  * the default JVM/process gauges (README.md:59). */
class LoggingAndMetricsSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val api = "https://cf.example.com"
  private val since = Instant.parse("2019-10-04T12:40:43Z")
  private val p1 = "/v2/events?q=timestamp%3E2019-10-04T12%3A40%3A43Z&results-per-page=100"

  private def body(guids: Seq[String], next: String): String = {
    val rs = guids.map(g =>
      s"""{"metadata":{"guid":"$g","created_at":"2019-10-04T12:41:00Z"},
         |"entity":{"type":"t","actor":"a","actor_type":"t","actor_name":"n",
         |"actor_username":"u","actee":"e","actee_type":"t","actee_name":"n",
         |"organization_guid":"","space_guid":"s","metadata":{}}}""".stripMargin).mkString(",")
    s"""{"total_results":${guids.size},"total_pages":1,"next_url":"$next","resources":[$rs]}"""
  }

  it("fetcher emits lager-shaped JSON lines: fetching, then fetched.page.ok per page") {
    val lines = mutable.ArrayBuffer.empty[String]
    val transport = new FakeTransport(Map(
      api + p1 -> HttpReply(200, body(Seq("g1", "g2"), "/v2/events?page=2")),
      api + "/v2/events?page=2" -> HttpReply(200, body(Seq("g3"), ""))))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0,
      logger = Lager.to("paasauditorspark", lines += _).session("cf-audit-event-fetcher"))
    f.fetchPages(since).toSeq
    val parsed = lines.map(mapper.readTree(_))
    parsed.map(_.get("message").asText()) shouldBe Seq(
      "paasauditorspark.cf-audit-event-fetcher.fetching",
      "paasauditorspark.cf-audit-event-fetcher.fetched.page.ok",
      "paasauditorspark.cf-audit-event-fetcher.fetched.page.ok")
    parsed.foreach(_.get("source").asText() shouldBe "paasauditorspark")
    parsed.foreach(_.get("log_level").asInt() shouldBe 1)
    // session context + per-page data ride in "data"
    parsed.head.get("data").get("start_page_url").asText() shouldBe p1
    parsed(1).get("data").get("event_count").asInt() shouldBe 2
    parsed(1).get("data").get("page_url").asText() shouldBe p1
    parsed(2).get("data").get("event_count").asInt() shouldBe 1
  }

  it("fetch failures log fetched.page.error at error level with the cause") {
    val lines = mutable.ArrayBuffer.empty[String]
    val transport = new FakeTransport(Map(api + p1 -> HttpReply(500, "boom")))
    val f = new CfAuditEventFetcher(transport, api, paginationWaitMillis = 0,
      logger = Lager.to("src", lines += _))
    f.fetchPages(since).toSeq
    val err = lines.map(mapper.readTree(_)).find(_.get("message").asText().endsWith("fetched.page.error")).get
    err.get("log_level").asInt() shouldBe 2
    err.get("data").get("error").asText() should include("status code 500")
    err.get("data").get("page_url").asText() shouldBe p1
  }

  it("/metrics serves app metrics plus the default JVM/process gauges") {
    val registry = new MetricsRegistry
    registry.inc(graft.metrics.Metrics.CollectorEventsCollected, 7.0)
    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val server = new MetricsServer(registry, port)
    server.start()
    try {
      val text = new String(
        new java.net.URI(s"http://127.0.0.1:$port/metrics").toURL.openStream().readAllBytes(), "UTF-8")
      text should include("cf_audit_event_collector_events_collected_total 7.0")
      text should include("# TYPE jvm_memory_bytes_used_heap gauge")
      text should include("jvm_threads_current")
      text should include("jvm_gc_collection_seconds_total")
      text should include("process_uptime_seconds")
    } finally server.stop()
  }
}
