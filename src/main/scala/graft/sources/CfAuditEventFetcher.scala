package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse => JHttpResponse}
import java.time.format.DateTimeFormatter
import java.time.{Duration => JDuration, Instant, ZoneOffset}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal HTTP abstraction so the fetcher/shipper are testable with an
  * in-memory transport and production uses the JDK client. */
final case class HttpReply(status: Int, body: String)

trait HttpTransport {
  def get(url: String, headers: Map[String, String] = Map.empty): HttpReply
  def post(url: String, body: String, headers: Map[String, String] = Map.empty): HttpReply
}

final class JdkHttpTransport(timeout: JDuration) extends HttpTransport {
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()
  private def send(b: HttpRequest.Builder, headers: Map[String, String]): HttpReply = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.timeout(timeout).build(), JHttpResponse.BodyHandlers.ofString())
    HttpReply(resp.statusCode(), resp.body())
  }
  def get(url: String, headers: Map[String, String]): HttpReply =
    send(HttpRequest.newBuilder(URI.create(url)).GET(), headers)
  def post(url: String, body: String, headers: Map[String, String]): HttpReply =
    send(HttpRequest.newBuilder(URI.create(url)).POST(HttpRequest.BodyPublishers.ofString(body)), headers)
}

/** One audit event as it appears on the wire (stringly-typed; identity
  * lifted out of the page's metadata envelope — `fetcher.go:76-81`). */
final case class CfWireEvent(
    guid: String,
    created_at: String,
    event_type: String,
    actor: String,
    actor_type: String,
    actor_name: String,
    actor_username: String,
    actee: String,
    actee_type: String,
    actee_name: String,
    organization_guid: String,
    space_guid: String,
    metadata: String)

/** A fetched page: events, or the error that terminated the stream
  * (`CFAuditEventResult`, fetcher.go:20-23). */
final case class PageResult(events: Seq[CfWireEvent], error: Option[Throwable])

/** Paginated `/v2/events` source (S1–S4, `pkg/fetchers/cf_audit_event_fetcher
  * .go:16-84`): walks pages following `next_url` until empty, pushes the
  * `timestamp>T` predicate to the upstream server in the query string
  * (source-side pushdown, `fetcher.go:25-31`), rate-limits between pages
  * (`fetcher.go:55`), and fails the stream on any non-200 status — even
  * 201 (`fetcher.go:66-68`).
  *
  * Spark integration: the driver-side pager yields bounded pages that the
  * collector turns into DataFrames (micro-batch boundary). At 100 TB-scale
  * backfill you'd run many fetchers over disjoint time slices — the
  * pushdown parameter makes the source trivially range-partitionable.
  */
final class CfAuditEventFetcher(
    http: HttpTransport,
    apiAddress: String,
    resultsPerPage: Int = 100,
    paginationWaitMillis: Long = 200L,
    logger: graft.logging.Lager = graft.logging.Lager.noop) {

  private val mapper = new ObjectMapper()
  private val tsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(ZoneOffset.UTC)

  /** Exact first-page URL shape asserted by the reference's tests
    * (`cf_audit_event_fetcher_test.go:90-91`): `q=timestamp>...` +
    * `results-per-page`, URL-encoded. */
  def startPageUrl(since: Instant): String = {
    val pred = s"timestamp>${tsFormat.format(since)}"
    val q = URLEncoder.encode(pred, "UTF-8").replace("+", "%20")
    s"/v2/events?q=$q&results-per-page=$resultsPerPage"
  }

  private def textOrEmpty(n: JsonNode, field: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull) "" else v.asText()
  }

  private def parsePage(body: String): (String, Seq[CfWireEvent]) = {
    val root = mapper.readTree(body)
    val next = textOrEmpty(root, "next_url")
    val resources = Option(root.get("resources")).map(_.elements().asInstanceOf[java.util.Iterator[JsonNode]])
    val events = resources.map { it =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[CfWireEvent]
      while (it.hasNext) {
        val r = it.next()
        val meta = r.get("metadata")
        val entity = r.get("entity")
        val md = Option(entity.get("metadata")).filterNot(_.isNull).map(_.toString).getOrElse("{}")
        buf += CfWireEvent(
          guid = textOrEmpty(meta, "guid"),
          created_at = textOrEmpty(meta, "created_at"),
          event_type = textOrEmpty(entity, "type"),
          actor = textOrEmpty(entity, "actor"),
          actor_type = textOrEmpty(entity, "actor_type"),
          actor_name = textOrEmpty(entity, "actor_name"),
          actor_username = textOrEmpty(entity, "actor_username"),
          actee = textOrEmpty(entity, "actee"),
          actee_type = textOrEmpty(entity, "actee_type"),
          actee_name = textOrEmpty(entity, "actee_name"),
          organization_guid = textOrEmpty(entity, "organization_guid"),
          space_guid = textOrEmpty(entity, "space_guid"),
          metadata = md)
      }
      buf.toSeq
    }.getOrElse(Seq.empty)
    (next, events)
  }

  /** Async producer/consumer form (ST3): a daemon producer thread walks the
    * pages into a bounded buffer (capacity `bufferPages`, mirroring the
    * reference's channel of 3, `collector.go:50`), so the next HTTP fetch
    * overlaps the consumer's store write — the same pipelining the
    * reference gets from its fetcher goroutine. */
  def fetchPagesAsync(since: Instant, bufferPages: Int = 3): Iterator[PageResult] = {
    val queue = new java.util.concurrent.ArrayBlockingQueue[AnyRef](bufferPages)
    val Done = new AnyRef
    val producer = new Thread(() => {
      try fetchPages(since).foreach(p => queue.put(p))
      catch { case e: InterruptedException => () }
      finally queue.put(Done) // channel close (fetcher.go:34)
    }, "cf-fetcher")
    producer.setDaemon(true)
    producer.start()
    new Iterator[PageResult] {
      private var done = false
      private var nextItem: Option[PageResult] = None
      private def pull(): Unit = if (!done && nextItem.isEmpty) {
        queue.take() match {
          case Done => done = true
          case p: PageResult => nextItem = Some(p)
          case other => throw new IllegalStateException(other.toString)
        }
      }
      def hasNext: Boolean = { pull(); nextItem.nonEmpty }
      def next(): PageResult = { pull(); val p = nextItem.get; nextItem = None; p }
    }
  }

  /** Lazily walk all pages from `since`. Emits one `PageResult` per page in
    * order; an error emits a terminal `PageResult(Nil, Some(err))` and ends
    * the stream (`fetcher.go:43-56`). */
  def fetchPages(since: Instant): Iterator[PageResult] = new Iterator[PageResult] {
    private var nextUrl: String = startPageUrl(since)
    // lager session context, fetcher.go:36-52: "fetching" once with the
    // start URL, then per page "fetched.page.ok" / "fetched.page.error"
    private val log = logger.withData("start_page_url" -> nextUrl)
    log.info("fetching")
    private var finished = false
    private var first = true

    def hasNext: Boolean = !finished && nextUrl.nonEmpty

    def next(): PageResult = {
      if (!first) Thread.sleep(paginationWaitMillis) // rate limit (fetcher.go:55)
      first = false
      val pageUrl = nextUrl
      try {
        val resp = http.get(apiAddress + pageUrl)
        if (resp.status != 200) { // any non-200, even 201, is an error (fetcher.go:66-68)
          finished = true
          val e = new RuntimeException(s"request failed with status code ${resp.status}")
          log.error("fetched.page.error", e, "page_url" -> pageUrl)
          PageResult(Nil, Some(e))
        } else {
          val (next, events) = parsePage(resp.body)
          nextUrl = next
          log.info("fetched.page.ok", "page_url" -> pageUrl, "event_count" -> events.size)
          PageResult(events, None)
        }
      } catch {
        case e: Exception =>
          finished = true
          log.error("fetched.page.error", e, "page_url" -> pageUrl)
          PageResult(Nil, Some(e))
      }
    }
  }
}
