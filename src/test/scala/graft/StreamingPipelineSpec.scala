package graft

import java.nio.file.Files
import java.time.Instant

import graft.sources.{HttpReply, HttpTransport}
import graft.sources.v2.CfEventsTable
import graft.store.ParquetEventStore
import graft.streaming.{SplunkHecClient, SplunkShipper, StreamingPipeline}

/** JVM-static state for the composed-pipeline e2e: executor task closures
  * are deserialized copies even in local mode, so the HEC post log and the
  * upstream release gate live in a static object — the one channel visible
  * to both sides. */
object PipelineE2E {
  val posted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def postedBodies: Seq[String] = {
    val it = posted.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  def shippedGuids: Seq[String] =
    postedBodies.flatMap(b => "\"guid\":\"(g\\d+)\"".r.findAllMatchIn(b).map(_.group(1)))
  def reset(): Unit = posted.clear()

  /** The scripted feed: event k+1 is released upstream only after event k
    * reached HEC — so every event flowing source→HEC proves the full
    * store→ship→cursor cycle completed in an EARLIER trigger. */
  val feed = Seq(
    ("g1", "2024-01-01T10:00:00Z"),
    ("g2", "2024-01-01T11:00:00Z"),
    ("g3", "2024-01-01T12:00:00Z"),
    ("g4", "2024-01-01T13:00:00Z"))
  def released: Seq[(String, String)] = {
    val have = shippedGuids.toSet
    // g1, g2 start released; each later event needs its predecessor shipped
    feed.take(2) ++ feed.drop(2).filter { case (g, _) =>
      have.contains(feed(feed.indexWhere(_._1 == g) - 1)._1)
    }
  }
}

/** HEC transport recording every POST body (always 200). */
final class RecordingHec extends HttpTransport with Serializable {
  def get(url: String, headers: Map[String, String]): HttpReply =
    throw new UnsupportedOperationException
  def post(url: String, body: String, headers: Map[String, String]): HttpReply = {
    PipelineE2E.posted.add(body)
    HttpReply(200, "ok")
  }
}

/** VERDICT r4 #5: the composed streaming end-to-end — ONE running
  * Structured Streaming query wiring DSv2 source → dedup → store → pooled
  * parallel ship under Trigger.ProcessingTime, with cursor commits observed
  * across ≥3 triggers. */
class StreamingPipelineSpec extends SparkSpec {

  private def pageJson(events: Seq[(String, String)]): String = {
    val resources = events.map { case (g, at) =>
      s"""{"metadata":{"guid":"$g","created_at":"$at"},
         |"entity":{"type":"test.event.type","actor":"a","actor_type":"t","actor_name":"n",
         |"actor_username":"u","actee":"e","actee_type":"t","actee_name":"n",
         |"organization_guid":"","space_guid":"sg","metadata":{}}}""".stripMargin
    }.mkString(",")
    s"""{"total_results":${events.size},"total_pages":1,"next_url":"","resources":[$resources]}"""
  }

  it("flows events source->store->HEC with per-trigger cursor commits across >= 3 triggers") {
    PipelineE2E.reset()
    // feed transport: serves released events strictly after the fetch's
    // pushed-down timestamp>T predicate — the 5 s overlap re-serves the
    // boundary event, exercising the dedup path for real
    val feedTransport = new HttpTransport with Serializable {
      def get(url: String, headers: Map[String, String]): HttpReply = {
        val t = "timestamp%3E([^&]+)".r.findFirstMatchIn(url)
          .map(m => Instant.parse(java.net.URLDecoder.decode(m.group(1), "UTF-8")))
          .getOrElse(Instant.EPOCH)
        val page = PipelineE2E.released.filter { case (_, at) => Instant.parse(at).isAfter(t) }
        HttpReply(200, pageJson(page))
      }
      def post(url: String, body: String, headers: Map[String, String]): HttpReply =
        throw new UnsupportedOperationException
    }
    val dir = Files.createTempDirectory("graft-pipeline-e2e").toString
    val store = new ParquetEventStore(spark, dir)
    store.init()
    val registry = new graft.metrics.MetricsRegistry
    def mkClient() = new SplunkHecClient(new RecordingHec, "http://hec.test/services/collector", "key")
    val shipper = new SplunkShipper(store, mkClient(), "test", registry)
    CfEventsTable.transportOverride.set(feedTransport)
    val pipeline = new StreamingPipeline(
      spark, store, shipper, () => mkClient(), apiAddress = "",
      triggerMillis = 100L, shipParallelism = 2, postBatchSize = 32,
      clientPoolKey = s"e2e-${System.nanoTime()}",
      sourceOptions = Map("paginationWaitMillis" -> "0"))
    val q = pipeline.start(s"$dir/_checkpoint")
    try {
      val deadline = System.currentTimeMillis() + 60000L
      // wait on the driver-side shipped COUNTER, not the HEC post log: the
      // registry increments after the cursor commit, so counter == 4 means
      // the last trigger's cursor update is durably done
      while (registry.counterValue(graft.metrics.Metrics.ShipperEventsShipped) < 4.0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100L)
      // stop BEFORE reading store state: a live trigger's cursor overwrite
      // would race the parquet read below
      q.stop()

      // every event made it source -> HEC...
      PipelineE2E.shippedGuids.toSet shouldBe Set("g1", "g2", "g3", "g4")
      // ...exactly once: a missed cursor commit would re-ship the previous
      // trigger's events, a missed dedup would double-store the overlap
      // re-fetch — either way a guid repeats
      PipelineE2E.shippedGuids.sorted shouldBe Seq("g1", "g2", "g3", "g4")
      // ≥3 separate ship ticks (g1,g2 | g3 | g4 at minimum): each POST body
      // is one trigger's prefix batch, so ≥3 posts = commits across ≥3
      // triggers — and the gated feed releases g3/g4 only after their
      // predecessor was SHIPPED, so the triggers were genuinely sequential
      PipelineE2E.postedBodies.size should be >= 3
      // the store holds each guid once (overlap refetch deduped)
      store.events.select("guid").collect().map(_.getString(0)).sorted shouldBe
        Array("g1", "g2", "g3", "g4")
      // final cursor: committed at the last shipped event
      val cursor = store.cursors.collect().head
      cursor.getAs[String]("shipped_id") shouldBe "g4"
    } finally {
      try q.stop() catch { case _: Exception => () }
      CfEventsTable.transportOverride.set(null)
    }
  }
}
