package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.DoubleAdder
import scala.jdk.CollectionConverters._

/** Minimal metrics registry reproducing the reference's 9 Prometheus
  * counters/gauges (README.md:45-58; pkg/collectors/metrics.go:8-28,
  * pkg/shippers/metrics.go:8-34, pkg/informer/metrics.go:8-22) with a
  * text-format exposition. Counters accumulate; gauges are set. */
final class MetricsRegistry {
  private val counters = new ConcurrentHashMap[String, DoubleAdder]()
  private val gauges = new ConcurrentHashMap[String, java.lang.Double]()

  def inc(name: String, delta: Double = 1.0): Unit =
    counters.computeIfAbsent(name, _ => new DoubleAdder).add(delta)

  def setGauge(name: String, value: Double): Unit =
    gauges.put(name, value)

  def counterValue(name: String): Double =
    Option(counters.get(name)).map(_.sum()).getOrElse(0.0)

  def gaugeValue(name: String): Double =
    Option(gauges.get(name)).map(_.doubleValue).getOrElse(0.0)

  /** Prometheus text exposition format (metric name + value lines). */
  def exposition: String = {
    val cs = counters.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
      s"# TYPE $k counter\n$k ${v.sum()}"
    }
    val gs = gauges.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
      s"# TYPE $k gauge\n$k ${v.doubleValue}"
    }
    (cs ++ gs).mkString("", "\n", "\n")
  }
}

object Metrics {
  // Collector (pkg/collectors/metrics.go)
  val CollectorErrors = "cf_audit_event_collector_errors_total"
  val CollectorEventsCollected = "cf_audit_event_collector_events_collected_total"
  val CollectorCollectDuration = "cf_audit_event_collector_collect_duration_total"
  // Shipper (pkg/shippers/metrics.go)
  val ShipperErrors = "cf_audit_events_to_splunk_shipper_errors_total"
  val ShipperEventsShipped = "cf_audit_events_to_splunk_shipper_events_shipped_total"
  val ShipperLatestEventTimestamp = "cf_audit_events_to_splunk_shipper_latest_event_timestamp"
  val ShipperShipDuration = "cf_audit_events_to_splunk_shipper_ship_duration_total"
  // Informer (pkg/informer/metrics.go)
  val InformerEventsTotal = "informer_cf_audit_events_total"
  val InformerLatestEventTimestamp = "informer_latest_cf_audit_event_timestamp"
}

/** `/metrics` + `/health` exposition server (main.go:75-86 analog), built on
  * the JDK's embedded HTTP server — no extra dependencies. */
final class MetricsServer(registry: MetricsRegistry, port: Int) {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
  private var server: Option[HttpServer] = None

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  def start(): Int = {
    val s = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    s.createContext("/metrics", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex, 200, registry.exposition)
    })
    s.createContext("/health", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex, 200, "OK")
    })
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = { server.foreach(_.stop(0)); server = None }
}
