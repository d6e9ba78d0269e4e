package graft.streaming

import graft.metrics.{Metrics, MetricsRegistry}
import graft.store.EventStore

/** Observability loop (`pkg/informer/informer.go:26-54`): every tick set
  * the approximate event-count gauge (statistics read, R16/S6) and the
  * latest-event-timestamp gauge (unix seconds, R14). Errors set 0, like
  * the reference (informer.go:42,48). */
final class Informer(store: EventStore, registry: MetricsRegistry) {

  def informOnce(): Unit = {
    val count =
      try store.getCFEventCount().toDouble
      catch { case _: Exception => 0.0 }
    registry.setGauge(Metrics.InformerEventsTotal, count)
    val latest =
      try store.getLatestCFEventTime().toInstant.getEpochSecond.toDouble
      catch { case _: Exception => 0.0 }
    registry.setGauge(Metrics.InformerLatestEventTimestamp, latest)
  }

  def run(scheduleMillis: Long, stop: () => Boolean): Unit =
    while (!stop()) {
      informOnce()
      val deadline = System.currentTimeMillis() + scheduleMillis
      while (!stop() && System.currentTimeMillis() < deadline) Thread.sleep(50L)
    }
}
