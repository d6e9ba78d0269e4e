package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.metrics.MetricsRegistry

/** Bridges Structured Streaming progress into the engine's metrics
  * registry (SURVEY S10/ST6: `StreamingQueryListener.onProgress` publishing
  * under the reference's metric vocabulary). Counters accumulate rows per
  * query name; gauges expose the latest batch's rates. */
final class MetricsListener(registry: MetricsRegistry) extends StreamingQueryListener {

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    registry.inc(s"streaming_${sanitize(event.name)}_starts_total")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val name = sanitize(p.name)
    registry.inc(s"streaming_${name}_input_rows_total", p.numInputRows.toDouble)
    registry.setGauge(s"streaming_${name}_input_rows_per_second", p.inputRowsPerSecond)
    registry.setGauge(s"streaming_${name}_batch_id", p.batchId.toDouble)
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    registry.inc("streaming_terminations_total")

  private def sanitize(name: String): String =
    Option(name).getOrElse("unnamed").replaceAll("[^A-Za-z0-9_]", "_")
}
