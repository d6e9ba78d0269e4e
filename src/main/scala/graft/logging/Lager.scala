package graft.logging

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal lager-style structured logger (the reference logs every fetch/
  * store/ship tick through CloudFoundry's lager: `main_config.go` creates
  * the root logger, components derive sessions — `fetcher.go:36-52`,
  * `collectors/cf_audit_event_collector.go:31-87`,
  * `shippers/cf_audit_events_to_splunk_shipper.go:94-XX`,
  * `informer.go:27-31`).
  *
  * One JSON object per line: `{"timestamp":…,"source":…,"message":
  * "<source>.<sessions>.<action>","log_level":1|2,"data":{…}}` — the
  * shape lager's writer sink emits, so the RUNBOOK's debugging flows
  * (grep by session prefix / message) work unchanged. `session` and
  * `withData` return derived loggers carrying the accumulated context. */
final class Lager private (
    source: String,
    path: String,
    ctx: Seq[(String, Any)],
    sink: String => Unit) {

  def session(name: String): Lager =
    new Lager(source, if (path.isEmpty) name else s"$path.$name", ctx, sink)

  def withData(kv: (String, Any)*): Lager = new Lager(source, path, ctx ++ kv, sink)

  def info(action: String, kv: (String, Any)*): Unit = emit(1, action, kv)

  def error(action: String, err: Throwable, kv: (String, Any)*): Unit =
    emit(2, action, kv :+ ("error" -> err.toString))

  private def emit(level: Int, action: String, kv: Seq[(String, Any)]): Unit = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("timestamp", System.currentTimeMillis() / 1000.0)
    m.put("source", source)
    val msg = if (path.isEmpty) s"$source.$action" else s"$source.$path.$action"
    m.put("message", msg)
    m.put("log_level", level)
    val data = new java.util.LinkedHashMap[String, Any]()
    (ctx ++ kv).foreach { case (k, v) =>
      data.put(k, v match {
        case n: Int => n; case n: Long => n; case n: Double => n
        case b: Boolean => b; case other => String.valueOf(other)
      })
    }
    m.put("data", data)
    sink(Lager.mapper.writeValueAsString(m))
  }
}

object Lager {
  private val mapper = new ObjectMapper()

  /** Root logger writing one JSON line per event to stderr (lager's
    * writer-sink analog; main_config.go sends to os.Stdout — stderr keeps
    * the Bench/Verify stdout protocol clean). */
  def apply(source: String): Lager = to(source, System.err.println)

  /** Root logger with a custom sink (specs capture lines; noop discards). */
  def to(source: String, sink: String => Unit): Lager = new Lager(source, "", Nil, sink)

  val noop: Lager = to("noop", _ => ())
}
