package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{SparkSession, functions => F}

import graft.metrics.{Metrics, MetricsRegistry}
import graft.sources.{CfAuditEventFetcher, CfWireEvent}
import graft.store.EventStore

/** Ingest loop (`pkg/collectors/cf_audit_event_collector.go`): every tick,
  * resume from `max(created_at) − overlap` (epoch-clamped; empty store ⇒
  * epoch ⇒ upstream backfills its ~31-day retention, RUNBOOK.md:32-36),
  * fetch pages, and dedup-append each page in its own store transaction
  * (ST1–ST3, S7).
  *
  * Error policy is the reference's fail-fast (collector.go:53-58 +
  * main.go:91-98): a fetch error aborts the tick and surfaces to the
  * caller. The re-fetch overlap + guid-dedup store makes the loop safe
  * under at-least-once delivery — exactly Spark's "late data + idempotent
  * sink" pattern.
  */
final class Collector(
    spark: SparkSession,
    store: EventStore,
    fetcher: CfAuditEventFetcher,
    registry: MetricsRegistry,
    overlapSeconds: Long = 5L,
    logger: graft.logging.Lager = graft.logging.Lager.noop) {

  // lager session naming as the reference: collector.go:26 + :31
  private val lsession = logger.session("cf-audit-event-collector").session("run")
  private var eventsCollectedLifetime = 0L

  /** Resume point: `max(created_at) − overlap`, clamped at epoch, with the
    * reference's year<1970 sentinel handling (collector.go:92-104). */
  def pullEventsSince(): Instant = {
    val latest = store.getLatestCFEventTime().toInstant
    if (latest.atZone(java.time.ZoneOffset.UTC).getYear < 1970) Instant.EPOCH
    else {
      val back = latest.minusSeconds(overlapSeconds)
      if (back.isBefore(Instant.EPOCH)) Instant.EPOCH else back
    }
  }

  /** Wire page → typed batch with the ingest-boundary conversions applied
    * once (parse timestamp, ''→NULL on org/space): SURVEY §1.3. */
  def pageToDf(events: Seq[CfWireEvent]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    events.toDF()
      .withColumn("created_at_raw", F.col("created_at"))
      .withColumn("created_at", F.to_timestamp(F.col("created_at_raw")))
      .withColumn("organization_guid", graft.model.Schemas.emptyToNull(F.col("organization_guid")))
      .withColumn("space_guid", graft.model.Schemas.emptyToNull(F.col("space_guid")))
      .withColumn("id", F.lit(0L)) // assigned by the store (R20)
      .select(graft.model.Schemas.cfAuditEvents.fieldNames.map(F.col).toSeq: _*)
  }

  /** One tick: fetch all pages since the resume point, store page-by-page.
    * Returns Right(collected count) or Left(first error) — fail-fast. */
  def collectOnce(): Either[Throwable, Long] = {
    val t0 = System.nanoTime()
    var collected = 0L
    val since = pullEventsSince()
    val it = fetcher.fetchPagesAsync(since) // fetch overlaps store (ST3)
    var error: Option[Throwable] = None
    while (error.isEmpty && it.hasNext) {
      val page = it.next()
      page.error match {
        case Some(e) =>
          registry.inc(Metrics.CollectorErrors)
          lsession.error("err-recv-events", e) // collector.go:55
          error = Some(e)
        case None if page.events.nonEmpty =>
          val n = store.storeCFAuditEvents(pageToDf(page.events))
          collected += page.events.size // reference counts fetched (collector.go:67-68)
          eventsCollectedLifetime += page.events.size
          registry.inc(Metrics.CollectorEventsCollected, page.events.size.toDouble)
          lsession.info("stored-events", // collector.go:70-77
            "duration" -> ((System.nanoTime() - t0) / 1e9),
            "events-collected" -> eventsCollectedLifetime)
          val _ = n
        case None => ()
      }
    }
    val duration = (System.nanoTime() - t0) / 1e9
    if (error.isEmpty)
      lsession.info("stored-all-events", // collector.go:80-87
        "duration" -> duration, "events-collected" -> eventsCollectedLifetime)
    registry.inc(Metrics.CollectorCollectDuration, duration)
    error.toLeft(collected)
  }

  /** Periodic loop (ST1): run until `stop` flips or a collect fails. */
  def run(scheduleMillis: Long, stop: () => Boolean): Either[Throwable, Unit] = {
    lsession.info("start") // collector.go:32-33
    try {
      while (!stop()) {
        collectOnce() match {
          case Left(e) => return Left(e) // fail-fast, main exits (main.go:94-97)
          case Right(_) => ()
        }
        val deadline = System.currentTimeMillis() + scheduleMillis
        while (!stop() && System.currentTimeMillis() < deadline) Thread.sleep(50L)
      }
      Right(())
    } finally lsession.info("end")
  }
}
