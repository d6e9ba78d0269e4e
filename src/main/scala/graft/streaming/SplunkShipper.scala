package graft.streaming

import java.time.OffsetDateTime
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, functions => F}

import graft.metrics.{Metrics, MetricsRegistry}
import graft.sources.{HttpReply, HttpTransport}
import graft.store.EventStore
import graft.Pin._

/** Splunk-HEC-style HTTP sink client with the reference's retry policy
  * (`shipper.go:62-86`): 2 s timeout (owned by the transport), backoff
  * 100 ms → 2 s with exponent 2 plus up to 500 ms jitter, 3 retries;
  * any 2xx is success (`shipper.go:216-223`). */
final class SplunkHecClient(
    http: HttpTransport,
    url: String,
    apiKey: String,
    maxRetries: Int = 3,
    initialBackoffMillis: Long = 100L,
    maxBackoffMillis: Long = 2000L,
    jitterMillis: Long = 500L,
    sleep: Long => Unit = Thread.sleep) {

  private val headers = Map(
    "Authorization" -> s"Splunk $apiKey",
    "Content-Type" -> "application/json")

  /** POST one payload; retries with exponential backoff + jitter. Returns
    * the last reply (success = 2xx). */
  def post(body: String): Either[Throwable, HttpReply] = {
    var attempt = 0
    var last: Either[Throwable, HttpReply] = Left(new RuntimeException("unattempted"))
    while (attempt <= maxRetries) {
      last =
        try {
          val r = http.post(url, body, headers)
          if (r.status >= 200 && r.status < 300) return Right(r)
          Left(new RuntimeException(s"received status code ${r.status} with body ${r.body}"))
        } catch { case e: Exception => Left(e) }
      attempt += 1
      if (attempt <= maxRetries) {
        val backoff = math.min(
          (initialBackoffMillis * math.pow(2.0, (attempt - 1).toDouble)).toLong,
          maxBackoffMillis)
        sleep(backoff + Random.nextLong(jitterMillis))
      }
    }
    last
  }
}

/** Per-executor-JVM HEC client cache: partitions of successive ticks reuse
  * one client (and therefore its transport's keep-alive connections) per
  * pool key instead of constructing a fresh client — and re-handshaking
  * TLS — for every partition of every tick. Keyed by endpoint identity;
  * `computeIfAbsent` makes racing partitions on the same executor share a
  * single instance (SplunkHecClient is thread-safe: its only state is
  * config). */
object HecClientPool {
  private val pool = new java.util.concurrent.ConcurrentHashMap[String, SplunkHecClient]()
  def getOrCreate(key: String, mk: () => SplunkHecClient): SplunkHecClient =
    pool.computeIfAbsent(key, _ => mk())
  def size: Int = pool.size
  private[graft] def clear(): Unit = pool.clear()
}

/** Egress loop (`pkg/shippers/cf_audit_events_to_splunk_shipper.go`): every
  * tick read the ≤8192 unshipped events in `created_at` order, ship them
  * serially, stop at the first failure, and commit the cursor for the
  * shipped *prefix* only (ST4). Boundary-timestamp re-ships preserve
  * at-least-once delivery (R6) — tested behavior in the reference
  * (`shipper_test.go:187-203`). Errors never kill the loop (ST5).
  *
  * The per-tick batch is capped at 8192 by the store query (store.go:206),
  * so collecting it to the driver is bounded by design — this mirrors the
  * reference's serial semantics bit-for-bit. `shipPartitioned` is the
  * scale path: range-partitioned parallel POSTs with prefix-partition
  * cursor commit (ordering preserved *across* partitions by the range
  * partitioner; within a partition by the sorted iterator).
  */
final class SplunkShipper(
    store: EventStore,
    hec: SplunkHecClient,
    deployEnv: String,
    registry: MetricsRegistry,
    shipperName: String = "cf-audit-events-to-splunk",
    logger: graft.logging.Lager = graft.logging.Lager.noop) {

  // lager session naming as the reference: shipper.go:60 + :94
  private val lsession = logger.session("cf-audit-events-to-splunk-shipper").session("run")

  /** `{"sourcetype":"cf-audit-event","source":env,"event":{...}}`
    * (shipper.go:24-28,187-192). The inner event mirrors the wire struct
    * the reference marshals (`events.go:26-41`): `type` (not event_type),
    * the RAW created_at string, `''` for NULL org/space (the read-path
    * coalesce, store.go:137-138), `metadata` as a JSON *object* (variant
    * passthrough), and no DB id. */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("__payload", F.to_json(F.struct(
      F.lit("cf-audit-event").as("sourcetype"),
      F.lit(deployEnv).as("source"),
      F.struct(
        F.col("guid"),
        F.col("created_at_raw").as("created_at"),
        F.col("event_type").as("type"),
        F.col("actor"), F.col("actor_type"), F.col("actor_name"), F.col("actor_username"),
        F.col("actee"), F.col("actee_type"), F.col("actee_name"),
        graft.model.Schemas.nullToEmpty(F.col("organization_guid")).as("organization_guid"),
        graft.model.Schemas.nullToEmpty(F.col("space_guid")).as("space_guid"),
        F.parse_json(F.coalesce(F.col("metadata"), F.lit("null"))).as("metadata")
      ).as("event"))))

  /** One tick. Returns (shipped, failed) counts; never throws (ST5).
    *
    * `postBatchSize = 1` reproduces the reference's per-event POST loop
    * (`shipper.go:122-135`) exactly. HEC accepts concatenated event JSON
    * in one request, so larger batch sizes amortize the HTTP round trip —
    * the per-event round trip is the reference's real throughput ceiling
    * (BASELINE.md) — while ordering and prefix-commit semantics are
    * unchanged (a failed POST stops the tick; the cursor commits the last
    * event of the last fully-shipped request). */
  def shipOnce(postBatchSize: Int = 1): (Long, Long) = {
    val t0 = System.nanoTime()
    try {
      val batch = withPayload(store.getUnshippedCFAuditEventsForShipper(shipperName))
      val rows = batch.select("__payload", "created_at_raw", "guid").collect() // ≤8192 by construction
      var shipped = 0L
      var lastOk: Option[Row] = None
      var failed = false
      val it = rows.grouped(math.max(1, postBatchSize))
      while (!failed && it.hasNext) {
        val group = it.next()
        hec.post(group.map(_.getString(0)).mkString("\n")) match {
          case Right(_) =>
            shipped += group.length
            lastOk = Some(group.last)
          case Left(e) =>
            failed = true // prefix stops here (shipper.go:125-135)
            lsession.error("err-ship-event", e) // shipper.go:126
            registry.inc(Metrics.ShipperErrors)
        }
      }
      lastOk.foreach { r =>
        // Commit cursor with the RAW created_at string (shipper.go:140-143).
        store.updateShipperCursor(shipperName, r.getString(1), r.getString(2))
        lsession.info("shipped-events",
          "shipped" -> shipped, "last_guid" -> r.getString(2))
        registry.inc(Metrics.ShipperEventsShipped, shipped.toDouble)
        // "Not fatal" parse for the latest-shipped gauge (shipper.go:158-169).
        try registry.setGauge(Metrics.ShipperLatestEventTimestamp,
          OffsetDateTime.parse(r.getString(1)).toInstant.getEpochSecond.toDouble)
        catch { case _: Exception => () }
      }
      (shipped, if (failed) 1L else 0L)
    } catch {
      case e: Exception =>
        lsession.error("err-get-unshipped-cf-audit-events-for-shipper", e) // shipper.go:110
        registry.inc(Metrics.ShipperErrors)
        (0L, 1L)
    } finally {
      registry.inc(Metrics.ShipperShipDuration, (System.nanoTime() - t0) / 1e9)
    }
  }

  /** Scale path: POST from executors, one HTTP stream per range partition.
    * The batch is range-partitioned on (created_at, guid) so partition i
    * holds strictly earlier events than partition i+1; the cursor commits
    * the last event of the longest fully-shipped partition prefix,
    * preserving prefix semantics at parallel throughput.
    *
    * `postBatchSize > 1` concatenates that many event payloads per POST
    * (HEC accepts newline-joined event JSON), amortizing the HTTP round
    * trip exactly like the serial `shipOnce` batched path; a failed POST
    * still stops that partition's prefix at the last fully-shipped group.
    * `clientPoolKey` reuses one client per executor JVM across ticks via
    * [[HecClientPool]] — keep-alive connections survive tick boundaries
    * instead of re-handshaking every partition × tick. */
  def shipPartitionedOnce(
      parallelism: Int,
      mkClient: () => SplunkHecClient,
      postBatchSize: Int = 1,
      clientPoolKey: Option[String] = None): (Long, Long) = {
    // localCheckpoint before the range repartition: RangePartitioner
    // SAMPLES its input to pick boundaries, which would re-run the whole
    // store query a second time per tick (measured: the parallel path
    // lost to serial on engine cost alone). Materializing the ≤page-size
    // batch once makes the sampling pass read checkpointed partitions.
    val batch = withPayload(store.getUnshippedCFAuditEventsForShipper(shipperName))
      .pin()
      .repartitionByRange(parallelism, F.col("created_at"), F.col("guid"))
      .sortWithinPartitions("created_at", "guid")
    val perPart = batch.select("__payload", "created_at_raw", "guid").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val client = clientPoolKey.fold(mkClient())(k => HecClientPool.getOrCreate(k, mkClient))
        var shipped = 0L
        var last: Option[(String, String)] = None
        var failed = false
        val groups = it.grouped(math.max(1, postBatchSize))
        while (!failed && groups.hasNext) {
          val g = groups.next()
          client.post(g.map(_.getString(0)).mkString("\n")) match {
            case Right(_) =>
              shipped += g.length
              last = Some((g.last.getString(1), g.last.getString(2)))
            case Left(_) => failed = true
          }
        }
        Iterator.single((pid, shipped, failed, last))
      }.collect().sortBy(_._1)
    var shipped = 0L
    var lastOk: Option[(String, String)] = None
    var anyFailed = false
    perPart.iterator.takeWhile(_ => !anyFailed).foreach { case (_, n, failed, last) =>
      shipped += n
      if (last.isDefined) lastOk = last
      if (failed) anyFailed = true
    }
    lastOk.foreach { case (raw, guid) => store.updateShipperCursor(shipperName, raw, guid) }
    if (shipped > 0) registry.inc(Metrics.ShipperEventsShipped, shipped.toDouble)
    if (anyFailed) registry.inc(Metrics.ShipperErrors)
    (shipped, if (anyFailed) 1L else 0L)
  }

  /** Periodic loop: errors are isolated — tick again next schedule (ST5). */
  def run(scheduleMillis: Long, stop: () => Boolean): Unit = {
    lsession.info("start") // shipper.go:96-97
    try while (!stop()) {
      shipOnce()
      val deadline = System.currentTimeMillis() + scheduleMillis
      while (!stop() && System.currentTimeMillis() < deadline) Thread.sleep(50L)
    } finally lsession.info("end")
  }
}
