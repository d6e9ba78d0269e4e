package graft.sources.v2

import java.time.{Duration => JDuration, Instant}
import java.util.concurrent.atomic.AtomicReference
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{CfAuditEventFetcher, CfWireEvent, HttpTransport, JdkHttpTransport}

/** DataSource V2 micro-batch streaming source for the paginated CF
  * `/v2/events` feed: `spark.readStream.format("graft-cf-events")
  * .option("apiAddress", …).load()`.
  *
  * Semantics (mirrors SURVEY §2A S1–S4 + §2C ST1–ST3):
  *  - each trigger, the driver pager fetches up to `maxPagesPerTrigger`
  *    pages starting from the last seen `created_at` minus `overlapSeconds`
  *    (the reference's 5 s re-fetch overlap) with the `timestamp>T`
  *    predicate pushed to the server;
  *  - one input partition per page — the page is the unit of parallel
  *    decode downstream, like the reference's page-per-transaction store;
  *  - offsets are page sequence numbers; `commit` drops acknowledged pages
  *    from the driver buffer. Re-delivered overlap events are handled by
  *    the guid-dedup sink (idempotent, at-least-once end to end).
  *
  * Scale path: a single pager is the reference's own topology (the feed is
  * one ordered HTTP stream). For bulk backfill at 100 TB, run one stream
  * per disjoint time slice — the pushdown predicate makes slicing trivial —
  * and union the sinks; per-slice order + guid dedup keep it correct.
  */
class CfEventsSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cf-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CfEventsTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CfEventsTable(new CaseInsensitiveStringMap(properties))
}

object CfEventsTable {
  /** Wire-shaped streaming schema (id is assigned by the store). */
  val schema: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("created_at", TimestampType),
    StructField("created_at_raw", StringType),
    StructField("event_type", StringType),
    StructField("actor", StringType),
    StructField("actor_type", StringType),
    StructField("actor_name", StringType),
    StructField("actor_username", StringType),
    StructField("actee", StringType),
    StructField("actee_type", StringType),
    StructField("actee_name", StringType),
    StructField("organization_guid", StringType),
    StructField("space_guid", StringType),
    StructField("metadata", StringType)))

  /** Test seam: inject an in-memory transport (production uses the JDK
    * client). Cleared by the test after use. */
  val transportOverride: AtomicReference[HttpTransport] = new AtomicReference(null)
}

final class CfEventsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"cf-audit-events(${options.getOrDefault("apiAddress", "")})"
  override def schema(): StructType = CfEventsTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CfEventsTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CfEventsMicroBatchStream(opts)
      }
    }
}

/** Offset = count of pages ever fetched by this stream instance. */
final case class CfPageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

final class CfEventsMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val apiAddress = options.getOrDefault("apiAddress", "")
  private val overlapSeconds = options.getOrDefault("overlapSeconds", "5").toLong
  private val maxPagesPerTrigger = options.getOrDefault("maxPagesPerTrigger", "50").toInt
  private val waitMillis = options.getOrDefault("paginationWaitMillis", "200").toLong
  private val startIso = options.getOrDefault("since", "1970-01-01T00:00:00Z")

  private val rawTransport: HttpTransport =
    Option(CfEventsTable.transportOverride.get())
      .getOrElse(new JdkHttpTransport(JDuration.ofSeconds(30)))
  // UAA OAuth, same option surface as the env config (main_config.go):
  // credentials present -> Bearer-authenticated transport with 401 refresh
  private val authCfg = graft.sources.CfAuthConfig(
    apiAddress,
    clientId = options.getOrDefault("cfClientId", ""),
    clientSecret = options.getOrDefault("cfClientSecret", ""),
    username = options.getOrDefault("cfUsername", ""),
    password = options.getOrDefault("cfPassword", ""))
  private val transport: HttpTransport =
    if (authCfg.enabled)
      new graft.sources.AuthenticatedTransport(rawTransport,
        new graft.sources.UaaAuthenticator(rawTransport, authCfg))
    else rawTransport
  private val fetcher =
    new CfAuditEventFetcher(transport, apiAddress, paginationWaitMillis = waitMillis)

  // Driver-side page buffer between latestOffset and commit.
  private val lock = new Object
  private var basePage = 0L // seq number of buffer head
  private val buffer = mutable.ArrayBuffer.empty[Seq[CfWireEvent]]
  private var resumeFrom: Instant = Instant.parse(startIso)

  override def initialOffset(): Offset = CfPageOffset(0L)

  override def deserializeOffset(json: String): Offset = CfPageOffset(json.toLong)

  override def latestOffset(): Offset = lock.synchronized {
    var fetched = 0
    val it = fetcher.fetchPagesAsync(resumeFrom)
    var failed: Option[Throwable] = None
    while (failed.isEmpty && fetched < maxPagesPerTrigger && it.hasNext) {
      val page = it.next()
      page.error match {
        case Some(e) => failed = Some(e) // surfaces on next trigger via stream failure
        case None if page.events.nonEmpty =>
          buffer += page.events
          fetched += 1
          val maxAt = page.events.iterator.map(e => Instant.parse(e.created_at)).max
          val back = maxAt.minusSeconds(overlapSeconds)
          if (back.isAfter(resumeFrom)) resumeFrom = back // ST2 overlap resume
        case None => ()
      }
    }
    failed.foreach(e => throw new RuntimeException("cf-events fetch failed", e)) // fail-fast (ST3)
    CfPageOffset(basePage + buffer.size)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    lock.synchronized {
      val s = start.asInstanceOf[CfPageOffset].page
      val e = end.asInstanceOf[CfPageOffset].page
      (s until e).map { p =>
        CfPageInputPartition(buffer((p - basePage).toInt)): InputPartition
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = CfPageReaderFactory

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[CfPageOffset].page
    val drop = (e - basePage).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); basePage = e }
  }

  override def stop(): Unit = ()
}

final case class CfPageInputPartition(events: Seq[CfWireEvent]) extends InputPartition

object CfPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val events = partition.asInstanceOf[CfPageInputPartition].events
    new PartitionReader[InternalRow] {
      private val it = events.iterator
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val e = it.next()
        def s(v: String) = UTF8String.fromString(v)
        def nullable(v: String) = if (v == null || v.isEmpty) null else s(v) // ''→NULL edge
        val at = Instant.parse(e.created_at)
        val micros = at.getEpochSecond * 1000000L + at.getNano / 1000L
        row = InternalRow(
          s(e.guid), micros, s(e.created_at), s(e.event_type),
          s(e.actor), s(e.actor_type), s(e.actor_name), s(e.actor_username),
          s(e.actee), s(e.actee_type), s(e.actee_name),
          nullable(e.organization_guid), nullable(e.space_guid), s(e.metadata))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
