package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.store.EventStore

/** Structured-Streaming form of the ingest dataflow: an unbounded stream
  * of CF API *page bodies* (JSON strings) → envelope parse + flatten (S3)
  * → typed events → dedup-append into the store via `foreachBatch` (S7).
  *
  * The page stream can come from any streaming source; `fromPageFiles`
  * wires the built-in file source (each file = one page body), which is
  * also how the tests drive it. A production deployment points the same
  * pipeline at a Kafka topic of page bodies — only the `readStream` line
  * changes.
  *
  * Watermark note (ST2 analog): ordering/dedup tolerance comes from the
  * collector's 5 s re-fetch overlap plus the idempotent guid-dedup sink,
  * so the batch pipeline needs no event-time watermark; `windowedCounts`
  * shows the watermarked windowed-aggregation form for monitoring.
  */
object EventStreamIngest {

  /** Parse a DataFrame of page-body strings (column `value`) into typed
    * audit-event rows (id unassigned). */
  def parsePages(pages: DataFrame): DataFrame =
    pages
      .select(F.from_json(F.col("value"), Schemas.cfApiPage).as("page"))
      .select(F.explode(F.col("page.resources")).as("r"))
      .select(
        F.lit(0L).as("id"),
        F.col("r.metadata.guid").as("guid"),
        F.to_timestamp(F.col("r.metadata.created_at")).as("created_at"),
        F.col("r.metadata.created_at").as("created_at_raw"),
        F.col("r.entity.type").as("event_type"),
        F.col("r.entity.actor").as("actor"),
        F.col("r.entity.actor_type").as("actor_type"),
        F.col("r.entity.actor_name").as("actor_name"),
        F.col("r.entity.actor_username").as("actor_username"),
        F.col("r.entity.actee").as("actee"),
        F.col("r.entity.actee_type").as("actee_type"),
        F.col("r.entity.actee_name").as("actee_name"),
        Schemas.emptyToNull(F.col("r.entity.organization_guid")).as("organization_guid"),
        Schemas.emptyToNull(F.col("r.entity.space_guid")).as("space_guid"),
        F.col("r.entity.metadata").as("metadata"))

  /** The shared pipeline tail: any streaming frame with a string `value`
    * column of page bodies → parse/flatten → dedup-append store. Every
    * `fromX` source wiring funnels through here — swapping the source
    * really is the only change. */
  def fromPageStream(
      pages: DataFrame,
      checkpointDir: String,
      store: EventStore,
      triggerMillis: Long = 2L * 60 * 1000): StreamingQuery =
    parsePages(pages).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.storeCFAuditEvents(batch)
        ()
      }
      .start()

  /** Streaming ingest from a directory of page files into the store. */
  def fromPageFiles(
      spark: SparkSession,
      pagesDir: String,
      checkpointDir: String,
      store: EventStore,
      triggerMillis: Long = 2L * 60 * 1000): StreamingQuery = {
    val pages = spark.readStream
      .option("wholetext", "true") // one file = one page body
      .text(pagesDir)
    fromPageStream(pages, checkpointDir, store, triggerMillis)
  }

  /** Streaming ingest from a Kafka-wire-shaped stream: the input carries
    * the exact columns `spark-sql-kafka` surfaces for a topic — BINARY
    * `key`/`value` plus (topic, partition, offset) — and only this select
    * differs from the file wiring; parse and sink are shared. Point it at
    * `spark.readStream.format("kafka")...load()` in production; the spec
    * drives it with a MemoryStream of the same shape. */
  def fromKafkaShaped(
      records: DataFrame,
      checkpointDir: String,
      store: EventStore,
      triggerMillis: Long = 2L * 60 * 1000): StreamingQuery =
    fromPageStream(
      records.select(F.col("value").cast("string").as("value")),
      checkpointDir, store, triggerMillis)

  /** Watermarked per-minute event-type counts over the parsed stream —
    * the Structured Streaming windowed-agg form (ST1/ST2 analog). */
  def windowedCounts(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("created_at", "5 seconds")
      .groupBy(F.window(F.col("created_at"), "1 minute"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"))
}
