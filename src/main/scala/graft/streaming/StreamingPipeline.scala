package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.EventStore

/** The whole reference pipeline COMPOSED as one running Structured
  * Streaming query: DSv2 paginated-HTTP source → in-batch dedup → guid-dedup
  * store append → pooled parallel HEC ship with prefix cursor commit, under
  * `Trigger.ProcessingTime` — the collector and shipper loops
  * (`pkg/collectors/cf_audit_event_collector.go` +
  * `pkg/shippers/cf_audit_events_to_splunk_shipper.go`) fused into Spark's
  * native streaming execution instead of hand-rolled threads.
  *
  * Semantics preserved end to end:
  *  - at-least-once ingest: the source re-fetches a 5 s overlap; replayed
  *    guids die in the store's bounded anti-join dedup (S7/R18);
  *  - exactly-once-per-guid storage: the idempotent sink makes micro-batch
  *    replay after a crash harmless (offsets checkpointed);
  *  - prefix-committed egress: each trigger ships the ≤8192-event unshipped
  *    batch in (created_at, guid) order via [[SplunkShipper
  *    .shipPartitionedOnce]] — range-partitioned parallel POSTs, cursor
  *    committed at the last event of the longest fully-shipped prefix, HEC
  *    clients pooled per executor JVM across triggers (ST4);
  *  - error isolation (ST5): a ship failure logs and leaves the cursor at
  *    the shipped prefix — next trigger resumes; a fetch failure fails the
  *    QUERY (collector fail-fast), surfaced via `StreamingQuery.exception`.
  *
  * At scale this is the deployment shape: checkpointed offsets + an
  * idempotent store make the whole path crash-consistent with no custom
  * scheduler code.
  */
final class StreamingPipeline(
    spark: SparkSession,
    store: EventStore,
    shipper: SplunkShipper,
    mkClient: () => SplunkHecClient,
    apiAddress: String,
    triggerMillis: Long,
    shipParallelism: Int = 4,
    postBatchSize: Int = 32,
    clientPoolKey: String = "streaming-pipeline",
    logger: graft.logging.Lager = graft.logging.Lager.noop,
    sourceOptions: Map[String, String] = Map.empty) {

  private val lsession = logger.session("streaming-pipeline")

  /** Wire-shaped micro-batch → the store's input shape: the `id` column the
    * store assigns (R20) plus in-batch guid dedup (an overlap re-fetch can
    * land the same guid twice in ONE batch; keep the first in event order,
    * mirroring the store's `row_number() … = 1` tie-break). */
  private def prepare(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("guid").orderBy(F.col("created_at").asc)
    batch
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
      .drop("__rn")
      .withColumn("id", F.lit(0L))
      .select(graft.model.Schemas.cfAuditEvents.fieldNames.map(F.col).toSeq: _*)
  }

  /** Start the composed query. Each trigger: store the micro-batch
    * (dedup-append), then run one ship tick. Ship errors are isolated —
    * the batch still commits (its events stay unshipped for the next
    * trigger); store errors fail the query (collector fail-fast). */
  def start(checkpointDir: String): StreamingQuery = {
    val src = spark.readStream
      .format("graft-cf-events")
      .options(sourceOptions)
      .option("apiAddress", apiAddress)
      .load()
    src.writeStream
      .queryName("graft-streaming-pipeline")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stored = store.storeCFAuditEvents(prepare(batch))
        val (shipped, failed) = shipper.shipPartitionedOnce(
          shipParallelism, mkClient, postBatchSize, Some(clientPoolKey))
        lsession.info("trigger",
          "batch_id" -> batchId, "stored" -> stored,
          "shipped" -> shipped, "ship_failed" -> failed)
      }
      .start()
  }
}
