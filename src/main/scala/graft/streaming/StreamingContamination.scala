package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalContamination

/** Streaming ingest-time DECONTAMINATION: a stream of (doc_id, text)
  * training documents → `foreachBatch` →
  * [[IncrementalContamination.checkBatch]] against the store's FROZEN
  * benchmark (shingles + bloom built once at init) — the contamination
  * member of the streaming curation family. checkBatch is replay-stable
  * (same-batch-id hits are anti-joined before append), so at-least-once
  * foreachBatch delivery yields exactly-once hit rows. */
object StreamingContamination {

  def attach(
      docs: DataFrame,
      checkpointDir: String,
      store: IncrementalContamination.ContaminationStore,
      n: Int,
      minShared: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalContamination.checkBatch(
          batch, store, idCol, textCol, n, minShared, batchId)
        ()
      }
      .start()

  /** Accumulated hits as of now. */
  def hits(spark: SparkSession, store: IncrementalContamination.ContaminationStore): DataFrame =
    IncrementalContamination.allHits(store)
}
