package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalBoilerplate

/** Streaming boilerplate removal: a stream of (doc_id, text) documents →
  * `foreachBatch` → [[IncrementalBoilerplate.cleanBatch]] → cleaned docs
  * parquet. The streaming face of the accumulating chunk-df store.
  *
  * End-to-end exactly-once cleaned output under crash/restart, the
  * [[StreamingDedup]] recipe: cleanBatch is replay-STABLE (reads exclude
  * the batch's own persisted counts, so an at-least-once replay sees the
  * same accumulated frequencies and re-emits identical documents) and the
  * sink overwrites its own `batch_id=<n>` partition. */
object StreamingBoilerplate {

  def attach(
      docs: DataFrame,
      checkpointDir: String,
      store: IncrementalBoilerplate.ChunkDfStore,
      cleanedDir: String,
      chunkTokens: Int = 16,
      minDocs: Long = 2L,
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cleaned = IncrementalBoilerplate.cleanBatch(
          batch, store, "doc_id", "text", chunkTokens, minDocs, batchId)
        cleaned.write.mode(SaveMode.Overwrite)
          .parquet(s"$cleanedDir/batch_id=$batchId")
        ()
      }
      .start()

  /** All cleaned docs across batches (partition-discovered batch dirs). */
  def cleaned(spark: org.apache.spark.sql.SparkSession, cleanedDir: String): DataFrame =
    spark.read.option("basePath", cleanedDir).parquet(cleanedDir)
      .select(F.col("doc_id"), F.col("n_chunks"), F.col("n_removed"), F.col("clean_text"))
}
