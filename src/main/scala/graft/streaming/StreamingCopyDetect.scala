package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalCopyDetect

/** Streaming ingest-time COPY suppression: a stream of (doc_id, text)
  * rows → `foreachBatch` →
  * [[IncrementalCopyDetect.dedupBatchIdempotent]] → survivors parquet —
  * the substring-overlap twin of [[StreamingDedup]] and
  * [[StreamingSemanticDedup]], riding the same two pieces for end-to-end
  * exactly-once survivors under crash/restart:
  *  - the copy check is replay-STABLE (a re-run batch excludes its own
  *    stored postings, so it deterministically re-yields the SAME
  *    survivor set);
  *  - the survivor sink is idempotent (each batch overwrites its own
  *    `batch_id=<n>` partition directory).
  * The df cap is batch-relative, so a batch's postings — and therefore
  * its survivor set — can never shift between a run and its replay. */
object StreamingCopyDetect {

  /** Attach the copy-detection stage to any streaming frame of
    * (`idCol`, `textCol`). */
  def attach(
      docs: DataFrame,
      checkpointDir: String,
      store: IncrementalCopyDetect.PostingStore,
      survivorsDir: String,
      minOverlap: Double = 0.8,
      maxDfFrac: Double = 0.05,
      idCol: String = "doc_id",
      textCol: String = "text",
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = IncrementalCopyDetect.dedupBatchIdempotent(
          batch, store, idCol, textCol, batchId, minOverlap, maxDfFrac)
        kept.write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** All survivors across batches (partition-discovered batch_id dirs). */
  def survivors(spark: org.apache.spark.sql.SparkSession, survivorsDir: String): DataFrame =
    spark.read.option("basePath", survivorsDir).parquet(survivorsDir)
      .drop(F.col("batch_id"))
}
