package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{IncrementalContamination, IncrementalDedup, TextAnalysis}

/** The WHOLE curation pipeline as ONE Structured Streaming query — the
  * training-data twin of [[StreamingPipeline]] (which composes the audit
  * path): a stream of (doc_id, text) documents runs, per micro-batch,
  *
  *   1. the stateless QUALITY gate ([[TextAnalysis.quality]] thresholds
  *      — map-only, no state);
  *   2. DECONTAMINATION against the store's FROZEN benchmark
  *      ([[IncrementalContamination.checkBatch]]; contaminated docs are
  *      dropped, and the hit rows land in the audit table);
  *   3. ingest-time NEAR-DUP suppression against the accumulated corpus
  *      ([[IncrementalDedup.dedupBatchIdempotent]]);
  *   4. an idempotent survivors sink (overwrite-by-batch-id partition).
  *
  * Exactly-once survivors under at-least-once foreachBatch replay holds
  * stage-wise: 1 is deterministic, 2 and 3 are replay-STABLE per
  * batch id (each excludes its own prior writes from its checks), and 4
  * overwrites rather than appends — so a crashed-and-replayed batch
  * converges to the identical survivor set, the same argument as
  * [[StreamingDedup]] extended across three stateful stores. */
object StreamingCuration {

  def attach(
      docs: DataFrame,
      checkpointDir: String,
      contamStore: IncrementalContamination.ContaminationStore,
      dedupStore: IncrementalDedup.BucketStore,
      survivorsDir: String,
      minTokens: Int = 30,
      maxStopRatio: Double = 0.4,
      contamN: Int = 3,
      contamMinShared: Long = 2L,
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // 1. quality gate — stateless, so a replay recomputes identically
        val quality = TextAnalysis.quality(batch, "text")
          .filter(F.col("stopword_ratio") <= maxStopRatio &&
            F.col("n_tokens") >= minTokens)
          .select("doc_id", "text")
        // 2. decontamination: checkBatch appends replay-stably; the DROP
        // set is read back from the store by batch id so a replayed
        // batch (whose fresh-hit frame is empty) still drops the same docs
        IncrementalContamination.checkBatch(
          quality, contamStore, "doc_id", "text", contamN, contamMinShared, batchId)
        val contaminated = contamStore.hits
          .filter(F.col("batch_id") === batchId)
          .select(F.col("train_id").as("doc_id")).distinct()
        val clean = quality.join(contaminated, Seq("doc_id"), "left_anti")
        // 3. near-dup suppression against the accumulated corpus
        val kept = IncrementalDedup.dedupBatchIdempotent(
          clean, dedupStore, "doc_id", "text", batchId)
        // 4. idempotent survivors sink
        kept.write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** All survivors across batches (partition-discovered batch_id dirs). */
  def survivors(spark: SparkSession, survivorsDir: String): DataFrame =
    spark.read.option("basePath", survivorsDir).parquet(survivorsDir)
      .drop("batch_id")
}
