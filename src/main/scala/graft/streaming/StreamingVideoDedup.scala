package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalVideoDedup

/** Streaming ingest-time VIDEO dedup — the foreachBatch twin of
  * [[IncrementalVideoDedup]], completing the family symmetry
  * ([[StreamingDedup]] / [[StreamingCopyDetect]] /
  * [[StreamingBoilerplate]]…): a stream of (media_id, payload) videos →
  * per micro-batch frame fingerprinting → containment check against the
  * accumulated frame-print store → idempotent survivors sink.
  *
  * Exactly-once survivors under at-least-once replay: the check is
  * replay-stable by batch id ([[IncrementalVideoDedup.dedupBatchIdempotent]]
  * excludes the batch's own prior prints) and the sink overwrites the
  * batch's own partition. Survivors write (media_id) only — the payloads
  * already live in the source of record; the sink is the curation
  * decision, not a payload copy. */
object StreamingVideoDedup {

  def attach(
      media: DataFrame,
      checkpointDir: String,
      store: IncrementalVideoDedup.FramePrintStore,
      survivorsDir: String,
      stride: Int = 1,
      maxHamming: Int = 3,
      minContainment: Double = 0.8,
      triggerMillis: Long = 1000L): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = IncrementalVideoDedup.dedupBatchIdempotent(
          batch, store, batchId, stride, maxHamming, minContainment)
        kept.select(F.col("media_id"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** All surviving video ids across batches. */
  def survivors(spark: SparkSession, survivorsDir: String): DataFrame =
    spark.read.option("basePath", survivorsDir).parquet(survivorsDir)
      .drop("batch_id")
}
