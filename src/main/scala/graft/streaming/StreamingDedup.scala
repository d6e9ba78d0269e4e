package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalDedup

/** Streaming ingest-time near-duplicate suppression: a stream of
  * (doc_id, text) documents → `foreachBatch` →
  * [[IncrementalDedup.dedupBatchIdempotent]] → survivors parquet.
  *
  * End-to-end exactly-once survivors under crash/restart, from two pieces:
  *  - the dedup is replay-STABLE: a re-run batch (foreachBatch is
  *    at-least-once) excludes its own bucket rows from the collision check,
  *    so it deterministically re-yields the SAME survivor set;
  *  - the survivor sink is idempotent: each batch overwrites its own
  *    `batch_id=<n>` partition directory, so a replay rewrites identical
  *    rows instead of appending duplicates.
  * Whichever point the previous attempt crashed at — before the bucket
  * append, between append and sink, or after — the replay converges to the
  * same survivors exactly once.
  */
object StreamingDedup {

  /** Attach the dedup stage to any streaming frame of (doc_id, text). */
  def attach(
      docs: DataFrame,
      checkpointDir: String,
      store: IncrementalDedup.BucketStore,
      survivorsDir: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = IncrementalDedup.dedupBatchIdempotent(
          batch, store, "doc_id", "text", batchId)
        kept.write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** File-source wiring: each line is `<doc_id>\t<text>`. A production
    * deployment points `attach` at a Kafka topic of documents — only this
    * source block changes. */
  def fromDocFiles(
      spark: SparkSession,
      docsDir: String,
      checkpointDir: String,
      store: IncrementalDedup.BucketStore,
      survivorsDir: String,
      triggerMillis: Long = 1000L): StreamingQuery = {
    val docs = spark.readStream.text(docsDir)
      .select(F.split(F.col("value"), "\t", 2).as("p"))
      .select(
        F.element_at(F.col("p"), 1).cast("long").as("doc_id"),
        F.element_at(F.col("p"), 2).as("text"))
    attach(docs, checkpointDir, store, survivorsDir, triggerMillis)
  }

  /** All survivors across batches (partition-discovered batch_id dirs). */
  def survivors(spark: SparkSession, survivorsDir: String): DataFrame =
    spark.read.option("basePath", survivorsDir).parquet(survivorsDir)
}
