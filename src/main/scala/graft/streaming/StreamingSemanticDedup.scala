package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalSemanticDedup

/** Streaming ingest-time SEMANTIC near-duplicate suppression: a stream of
  * (vec_id, embedding) rows → `foreachBatch` →
  * [[IncrementalSemanticDedup.dedupBatchIdempotent]] → survivors parquet —
  * the embedding twin of [[StreamingDedup]], riding the same two pieces
  * for end-to-end exactly-once survivors under crash/restart:
  *  - the dedup is replay-STABLE (a re-run batch excludes its own stored
  *    memberships from the collision check, so it deterministically
  *    re-yields the SAME survivor set);
  *  - the survivor sink is idempotent (each batch overwrites its own
  *    `batch_id=<n>` partition directory).
  * The centroid model is FROZEN for the stream's lifetime — cell
  * assignment can never shift between a batch and its replay.
  */
object StreamingSemanticDedup {

  /** Attach the semantic-dedup stage to any streaming frame of
    * (`idCol`, `vecCol`). */
  def attach(
      vectors: DataFrame,
      checkpointDir: String,
      store: IncrementalSemanticDedup.CellStore,
      survivorsDir: String,
      centroids: Array[Array[Double]],
      minCos: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      triggerMillis: Long = 1000L): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = IncrementalSemanticDedup.dedupBatchIdempotent(
          batch, store, idCol, vecCol, centroids, minCos, batchId)
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
