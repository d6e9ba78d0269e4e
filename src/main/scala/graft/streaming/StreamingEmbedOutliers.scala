package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalEmbedOutliers

/** Streaming ingest-time embedding-outlier SCORING: a stream of
  * (vec_id, embedding) rows → `foreachBatch` →
  * [[IncrementalEmbedOutliers.scoreBatch]] — the outlier member of the
  * streaming curation family ([[StreamingDedup]] /
  * [[StreamingSemanticDedup]] / [[StreamingBoilerplate]]).
  *
  * Only SCORING streams; the FLAG read stays a batch call
  * ([[IncrementalEmbedOutliers.flags]]) because the cutoff is a
  * corpus-wide percentile that every new batch moves — materializing
  * per-batch flags would freeze thresholds at whatever the corpus looked
  * like mid-stream. scoreBatch is replay-stable (same-batch-id rows are
  * anti-joined before append), so at-least-once foreachBatch delivery
  * still yields exactly-once score rows with no overwrite sink needed.
  */
object StreamingEmbedOutliers {

  /** Attach the scoring stage to any streaming frame of (`idCol`,
    * `vecCol`). The model is FROZEN for the stream's lifetime. */
  def attach(
      vectors: DataFrame,
      checkpointDir: String,
      store: IncrementalEmbedOutliers.ScoreStore,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      triggerMillis: Long = 1000L): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalEmbedOutliers.scoreBatch(
          batch, store, idCol, vecCol, centroids, batchId)
        ()
      }
      .start()

  /** The corpus-wide flag set as of now — delegates to the incremental
    * operator's percentile-recomputing read. */
  def flags(spark: SparkSession, store: IncrementalEmbedOutliers.ScoreStore,
            q: Double = 0.05): DataFrame =
    IncrementalEmbedOutliers.flags(store, q)
}
