package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming top user journeys — the
  * [[graft.operators.TimeSeries.topPaths]] twin. The accumulating state
  * is each user's EARLIEST-`depth` events: a per-batch bounded top-k
  * (smallest (ts, event_id) per user) is a classic mergeable summary —
  * an event outside a batch's earliest-k can never be in the union's
  * earliest-k — so the read side unions the partials and re-enters the
  * batch operator unchanged, and streamed == batch EXACTLY regardless
  * of how events split across micro-batches or replays (a replayed
  * batch overwrites its own `batch_id=` partition, the StreamingDrift
  * storage contract). */
object StreamingPaths {

  /** Persist each micro-batch's per-user earliest-`depth` events
    * (user_id, ts, event_type, event_id). NULL keys/timestamps/types/ids
    * are excluded — the batch operator's own filter (NULL tie-break ids
    * order differently across engines). */
  def attach(
      events: DataFrame,
      checkpointDir: String,
      partsDir: String,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      depth: Int = 4,
      triggerMillis: Long = 1000L): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        batch
          .select(F.col(userCol).as("user_id"), F.col(tsCol).as("ts"),
            F.col(typeCol).as("event_type"), F.col(idCol).as("event_id"))
          .filter(F.col("user_id").isNotNull && F.col("ts").isNotNull &&
            F.col("event_type").isNotNull && F.col("event_id").isNotNull)
          .withColumn("__rn", F.row_number().over(w))
          .filter(F.col("__rn") <= depth)
          .drop("__rn")
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$partsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** The ranked first-`depth` journeys over everything streamed so far —
    * the [[graft.operators.TimeSeries.topPaths]] output shape, from the
    * unioned partials (an equivalent reduced event multiset: each user's
    * true earliest-`depth` events survive every batch's local cut). */
  def topPathsNow(spark: SparkSession, partsDir: String,
                  depth: Int = 4, k: Int = 20): DataFrame =
    graft.operators.TimeSeries.topPaths(
      spark.read.parquet(partsDir).drop("batch_id"),
      "user_id", "ts", "event_type", "event_id", depth, k)
}
