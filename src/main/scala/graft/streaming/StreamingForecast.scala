package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TimeSeries

/** Streaming Holt-Winters: events accumulate as (key, day) COUNT
  * partials — plain mergeable sums, so unlike the itemsets twin there
  * is NO batch-completeness contract: a day split across micro-batches
  * just sums back together at read time. Each batch overwrites its own
  * `batch_id=` partition (replay-idempotent); `forecastNow` re-derives
  * the daily series and runs the batch operator's exact recursion over
  * it, so a streamed board equals the batch answer on the same events
  * by construction. State is keys × days rows — the time axis, never
  * the event count. */
object StreamingForecast {

  def attach(
      events: DataFrame,
      checkpointDir: String,
      countsDir: String,
      keyCol: String,
      tsCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(F.col(keyCol).cast("string").as("k"), F.to_date(F.col(tsCol)).as("d"))
          .filter(F.col("k").isNotNull && F.col("d").isNotNull)
          .groupBy("k", "d").agg(F.count(F.lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$countsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** The forecast board over everything streamed so far — the
    * [[TimeSeries.holtWintersForecast]] output shape (keys with fewer
    * than two seasons of days are absent, like the batch operator). */
  def forecastNow(spark: SparkSession, countsDir: String,
                  period: Int = 7, h: Int = 7): DataFrame = {
    // partition-col types are INFERRED on partial reads: cast explicitly
    val daily = StreamingDrift.readPartials(spark, countsDir,
        Seq("k" -> "string", "d" -> "date"))
      .groupBy("k", "d").agg(F.sum("n").cast("double").as("x"))
    TimeSeries.holtWintersForecast(daily, "k", "d", "x", period, h)
  }
}
