package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Time-series regularization over the event stream: gap-filled resampling
  * to a fixed grid, last-observation-carried-forward imputation, and
  * trailing-window smoothing.
  *
  * The reference pipeline only ever aggregates events into the buckets that
  * exist (paas-auditor's reporting queries group by whatever hours have
  * rows); a monitoring/training pipeline needs the DENSE series — every
  * bucket between a key's first and last observation, zeros where nothing
  * happened, carried-forward values where a gauge had no fresh reading.
  *
  * Scale shape (100 TB): the raw-event pass is ONE map-side-combinable
  * aggregation to (key, bucket) — cardinality keys × hours, orders of
  * magnitude smaller than the input. Everything downstream (bounds, grid
  * explode, left join, windows) runs on that reduced frame. The LOCF/MA
  * windows partition BY KEY, so parallelism is preserved across keys and a
  * single key's series (bounded by the time span, not the event count)
  * stays within one task.
  */
object TimeSeries {

  /** Hourly gap-filled resample of `events` per `keyCol`.
    *
    * Output per (key, hour in [min observed, max observed]):
    *   - `cnt`      events in the bucket (0 for gap buckets)
    *   - `avg_v`    mean of `valCol` in the bucket (NULL for gaps)
    *   - `locf_avg` `avg_v` carried forward over gaps (NULL until the
    *                key's first observed bucket)
    *   - `ma4_cnt`  trailing 4-bucket moving average of `cnt`
    */
  def resampleHourlyLocf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String): DataFrame = {
    // Timestamp -> epoch-hour bucket. cast(long) truncates micros to whole
    // seconds exactly like DuckDB's floor(epoch(ts)); both floor for the
    // post-1970 instants this table carries.
    val bucket = F.floor(F.col(tsCol).cast("long") / F.lit(3600)).cast("long")

    val hourly = events
      .groupBy(F.col(keyCol).as("k"), bucket.as("h"))
      .agg(F.count(F.lit(1)).as("n"), F.sum(valCol).as("sv"))

    val grid = hourly
      .groupBy("k")
      .agg(F.min("h").as("mn"), F.max("h").as("mx"))
      .select(F.col("k"), F.explode(F.sequence(F.col("mn"), F.col("mx"))).as("h"))

    val byKey = Window.partitionBy("k").orderBy("h")
    val locfW = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val maW = byKey.rowsBetween(-3, Window.currentRow)

    grid
      .join(hourly, Seq("k", "h"), "left")
      .select(
        F.col("k"),
        F.col("h"),
        F.coalesce(F.col("n"), F.lit(0L)).as("cnt"),
        F.when(F.col("n").isNotNull, F.round(F.col("sv") / F.col("n"), 4)).as("avg_v"))
      .withColumn("locf_avg", F.last("avg_v", ignoreNulls = true).over(locfW))
      .withColumn("ma4_cnt",
        F.round(F.sum("cnt").over(maW).cast("double") / F.count(F.lit(1)).over(maW), 4))
      .select(
        F.col("k").as(keyCol),
        F.col("h").as("bucket_hour"),
        F.col("cnt"),
        F.col("avg_v"),
        F.col("locf_avg"),
        F.col("ma4_cnt"))
  }
}
