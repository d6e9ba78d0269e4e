package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization (the "session windows" operator the reference
  * lacks, SURVEY §2B absent-list).
  *
  * Batch form: a per-user window pass — `session_idx` is the running count
  * of gaps larger than `gapMinutes`. One shuffle on the user key; frames
  * are `rowsBetween(unboundedPreceding, current)` so the window is
  * computed streamingly per partition, never materializing a session
  * buffer. The streaming form lives in
  * [[graft.streaming.StatefulCounts]]-style mapGroupsWithState state.
  */
object Sessionize {

  /** Adds `session_idx` (0-based per user) to each event row. */
  def assign(df: DataFrame, userCol: String, tsCol: String, idCol: String,
             gapMinutes: Int): DataFrame = {
    val byTime = Window.partitionBy(F.col(userCol)).orderBy(F.col(tsCol), F.col(idCol))
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = F.lag(F.col(tsCol), 1).over(byTime)
    val brk = F.when(
      prev.isNotNull &&
        F.unix_micros(F.col(tsCol)) - F.unix_micros(prev) > gapMinutes * 60L * 1000000L,
      F.lit(1L))
      .otherwise(F.lit(0L))
    df.withColumn("__brk", brk)
      .withColumn("session_idx", F.sum(F.col("__brk")).over(running))
      .drop("__brk")
  }

  /** Per-session aggregate: event count and span seconds. */
  def sessions(df: DataFrame, userCol: String, tsCol: String, idCol: String,
               gapMinutes: Int): DataFrame =
    assign(df, userCol, tsCol, idCol, gapMinutes)
      .groupBy(F.col(userCol), F.col("session_idx"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        (F.unix_micros(F.max(F.col(tsCol))) - F.unix_micros(F.min(F.col(tsCol)))).as("span_us"))
}
