package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}

/** STREAM-STREAM point-in-interval join — "alert on every event that
  * falls inside any incident window, as both arrive": Structured
  * Streaming's native watermarked stream-stream inner join, keyed the
  * same way as the batch [[graft.operators.IntervalJoin]].
  *
  * Three ingredients make it scale:
  *  - the bucketized EQUALITY key (intervals explode to the buckets they
  *    cover — a stateless pre-join transform — and points map to one
  *    bucket), so the join is hash-partitioned by bucket instead of
  *    every-point-against-every-interval;
  *  - WATERMARKS on both event-time columns, which bound how late either
  *    stream may arrive relative to the other (later rows are dropped by
  *    the engine — the documented lateness contract);
  *  - a DECLARED maximum interval span (`maxSpanSec`), written into the
  *    join condition as explicit two-sided timestamp bounds
  *    (`p < hi <= p + maxSpan`). Containment alone only upper-bounds one
  *    direction, which lets the engine evict interval state but forces
  *    it to hold every point forever (a window containing an old point
  *    could always still arrive); the span bound is what makes POINT
  *    state evictable too, so state is a sliding window of both streams.
  *    The bound is implied by containment for any interval with
  *    span <= maxSpan; longer intervals are dropped up front rather than
  *    silently mismatched.
  *
  * Each qualifying (point, interval) pair emits exactly once (the
  * point's bucket is the one bucket both sides share), and inner-join
  * rows emit as soon as both sides have arrived. */
object StreamingIntervalJoin {

  /** Join a streaming `points` frame (timestamp column `pTsCol`) to a
    * streaming `intervals` frame (timestamp columns `loTsCol` inclusive,
    * `hiTsCol` exclusive) on containment. Column names must be disjoint.
    * `maxSpanSec` is the declared upper bound on interval length (longer
    * intervals are dropped); `bucketWidthSec` defaults to it. `lateness`
    * is the watermark delay for both sides. */
  def joined(points: DataFrame, pTsCol: String,
             intervals: DataFrame, loTsCol: String, hiTsCol: String,
             maxSpanSec: Long,
             bucketWidthSec: Long = 0L,
             lateness: String = "10 seconds"): DataFrame = {
    require(maxSpanSec > 0, "maxSpanSec must be positive")
    // Buckets are computed on MICROS — Spark's full timestamp resolution,
    // the same exact-integer domain as the batch IntervalJoin. Truncated
    // seconds would make `div(hi_seconds - 1, w)` drop the final bucket
    // whenever hi carries a sub-second fraction past a bucket boundary,
    // silently losing matches the timestamp comparison still admits.
    val w = (if (bucketWidthSec > 0) bucketWidthSec else maxSpanSec) * 1000000L
    val pb = points.withWatermark(pTsCol, lateness)
      .withColumn("__bucket",
        F.call_function("div", F.unix_micros(F.col(pTsCol)), F.lit(w)))
    val ib = intervals.withWatermark(hiTsCol, lateness)
      .filter(F.col(hiTsCol) > F.col(loTsCol) &&
        F.col(hiTsCol) <= F.col(loTsCol) + F.expr(s"INTERVAL $maxSpanSec SECONDS"))
      .withColumn("__bucket",
        F.explode(F.sequence(
          F.call_function("div", F.unix_micros(F.col(loTsCol)), F.lit(w)),
          F.call_function("div", F.unix_micros(F.col(hiTsCol)) - 1, F.lit(w)))))
    pb.join(ib,
        pb("__bucket") === ib("__bucket") &&
          F.col(pTsCol) >= F.col(loTsCol) && F.col(pTsCol) < F.col(hiTsCol) &&
          // implied by containment + the span bound; stated explicitly so
          // the engine can derive a points-side state eviction horizon
          F.col(hiTsCol) <= F.col(pTsCol) + F.expr(s"INTERVAL $maxSpanSec SECONDS"))
      .drop("__bucket")
  }
}
