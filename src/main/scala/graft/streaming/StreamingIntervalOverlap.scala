package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}

/** STREAM-STREAM interval-OVERLAP join — "pair every session with every
  * incident window it overlaps, as both arrive": the streaming twin of
  * [[graft.operators.IntervalJoin.intervalOverlap]], built on Structured
  * Streaming's native watermarked stream-stream inner join exactly like
  * [[StreamingIntervalJoin]].
  *
  * Both sides explode to their covered buckets (a stateless pre-join
  * transform), the join is hash-partitioned by bucket, and the exact
  * overlap residual `lo1 < hi2 AND lo2 < hi1` runs inside the join
  * condition. Exactly-once WITHOUT a dedup pass is the batch operator's
  * canonical attribution, also inside the condition: a pair emits only in
  * the bucket of `greatest(lo1, lo2)` — the overlap's first instant,
  * covered by both sides.
  *
  * State eviction needs BOTH watermarked columns bounded relative to each
  * other. Overlap alone bounds neither direction (an arbitrarily old
  * interval could always still overlap something new), so both sides
  * declare the same `maxSpanSec` ceiling on interval length; overlap plus
  * the two span bounds implies `hi1 < hi2 + maxSpan` and
  * `hi2 < hi1 + maxSpan`, which are stated explicitly so the engine can
  * derive an eviction horizon for each store. Intervals longer than
  * `maxSpanSec` are dropped up front rather than silently mismatched —
  * the [[StreamingIntervalJoin]] contract. As there, Spark guarantees
  * state CLEANUP for rows older than the horizon, not that late input is
  * dropped — don't assert the latter. */
object StreamingIntervalOverlap {

  /** Join two streaming interval frames (`loTs*` inclusive, `hiTs*`
    * exclusive timestamps) on overlap. Column names must be disjoint.
    * `lateness` is the watermark delay for both sides; `bucketWidthSec`
    * defaults to `maxSpanSec`. */
  def joined(left: DataFrame, loTs1: String, hiTs1: String,
             right: DataFrame, loTs2: String, hiTs2: String,
             maxSpanSec: Long,
             bucketWidthSec: Long = 0L,
             lateness: String = "10 seconds"): DataFrame = {
    require(maxSpanSec > 0, "maxSpanSec must be positive")
    // micros-domain buckets, same exact-integer arithmetic as the batch
    // operator (second truncation would lose sub-second boundary matches)
    val w = (if (bucketWidthSec > 0) bucketWidthSec else maxSpanSec) * 1000000L
    def buckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withWatermark(hi, lateness)
        .filter(F.col(hi) > F.col(lo) &&
          F.col(hi) <= F.col(lo) + F.expr(s"INTERVAL $maxSpanSec SECONDS"))
        .withColumn("__bucket",
          F.explode(F.sequence(
            F.call_function("div", F.unix_micros(F.col(lo)), F.lit(w)),
            F.call_function("div", F.unix_micros(F.col(hi)) - 1, F.lit(w)))))
    val lb = buckets(left, loTs1, hiTs1)
    val rb = buckets(right, loTs2, hiTs2)
    lb.join(rb,
        lb("__bucket") === rb("__bucket") &&
          F.col(loTs1) < F.col(hiTs2) && F.col(loTs2) < F.col(hiTs1) &&
          // implied by overlap + the two span ceilings; stated so BOTH
          // state stores get an eviction horizon
          F.col(hiTs1) <= F.col(hiTs2) + F.expr(s"INTERVAL $maxSpanSec SECONDS") &&
          F.col(hiTs2) <= F.col(hiTs1) + F.expr(s"INTERVAL $maxSpanSec SECONDS") &&
          // canonical exactly-once attribution: emit only in the bucket
          // of the overlap's first instant
          lb("__bucket") === F.call_function("div",
            F.unix_micros(F.greatest(F.col(loTs1), F.col(loTs2))), F.lit(w)))
      .drop(lb("__bucket")).drop(rb("__bucket"))
  }
}
