package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Keyless point-in-interval join — "every event inside ANY incident
  * window" — without the nested-loop plan vanilla Spark produces for a
  * pure inequality join (BroadcastNestedLoopJoin: broadcast one whole
  * side, compare every pair; dead at 100 TB).
  *
  * The scalable shape is BUCKETIZATION: pick a bucket width comparable to
  * the interval span, explode each interval to the buckets it covers
  * (span/width + 1 rows — bounded fan-out), map each point to its single
  * bucket, equi-join on the bucket (hash/sort-merge, AQE-skew-safe), and
  * apply the exact range residual. Every qualifying (point, interval)
  * pair is discovered EXACTLY once — in the point's bucket, which the
  * covering interval necessarily exploded to — so no dedup pass is
  * needed. Cost: Σ per-bucket |points|·|intervals|, governed by the
  * bucket width; the quadratic blowup of the nested loop is confined to
  * what actually overlaps in time. */
object IntervalJoin {

  /** Join `points` (long column `pCol`) to `intervals` (long columns
    * `loCol` inclusive, `hiCol` exclusive) on containment. Column names
    * must be disjoint across the two frames. `bucketWidth` should be on
    * the order of the typical interval span. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      F.call_function("div", F.col(pCol), F.lit(bucketWidth)))
    // hi is EXCLUSIVE: the last bucket any qualifying point can live in is
    // div(hi - 1) — sequencing to div(hi) would emit one posting per
    // interval that nothing can ever match (DOUBLING fan-out whenever hi
    // is bucket-aligned, the common case of span == width). Empty
    // intervals (hi <= lo) match nothing and are dropped up front, which
    // also keeps the sequence ascending.
    val ib = intervals
      .filter(F.col(hiCol) > F.col(loCol))
      .withColumn("__bucket",
        F.explode(F.sequence(
          F.call_function("div", F.col(loCol), F.lit(bucketWidth)),
          F.call_function("div", F.col(hiCol) - 1, F.lit(bucketWidth)))))
    pb.join(ib, Seq("__bucket"))
      .filter(F.col(pCol) >= F.col(loCol) && F.col(pCol) < F.col(hiCol))
      .drop("__bucket")
  }

  /** Interval–interval OVERLAP join (session-vs-incident, ad-vs-view):
    * half-open `[lo1, hi1) × [lo2, hi2)` pairs with `lo1 < hi2 AND
    * lo2 < hi1`. Both sides explode to their covered buckets and
    * equi-join, confining the pair space to co-bucketed overlap like
    * [[pointInInterval]] — but an overlapping pair now shares EVERY
    * bucket in `[div(max(lo1,lo2)), div(min(hi1,hi2)-1)]`, so exactly-once
    * needs canonical attribution instead of a dedup pass: a pair is
    * emitted only in the bucket of `greatest(lo1, lo2)` — the overlap's
    * first instant, which both intervals necessarily cover (it is ≥ each
    * `lo` and, when they overlap, < each `hi`), so both sides exploded to
    * that bucket and no other shared bucket passes the filter. Column
    * names must be disjoint across the two frames. */
  def intervalOverlap(left: DataFrame, lo1: String, hi1: String,
                      right: DataFrame, lo2: String, hi2: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(F.col(hi) > F.col(lo)) // empty intervals overlap nothing
        .withColumn("__bucket",
          F.explode(F.sequence(
            F.call_function("div", F.col(lo), F.lit(bucketWidth)),
            F.call_function("div", F.col(hi) - 1, F.lit(bucketWidth)))))
    buckets(left, lo1, hi1).join(buckets(right, lo2, hi2), Seq("__bucket"))
      .filter(F.col(lo1) < F.col(hi2) && F.col(lo2) < F.col(hi1))
      .filter(F.col("__bucket") ===
        F.call_function("div", F.greatest(F.col(lo1), F.col(lo2)), F.lit(bucketWidth)))
      .drop("__bucket")
  }
}
