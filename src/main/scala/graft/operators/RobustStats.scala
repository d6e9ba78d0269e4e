package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Robust location estimates per group — the complement of
  * [[TimeSeries.robustAnomalies]]'s median/MAD detection: when the
  * DELIVERABLE is the average itself (mean price, mean latency, mean
  * doc length) a handful of outliers poison the plain mean, and the
  * standard fixes are trimming (drop the tails) and winsorizing (clamp
  * them).
  *
  * Scale shape: one exact grouped percentile pass for the tail bounds
  * (groups partition the sort; for raw unaggregated streams swap in the
  * KLL sketch), one join of the per-group 2-scalar bound frame, one
  * combinable aggregate. Bounds are percentile_cont-interpolated values
  * of exact inputs — bit-identical across engines — so which rows trim
  * is engine-exact; the means are double sums collapsed by round 4. */
object RobustStats {

  /** Per-group raw / trimmed / winsorized means with `loQ`/`hiQ`
    * quantile bounds (classic 10%/90%). Output: (grp, n, n_kept,
    * raw_mean, trimmed_mean, winsorized_mean). */
  def trimmedMeans(df: DataFrame, keyCol: String, valCol: String,
                   loQ: Double = 0.1, hiQ: Double = 0.9): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "need 0 <= loQ < hiQ <= 1")
    val base = df.select(F.col(keyCol).as("grp"), F.col(valCol).cast("double").as("x"))
      .filter(F.col("x").isNotNull)
    val bounds = base.groupBy("grp").agg(
      F.expr(s"percentile(x, $loQ)").as("lo"),
      F.expr(s"percentile(x, $hiQ)").as("hi"))
    val kept = F.col("x") >= F.col("lo") && F.col("x") <= F.col("hi")
    base.join(bounds, "grp")
      .groupBy("grp")
      .agg(
        F.count(F.lit(1)).as("n"),
        F.count(F.when(kept, F.lit(1))).as("n_kept"),
        F.round(F.avg(F.col("x")), 4).as("raw_mean"),
        F.round(F.avg(F.when(kept, F.col("x"))), 4).as("trimmed_mean"),
        F.round(F.avg(F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))), 4)
          .as("winsorized_mean"))
  }
}
