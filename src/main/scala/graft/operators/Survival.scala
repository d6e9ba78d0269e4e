package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Survival analysis over right-censored durations — the retention /
  * lifetime toolkit (how long do users stay active, how long do
  * documents survive dedup sweeps, time-to-failure of jobs) where
  * CENSORING is the defining wrinkle: a subject still alive at the
  * observation horizon contributes "survived at least this long", not
  * an event, and dropping or miscounting those biases every naive
  * average.
  *
  * Scale shape: everything reduces to per-duration counts (one
  * combinable scan over subjects), then window algebra over the
  * duration axis — a frame whose size is the number of DISTINCT
  * durations (days, not subjects), so the global ordered window is over
  * an aggregate, never over data. */
object Survival {

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier, JASA 1958).
    * Input: one row per subject with a non-negative integer `durCol`
    * and `obsCol` ∈ {0, 1} (1 = the event was observed at that
    * duration, 0 = censored there). Output: one row per distinct
    * duration t — (t, n_risk, d_events, n_censored, survival) with
    * S(t) = Π_{tᵢ ≤ t, dᵢ > 0} (1 − dᵢ/n_riskᵢ).
    *
    * The product is computed as exp(Σ ln(1 − d/n)) — every term is an
    * IEEE function of two exact integers, the cumulative sum runs in
    * duration order in both engines, and round-6 collapses the residual
    * ulp drift. A duration where EVERYONE at risk dies is branched to an
    * exact 0 instead of flowing ln(0) through the sum — Spark's ln
    * returns NULL for non-positive input (silently dropping the term
    * from the window sum) while DuckDB returns −∞, so the explicit
    * branch is what keeps the engines agreeing; such a step is
    * necessarily the last row (nobody remains at risk after it). */
  def kaplanMeier(subjects: DataFrame, durCol: String, obsCol: String): DataFrame =
    kaplanMeierFromCounts(subjects
      .filter(F.col(durCol).isNotNull && F.col(obsCol).isNotNull)
      .groupBy(F.col(durCol).cast("long").as("t"))
      .agg(F.sum(F.col(obsCol).cast("long")).as("d"),
        F.count(F.lit(1)).as("c")))

  /** The estimator over a pre-aggregated (t, d, c) frame — per-duration
    * event/subject counts are the curve's MERGEABLE summary (plain
    * sums), the entry a streaming accumulator re-enters
    * (graft.streaming.StreamingSurvival). */
  def kaplanMeierFromCounts(byT: DataFrame): DataFrame = {
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byT.agg(F.sum("c").as("__n"))
    byT.crossJoin(F.broadcast(tot))
      .withColumn("n_risk", F.col("__n") - F.sum("c").over(w) + F.col("c"))
      .withColumn("__term",
        F.when(F.col("d") > 0 && F.col("d") < F.col("n_risk"),
          F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")))
          .otherwise(F.lit(0.0)))
      .withColumn("survival",
        F.when(F.col("d") === F.col("n_risk"), F.lit(0.0))
          .otherwise(F.round(F.exp(F.sum("__term").over(w)), 6)))
      .select(F.col("t"), F.col("n_risk"), F.col("d").as("d_events"),
        (F.col("c") - F.col("d")).as("n_censored"), F.col("survival"))
  }
}
