package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, functions => F}

import graft.functions.{Theta, ThetaSketchAggregator}
import graft.Pin._

/** Corpus-slice set algebra at sketch fidelity: per-slice theta (KMV)
  * sketches and pairwise intersection / union / Jaccard ESTIMATES between
  * every slice pair — the train/test-contamination, source-overlap, and
  * audience-intersection monitoring shape at 100 TB, where the exact
  * answer (a distinct self-join per pair) is a full-data shuffle PER PAIR
  * but the sketch answer is one scan + k-bounded joins.
  *
  * Everything downstream of the one sketch-building aggregate operates on
  * EXPLODED retained-hash rows (≤ k per slice) with plain column algebra:
  * no UDF touches a sketch after aggregation, no sketch is collected to
  * the driver, and a G-slice overlap matrix costs O(G²·k) joined rows —
  * independent of data size. Scale shape: ONE map-side-combinable
  * aggregate over the data (the only full scan), then joins over G·k-row
  * frames.
  *
  * Estimates are exact while every participating sketch is unsaturated
  * (< k distinct values — the observable lossless regime, see
  * [[graft.functions.Theta]]); above saturation the single-set relative
  * standard error is ≈ 1/√(k−2) and set-op errors scale with the
  * fraction of the k-bounded common sample that matches. */
object SetSketches {

  /** One theta sketch per `keyCol` group over `valueCol`'s string form
    * (null values skipped, the COUNT(DISTINCT) convention).
    * Output: (set_key, sk). */
  def sketchSets(df: DataFrame, keyCol: String, valueCol: Column, k: Int): DataFrame = {
    val ag = F.udaf(new ThetaSketchAggregator(k), Encoders.STRING)
    df.groupBy(F.col(keyCol).as("set_key"))
      .agg(ag(valueCol.cast("string")).as("sk"))
  }

  /** Per-slice distinct-count estimates: (set_key, est, saturated). */
  def estimates(sketches: DataFrame, k: Int): DataFrame =
    meta(sketches, k).select(
      F.col("key").as("set_key"),
      F.col("est"),
      (F.col("sz") >= k).as("saturated"))

  /** Pairwise set-operation estimates over every unordered slice pair
    * (set_a < set_b). Output columns: est_a, est_b, est_intersect,
    * est_union, est_diff_ab (= |A∖B| est), est_jaccard, saturated_a,
    * saturated_b. Exact when both sides are unsaturated. */
  def pairOverlap(sketches: DataFrame, k: Int): DataFrame = {
    // pin the aggregate ONCE (one row of ≤ k longs per slice): meta and
    // the exploded-hash frame both read it, and must not re-scan the data
    val sk = sketches.pin()
    val m = meta(sk, k)
    val hashes = sk.select(
      F.col("set_key").as("key"), F.explode(F.col("sk.retained")).as("h"))

    val a = m.select(F.col("key").as("set_a"), F.col("theta").as("__ta"),
      F.col("est").as("est_a"), (F.col("sz") >= k).as("saturated_a"))
    val b = m.select(F.col("key").as("set_b"), F.col("theta").as("__tb"),
      F.col("est").as("est_b"), (F.col("sz") >= k).as("saturated_b"))
    val pairs = a.join(b, F.col("set_a") < F.col("set_b"))
      .withColumn("__t", F.least(F.col("__ta"), F.col("__tb")))
      .withColumn("__frac",
        F.when(F.col("__t") === Theta.Unsaturated, F.lit(1.0))
          .otherwise(F.col("__t").cast("double") / F.lit(Theta.D)))

    // each side's below-threshold sample, tagged, per pair: hashes are
    // < 2^62 < Unsaturated, so `h < t` is the single universal filter
    val pk = pairs.select("set_a", "set_b", "__t")
    val ra = pk.join(hashes, F.col("set_a") === F.col("key"))
      .filter(F.col("h") < F.col("__t"))
      .select(F.col("set_a"), F.col("set_b"), F.col("h"),
        F.lit(1).as("__a"), F.lit(0).as("__b"))
    val rb = pk.join(hashes, F.col("set_b") === F.col("key"))
      .filter(F.col("h") < F.col("__t"))
      .select(F.col("set_a"), F.col("set_b"), F.col("h"),
        F.lit(0).as("__a"), F.lit(1).as("__b"))
    val counts = ra.unionAll(rb)
      .groupBy("set_a", "set_b", "h")
      .agg(F.max("__a").as("__ina"), F.max("__b").as("__inb"))
      .groupBy("set_a", "set_b")
      .agg(F.count(F.lit(1)).as("__nu"),
        F.sum(F.col("__ina") * F.col("__inb")).as("__ni"),
        F.sum(F.col("__ina")).as("__na"))

    // every estimator reads the SAME common-threshold sample (the theta
    // framework's composability): count/frac for ∩, ∪, and A∖B alike
    pairs.join(counts, Seq("set_a", "set_b"), "left")
      .select(F.col("set_a"), F.col("set_b"), F.col("est_a"), F.col("est_b"),
        (F.coalesce(F.col("__ni"), F.lit(0L)).cast("double") / F.col("__frac")).as("est_intersect"),
        (F.coalesce(F.col("__nu"), F.lit(0L)).cast("double") / F.col("__frac")).as("est_union"),
        ((F.coalesce(F.col("__na"), F.lit(0L)) - F.coalesce(F.col("__ni"), F.lit(0L)))
          .cast("double") / F.col("__frac")).as("est_diff_ab"),
        F.when(F.coalesce(F.col("__nu"), F.lit(0L)) === 0L, F.lit(0.0))
          .otherwise(F.coalesce(F.col("__ni"), F.lit(0L)).cast("double") /
            F.col("__nu").cast("double")).as("est_jaccard"),
        F.col("saturated_a"), F.col("saturated_b"))
  }

  /** SLIDING-WINDOW distinct counts — the query COUNT(DISTINCT) cannot
    * decompose: distinct-over-7-days is not a sum of daily distincts,
    * and the exact answer re-scans `window` days of raw data PER output
    * day. Sketch unions decompose it: ONE scan builds a theta sketch
    * per day, then each output day k-min-folds its window's ≤ k·window
    * retained hashes ([[graft.functions.ThetaHashAggregator]] — the
    * distributed rebuild, nothing collected). Exact while every window
    * stays under k distinct values (the observable lossless regime);
    * day frames are tiny, so the window-membership range join is a
    * broadcast over days × window rows, never data.
    *
    * Output: (day, est, saturated) — one row per day with data,
    * covering the `window` days ending at it. */
  def slidingDistinct(df: DataFrame, dayCol: Column, valueCol: Column,
                      window: Int, k: Int): DataFrame =
    slidingFromDaySketches(
      sketchSets(df.select(dayCol.as("d"), valueCol.as("v")), "d", F.col("v"), k),
      window, k)

  /** The window-union tail over a pre-built (set_key: date, sk) day-
    * sketch frame — day sketches are the sliding monitor's mergeable
    * summary, the entry the streaming accumulator re-enters
    * (graft.streaming.StreamingSetSketches.slidingDistinctNow). */
  def slidingFromDaySketches(daySketches: DataFrame, window: Int, k: Int): DataFrame = {
    require(window >= 1, "window must be positive")
    val daySk = daySketches.pin() // feeds the day grid AND the member join
    val days = daySk.select(F.col("set_key").as("wd"))
    val members = days.join(
      daySk.select(F.col("set_key").as("md"), F.col("sk")),
      F.col("md") >= F.date_sub(F.col("wd"), window - 1) && F.col("md") <= F.col("wd"))
    val ag = F.udaf(new graft.functions.ThetaHashAggregator(k), Encoders.scalaLong)
    val unions = members
      .select(F.col("wd"), F.explode(F.col("sk.retained")).as("h"))
      .groupBy(F.col("wd").as("set_key"))
      .agg(ag(F.col("h")).as("sk"))
    estimates(unions, k).withColumnRenamed("set_key", "day")
  }

  /** Per-slice scalar frame shared by the public surfaces: θ (sentinel
    * when unsaturated), retained size, and the cardinality estimate. */
  private def meta(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(
      F.col("set_key").as("key"),
      F.size(F.col("sk.retained")).as("sz"),
      F.when(F.size(F.col("sk.retained")) >= k,
          F.element_at(F.col("sk.retained"), k))
        .otherwise(F.lit(Theta.Unsaturated)).as("theta"))
      .withColumn("est",
        F.when(F.col("sz") < k, F.col("sz").cast("double"))
          .otherwise(F.lit((k - 1).toDouble * Theta.D) / F.col("theta").cast("double")))
}
