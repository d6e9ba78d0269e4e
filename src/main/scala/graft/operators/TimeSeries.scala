package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.Pin._

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

  /** Per-entity TIME-SERIES SIMILARITY SEARCH (the distributed top-k
    * similarity-search shape of the streaming/EDBT line of work, over the
    * event stream): each entity is rolled up to a fixed 24-dim
    * hour-of-day activity profile (sum of `valCol` per UTC hour — one
    * combinable aggregation however large the event table), and entities
    * are ranked by profile cosine. The all-pairs stage is over ENTITIES
    * (the rollup output), not events — an entity-count-squared frame a
    * real deployment caps by ANN-bucketing profiles like any other
    * embedding; here queries are restricted (`queryPred`) and the
    * bounded-heap top-k keeps the exchange O(k). */
  /** Ordered funnel analysis: how many entities reached each stage of
    * `stages` IN ORDER (stage k counts only if its event happened strictly
    * after the entity's stage-k-1 time; the entity's stage time is the
    * EARLIEST qualifying event). Output: (stage, stage_idx, n_users).
    *
    * Scale shape: stage 1 is one map-side-combinable min-aggregate over
    * the type-pruned events; each later stage joins the entity-sized
    * previous frame (keys × 1 row) back to that stage's type-pruned
    * events and min-aggregates — k passes over filtered events, never an
    * all-event window or collect. */
  def funnel(events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(F.col(typeCol) === stages.head)
      .groupBy(F.col(keyCol)).agg(F.min(F.col(tsCol)).as("t"))
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(F.col(typeCol) === stage)
        .join(prev.select(F.col(keyCol), F.col("t").as("t_prev")), keyCol)
        .filter(F.col(tsCol) > F.col("t_prev"))
        .groupBy(F.col(keyCol)).agg(F.min(F.col(tsCol)).as("t"))
    }
    stages.zip(frames).zipWithIndex.map { case ((name, df), i) =>
      df.agg(F.count(F.lit(1)).as("n_users"))
        .select(F.lit(name).as("stage"), F.lit(i + 1).cast("int").as("stage_idx"),
          F.col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention: entities grouped by the epoch-week of their FIRST
    * event; for each (cohort week, week offset) the number of distinct
    * entities active that week. Weeks are integer weeks since the epoch
    * (exact integer arithmetic, engine-portable — calendar-week alignment
    * is presentation, not semantics). One min-aggregate to the entity
    * frame + one distinct count over (entity, week) — both map-side
    * combinable; nothing larger than events ever shuffles. */
  /** TOP USER JOURNEYS: the most common first-`depth` event-type paths —
    * funnel analysis's exploratory sibling (the funnel checks ONE
    * hypothesized path; this surfaces which paths actually happen).
    * Each user's first `depth` events in (ts, id) order — the id
    * tie-break makes equal timestamps replay identically — concatenate
    * into a '>'-joined path; paths are counted and ranked (count desc,
    * path asc).
    *
    * Scale shape: the only window is per-user over that user's events;
    * the path-count frame is bounded by |event types|^depth (a type-
    * space constant, not data), so the final rank window is over a
    * bounded aggregate. Exact integers throughout — hash-exact.
    *
    * Output: (rank 1-based, path, n_users), top `k` rows. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, idCol: String,
               depth: Int = 4, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u").orderBy("t", "eid")
    val firstK = events
      .select(F.col(userCol).as("u"), F.col(tsCol).as("t"),
        F.col(typeCol).as("et"), F.col(idCol).as("eid"))
      // eid is the tie-break: NULL ids sort FIRST in Spark but LAST in
      // DuckDB's default ORDER BY, so tied-timestamp rows with NULL ids
      // would order differently across engines — exclude them (the SQL
      // mirror carries the same predicate).
      .filter(F.col("u").isNotNull && F.col("t").isNotNull &&
        F.col("et").isNotNull && F.col("eid").isNotNull)
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= depth)
    val paths = firstK.groupBy("u")
      .agg(F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("et")))),
          e => e.getField("et")), ">").as("path"))
      .groupBy("path").agg(F.count(F.lit(1)).as("n_users"))
    paths
      .withColumn("rank", F.row_number().over(
        Window.orderBy(F.col("n_users").desc, F.col("path"))))
      .filter(F.col("rank") <= k)
      .select(F.col("rank").cast("long").as("rank"), F.col("path"), F.col("n_users"))
  }

  /** MANN–KENDALL trend test per key (Mann, Econometrica 1945; Kendall
    * 1975) — "is this series monotonically trending?" without assuming
    * linearity or a distribution: S = Σ_{i<j} sgn(x_j − x_i) over the
    * time order, Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18
    * (t_g the tied-value group sizes), z = (S ∓ 1)/√Var with the
    * continuity correction. Every operand is an exact BIGINT (sgn of
    * integer counts, polynomial tie correction), so S/Var/z are
    * fixed-shape IEEE — engine-bit-identical, no rounding discipline
    * beyond the output snap.
    *
    * Scale shape: the pair join is per-key over the TIME axis —
    * days-sized per key (the xcorr/holt-winters argument: the series
    * length is bounded by the calendar, not the data), partitioned by
    * key; tie counts and n are one grouped aggregate each.
    *
    * Output: per key — (key, n_points, s, var_s round 6, z round 4,
    * reject_95 on the UNROUNDED |z| > 1.96); z NULL when Var = 0
    * (all values tied, or n < 2 — no trend information). */
  def mannKendall(series: DataFrame, keyCol: String, tCol: String,
                  xCol: String): DataFrame = {
    val s = series.select(F.col(keyCol).as("k"), F.col(tCol).as("t"),
        F.col(xCol).cast("long").as("x"))
      .filter(F.col("k").isNotNull && F.col("t").isNotNull && F.col("x").isNotNull)
      .pin() // feeds the pair join (both sides), ties, n
    val pairs = s.select(F.col("k"), F.col("t").as("ti"), F.col("x").as("xi"))
      .join(s.select(F.col("k"), F.col("t").as("tj"), F.col("x").as("xj")), "k")
      .filter(F.col("ti") < F.col("tj"))
    val sv = pairs.groupBy("k").agg(F.sum(
      F.when(F.col("xj") > F.col("xi"), 1L)
        .when(F.col("xj") < F.col("xi"), -1L).otherwise(0L)).as("s"))
    val n = s.groupBy("k").agg(F.count(F.lit(1)).as("n"))
    val ties = s.groupBy("k", "x").agg(F.count(F.lit(1)).as("tg"))
      .groupBy("k").agg(F.sum(
        F.col("tg") * (F.col("tg") - 1) * (F.lit(2L) * F.col("tg") + 5)).as("corr"))
    val vs = (F.col("n") * (F.col("n") - 1) * (F.lit(2L) * F.col("n") + 5)
      - F.col("corr")).cast("double") / 18.0
    val z = F.when(vs > 0.0 && F.col("s") > 0, (F.col("s").cast("double") - 1) / F.sqrt(vs))
      .when(vs > 0.0 && F.col("s") < 0, (F.col("s").cast("double") + 1) / F.sqrt(vs))
      .when(vs > 0.0, F.lit(0.0))
    n.join(ties, "k").join(sv, Seq("k"), "left")
      .select(F.col("k"), F.col("n").as("n_points"),
        F.coalesce(F.col("s"), F.lit(0L)).as("s"),
        (F.round(vs, 6) + F.lit(0.0)).as("var_s"),
        (F.round(z, 4) + F.lit(0.0)).as("z"),
        (F.abs(z) > 1.96).as("reject_95"))
  }

  /** THEIL–SEN robust slope per key (Theil, 1950; Sen, JASA 1968) —
    * Mann–Kendall's estimator companion: [[mannKendall]] says WHETHER
    * the series trends; this says BY HOW MUCH, immune to ~29% outlier
    * contamination where OLS breaks at one bad day. slope = median over
    * all i<j pair slopes (x_j − x_i)/(t_j − t_i), intercept = median of
    * (x_i − slope·t_i) (the Conover form).
    *
    * Same per-key time-axis pair join as Mann–Kendall (days-sized per
    * key, never data-sized). Each pair slope is ONE IEEE division of
    * exact integers — identical in both engines — and the median
    * interpolates identical double sets (`percentile` ≡ DuckDB
    * `quantile_cont`, the q_percentiles contract), so WHICH value is
    * the median is engine-exact; the slope is rounded (round 6) before
    * the intercept pass so the residual medians are as deterministic as
    * their inputs. `tCol` must be integer-valued (e.g. epoch days).
    *
    * Output: per key — (key, n_points, n_pairs, slope, intercept),
    * round 6. */
  def theilSen(series: DataFrame, keyCol: String, tCol: String,
               xCol: String): DataFrame = {
    val s = series.select(F.col(keyCol).as("k"), F.col(tCol).cast("long").as("t"),
        F.col(xCol).cast("long").as("x"))
      .filter(F.col("k").isNotNull && F.col("t").isNotNull && F.col("x").isNotNull)
      .pin() // feeds the pair join (both sides) + the intercept pass
    val pairs = s.select(F.col("k"), F.col("t").as("ti"), F.col("x").as("xi"))
      .join(s.select(F.col("k"), F.col("t").as("tj"), F.col("x").as("xj")), "k")
      .filter(F.col("ti") < F.col("tj"))
    val sl = pairs
      .withColumn("__sl", (F.col("xj") - F.col("xi")).cast("double")
        / (F.col("tj") - F.col("ti")).cast("double"))
      .groupBy("k")
      .agg(F.count(F.lit(1)).as("n_pairs"),
        (F.round(F.expr("percentile(__sl, 0.5)"), 6) + F.lit(0.0)).as("slope"))
    s.join(sl, "k")
      .withColumn("__ic", F.col("x").cast("double") - F.col("slope") * F.col("t"))
      .groupBy("k")
      .agg(F.count(F.lit(1)).as("n_points"),
        F.first("n_pairs").as("n_pairs"), F.first("slope").as("slope"),
        (F.round(F.expr("percentile(__ic, 0.5)"), 6) + F.lit(0.0)).as("intercept"))
      .select("k", "n_points", "n_pairs", "slope", "intercept")
  }

  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val wk = F.call_function("div", F.unix_micros(F.col(tsCol)), F.lit(604800000000L))
    val weekly = events.select(F.col(keyCol).as("k"), wk.as("wk")).distinct()
    val cohorts = weekly.groupBy("k").agg(F.min("wk").as("cohort_wk"))
    weekly.join(cohorts, "k")
      .groupBy(F.col("cohort_wk"), (F.col("wk") - F.col("cohort_wk")).as("week_offset"))
      .agg(F.count(F.lit(1)).as("n_users"))
  }

  /** Interval-overlap concurrency by sweep line: each event is an
    * interval [ts, ts + durationMin); emit (+1 at start, −1 at end)
    * points and running-sum them per day — max concurrent intervals per
    * day WITHOUT exploding minutes. The −1 sorts before the +1 at equal
    * timestamps (half-open intervals don't overlap end-to-start), the
    * default RANGE frame makes tied timestamps see their full peer sum
    * identically on both engines, and the window partitions by DAY, so
    * the sweep parallelizes across days (an interval crossing midnight
    * counts in its start day). */
  def maxConcurrency(events: DataFrame, tsCol: String, durationMin: Int): DataFrame = {
    val durUs = durationMin * 60000000L
    val starts = events.select(F.to_date(F.col(tsCol)).as("day"),
      F.unix_micros(F.col(tsCol)).as("t"), F.lit(1L).as("delta"))
    val ends = events.select(F.to_date(F.col(tsCol)).as("day"),
      (F.unix_micros(F.col(tsCol)) + durUs).as("t"), F.lit(-1L).as("delta"))
    val w = Window.partitionBy("day").orderBy(F.col("t"), F.col("delta"))
    starts.unionByName(ends)
      .withColumn("c", F.sum("delta").over(w))
      .groupBy("day")
      .agg(F.max("c").as("max_concurrent"))
  }

  /** Exponentially time-decayed aggregates per key (the trending-score
    * shape): each event contributes `value * 2^(-age/halfLife)` where age
    * is measured back from the corpus max timestamp. ONE combinable
    * aggregate — the decay weight is a map-only projection against the
    * broadcast 1-row max, so recency-weighted scores over 100 TB cost
    * exactly what a plain grouped sum costs. */
  def decayedAgg(events: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 halfLifeHours: Double): DataFrame = {
    val mx = events.agg(F.max(F.unix_micros(F.col(tsCol))).as("__tmax"))
    val w = F.pow(F.lit(2.0),
      -((F.col("__tmax") - F.unix_micros(F.col(tsCol))).cast("double") / 3600000000.0)
        / halfLifeHours)
    events.crossJoin(F.broadcast(mx))
      .groupBy(F.col(keyCol))
      .agg(F.round(F.sum(F.col(valCol) * w), 4).as("decayed_value"),
        F.round(F.sum(w), 4).as("decayed_n"))
  }

  def hourProfileTopK(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val sums = (0 until 24).map(h =>
      F.sum(F.when(F.hour(F.col(tsCol)) === h, F.col(valCol)).otherwise(0.0)).as(s"h$h"))
    val prof = events.groupBy(F.col(keyCol))
      .agg(sums.head, sums.tail: _*)
      .select(F.col(keyCol), F.array((0 until 24).map(h => F.col(s"h$h")): _*).as("profile"))
    val q = prof.filter(queryPred)
      .select(F.col(keyCol).as("qid"), F.col("profile").as("qv"))
    val c = prof.select(F.col(keyCol).as("cid"), F.col("profile").as("cv"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"),
        F.round(Similarity.dot(F.col("qv"), F.col("cv")) /
          (Similarity.norm(F.col("qv")) * Similarity.norm(F.col("cv"))), 4).as("cos_sim"))
    Similarity.topKPerQuery(scored, "cos_sim", k)
  }

  /** Robust (median/MAD) anomaly scoring of a keyed series — the volume-
    * monitoring shape: flag the days whose event count sits far outside
    * the group's typical spread. Median + MAD instead of mean + stddev
    * because the baseline must not be dragged by the very outliers it is
    * meant to expose (one 100× ingest spike inflates a stddev threshold
    * enough to hide every smaller incident; it barely moves the MAD).
    *
    * robust_z = (v − median) / (1.4826 · MAD), the consistency constant
    * making MAD estimate σ under normality; |robust_z| > `sigma` flags.
    * When MAD = 0 (over half the series at the median) any deviation at
    * all is flagged and robust_z is null.
    *
    * Cost: two exact grouped percentiles plus broadcastable joins of the
    * per-key scalar frames — the input here is already an aggregate
    * (e.g. day × key counts: |keys|·|days| rows, not raw events), so
    * exact `percentile` is the right fidelity; swap in the KLL sketch
    * ([[graft.functions.KllQuantilesAggregator]]) when scoring must ride
    * a raw unaggregated stream. */
  def robustAnomalies(series: DataFrame, keyCol: String, valCol: String,
                      sigma: Double = 3.0): DataFrame = {
    val v = F.col(valCol).cast("double")
    val med = series.groupBy(F.col(keyCol))
      .agg(F.expr(s"percentile($valCol, 0.5)").as("__med"))
    val withMed = series.join(med, keyCol)
      .withColumn("__dev", F.abs(v - F.col("__med")))
    val mad = withMed.groupBy(F.col(keyCol))
      .agg(F.expr("percentile(__dev, 0.5)").as("__mad"))
    withMed.join(mad, keyCol)
      .withColumn("robust_z",
        F.when(F.col("__mad") === 0.0, F.lit(null).cast("double"))
          .otherwise(F.round((v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")), 4)))
      .withColumn("is_anomaly",
        F.when(F.col("__mad") === 0.0, F.col("__dev") > 0.0)
          .otherwise(F.col("__dev") > F.lit(sigma * 1.4826) * F.col("__mad")))
      .drop("__med", "__dev", "__mad")
  }

  /** Robust SEASONAL DECOMPOSITION of a per-key daily series (an
    * STL-style additive split on medians): x = trend + seasonal +
    * residual, where trend is the centered (2·half+1)-day running
    * MEDIAN (medians, not means — one outage spike must not bend the
    * baseline it will later be judged against), seasonal is the per-
    * (key, phase) median of the detrended values (phase = day-of-cycle,
    * `(t − epoch) mod period`), and the residual is what anomaly logic
    * should score. The robustAnomalies/q_anomaly_mad complement: that
    * flags days; this explains the weekly shape they sit on.
    *
    * Determinism: inputs are integral counts, the running median is an
    * explicit sorted-array middle ((a[⌈n/2⌉−1] + a[⌊n/2⌋]) / 2 — the
    * percentile_cont(0.5) interpolation both engines define), so every
    * derived value is an exact small dyadic rational; edge windows clamp
    * identically in both engines. Windows partition BY KEY (rows per key
    * = days); the seasonal join is per (key, phase) — frames of
    * aggregate size throughout. */
  def seasonalDecompose(series: DataFrame, keyCol: String, tCol: String,
                        xCol: String, period: Int = 7, halfWindow: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(-halfWindow, halfWindow)
    val base = series.select(F.col(keyCol).as("k"), F.col(tCol).as("t"),
      F.col(xCol).cast("double").as("x"))
    val tr = base
      .withColumn("__arr", F.sort_array(F.collect_list("x").over(w)))
      .withColumn("__n", F.size(F.col("__arr")))
      .withColumn("trend",
        (F.element_at(F.col("__arr"), ((F.col("__n") + 1) / 2).cast("int"))
          + F.element_at(F.col("__arr"), (F.col("__n") / 2).cast("int") + 1)) / 2.0)
      .withColumn("__det", F.col("x") - F.col("trend"))
      .withColumn("__phase",
        F.pmod(F.datediff(F.col("t"), F.to_date(F.lit("1970-01-01"))), F.lit(period)))
    val se = tr.groupBy("k", "__phase")
      .agg(F.expr("percentile(__det, 0.5)").as("seasonal"))
    tr.join(se, Seq("k", "__phase"))
      .select(F.col("k"), F.col("t"), F.col("x"),
        (F.round(F.col("trend"), 6) + F.lit(0.0)).as("trend"),
        (F.round(F.col("seasonal"), 6) + F.lit(0.0)).as("seasonal"),
        (F.round(F.col("x") - F.col("trend") - F.col("seasonal"), 6) + F.lit(0.0)).as("residual"))
  }

  /** Per-key BURSTINESS of inter-event gaps (Goh & Barabási, "Burstiness
    * and memory in complex systems", EPL 2008): B = (σ−μ)/(σ+μ) over the
    * gaps between a key's consecutive events — −1 for a metronome, → 0
    * for a Poisson process, → 1 for extreme bursts. The behavioral
    * fingerprint that separates bots (periodic, B < 0) from humans
    * (bursty, B > 0) and flags scraping/replay traffic.
    *
    * Gaps are exact microsecond differences over a per-key ordered
    * window (the gap MULTISET is invariant to how ties order, so no
    * tiebreak is needed for these aggregates); one combinable three-sum
    * aggregate per key; the variance is floored at 0 before the sqrt
    * (float drift must not manufacture NaN). Output: (key, n_gaps,
    * mean_gap_s, cv, burstiness), round 4. */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("t")
    val gaps = events
      .select(F.col(keyCol).as("k"), F.unix_micros(F.col(tsCol)).as("t"))
      .withColumn("gap", (F.col("t") - F.lag("t", 1).over(w)).cast("double") / 1000000.0)
      .filter(F.col("gap").isNotNull)
    val a = gaps.groupBy("k").agg(
      F.count(F.lit(1)).as("n"),
      F.sum("gap").as("sg"),
      F.sum(F.col("gap") * F.col("gap")).as("sg2"))
    val mu = F.col("sg") / F.col("n")
    val sig = F.sqrt(F.greatest(
      (F.col("sg2") - F.col("sg") * F.col("sg") / F.col("n")) / F.col("n"), F.lit(0.0)))
    a.select(F.col("k"), F.col("n").as("n_gaps"),
      F.round(mu, 4).as("mean_gap_s"),
      F.when(F.col("sg") > 0, F.round(sig / mu, 4)).as("cv"),
      F.when(sig + mu > 0.0,
        F.round((sig - mu) / (sig + mu), 4) + F.lit(0.0)).as("burstiness"))
  }

  /** CONDITIONAL ENTROPY of the next event type given the current one —
    * how predictable is each step of the behavioral sequence, and how
    * much does knowing the current state buy (info_gain = H(next) −
    * H(next|cur), the q_transition_matrix's single-number summary).
    * Bigrams come from the per-key (ts, id)-ordered lag (ties broken by
    * the unique id — bigram IDENTITY, unlike gap sums, depends on tie
    * order); H terms are IEEE functions of exact counts, summation
    * order collapsed at round 4. Output one row: (n_bigrams, h_next,
    * h_cond, info_gain). */
  def sequenceEntropy(events: DataFrame, keyCol: String, tsCol: String,
                      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("t", "id")
    val bi = events
      .select(F.col(keyCol).as("k"), F.col(tsCol).as("t"), F.col(idCol).as("id"),
        F.col(typeCol).as("nx"))
      .withColumn("cur", F.lag("nx", 1).over(w))
      .filter(F.col("cur").isNotNull)
      .groupBy("cur", "nx").agg(F.count(F.lit(1)).as("o"))
      .pin() // margins + total + terms all read it
    val tot = bi.agg(F.sum("o").as("t"))
    val curM = bi.groupBy("cur").agg(F.sum("o").as("nc"))
    val nxM = bi.groupBy("nx").agg(F.sum("o").as("nn"))
    val od = F.col("o").cast("double")
    val td = F.col("t").cast("double")
    val hCond = bi.join(curM, "cur").crossJoin(F.broadcast(tot))
      .agg((-F.sum(od / td * F.log(od / F.col("nc").cast("double")))).as("h_cond"))
    val hNext = nxM.crossJoin(F.broadcast(tot))
      .agg((-F.sum(F.col("nn").cast("double") / td
        * F.log(F.col("nn").cast("double") / td))).as("h_next"))
    tot.crossJoin(F.broadcast(hNext)).crossJoin(F.broadcast(hCond))
      .select(F.col("t").as("n_bigrams"),
        // + 0.0 on all three: a fully deterministic sequence makes each
        // statistic −Σ of zero terms = −0.0 (the repo-wide guard)
        (F.round(F.col("h_next"), 4) + F.lit(0.0)).as("h_next"),
        (F.round(F.col("h_cond"), 4) + F.lit(0.0)).as("h_cond"),
        (F.round(F.col("h_next") - F.col("h_cond"), 4) + F.lit(0.0)).as("info_gain"))
  }

  /** Lead–lag CROSS-CORRELATION between two aligned daily series — does
    * series x anticipate series y, and by how many days? (clicks →
    * purchases, errors → churn: the causal-direction screen run before
    * any heavier modeling.) For every lag ∈ [−maxLag, maxLag], Pearson
    * correlation of (x(t), y(t + lag)) over the days where both exist.
    *
    * Scale shape: the x side is replicated once per lag (2·maxLag + 1
    * copies of an already-aggregated series — rows = days × lags, not
    * events), one equi-join on the shifted date, then ONE combinable
    * six-sum aggregate per lag feeding the shared [[Pearson.fromSums]]
    * operand shape (exact BIGINT sums; see its range caveat for values
    * near the 64-bit boundary); a zero-variance overlap yields NULL,
    * not a blowup.
    *
    * Inputs: (tCol: date, xCol) and (tCol: date, yCol) frames, one row
    * per day. Output: (lag, n_days, xcorr round 6). */
  def crossCorrelation(xs: DataFrame, ys: DataFrame, tCol: String,
                       xCol: String, yCol: String, maxLag: Int): DataFrame = {
    val spark = xs.sparkSession
    val lags = spark.range(-maxLag.toLong, maxLag.toLong + 1)
      .select(F.col("id").cast("int").as("lag"))
    val x = xs.select(F.col(tCol).as("t"), F.col(xCol).cast("long").as("x"))
    val y = ys.select(F.col(tCol).as("t2"), F.col(yCol).cast("long").as("y"))
    val shifted = x.crossJoin(F.broadcast(lags))
      .select(F.col("lag"), F.col("x"), F.expr("date_add(t, lag)").as("t2"))
    val a = shifted.join(y, "t2")
      .groupBy("lag")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"), F.sum("y").as("sy"),
        F.sum(F.col("x") * F.col("y")).as("sxy"),
        F.sum(F.col("x") * F.col("x")).as("sxx"),
        F.sum(F.col("y") * F.col("y")).as("syy"))
    a.select(F.col("lag"), F.col("n").as("n_days"),
      Pearson.fromSums(F.col("n")).as("xcorr"))
  }

  /** AUTOCORRELATION FUNCTION per key — [[crossCorrelation]]'s
    * self-variant: the Pearson correlation of each key's series with
    * its own lag-l shift, for l = 1..maxLag. THE seasonality detector: a
    * weekly rhythm puts a spike at lag 7 before anyone fits a seasonal
    * model, and a slow-decaying ACF is the trend/burst signature the
    * anomaly thresholds should know about. (The pairwise-Pearson form —
    * each lag correlates only its overlapping pairs — rather than the
    * global-mean estimator: every sum here is then an exact BIGINT, the
    * cross-engine determinism anchor, exactly the xcorr contract.)
    *
    * Scale shape: the lag table (maxLag rows) broadcasts onto the
    * date-shifted series; ONE equi-join on (key, shifted day) and one
    * combinable six-sum aggregate per (key, lag). The series axis is
    * calendar-bounded per key — never event-sized. Output: (key, lag,
    * n_days, acf round 6); acf NULL when either side is constant. */
  def acf(series: DataFrame, keyCol: String, tCol: String, xCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, "need at least one lag")
    val spark = series.sparkSession
    val lags = spark.range(1L, maxLag + 1L).select(F.col("id").cast("int").as("lag"))
    val s = series.select(F.col(keyCol).as("k"), F.col(tCol).as("t"),
        F.col(xCol).cast("long").as("x"))
      .filter(F.col("k").isNotNull && F.col("t").isNotNull && F.col("x").isNotNull)
      .pin() // feeds both sides of the lag join
    val shifted = s.crossJoin(F.broadcast(lags))
      .select(F.col("k"), F.col("lag"), F.col("x"), F.expr("date_add(t, lag)").as("t2"))
    shifted
      .join(s.select(F.col("k"), F.col("t").as("t2"), F.col("x").as("y")), Seq("k", "t2"))
      .groupBy("k", "lag")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"), F.sum("y").as("sy"),
        F.sum(F.col("x") * F.col("y")).as("sxy"),
        F.sum(F.col("x") * F.col("x")).as("sxx"),
        F.sum(F.col("y") * F.col("y")).as("syy"))
      .select(F.col("k"), F.col("lag"), F.col("n").as("n_days"),
        Pearson.fromSums(F.col("n")).as("acf"))
  }

  /** HOLT-WINTERS additive forecast (Winters, "Forecasting sales by
    * exponentially weighted moving averages", Mgmt. Sci. 1960) over a
    * per-key regular series `(key, t, x)` — the projection a
    * capacity-planning story ends with: consume the level/trend/seasonal
    * structure FORWARD `h` steps, with a flat in-sample-MAE error band.
    *
    *   l_t = α·(x_t − s_{t−p}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(x_t − l_t) + (1−γ)·s_{t−p}
    *   ŷ_{T+m} = l_T + m·b_T + s_{T+m−p}   (m ≤ p)
    *
    * Initialized from the first two seasons (l₀ = mean of season 1, b₀ =
    * (mean₂ − mean₁)/p, s_i = x_i − l₀); keys with fewer than 2p points
    * are dropped. The smoothing COMPLEMENTS (1−α etc.) are passed as
    * explicit literals, never computed — `1.0 - 0.3` and the literal
    * `0.7` are DIFFERENT doubles, the kind of ulp fork no snap absorbs.
    *
    * Spark-first shape: ONE combinable aggregate builds each key's
    * day-ordered value array (bounded by the TIME RANGE, the
    * seasonalDecompose axis discipline — never by event count), then the
    * whole recursion runs inside `F.aggregate` (a codegen'd sequential
    * fold, no UDF): the accumulator struct carries (l, b, the rolling
    * p-slot seasonal array via slice‖concat, Σ|one-step error|). Fold
    * order is the array order, so every step is fixed-shape IEEE on
    * identical operands — engine-exact — with l/b/s snapped at 9 per
    * step and the init means snapped at 9 (the only order-dependent
    * sums), which lets a DuckDB RECURSIVE CTE carrying the same list
    * replay the trajectory bit-for-bit.
    *
    * Output: one row per (key, step 1..h): forecast, mae (mean |x −
    * one-step prediction| over the fitted tail), lo/hi = forecast ∓ mae,
    * all round 6 with the −0.0 guard. `h` ≤ `period`. */
  def holtWintersForecast(series: DataFrame, keyCol: String, tCol: String,
      xCol: String, period: Int = 7, h: Int = 7,
      alpha: Double = 0.3, oneMinusAlpha: Double = 0.7,
      beta: Double = 0.1, oneMinusBeta: Double = 0.9,
      gamma: Double = 0.2, oneMinusGamma: Double = 0.8): DataFrame = {
    require(h <= period, "forecast horizon beyond one season needs seasonal cycling")
    val p = period
    def r9(c: Column): Column = F.round(c, 9)
    val byKey = series
      .groupBy(F.col(keyCol).as("k"))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(tCol).as("t"),
        F.col(xCol).cast("double").as("x")))).as("sx"))
      .select(F.col("k"), F.transform(F.col("sx"), e => e.getField("x")).as("xs"))
      .filter(F.size(F.col("xs")) >= 2 * p)
    val mean1 = r9(F.aggregate(F.slice(F.col("xs"), 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val mean2 = r9(F.aggregate(F.slice(F.col("xs"), p + 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val withInit = byKey
      .withColumn("l0", mean1)
      .withColumn("b0", r9((mean2 - F.col("l0")) / p))
      .withColumn("s0", F.transform(F.slice(F.col("xs"), 1, p),
        x => r9(x - F.col("l0"))))
    // the fold: state (l, b, s[p], ae) over the post-init tail
    val state = F.aggregate(
      F.slice(F.col("xs"), F.lit(p + 1), F.size(F.col("xs")) - p),
      F.struct(F.col("l0").as("l"), F.col("b0").as("b"),
        F.col("s0").as("s"), F.lit(0.0).as("ae")),
      (acc, x) => {
        val sOld = F.element_at(acc.getField("s"), 1)
        val pred = acc.getField("l") + acc.getField("b") + sOld
        val lN = r9(F.lit(alpha) * (x - sOld)
          + F.lit(oneMinusAlpha) * (acc.getField("l") + acc.getField("b")))
        val bN = r9(F.lit(beta) * (lN - acc.getField("l"))
          + F.lit(oneMinusBeta) * acc.getField("b"))
        val sN = r9(F.lit(gamma) * (x - lN) + F.lit(oneMinusGamma) * sOld)
        F.struct(lN.as("l"), bN.as("b"),
          F.concat(F.slice(acc.getField("s"), 2, p - 1), F.array(sN)).as("s"),
          (acc.getField("ae") + F.abs(x - pred)).as("ae"))
      })
    val fitted = withInit
      .withColumn("n_fit", (F.size(F.col("xs")) - p).cast("double"))
      .withColumn("st", state)
      .select(F.col("k"), F.col("n_fit"),
        F.col("st.l").as("l"), F.col("st.b").as("b"), F.col("st.s").as("s"),
        (F.round(F.col("st.ae") / F.col("n_fit"), 6) + F.lit(0.0)).as("mae"))
    fitted
      .select(F.col("k"), F.col("mae"), F.col("l"), F.col("b"), F.col("s"),
        F.explode(F.sequence(F.lit(1), F.lit(h))).as("step"))
      .withColumn("forecast",
        F.round(F.col("l") + F.col("step").cast("double") * F.col("b")
          + F.element_at(F.col("s"), F.col("step")), 6) + F.lit(0.0))
      .select(F.col("k"), F.col("step"), F.col("forecast"), F.col("mae"),
        (F.round(F.col("forecast") - F.col("mae"), 6) + F.lit(0.0)).as("lo"),
        (F.round(F.col("forecast") + F.col("mae"), 6) + F.lit(0.0)).as("hi"))
  }

  /** ROLLING-ORIGIN backtest of [[holtWintersForecast]]: every one-step
    * prediction the recursion makes against the actual that arrived —
    * the "would this forecast have worked" evaluation a capacity model
    * needs before anyone trusts its bands.
    *
    * The recursion already produces every origin's one-step forecast as
    * it advances (pred_t = l_{t−1} + b_{t−1} + s_{t−p}, the same term
    * the MAE accumulates), so the whole backtest is the SAME single
    * fold with the prediction list carried in the accumulator — no
    * origin × refit explosion. Rows before index 2p are withheld: the
    * trend seed b₀ consumes the second season's mean, so one-step
    * predictions inside [p+1, 2p] leak their own future through the
    * init (the honest-origin cutoff).
    *
    * Output per (key, day > the 2p-th): actual, forecast, err (round 6,
    * −0.0-guarded). The oracle reuses q_forecast's recursive CTE — a
    * recursive CTE returns ALL its rows, so each step's pre-update
    * state IS the join of row i with observation i+1. */
  def holtWintersBacktest(series: DataFrame, keyCol: String, tCol: String,
      xCol: String, period: Int = 7,
      alpha: Double = 0.3, oneMinusAlpha: Double = 0.7,
      beta: Double = 0.1, oneMinusBeta: Double = 0.9,
      gamma: Double = 0.2, oneMinusGamma: Double = 0.8): DataFrame = {
    val p = period
    def r9(c: Column): Column = F.round(c, 9)
    val byKey = series
      .groupBy(F.col(keyCol).as("k"))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(tCol).as("t"),
        F.col(xCol).cast("double").as("x")))).as("sx"))
      .select(F.col("k"), F.transform(F.col("sx"), e => e.getField("x")).as("xs"),
        F.transform(F.col("sx"), e => e.getField("t")).as("ts"))
      .filter(F.size(F.col("xs")) > 2 * p)
    val mean1 = r9(F.aggregate(F.slice(F.col("xs"), 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val mean2 = r9(F.aggregate(F.slice(F.col("xs"), p + 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val withInit = byKey
      .withColumn("l0", mean1)
      .withColumn("b0", r9((mean2 - F.col("l0")) / p))
      .withColumn("s0", F.transform(F.slice(F.col("xs"), 1, p),
        x => r9(x - F.col("l0"))))
    val state = F.aggregate(
      F.slice(F.col("xs"), F.lit(p + 1), F.size(F.col("xs")) - p),
      F.struct(F.col("l0").as("l"), F.col("b0").as("b"),
        F.col("s0").as("s"), F.array().cast("array<double>").as("preds")),
      (acc, x) => {
        val sOld = F.element_at(acc.getField("s"), 1)
        val pred = acc.getField("l") + acc.getField("b") + sOld
        val lN = r9(F.lit(alpha) * (x - sOld)
          + F.lit(oneMinusAlpha) * (acc.getField("l") + acc.getField("b")))
        val bN = r9(F.lit(beta) * (lN - acc.getField("l"))
          + F.lit(oneMinusBeta) * acc.getField("b"))
        val sN = r9(F.lit(gamma) * (x - lN) + F.lit(oneMinusGamma) * sOld)
        F.struct(lN.as("l"), bN.as("b"),
          F.concat(F.slice(acc.getField("s"), 2, p - 1), F.array(sN)).as("s"),
          F.concat(acc.getField("preds"), F.array(pred)).as("preds"))
      })
    withInit
      .withColumn("preds", state.getField("preds"))
      // sliced position pos (1-based) ↔ series index 2p + pos: the first
      // p predictions (indices p+1..2p) are the init-leaky ones
      .select(F.col("k"), F.col("xs"), F.col("ts"),
        F.posexplode(F.slice(F.col("preds"), F.lit(p + 1),
          F.size(F.col("preds")) - p)).as(Seq("__pos", "__pred")))
      .withColumn("__idx", F.col("__pos") + 2 * p + 1) // posexplode is 0-based
      .select(F.col("k"),
        F.element_at(F.col("ts"), F.col("__idx")).as("day"),
        F.element_at(F.col("xs"), F.col("__idx")).as("actual"),
        (F.round(F.col("__pred"), 6) + F.lit(0.0)).as("forecast"),
        (F.round(F.element_at(F.col("xs"), F.col("__idx")) - F.col("__pred"), 6)
          + F.lit(0.0)).as("err"))
  }

  /** MASE forecast skill (Hyndman & Koehler, "Another look at measures
    * of forecast accuracy", IJF 2006): the model's one-step backtest MAE
    * over the honest origins divided by the SEASONAL-NAIVE MAE
    * (x̂_t = x_{t−p}) on the exact same target range — the
    * scale-free "is this forecast better than doing nothing" number.
    * MASE < 1 beats the naive; > 1 means the smoother is losing to
    * last week's value. Same single fold as the backtest (the
    * prediction list rides the accumulator); the naive errors are pure
    * array arithmetic on the same day-ordered array. Both error sums
    * fold in index order, so an ordered-window mirror replays them
    * bit-for-bit.
    *
    * Output per key: (k, n_eval, mae_model, mae_naive, mase), round 6;
    * mase NULL when the naive MAE is 0 (a perfectly periodic series —
    * nothing to beat). */
  def holtWintersSkill(series: DataFrame, keyCol: String, tCol: String,
      xCol: String, period: Int = 7,
      alpha: Double = 0.3, oneMinusAlpha: Double = 0.7,
      beta: Double = 0.1, oneMinusBeta: Double = 0.9,
      gamma: Double = 0.2, oneMinusGamma: Double = 0.8): DataFrame = {
    val p = period
    def r9(c: Column): Column = F.round(c, 9)
    val byKey = series
      .groupBy(F.col(keyCol).as("k"))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(tCol).as("t"),
        F.col(xCol).cast("double").as("x")))).as("sx"))
      .select(F.col("k"), F.transform(F.col("sx"), e => e.getField("x")).as("xs"))
      .filter(F.size(F.col("xs")) > 2 * p)
    val mean1 = r9(F.aggregate(F.slice(F.col("xs"), 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val mean2 = r9(F.aggregate(F.slice(F.col("xs"), p + 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val withInit = byKey
      .withColumn("l0", mean1)
      .withColumn("b0", r9((mean2 - F.col("l0")) / p))
      .withColumn("s0", F.transform(F.slice(F.col("xs"), 1, p),
        x => r9(x - F.col("l0"))))
    val state = F.aggregate(
      F.slice(F.col("xs"), F.lit(p + 1), F.size(F.col("xs")) - p),
      F.struct(F.col("l0").as("l"), F.col("b0").as("b"),
        F.col("s0").as("s"), F.array().cast("array<double>").as("preds")),
      (acc, x) => {
        val sOld = F.element_at(acc.getField("s"), 1)
        val pred = acc.getField("l") + acc.getField("b") + sOld
        val lN = r9(F.lit(alpha) * (x - sOld)
          + F.lit(oneMinusAlpha) * (acc.getField("l") + acc.getField("b")))
        val bN = r9(F.lit(beta) * (lN - acc.getField("l"))
          + F.lit(oneMinusBeta) * acc.getField("b"))
        val sN = r9(F.lit(gamma) * (x - lN) + F.lit(oneMinusGamma) * sOld)
        F.struct(lN.as("l"), bN.as("b"),
          F.concat(F.slice(acc.getField("s"), 2, p - 1), F.array(sN)).as("s"),
          F.concat(acc.getField("preds"), F.array(pred)).as("preds"))
      })
    withInit
      .withColumn("preds", state.getField("preds"))
      // honest targets: indices 2p+1..n (the backtest's init-leak cutoff)
      .withColumn("hp", F.slice(F.col("preds"), F.lit(p + 1),
        F.size(F.col("preds")) - p))
      .withColumn("ha", F.slice(F.col("xs"), F.lit(2 * p + 1),
        F.size(F.col("xs")) - 2 * p))
      // seasonal-naive predictions for the same targets: x_{t−p}
      .withColumn("hb", F.slice(F.col("xs"), F.lit(p + 1),
        F.size(F.col("xs")) - 2 * p))
      .withColumn("n_eval", F.size(F.col("ha")))
      .withColumn("__sm", F.aggregate(
        F.zip_with(F.col("ha"), F.col("hp"), (a, q) => F.abs(a - q)),
        F.lit(0.0), (acc, e) => acc + e))
      .withColumn("__sn", F.aggregate(
        F.zip_with(F.col("ha"), F.col("hb"), (a, q) => F.abs(a - q)),
        F.lit(0.0), (acc, e) => acc + e))
      .select(F.col("k"), F.col("n_eval").cast("long").as("n_eval"),
        (F.round(F.col("__sm") / F.col("n_eval"), 6) + F.lit(0.0)).as("mae_model"),
        (F.round(F.col("__sn") / F.col("n_eval"), 6) + F.lit(0.0)).as("mae_naive"),
        (F.round(F.when(F.col("__sn") > 0,
          (F.col("__sm") / F.col("n_eval")) / (F.col("__sn") / F.col("n_eval"))), 6)
          + F.lit(0.0)).as("mase"))
  }

  /** SPLIT-CONFORMAL prediction bands for [[holtWintersForecast]]
    * (Vovk et al., "Algorithmic Learning in a Random World", 2005; the
    * split/inductive form of Papadopoulos et al., ECML 2002): instead of
    * the flat in-sample ±MAE, each horizon's band half-width is the
    * ⌈(n_cal + 1)·level⌉-th smallest |residual| among that horizon's
    * OWN calibration scores — residuals of real j-step-ahead forecasts
    * made at every honest origin of the fitted series. Under
    * exchangeability the band then COVERS with probability ≥ `level`
    * by construction (finite-sample, distribution-free), which is what
    * "calibrated" means; the MAE band is merely nominal.
    *
    * The same single fold produces everything: the accumulator also
    * carries a per-step (l, b, s) SNAPSHOT (day-axis-bounded — at most
    * (n − p) structs of p + 2 doubles), each snapshot is an origin, and
    * the j-step residual is |xs[i + j] − (l_i + j·b_i + s_i[j])| — one
    * posexplode, no origin × refit explosion. Honest origins start at
    * i ≥ 2p (the backtest's init-leak cutoff). The quantile is an exact
    * ORDER STATISTIC on the sorted score array (no interpolation), with
    * the conformal rank computed by the same IEEE ceil in both engines
    * and capped at n_cal (the standard take-the-max fallback when the
    * calibration set is smaller than the level demands).
    *
    * Output per (key, step 1..h): forecast (= [[holtWintersForecast]]'s
    * value exactly), n_cal, band, lo/hi = forecast ∓ band, all round 6
    * −0.0-guarded; horizons whose calibration set is empty (series
    * shorter than 2p + j) keep the forecast with NULL band/lo/hi. */
  def holtWintersConformal(series: DataFrame, keyCol: String, tCol: String,
      xCol: String, period: Int = 7, h: Int = 7, level: Double = 0.9,
      alpha: Double = 0.3, oneMinusAlpha: Double = 0.7,
      beta: Double = 0.1, oneMinusBeta: Double = 0.9,
      gamma: Double = 0.2, oneMinusGamma: Double = 0.8): DataFrame = {
    require(h <= period, "forecast horizon beyond one season needs seasonal cycling")
    val p = period
    def r9(c: Column): Column = F.round(c, 9)
    val byKey = series
      .groupBy(F.col(keyCol).as("k"))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(tCol).as("t"),
        F.col(xCol).cast("double").as("x")))).as("sx"))
      .select(F.col("k"), F.transform(F.col("sx"), e => e.getField("x")).as("xs"))
      .filter(F.size(F.col("xs")) >= 2 * p)
    val mean1 = r9(F.aggregate(F.slice(F.col("xs"), 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val mean2 = r9(F.aggregate(F.slice(F.col("xs"), p + 1, p),
      F.lit(0.0), (a, x) => a + x) / p)
    val withInit = byKey
      .withColumn("l0", mean1)
      .withColumn("b0", r9((mean2 - F.col("l0")) / p))
      .withColumn("s0", F.transform(F.slice(F.col("xs"), 1, p),
        x => r9(x - F.col("l0"))))
    val snapType = "array<struct<l:double,b:double,s:array<double>>>"
    val state = F.aggregate(
      F.slice(F.col("xs"), F.lit(p + 1), F.size(F.col("xs")) - p),
      F.struct(F.col("l0").as("l"), F.col("b0").as("b"),
        F.col("s0").as("s"), F.array().cast(snapType).as("snaps")),
      (acc, x) => {
        val sOld = F.element_at(acc.getField("s"), 1)
        val lN = r9(F.lit(alpha) * (x - sOld)
          + F.lit(oneMinusAlpha) * (acc.getField("l") + acc.getField("b")))
        val bN = r9(F.lit(beta) * (lN - acc.getField("l"))
          + F.lit(oneMinusBeta) * acc.getField("b"))
        val sN = r9(F.lit(gamma) * (x - lN) + F.lit(oneMinusGamma) * sOld)
        val sNew = F.concat(F.slice(acc.getField("s"), 2, p - 1), F.array(sN))
        F.struct(lN.as("l"), bN.as("b"), sNew.as("s"),
          F.concat(acc.getField("snaps"),
            F.array(F.struct(lN.as("l"), bN.as("b"), sNew.as("s")))).as("snaps"))
      })
    val snapped = withInit
      .withColumn("st", state)
      .select(F.col("k"), F.col("xs"), F.size(F.col("xs")).as("n"),
        F.col("st.l").as("l"), F.col("st.b").as("b"), F.col("st.s").as("s"),
        F.col("st.snaps").as("snaps"))
      .pin() // feeds the calibration explode AND the forecast
    // calibration scores: origin i = p + m + 1 (snapshot m is the state
    // after consuming xs[p + m + 1]), honest from i >= 2p, target i + j
    val cal = snapped
      .select(F.col("k"), F.col("xs"), F.col("n"),
        F.posexplode(F.col("snaps")).as(Seq("__m", "__st")))
      .withColumn("__i", F.col("__m") + (p + 1))
      .filter(F.col("__i") >= 2 * p)
      .select(F.col("k"), F.col("xs"), F.col("n"), F.col("__i"), F.col("__st"),
        F.explode(F.sequence(F.lit(1), F.lit(h))).as("step"))
      .filter(F.col("__i") + F.col("step") <= F.col("n"))
      .select(F.col("k"), F.col("step"),
        F.abs(F.element_at(F.col("xs"), (F.col("__i") + F.col("step")).cast("int"))
          - (F.col("__st.l") + F.col("step").cast("double") * F.col("__st.b")
            + F.element_at(F.col("__st.s"), F.col("step")))).as("score"))
    val bands = cal.groupBy("k", "step")
      .agg(F.sort_array(F.collect_list(F.col("score"))).as("sc"))
      .select(F.col("k"), F.col("step"), F.size(F.col("sc")).as("n_cal"),
        F.element_at(F.col("sc"),
          F.least(F.ceil((F.size(F.col("sc")) + 1) * F.lit(level)).cast("int"),
            F.size(F.col("sc")))).as("__q"))
    val fc = snapped
      .select(F.col("k"), F.col("l"), F.col("b"), F.col("s"),
        F.explode(F.sequence(F.lit(1), F.lit(h))).as("step"))
      .withColumn("forecast",
        F.round(F.col("l") + F.col("step").cast("double") * F.col("b")
          + F.element_at(F.col("s"), F.col("step")), 6) + F.lit(0.0))
    fc.join(bands, Seq("k", "step"), "left")
      .select(F.col("k"), F.col("step"), F.col("forecast"),
        F.coalesce(F.col("n_cal").cast("long"), F.lit(0L)).as("n_cal"),
        (F.round(F.col("__q"), 6) + F.lit(0.0)).as("band"),
        (F.round(F.col("forecast") - F.col("__q"), 6) + F.lit(0.0)).as("lo"),
        (F.round(F.col("forecast") + F.col("__q"), 6) + F.lit(0.0)).as("hi"))
  }
}
