package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Drift

/** Streaming drift monitoring — the [[graft.operators.Drift]] triad's
  * accumulating state is grouped COUNTS, the simplest mergeable summary
  * there is, so the streaming twin follows the StreamingQuantiles /
  * StreamingSetSketches storage contract verbatim: each micro-batch
  * writes its own count partial under `batch_id=` (a replayed batch
  * overwrites its own partition — idempotent under at-least-once
  * foreachBatch), and the read side re-aggregates the partials into one
  * count frame and re-enters the batch operator's scoring tail
  * ([[Drift.psiFromCounts]] / [[Drift.jsDivergenceFromCounts]]).
  * Because counts are a pure function of the input multiset, streamed ==
  * batch EXACTLY, not just within error.
  *
  * For PSI the reference is FROZEN at attach time — its (lo, hi) bounds
  * parameterize every batch's bucketing ([[Drift.bucketCounts]], the
  * frozen-model-scoring discipline: the monitor alarms against a fixed
  * baseline, it does not let the baseline drift with the stream). */
object StreamingDrift {

  /** One driver-side scalar: the reference frame's (min, max), the
    * bounds the batch operator derives internally. Collect them ONCE and
    * pass to [[attachNumeric]]. */
  def refBounds(ref: DataFrame, valueCol: String): (Double, Double) = {
    val v = F.col(valueCol).cast("double")
    val r = ref.filter(v.isNotNull).agg(F.min(v), F.max(v)).head
    (r.getDouble(0), r.getDouble(1))
  }

  /** Accumulate per-batch bucket counts of `valueCol` under the frozen
    * reference bounds. */
  def attachNumeric(
      values: DataFrame,
      checkpointDir: String,
      countsDir: String,
      valueCol: String,
      lo: Double,
      hi: Double,
      buckets: Int = 10,
      triggerMillis: Long = 1000L): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Drift.bucketCounts(batch, valueCol, lo, hi, buckets)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$countsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Stream-wide (bucket, n) counts: partials summed. Empty stream →
    * empty frame (PSI then reads every current bucket as 0, which is the
    * right degenerate answer, not a throw). */
  def numericCounts(spark: SparkSession, countsDir: String): DataFrame =
    readPartials(spark, countsDir, Seq("bucket" -> "int"))
      .groupBy("bucket").agg(F.sum("n").as("n"))

  /** PSI of the stream so far against the frozen reference counts
    * (produce them once with [[Drift.bucketCounts]] over the reference
    * at the same bounds). Same output shape as [[Drift.psi]]. */
  def psiNow(spark: SparkSession, refCounts: DataFrame, countsDir: String,
             buckets: Int): DataFrame =
    Drift.psiFromCounts(spark, refCounts, numericCounts(spark, countsDir), buckets)

  /** Accumulate per-batch (slice, cat) counts for divergence monitoring
    * between stream slices (sources, shards, A/B arms). */
  def attachCategorical(
      rows: DataFrame,
      checkpointDir: String,
      countsDir: String,
      sliceCol: String = "slice",
      catCol: String = "cat",
      triggerMillis: Long = 1000L): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.filter(F.col(sliceCol).isNotNull && F.col(catCol).isNotNull)
          .groupBy(F.col(sliceCol).cast("string").as("slice"),
            F.col(catCol).cast("string").as("cat"))
          .agg(F.count(F.lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$countsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Stream-wide (slice, cat, n) counts — one row per (slice, cat), the
    * shape [[Drift.jsDivergenceFromCounts]] expects. */
  def categoricalCounts(spark: SparkSession, countsDir: String): DataFrame =
    readPartials(spark, countsDir, Seq("slice" -> "string", "cat" -> "string"))
      .groupBy("slice", "cat").agg(F.sum("n").as("n"))

  /** Pairwise JS divergence between the stream's slices so far. */
  def jsNow(spark: SparkSession, countsDir: String): DataFrame =
    Drift.jsDivergenceFromCounts(categoricalCounts(spark, countsDir))

  /** Two-sample KS over the accumulated per-value counts:
    * [[attachCategorical]] with slice ∈ {a, b} and the VALUE as the
    * category. Per-value counts are the two-sample tests' mergeable
    * summary; the value's double→string→double round trip through the
    * partial layout is exact (shortest-representation formatting). */
  def ksNow(spark: SparkSession, countsDir: String, a: String, b: String): DataFrame =
    Drift.ksFromCounts(twoSampleCounts(spark, countsDir, a, b))

  /** Mann–Whitney U over the same accumulated per-value counts. */
  def mannWhitneyNow(spark: SparkSession, countsDir: String,
                     a: String, b: String): DataFrame =
    Drift.mannWhitneyFromCounts(twoSampleCounts(spark, countsDir, a, b))

  /** Welch's t over the same accumulated per-value counts — the third
    * two-sample test the one-partial layout buys for free. */
  def welchTNow(spark: SparkSession, countsDir: String,
                a: String, b: String): DataFrame =
    Drift.welchTFromCounts(twoSampleCounts(spark, countsDir, a, b))

  /** ROC AUC of everything streamed so far — the model-monitoring read
    * over the SAME two-slice count layout (slice `pos` = positives,
    * `neg` = negatives, the score as the category): merged counts
    * re-enter [[graft.operators.Evaluation.rocAucFromCounts]]'s exact
    * midrank algebra, so streamed == batch exactly. */
  def rocAucNow(spark: SparkSession, countsDir: String,
                pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.rocAucFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Average precision (PR-AUC) over the same accumulated counts. */
  def averagePrecisionNow(spark: SparkSession, countsDir: String,
                          pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.averagePrecisionFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Brier + skill over the same accumulated counts (the category is
    * the predicted probability). */
  def brierNow(spark: SparkSession, countsDir: String,
               pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.brierFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Reliability bins over the same accumulated counts. */
  def calibrationNow(spark: SparkSession, countsDir: String,
                     pos: String, neg: String, bins: Int = 10): DataFrame =
    graft.operators.Evaluation.calibrationBinsFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg), bins)

  /** Expected calibration error over the same accumulated counts. */
  def eceNow(spark: SparkSession, countsDir: String,
             pos: String, neg: String, bins: Int = 10): DataFrame =
    graft.operators.Evaluation.eceFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg), bins)

  /** Cumulative gains / lift table over the same accumulated counts. */
  def liftNow(spark: SparkSession, countsDir: String,
              pos: String, neg: String, tiles: Int = 10): DataFrame =
    graft.operators.Evaluation.liftTableFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg), tiles)

  /** Youden-optimal threshold over the same accumulated counts. */
  def bestThresholdNow(spark: SparkSession, countsDir: String,
                       pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.bestThresholdFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Isotonic calibration over the same accumulated counts. */
  def isotonicNow(spark: SparkSession, countsDir: String,
                  pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.isotonicFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Per-class precision/recall/F1 of everything streamed so far — the
    * PREDICTION rides the slice dimension, the label the category;
    * merged confusion cells are the board's complete mergeable summary
    * (trivially: cells are counts), so streamed == batch exactly. */
  def perClassNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.perClassFromCells(
      confusionCellsNow(spark, countsDir))

  /** Cohen's κ + accuracy over the same accumulated confusion cells. */
  def kappaNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.kappaFromCells(
      confusionCellsNow(spark, countsDir))

  /** Matthews correlation (multiclass R_K) over the same accumulated
    * confusion cells. */
  def mccNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.mccFromCells(confusionCellsNow(spark, countsDir))

  /** Accuracy / balanced accuracy / macro-F1 over the same cells. */
  def classSummaryNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.classSummaryFromCells(
      confusionCellsNow(spark, countsDir))

  /** Quadratic-weighted kappa over the stream's ordinal (pred, label)
    * pairs — the [[kendallNow]] bounded-vocabulary pair layout. */
  def weightedKappaNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.weightedKappaFromCells(
      categoricalCounts(spark, countsDir)
        // a non-numeric slice/cat try_casts to NULL — drop it like
        // the batch path's pre-group filter, instead of NULLing
        // kappa_w through the cell sums (ANSI cast would throw) —
        // r15 ADVICE
        .select(F.expr("try_cast(slice AS double)").as("pred"),
          F.expr("try_cast(cat AS double)").as("label"), F.col("n"))
        .filter(F.col("pred").isNotNull && F.col("label").isNotNull))

  /** Fleiss' kappa over the stream's (item, rater-vote) pairs — the
    * ITEM rides the slice dimension, the vote the category; merged
    * vote counts re-enter the batch integer identities exactly. */
  def fleissKappaNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.fleissKappaFromCells(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("item"), F.col("cat"), F.col("n").as("nij")))

  /** Hosmer–Lemeshow calibration χ² over the accumulated two-slice
    * score counts (the [[rocAucNow]] layout). */
  def hosmerNow(spark: SparkSession, countsDir: String,
                pos: String, neg: String, bins: Int = 10): DataFrame =
    graft.operators.Evaluation.hosmerLemeshowFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg), bins)

  /** Murphy Brier decomposition over the same accumulated counts. */
  def brierDecompositionNow(spark: SparkSession, countsDir: String,
                            pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.brierDecompositionFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  /** Calibration intercept + slope (logistic recalibration) over the
    * same accumulated counts — the Newton fold re-enters the merged
    * distinct-score frame, so streamed == batch exactly. */
  def calibrationSlopeNow(spark: SparkSession, countsDir: String,
                          pos: String, neg: String): DataFrame =
    graft.operators.Evaluation.calibrationSlopeFromCounts(
      twoSampleCounts(spark, countsDir, pos, neg))

  private def confusionCellsNow(spark: SparkSession,
                                countsDir: String): DataFrame =
    categoricalCounts(spark, countsDir)
      .select(F.col("slice").as("pred"), F.col("cat").as("label"), F.col("n"))

  /** ARI + NMI of the stream's two partitions so far — partition A
    * rides the slice dimension, B the category; merged contingency
    * cells re-enter the batch pair-count algebra bit-for-bit. */
  def clusterAgreementNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Evaluation.clusterAgreementFromCells(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("a"), F.col("cat").as("b"),
          F.col("n").as("nij")))

  /** Kendall τ-b of the stream's (x, y) pairs so far — the
    * [[spearmanNow]] pair-count layout (both axes bounded vocabularies,
    * the batch operator's contract); P/Q/margins are exact integers
    * over the merged cells, so streamed == batch bit-for-bit. */
  def kendallNow(spark: SparkSession, countsDir: String): DataFrame =
    Drift.kendallTauFromCounts(
      categoricalCounts(spark, countsDir)
        // same try_cast NULL-drop as [[weightedKappaNow]] (r15 ADVICE)
        .select(F.expr("try_cast(slice AS double)").as("x"),
          F.expr("try_cast(cat AS double)").as("y"), F.col("n").as("nij"))
        .filter(F.col("x").isNotNull && F.col("y").isNotNull))

  /** Per-group calibration (sufficiency) of the stream so far — the
    * (group, outcome) pair rides the slice dimension as "group|true"
    * (the cupedNow pipe convention: group before the FIRST pipe, the
    * boolean label after the LAST), the probability the category;
    * merged (group, x, c1, c2) counts re-enter the weighted-count ECE
    * algebra, so streamed == batch exactly. */
  def eceByGroupNow(spark: SparkSession, countsDir: String,
                    bins: Int = 10): DataFrame =
    graft.operators.Evaluation.eceByGroupFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.substring_index(F.col("slice"), "|", 1).as("group"),
          F.substring_index(F.col("slice"), "|", -1).as("y"),
          F.col("cat").cast("double").as("x"), F.col("n"))
        .groupBy("group", "x")
        .agg(
          F.sum(F.when(F.col("y") === "true", F.col("n")).otherwise(0L)).as("c1"),
          F.sum(F.when(F.col("y") =!= "true", F.col("n")).otherwise(0L)).as("c2")),
      bins)

  /** The stream's per-score arm-split counts — (treat, outcome) ride
    * the slice as "true|false" booleans around the pipe, the targeting
    * score the category. The complete mergeable summary of the uplift
    * family. */
  private def armCountsNow(spark: SparkSession, countsDir: String): DataFrame =
    categoricalCounts(spark, countsDir)
      .select(F.substring_index(F.col("slice"), "|", 1).as("t"),
        F.substring_index(F.col("slice"), "|", -1).as("y"),
        F.col("cat").cast("double").as("x"), F.col("n"))
      .groupBy("x")
      .agg(
        F.sum(F.when(F.col("t") === "true", F.col("n")).otherwise(0L)).as("t1"),
        F.sum(F.when(F.col("t") === "true" && F.col("y") === "true", F.col("n"))
          .otherwise(0L)).as("p1"),
        F.sum(F.when(F.col("t") =!= "true", F.col("n")).otherwise(0L)).as("t0"),
        F.sum(F.when(F.col("t") =!= "true" && F.col("y") === "true", F.col("n"))
          .otherwise(0L)).as("p0"))

  /** Uplift-by-tile of everything streamed so far — merged arm counts
    * re-enter the batch tile ceil + guarded ratio algebra exactly. */
  def upliftNow(spark: SparkSession, countsDir: String,
                tiles: Int = 10): DataFrame =
    graft.operators.Evaluation.upliftTableFromArmCounts(
      armCountsNow(spark, countsDir), tiles)

  /** Qini coefficient of everything streamed so far — same partials as
    * [[upliftNow]]. */
  def qiniNow(spark: SparkSession, countsDir: String,
              tiles: Int = 10): DataFrame =
    graft.operators.Evaluation.qiniFromArmCounts(
      armCountsNow(spark, countsDir), tiles)

  /** Gini concentration of everything streamed so far — the VALUE rides
    * the category dimension ([[attachCategorical]] with a constant
    * slice), merged counts re-enter the batch rank algebra. */
  def giniNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.RobustStats.giniFromCounts(
      categoricalCounts(spark, countsDir)
        .groupBy(F.col("cat").cast("double").as("x"))
        .agg(F.sum("n").as("c")))

  /** Hill tail index of everything streamed so far — same single-slice
    * value-count layout as [[giniNow]]; the top-(k+1) order statistics
    * fall out of the merged distinct-value counts, so streamed == batch
    * bit-for-bit (ties carry equal log terms). */
  def hillNow(spark: SparkSession, countsDir: String, k: Int = 50): DataFrame =
    graft.operators.RobustStats.hillFromCounts(
      categoricalCounts(spark, countsDir)
        .groupBy(F.col("cat").cast("double").as("x"))
        .agg(F.sum("n").as("c")), k)

  /** Theil between/within decomposition of the stream so far — the GROUP
    * rides the slice dimension, the value the category; merged
    * per-(group, value) counts re-enter the batch moment algebra. */
  def theilNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.RobustStats.theilFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("grp"), F.col("cat").cast("double").as("x"),
          F.col("n")))

  /** Spearman rank correlation of the stream's (x, y) pairs so far — x
    * rides the slice dimension, y the category; merged PAIR counts are
    * the statistic's complete mergeable summary (marginal midranks +
    * weighted rank sums, all exact dyadics — streamed == batch
    * bit-for-bit). The double→string→double round trip through the
    * partial layout is exact (shortest-representation formatting). */
  def spearmanNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Drift.spearmanFromCounts(
      categoricalCounts(spark, countsDir)
        // same try_cast NULL-drop as [[weightedKappaNow]] (r15 ADVICE)
        .select(F.expr("try_cast(slice AS double)").as("x"),
          F.expr("try_cast(cat AS double)").as("y"), F.col("n"))
        .filter(F.col("x").isNotNull && F.col("y").isNotNull))

  /** Zipf rank-frequency fit of the stream's tokens so far — the TERM
    * rides the category dimension (constant slice); merged term counts
    * re-enter the batch top-N + regression tail bit-for-bit. */
  def zipfNow(spark: SparkSession, countsDir: String, topN: Int = 200): DataFrame =
    graft.operators.TextAnalysis.zipfFitFromCounts(
      categoricalCounts(spark, countsDir)
        .groupBy(F.col("cat").as("term")).agg(F.sum("n").as("c")), topN)

  /** Vocabulary coverage (Good–Turing unseen mass + Chao1 richness) of
    * the stream's tokens so far — the SAME term-count store as
    * [[zipfNow]]; the frequency-of-frequencies frame is a pure function
    * of the merged counts, so streamed == batch exactly. */
  def vocabCoverageNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.TextAnalysis.vocabCoverageFromCounts(
      categoricalCounts(spark, countsDir)
        .groupBy(F.col("cat").as("term")).agg(F.sum("n").as("c")))

  /** CUPED variance reduction over the stream's units so far — the
    * (arm, pre-metric) pair rides the slice dimension as "arm|x" (arm
    * must not contain '|': arm reads before the FIRST pipe, x after the
    * LAST — the attachGrouped convention), y the category. Merged
    * (arm, x, y) counts are CUPED's complete sufficient statistics
    * (exact-BIGINT moments): streamed == batch bit-for-bit. */
  def cupedNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.Drift.cupedFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.substring_index(F.col("slice"), "|", 1).as("arm"),
          F.substring_index(F.col("slice"), "|", -1).cast("long").as("x"),
          F.col("cat").cast("long").as("y"), F.col("n")))

  /** One-way ANOVA across the stream's groups so far — the GROUP rides
    * the slice dimension, the value the category (the theilNow layout);
    * merged per-(group, value) counts fold into the moment sums. Output
    * ratios (F, η²) are as deterministic as their round-4/6 snap; the
    * SS columns carry the batch operator's round-2 discipline. */
  def anovaNow(spark: SparkSession, countsDir: String): DataFrame =
    Drift.anovaFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("g"), F.col("cat").cast("double").as("x"),
          F.col("n").as("c")))

  /** Kruskal–Wallis H across the stream's groups so far — same layout
    * as [[anovaNow]]; merged counts re-enter the batch midrank algebra,
    * so streamed == batch bit-for-bit (exact dyadic rank sums). */
  def kruskalNow(spark: SparkSession, countsDir: String): DataFrame =
    Drift.kruskalFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("g"), F.col("cat").cast("double").as("x"),
          F.col("n").as("c")))

  /** Cliff's delta between slices `a` and `b` of the stream so far —
    * the two-sample count layout ([[ksNow]]/[[mannWhitneyNow]]); the
    * dominance counts are exact integers, so streamed == batch
    * bit-for-bit. */
  def cliffsDeltaNow(spark: SparkSession, countsDir: String,
                     a: String, b: String): DataFrame =
    Drift.cliffsDeltaFromCounts(twoSampleCounts(spark, countsDir, a, b))

  private def twoSampleCounts(spark: SparkSession, countsDir: String,
                              a: String, b: String): DataFrame =
    categoricalCounts(spark, countsDir)
      .filter(F.col("slice") === a || F.col("slice") === b)
      .groupBy(F.col("cat").cast("double").as("x"))
      .agg(
        F.sum(F.when(F.col("slice") === a, F.col("n")).otherwise(F.lit(0L))).as("c1"),
        F.sum(F.when(F.col("slice") === b, F.col("n")).otherwise(F.lit(0L))).as("c2"))

  /** CUSUM changepoints over the stream's accumulated per-(key, day)
    * volume — [[attachCategorical]] with the DAY as the category, then
    * the batch operator over the merged counts (daily counts are sums:
    * a day split across micro-batches or replays merges exactly). */
  def cusumNow(spark: SparkSession, countsDir: String,
               slack: Double, threshold: Double): DataFrame =
    Drift.cusum(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("k"), F.col("cat").cast("date").as("t"),
          F.col("n").cast("double").as("x")),
      "k", "t", "x", slack, threshold)

  /** Two-proportion z over the stream so far — the ARM rides the slice
    * dimension, the boolean success flag the category ('true'/'false');
    * the four pooled counts are the test's complete mergeable summary,
    * so streamed == batch bit-for-bit. */
  def propTestNow(spark: SparkSession, countsDir: String,
                  a: String, b: String): DataFrame = {
    require(a != b, "arms must be distinct labels")
    Drift.twoProportionZFromCounts(
      categoricalCounts(spark, countsDir)
        .filter(F.col("slice") === a || F.col("slice") === b)
        .agg(
          F.sum(F.when(F.col("slice") === a, F.col("n")).otherwise(0L)).as("n1"),
          F.sum(F.when(F.col("slice") === a && F.col("cat") === "true", F.col("n"))
            .otherwise(0L)).as("s1"),
          F.sum(F.when(F.col("slice") === b, F.col("n")).otherwise(0L)).as("n2"),
          F.sum(F.when(F.col("slice") === b && F.col("cat") === "true", F.col("n"))
            .otherwise(0L)).as("s2")))
  }

  /** Always-valid mSPRT p-sequence over the stream so far — the
    * (day, arm) pair rides the slice dimension as "day|arm" (the
    * cupedNow pipe convention), the centi-snapped metric the category;
    * merged (t, g, x2, c) counts are the test's complete sufficient
    * statistics, so streamed == batch bit-for-bit. */
  def msprtNow(spark: SparkSession, countsDir: String, a: String, b: String,
               tau: Double, alpha: Double = 0.05): DataFrame =
    Drift.msprtFromCounts(
      categoricalCounts(spark, countsDir)
        .select(F.to_date(F.substring_index(F.col("slice"), "|", 1)).as("t"),
          F.substring_index(F.col("slice"), "|", -1).as("g"),
          F.col("cat").cast("long").as("x2"), F.col("n").as("c")),
      a, b, tau, alpha)

  /** Autocorrelation over the stream's accumulated per-(key, day)
    * volume — the [[cusumNow]] layout; merged daily counts re-enter the
    * batch exact-BIGINT Pearson sums, so streamed == batch bit-for-bit. */
  def acfNow(spark: SparkSession, countsDir: String, maxLag: Int): DataFrame =
    graft.operators.TimeSeries.acf(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("k"), F.col("cat").cast("date").as("t"),
          F.col("n").as("x")),
      "k", "t", "x", maxLag)

  /** EWMA control chart over the same accumulated per-(key, day)
    * volume — merged counts re-enter the batch fold (the 9-snapped
    * trajectory is a pure function of the merged series). */
  def ewmaNow(spark: SparkSession, countsDir: String,
              lambda: Double = 0.2, limitL: Double = 3.0): DataFrame =
    Drift.ewmaChart(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("k"), F.col("cat").cast("date").as("t"),
          F.col("n").cast("double").as("x")),
      "k", "t", "x", lambda, limitL)

  /** Mann–Kendall trend test over the stream's accumulated per-(key,
    * day) volume — the [[cusumNow]] layout; daily counts merge exactly,
    * and the batch S/Var(S)/z are exact-integer functions of them, so
    * streamed == batch bit-for-bit. */
  def mannKendallNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.TimeSeries.mannKendall(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("k"), F.col("cat").cast("date").as("t"),
          F.col("n").as("x")),
      "k", "t", "x")

  /** Theil–Sen robust slope over the same accumulated per-(key, day)
    * volume — the estimator companion to [[mannKendallNow]] from the
    * SAME partials; the time axis re-enters as epoch days (the batch
    * operator's integer-t contract). */
  def theilSenNow(spark: SparkSession, countsDir: String): DataFrame =
    graft.operators.TimeSeries.theilSen(
      categoricalCounts(spark, countsDir)
        .select(F.col("slice").as("k"),
          F.datediff(F.col("cat").cast("date"), F.to_date(F.lit("1970-01-01"))).as("t"),
          F.col("n").as("x")),
      "k", "t", "x")

  /** Partial reader: key columns cast back (partition-column inference,
    * the foreachBatch-partial gotcha), empty/missing dir → empty frame.
    * Shared by every count-partial accumulator in this package. */
  private[streaming] def readPartials(spark: SparkSession, dir: String,
                                      keys: Seq[(String, String)]): DataFrame = {
    val raw =
      try spark.read.option("basePath", dir).parquet(dir)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          return spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(
              keys.map { case (k, t) =>
                org.apache.spark.sql.types.StructField(k,
                  org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
              } :+ org.apache.spark.sql.types.StructField("n",
                org.apache.spark.sql.types.LongType)))
      }
    raw.select(keys.map { case (k, t) => F.col(k).cast(t).as(k) } :+
      F.col("n").cast("long").as("n"): _*)
  }
}
