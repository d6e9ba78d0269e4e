package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Survival

/** Streaming Kaplan–Meier: subjects arrive as (duration, observed)
  * rows — completed support tickets, finished sessions, resolved jobs —
  * and the retention curve is re-derivable at any time. The curve's
  * accumulating state is per-(duration, observed) COUNTS, so the write
  * side IS [[StreamingDrift.attachCategorical]] (duration as the slice,
  * the observed flag as the category — same batch_id-partitioned,
  * replay-idempotent partial layout); the read side folds the merged
  * counts back into the batch estimator's (t, d, c) entry. Counts are a
  * pure function of the input multiset: streamed == batch exactly. */
object StreamingSurvival {

  /** Null rows are dropped on the WRITE side of every attach variant,
    * mirroring the batch entry points' `isNotNull` pre-filters
    * (Survival.scala drops them before counting): `concat_ws` silently
    * SKIPS null arguments, so an unfiltered null covariate/stratum/group
    * would shift the pipe-segment layout and the read side would parse a
    * neighbouring slot as the missing value — a silently corrupted fit
    * instead of the batch semantics (row dropped). */
  private def notNull(cols: String*): org.apache.spark.sql.Column =
    cols.map(F.col(_).isNotNull).reduce(_ && _)

  /** Persist per-batch (duration, observed) counts. `durCol` must be a
    * non-negative integer column, `obsCol` ∈ {0, 1}. */
  def attach(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol, obsCol))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
        F.col(obsCol).cast("int").cast("string").as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)

  /** The survival curve over everything streamed so far — the
    * [[Survival.kaplanMeier]] output shape. */
  def kmNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.kaplanMeierFromCounts(kmCounts(spark, countsDir))

  /** The KM curve with Greenwood bands over everything streamed so far —
    * the [[Survival.kaplanMeierCI]] output shape from the same partials. */
  def kmCiNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.kaplanMeierCIFromCounts(kmCounts(spark, countsDir))

  /** Nelson–Aalen cumulative hazard over everything streamed so far. */
  def cumhazNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.nelsonAalenFromCounts(kmCounts(spark, countsDir))

  /** Restricted mean survival time over everything streamed so far —
    * the area under the current KM curve up to `tau`, from the same
    * counts. */
  def rmstNow(spark: SparkSession, countsDir: String, tau: Long): DataFrame =
    Survival.rmstFromCounts(kmCounts(spark, countsDir), tau)

  /** Aalen–Johansen cumulative incidence over everything streamed so
    * far — the CAUSE (0 = censored, 1, 2, …) rides the category
    * dimension of the SAME [[attach]] layout (obs ∈ {0, 1} is just the
    * single-cause special case); merged (t, cause, c) counts re-enter
    * the batch estimator, so streamed == batch exactly. Attach with
    * `obsCol` = the cause column. */
  def aalenJohansenNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.aalenJohansenFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .select(F.col("slice").cast("long").as("t"),
          F.col("cat").cast("long").as("cause"), F.col("n").as("c")))

  private def kmCounts(spark: SparkSession, countsDir: String): DataFrame =
    StreamingDrift.categoricalCounts(spark, countsDir)
      .groupBy(F.col("slice").cast("long").as("t"))
      .agg(
        F.sum(F.when(F.col("cat") === "1", F.col("n")).otherwise(F.lit(0L))).as("d"),
        F.sum(F.col("n")).as("c"))

  /** Persist per-batch (duration, observed, cohort) counts for the
    * two-cohort log-rank test: the cohort rides the same categorical
    * partial layout as "obs|group" (the group value must not contain
    * '|' — obs is read before the FIRST pipe, the group after the
    * LAST). Counts stay plain mergeable sums, so streamed == batch. */
  def attachGrouped(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      groupCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol, obsCol, groupCol))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
        F.concat_ws("|", F.col(obsCol).cast("int").cast("string"),
          F.col(groupCol).cast("string")).as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)

  /** The log-rank statistic over everything streamed so far — the
    * [[Survival.logRank]] one-row output shape. */
  def logRankNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.logRankFromCounts(groupedCounts(spark, countsDir))

  /** The Breslow Cox-PH fit over everything streamed so far — the
    * [[Survival.coxPh]] one-row output shape, from the SAME grouped
    * counts store [[attachGrouped]] maintains (the per-(t, g) counts
    * are the fit's complete sufficient statistics). */
  def coxPhNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.coxPhFromCounts(groupedCounts(spark, countsDir))

  /** Harrell's C-index over everything streamed so far — the pair
    * counting is a pure function of the same per-(t, g) counts, so
    * streamed == batch exactly. */
  def cIndexNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.cIndexFromCounts(groupedCounts(spark, countsDir))

  /** RMST difference at τ over everything streamed so far — the same
    * grouped counts are the per-cohort KM curve's complete summary. */
  def rmstDiffNow(spark: SparkSession, countsDir: String, tau: Long): DataFrame =
    Survival.rmstDiffFromCounts(groupedCounts(spark, countsDir), tau)

  private def groupedCounts(spark: SparkSession, countsDir: String): DataFrame =
    StreamingDrift.categoricalCounts(spark, countsDir)
      .select(F.col("slice").cast("long").as("t"),
        F.substring_index(F.col("cat"), "|", 1).cast("int").as("__obs"),
        F.substring_index(F.col("cat"), "|", -1).as("g"),
        F.col("n"))
      .groupBy("t", "g")
      .agg(
        F.sum(F.when(F.col("__obs") === 1, F.col("n")).otherwise(F.lit(0L))).as("d"),
        F.sum(F.col("n")).as("c"))

  /** Breslow baseline hazard + predicted curves over everything
    * streamed so far — [[Survival.coxBaseline]]'s output shape from the
    * SAME [[attachGrouped]] counts store ([[coxPhNow]]'s sufficient
    * statistics are also the curves'). */
  def coxBaselineNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.coxBaselineFromCounts(groupedCounts(spark, countsDir))

  /** Schoenfeld PH-trend check over everything streamed so far — the
    * residuals are a pure function of the same per-(t, g) counts, so
    * streamed == batch exactly. */
  def coxSchoenfeldNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.coxSchoenfeldTrendFromCounts(groupedCounts(spark, countsDir))

  /** Persist per-batch (duration, observed, stratum, cohort) counts for
    * the stratified Cox fit: cat = "obs|stratum|group" (obs before the
    * FIRST pipe, group after the LAST, the stratum between — neither
    * value may contain '|'). */
  def attachStrat(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      groupCol: String,
      strataCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol, obsCol, strataCol, groupCol))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
        F.concat_ws("|", F.col(obsCol).cast("int").cast("string"),
          F.col(strataCol).cast("string"),
          F.col(groupCol).cast("string")).as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)

  /** The stratified Cox fit over everything streamed so far — the
    * [[Survival.coxPhStratified]] one-row shape from the merged
    * (t, stratum, cohort) counts [[attachStrat]] maintains. */
  def coxPhStratNow(spark: SparkSession, countsDir: String): DataFrame =
    Survival.coxPhStratifiedFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .select(F.col("slice").cast("long").as("t"),
          F.substring_index(F.col("cat"), "|", 1).cast("int").as("__obs"),
          F.substring_index(F.substring_index(F.col("cat"), "|", 2), "|", -1).as("s"),
          F.substring_index(F.col("cat"), "|", -1).as("g"),
          F.col("n"))
        .groupBy("s", "t", "g")
        .agg(
          F.sum(F.when(F.col("__obs") === 1, F.col("n")).otherwise(F.lit(0L))).as("d"),
          F.sum(F.col("n")).as("c")))

  /** Persist per-batch (duration, observed, covariate-pattern) counts
    * for the multi-covariate Cox fit: the pattern index is computed on
    * the WRITE side with the batch operator's own [[Survival.patternCol]]
    * (non-binary covariate values land in pattern -1 and trip the batch
    * guard at read time — the fail-loud contract survives streaming). */
  def attachPattern(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      covCols: Seq[String],
      triggerMillis: Long = 1000L): StreamingQuery =
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol +: obsCol +: covCols: _*))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
        F.concat_ws("|", F.col(obsCol).cast("int").cast("string"),
          Survival.patternCol(covCols).cast("string")).as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)

  /** The multi-covariate Cox fit over everything streamed so far — the
    * [[Survival.coxPhMulti]] per-covariate row shape from the merged
    * (t, pattern) counts [[attachPattern]] maintains. `covNames` labels
    * the output rows and fixes the arity — it must match the covCols
    * the stream was attached with. */
  def coxPhMultiNow(spark: SparkSession, countsDir: String,
                    covNames: Seq[String]): DataFrame =
    Survival.coxPhMultiFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .select(F.col("slice").cast("long").as("t"),
          F.substring_index(F.col("cat"), "|", 1).cast("int").as("__obs"),
          F.substring_index(F.col("cat"), "|", -1).cast("long").as("k"),
          F.col("n"))
        .groupBy("t", "k")
        .agg(
          F.sum(F.when(F.col("__obs") === 1, F.col("n")).otherwise(F.lit(0L))).as("d"),
          F.sum(F.col("n")).as("c")),
      covNames)

  /** Persist per-batch (duration, observed, snapped covariate) counts
    * for the continuous-covariate Cox fit: the covariate must be
    * PRE-SNAPPED to its grid (the [[Survival.coxPhCont]] decimals
    * contract) before attaching — the double→string→double round trip
    * through the partial layout is exact. */
  def attachCont(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      covCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol, obsCol, covCol))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
        F.concat_ws("|", F.col(obsCol).cast("int").cast("string"),
          F.col(covCol).cast("double").cast("string")).as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)

  /** The continuous-covariate Cox fit over everything streamed so far —
    * the [[Survival.coxPhCont]] one-row shape from the merged
    * (t, grid value) counts [[attachCont]] maintains. */
  def coxPhContNow(spark: SparkSession, countsDir: String,
                   covName: String): DataFrame =
    Survival.coxPhContFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .select(F.col("slice").cast("long").as("t"),
          F.substring_index(F.col("cat"), "|", 1).cast("int").as("__obs"),
          F.substring_index(F.col("cat"), "|", -1).cast("double").as("v"),
          F.col("n"))
        .groupBy("t", "v")
        .agg(
          F.sum(F.when(F.col("__obs") === 1, F.col("n")).otherwise(F.lit(0L))).as("d"),
          F.sum(F.col("n")).as("c")),
      covName)

  /** Persist per-batch (duration, observed, snapped covariate, binary
    * pattern) counts for the MIXED continuous+binary Cox fit
    * ([[Survival.coxPhMixed]]): the continuous covariate pre-snapped to
    * its grid (the decimals contract), the 0–2 binary adjustment
    * covariates encoded as their [[Survival.patternCol]] index. A
    * non-binary adjustment value lands in pattern -1 and trips
    * [[Survival.coxPhMixedFromCounts]]'s loud guard at read time. */
  def attachMixed(
      subjects: DataFrame,
      checkpointDir: String,
      countsDir: String,
      durCol: String,
      obsCol: String,
      covCol: String,
      binCols: Seq[String],
      triggerMillis: Long = 1000L): StreamingQuery = {
    val k = if (binCols.isEmpty) F.lit(0L) else Survival.patternCol(binCols)
    StreamingDrift.attachCategorical(
      subjects.filter(notNull(durCol +: obsCol +: covCol +: binCols: _*))
        .select(F.col(durCol).cast("long").cast("string").as("slice"),
          F.concat_ws("|", F.col(obsCol).cast("int").cast("string"),
            F.col(covCol).cast("double").cast("string"),
            k.cast("string")).as("cat")),
      checkpointDir, countsDir, triggerMillis = triggerMillis)
  }

  /** The mixed continuous+binary Cox fit over everything streamed so
    * far — [[Survival.coxPhMixed]]'s per-covariate row shape from the
    * merged (t, v, k) counts [[attachMixed]] maintains. `covName` /
    * `binNames` label the output rows and must match the columns the
    * stream was attached with. */
  def coxPhMixedNow(spark: SparkSession, countsDir: String,
                    covName: String, binNames: Seq[String]): DataFrame =
    Survival.coxPhMixedFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .select(F.col("slice").cast("long").as("t"),
          F.substring_index(F.col("cat"), "|", 1).cast("int").as("__obs"),
          F.substring_index(F.substring_index(F.col("cat"), "|", 2), "|", -1)
            .cast("double").as("v"),
          F.substring_index(F.col("cat"), "|", -1).cast("long").as("k"),
          F.col("n"))
        .groupBy("t", "v", "k")
        .agg(
          F.sum(F.when(F.col("__obs") === 1, F.col("n")).otherwise(F.lit(0L))).as("d"),
          F.sum(F.col("n")).as("c")),
      covName, binNames)
}
