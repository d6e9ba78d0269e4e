package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.Pin._

/** Classifier evaluation over a (prediction, label) pair — the scoring
  * half of the learned-filter loop ([[QualityModel]], [[TextAnalysis.langId]]):
  * once a model labels the corpus, the pipeline needs per-class
  * precision/recall/F1 and a chance-corrected agreement number before
  * anyone trusts the labels downstream.
  *
  * Everything reduces to ONE combinable confusion-cell scan
  * (groupBy(pred, label).count — the [[Drift.chiSquare]] cell shape);
  * margins are re-aggregations of the cell frame, every statistic is
  * fixed-shape IEEE over exact BIGINT counts, so both the per-class and
  * the one-row readers are engine-exact up to the round-6/4 output snap.
  * Class key space is bounded by the label vocabulary, never the corpus.
  */
object Evaluation {

  /** Per-class precision / recall / F1 from one confusion-cell scan.
    * Classes are the UNION of everything seen as a prediction or a
    * label (full outer margin join), so a class the model never
    * predicts still reports its recall = 0 instead of vanishing.
    * Divisions are CASE-guarded (ANSI): a class with no predictions has
    * NULL precision, no true instances NULL recall, and F1 is NULL
    * unless precision + recall > 0. Output: one row per class —
    * (class, n_pred, n_actual, tp, precision, recall, f1), round 6. */
  def perClass(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    perClassFromCells(confusionCells(df, predCol, labelCol))

  /** [[perClass]] over a pre-aggregated (pred, label, n) confusion-cell
    * frame — the streaming re-entry point (cells are trivially
    * mergeable partials, so streamed == batch exactly). */
  def perClassFromCells(cells: DataFrame): DataFrame = {
    val predN = cells.groupBy(F.col("pred").as("class"))
      .agg(F.sum("n").as("n_pred"))
    val actualN = cells.groupBy(F.col("label").as("class"))
      .agg(F.sum("n").as("n_actual"))
    val tp = cells.filter(F.col("pred") === F.col("label"))
      .select(F.col("pred").as("class"), F.col("n").as("tp"))
    predN.join(actualN, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left")
      .select(F.col("class"),
        F.coalesce(F.col("n_pred"), F.lit(0L)).as("n_pred"),
        F.coalesce(F.col("n_actual"), F.lit(0L)).as("n_actual"),
        F.coalesce(F.col("tp"), F.lit(0L)).as("tp"))
      .withColumn("__p", F.when(F.col("n_pred") > 0,
        F.col("tp").cast("double") / F.col("n_pred")))
      .withColumn("__r", F.when(F.col("n_actual") > 0,
        F.col("tp").cast("double") / F.col("n_actual")))
      .withColumn("__f", F.when(F.col("__p") + F.col("__r") > 0,
        F.lit(2.0) * F.col("__p") * F.col("__r") / (F.col("__p") + F.col("__r"))))
      .select(F.col("class"), F.col("n_pred"), F.col("n_actual"), F.col("tp"),
        (F.round(F.col("__p"), 6) + F.lit(0.0)).as("precision"),
        (F.round(F.col("__r"), 6) + F.lit(0.0)).as("recall"),
        (F.round(F.col("__f"), 6) + F.lit(0.0)).as("f1"))
  }

  /** COHEN'S KAPPA (Cohen, Educ. Psychol. Meas. 1960) + overall
    * accuracy — the chance-corrected agreement number: accuracy alone
    * flatters any model on a skewed label distribution; κ subtracts the
    * agreement the margins would produce by chance, pₑ = Σ_c (pred_c/n)
    * (actual_c/n), κ = (p₀ − pₑ)/(1 − pₑ). κ is NULL when pₑ = 1 (a
    * single-class degenerate margin — agreement is unmeasurable, not
    * perfect). Output: one row — (n, accuracy, expected_accuracy,
    * kappa), round 6 / κ round 4. */
  def kappa(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    kappaFromCells(confusionCells(df, predCol, labelCol))

  /** [[kappa]] over a pre-aggregated (pred, label, n) cell frame. */
  def kappaFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    val po = cells.agg(F.sum("n").as("n"),
      F.sum(F.when(F.col("pred") === F.col("label"), F.col("n")).otherwise(0L)).as("agree"))
    val pe = cells.groupBy("pred").agg(F.sum("n").as("np"))
      .join(cells.groupBy("label").agg(F.sum("n").as("na")),
        F.col("pred") === F.col("label"))
      .agg(F.sum(F.col("np").cast("double") * F.col("na")).as("__pewn"))
    po.crossJoin(F.broadcast(pe))
      .withColumn("__po", F.col("agree").cast("double") / F.col("n"))
      .withColumn("__pe", F.col("__pewn") / F.col("n") / F.col("n"))
      .withColumn("__k", F.when(F.col("__pe") < 1.0,
        (F.col("__po") - F.col("__pe")) / (F.lit(1.0) - F.col("__pe"))))
      .select(F.col("n"),
        (F.round(F.col("__po"), 6) + F.lit(0.0)).as("accuracy"),
        (F.round(F.col("__pe"), 6) + F.lit(0.0)).as("expected_accuracy"),
        (F.round(F.col("__k"), 4) + F.lit(0.0)).as("kappa"))
  }

  /** The shared confusion frame: (pred, label, n) over non-null pairs. */
  private def confusionCells(df: DataFrame, predCol: String,
                             labelCol: String): DataFrame =
    df.filter(F.col(predCol).isNotNull && F.col(labelCol).isNotNull)
      .groupBy(F.col(predCol).as("pred"), F.col(labelCol).as("label"))
      .agg(F.count(F.lit(1)).as("n"))

  // ---------------------------------------------------------------------
  // Score-based evaluation: every statistic below reduces to ONE
  // mergeable (x, c1, c2) per-distinct-score count frame — c1 positives,
  // c2 negatives at score x — the SAME layout the two-sample drift tests
  // accumulate, so each gets a streaming twin for free and the heavy
  // lifting (the corpus-wide cumulative) rides [[Drift.cdfFromCounts]]'s
  // two-phase distributed prefix, never a single-partition window.
  // ---------------------------------------------------------------------

  /** ROC AUC via the Mann–Whitney formulation (Hanley & McNeil,
    * Radiology 1982): AUC = P(score⁺ > score⁻) + ½P(tie), computed as
    * (R₁ − n₁(n₁+1)/2) / (n₁n₂) with R₁ the positives' midrank sum —
    * tie-aware (midranks are exact dyadic rationals over BIGINT counts,
    * the [[Drift.mannWhitneyFromCounts]] discipline, so the rank sum is
    * engine-exact) and rank-based, so it never materializes the O(n₁n₂)
    * pair space. NULL when either class is empty (AUC is undefined, not
    * 0.5). Output: one row — (n_pos, n_neg, auc), round 6. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    rocAucFromCounts(binaryScoreCounts(df, scoreCol, labelCol))

  /** [[rocAuc]] over a pre-aggregated (x, c1 = positives, c2 =
    * negatives) count frame — the streaming re-entry point. */
  def rocAucFromCounts(byV: DataFrame): DataFrame = {
    val (cum, n) = Drift.cdfFromCounts(byV)
    val t = F.col("c1") + F.col("c2")
    val before = (F.col("__k1") + F.col("__k2") - t).cast("double")
    val midrank = before + (t.cast("double") + 1.0) / 2.0
    val s = cum.agg(F.sum(F.col("c1").cast("double") * midrank).as("__r1"))
    s.crossJoin(F.broadcast(n))
      .withColumn("__auc", F.when(F.col("n1") > 0 && F.col("n2") > 0,
        (F.col("__r1") - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0)
          / (F.col("n1").cast("double") * F.col("n2"))))
      .select(F.col("n1").as("n_pos"), F.col("n2").as("n_neg"),
        (F.round(F.col("__auc"), 6) + F.lit(0.0)).as("auc"))
  }

  /** ROC AUC with the DeLong 95% confidence interval (DeLong, DeLong &
    * Clarke-Pearson, Biometrics 1988) — the distribution-free SE the
    * bare AUC needs before two models are compared: per-positive
    * placement values V₁₀(x) = (neg_below + ½·neg_at)/n₂ (and V₀₁
    * symmetrically), S₁₀ = var(V₁₀), SE² = S₁₀/n₁ + S₀₁/n₂. Every
    * placement value folds from the SAME ascending cumulatives as
    * [[rocAuc]] — one scan, no pair space; variances are count-weighted
    * moment sums (the welch round-snap class). CI clipped to [0, 1];
    * SE/CI NULL when either class has < 2 members (a variance needs
    * two). Output: one row — (n_pos, n_neg, auc, se, ci_lo, ci_hi),
    * auc round 6, se round 6, CI round 6. */
  def rocAucCi(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    rocAucCiFromCounts(binaryScoreCounts(df, scoreCol, labelCol))

  /** [[rocAucCi]] over a pre-aggregated (x, c1, c2) count frame. */
  def rocAucCiFromCounts(byV: DataFrame): DataFrame = {
    val (cum, n) = Drift.cdfFromCounts(byV)
    val c = cum.crossJoin(F.broadcast(n))
    // placement of positives at x among negatives (and symmetrically):
    // strictly-below cumulative + half the same-score mass
    val v10 = ((F.col("__k2") - F.col("c2")).cast("double")
      + F.col("c2").cast("double") / 2.0) / F.col("n2")
    val v01 = ((F.col("n1") - F.col("__k1")).cast("double")
      + F.col("c1").cast("double") / 2.0) / F.col("n1")
    val s = c.agg(
      F.sum(F.col("c1") * v10).as("__s10"),
      F.sum(F.col("c1") * v10 * v10).as("__q10"),
      F.sum(F.col("c2") * v01).as("__s01"),
      F.sum(F.col("c2") * v01 * v01).as("__q01"))
    s.crossJoin(F.broadcast(n))
      .withColumn("__auc", F.when(F.col("n1") > 0 && F.col("n2") > 0,
        F.col("__s10") / F.col("n1")))
      // clamp the FP-cancellation shadow below zero INSIDE the guard
      // (greatest skips nulls — an n ≤ 1 class must stay NULL)
      .withColumn("__v10", F.when(F.col("n1") > 1, F.greatest(F.lit(0.0),
        (F.col("__q10") - F.col("__s10") * F.col("__s10") / F.col("n1"))
          / (F.col("n1") - 1))))
      .withColumn("__v01", F.when(F.col("n2") > 1, F.greatest(F.lit(0.0),
        (F.col("__q01") - F.col("__s01") * F.col("__s01") / F.col("n2"))
          / (F.col("n2") - 1))))
      .withColumn("__se", F.sqrt(F.col("__v10") / F.col("n1")
        + F.col("__v01") / F.col("n2")))
      .select(F.col("n1").as("n_pos"), F.col("n2").as("n_neg"),
        (F.round(F.col("__auc"), 6) + F.lit(0.0)).as("auc"),
        (F.round(F.col("__se"), 6) + F.lit(0.0)).as("se"),
        // greatest/least SKIP nulls (the q_survival_ci trap): an
        // undefined SE must yield NULL bands, not a clipped [0, 1]
        (F.round(F.when(F.col("__se").isNotNull,
          F.greatest(F.col("__auc") - F.lit(1.96) * F.col("__se"),
            F.lit(0.0))), 6) + F.lit(0.0)).as("ci_lo"),
        (F.round(F.when(F.col("__se").isNotNull,
          F.least(F.col("__auc") + F.lit(1.96) * F.col("__se"),
            F.lit(1.0))), 6) + F.lit(0.0)).as("ci_hi"))
  }

  /** PAIRED DeLong test: are two scorers' AUCs different ON THE SAME
    * ROWS (DeLong et al. 1988, §3)? The unpaired z ignores that both
    * models rank the same subjects, wasting the correlation; the paired
    * SE subtracts it: SE² = (S₁₀ᴬ + S₁₀ᴮ − 2S₁₀ᴬᴮ)/n₁ + (·)₀₁/n₂ with
    * S₁₀ᴬᴮ the covariance of the two models' placement values over the
    * positives. Placements come from each score's own cumulative count
    * frame JOINED BACK to the rows by score value (equi-joins on the
    * score — data-sized but key-partitioned, never a pair space), then
    * one combinable moment scan per class. z is decided on the
    * UNROUNDED statistic (the welch class); NULL when either class has
    * < 2 members or the variance degenerates. Output: one row —
    * (n_pos, n_neg, auc_a, auc_b, diff, se, z, reject_95), AUCs/diff/se
    * round 6, z round 4. */
  def aucCompare(df: DataFrame, scoreACol: String, scoreBCol: String,
                 labelCol: String): DataFrame = {
    val xa = F.col(scoreACol).cast("double")
    val xb = F.col(scoreBCol).cast("double")
    val y = F.col(labelCol).cast("boolean")
    val base = df.filter(xa.isNotNull && xb.isNotNull && y.isNotNull)
      .select(xa.as("xa"), xb.as("xb"), y.as("y"))
    def placeFrame(col: String, out: String): DataFrame = {
      val byV = base.groupBy(F.col(col).as("x"))
        .agg(F.count(F.when(F.col("y"), 1)).as("c1"),
          F.count(F.when(!F.col("y"), 1)).as("c2"))
      val (cum, n) = Drift.cdfFromCounts(byV)
      cum.crossJoin(F.broadcast(n)).select(
        F.col("x").as(col),
        (((F.col("__k2") - F.col("c2")).cast("double")
          + F.col("c2").cast("double") / 2.0) / F.col("n2")).as(s"v10$out"),
        (((F.col("n1") - F.col("__k1")).cast("double")
          + F.col("c1").cast("double") / 2.0) / F.col("n1")).as(s"v01$out"))
    }
    val placed = base
      .join(placeFrame("xa", "a"), Seq("xa"))
      .join(placeFrame("xb", "b"), Seq("xb"))
    val pos = placed.filter(F.col("y"))
      .agg(F.count(F.lit(1)).as("n1"),
        F.sum("v10a").as("sa"), F.sum("v10b").as("sb"),
        F.sum(F.col("v10a") * F.col("v10a")).as("qa"),
        F.sum(F.col("v10b") * F.col("v10b")).as("qb"),
        F.sum(F.col("v10a") * F.col("v10b")).as("qab"))
    val neg = placed.filter(!F.col("y"))
      .agg(F.count(F.lit(1)).as("n2"),
        F.sum("v01a").as("ta"), F.sum("v01b").as("tb"),
        F.sum(F.col("v01a") * F.col("v01a")).as("ra"),
        F.sum(F.col("v01b") * F.col("v01b")).as("rb"),
        F.sum(F.col("v01a") * F.col("v01b")).as("rab"))
    def svar(q: Column, s1: Column, s2: Column, n: Column): Column =
      F.when(n > 1, (q - s1 * s2 / n) / (n - 1))
    val z0 = pos.crossJoin(neg)
      .withColumn("__aa", F.when(F.col("n1") > 0, F.col("sa") / F.col("n1")))
      .withColumn("__ab", F.when(F.col("n1") > 0, F.col("sb") / F.col("n1")))
      .withColumn("__s10a", svar(F.col("qa"), F.col("sa"), F.col("sa"), F.col("n1")))
      .withColumn("__s10b", svar(F.col("qb"), F.col("sb"), F.col("sb"), F.col("n1")))
      .withColumn("__s10ab", svar(F.col("qab"), F.col("sa"), F.col("sb"), F.col("n1")))
      .withColumn("__s01a", svar(F.col("ra"), F.col("ta"), F.col("ta"), F.col("n2")))
      .withColumn("__s01b", svar(F.col("rb"), F.col("tb"), F.col("tb"), F.col("n2")))
      .withColumn("__s01ab", svar(F.col("rab"), F.col("ta"), F.col("tb"), F.col("n2")))
      .withColumn("__se2",
        (F.col("__s10a") + F.col("__s10b") - F.lit(2.0) * F.col("__s10ab")) / F.col("n1")
          + (F.col("__s01a") + F.col("__s01b") - F.lit(2.0) * F.col("__s01ab")) / F.col("n2"))
      .withColumn("__se", F.when(F.col("__se2") > 0.0, F.sqrt(F.col("__se2"))))
      .withColumn("__z", (F.col("__aa") - F.col("__ab")) / F.col("__se"))
    z0.select(F.col("n1").as("n_pos"), F.col("n2").as("n_neg"),
      (F.round(F.col("__aa"), 6) + F.lit(0.0)).as("auc_a"),
      (F.round(F.col("__ab"), 6) + F.lit(0.0)).as("auc_b"),
      (F.round(F.col("__aa") - F.col("__ab"), 6) + F.lit(0.0)).as("diff"),
      (F.round(F.col("__se"), 6) + F.lit(0.0)).as("se"),
      (F.round(F.col("__z"), 4) + F.lit(0.0)).as("z"),
      (F.abs(F.col("__z")) > 1.96).as("reject_95"))
  }

  /** Average precision (area under the precision–recall curve, the
    * step-function convention scikit-learn's average_precision_score
    * uses): walking distinct scores DESCENDING, AP = Σₓ ΔRₓ · Pₓ with
    * Pₓ = precision and Rₓ = recall at threshold "score ≥ x". Ties are
    * handled by construction — a tied block enters as one step, never
    * an arbitrary within-tie order (the trap of row-at-a-time AP).
    * Descending cumulatives fold from the SAME ascending two-phase
    * prefix as [[rocAuc]] (n − exclusive-ascending), one scan total.
    * The baseline for "is this good" is prevalence = n₊/n — a random
    * ranker's AP — emitted alongside. NULL AP when there are no
    * positives. Output: one row — (n_pos, n_neg, prevalence, pr_auc),
    * round 6. */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame =
    averagePrecisionFromCounts(binaryScoreCounts(df, scoreCol, labelCol))

  /** [[averagePrecision]] over a pre-aggregated (x, c1, c2) count
    * frame. */
  def averagePrecisionFromCounts(byV: DataFrame): DataFrame = {
    val (cum, n) = Drift.cdfFromCounts(byV)
    val t = F.col("c1") + F.col("c2")
    // positives / total with score >= x: grand total minus the
    // EXCLUSIVE ascending prefix (inclusive __k minus own block).
    val posGe = F.col("n1") - (F.col("__k1") - F.col("c1"))
    val totGe = (F.col("n1") + F.col("n2")) - ((F.col("__k1") + F.col("__k2")) - t)
    val step = F.when(F.col("c1") > 0,
      F.col("c1").cast("double") / F.col("n1")
        * (posGe.cast("double") / totGe)).otherwise(F.lit(0.0))
    val s = cum.crossJoin(F.broadcast(n)).agg(F.sum(step).as("__ap"))
    s.crossJoin(F.broadcast(n))
      .select(F.col("n1").as("n_pos"), F.col("n2").as("n_neg"),
        (F.round(F.col("n1").cast("double") / (F.col("n1") + F.col("n2")), 6)
          + F.lit(0.0)).as("prevalence"),
        (F.round(F.when(F.col("n1") > 0, F.col("__ap")), 6)
          + F.lit(0.0)).as("pr_auc"))
  }

  /** Brier score (Brier, Monthly Weather Review 1950) + skill: mean
    * squared gap between a probability forecast and the 0/1 outcome,
    * and the skill score 1 − BS/BS_ref against the climatology forecast
    * p ≡ prevalence (BS_ref = prev·(1−prev)) — the number that says
    * whether the model beats "always predict the base rate". Skill is
    * NULL on a single-class input (BS_ref = 0: skill is unmeasurable,
    * not perfect). One combinable scan. Output: one row — (n, n_pos,
    * brier, brier_ref, skill), round 6 / skill round 4. */
  def brier(df: DataFrame, probCol: String, labelCol: String): DataFrame =
    brierFromCounts(binaryScoreCounts(df, probCol, labelCol))

  /** [[brier]] over a pre-aggregated (x = probability, c1, c2) count
    * frame: BS = Σ[c1·(x−1)² + c2·x²] / n. */
  def brierFromCounts(byV: DataFrame): DataFrame =
    byV.agg(
        F.sum("c1").as("n_pos"), F.sum(F.col("c1") + F.col("c2")).as("n"),
        F.sum(F.col("c1") * (F.col("x") - 1.0) * (F.col("x") - 1.0)
          + F.col("c2") * F.col("x") * F.col("x")).as("__se"))
      .withColumn("__prev", F.col("n_pos").cast("double") / F.col("n"))
      .withColumn("__bs", F.col("__se") / F.col("n"))
      .withColumn("__ref", F.col("__prev") * (F.lit(1.0) - F.col("__prev")))
      .select(F.col("n"), F.col("n_pos"),
        (F.round(F.col("__bs"), 6) + F.lit(0.0)).as("brier"),
        (F.round(F.col("__ref"), 6) + F.lit(0.0)).as("brier_ref"),
        (F.round(F.when(F.col("__ref") > 0.0,
          F.lit(1.0) - F.col("__bs") / F.col("__ref")), 4)
          + F.lit(0.0)).as("skill"))

  /** Reliability diagram: `bins` equal-width probability buckets, each
    * reporting how often the outcome actually happened vs what the
    * model predicted — the calibration read ("of everything scored
    * ~0.7, did ~70% turn out positive?"). p = 1.0 lands in the TOP bin
    * (least-clamp, the histogram right-edge convention). `gap` is
    * |frac_pos − mean_pred| on the UNROUNDED means. Bin key space is
    * `bins`, never the corpus. Output: one row per non-empty bin —
    * (bin, n, mean_pred, frac_pos, gap), round 6. */
  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
                      bins: Int = 10): DataFrame =
    calibrationBinsFromCounts(binaryScoreCounts(df, probCol, labelCol), bins)

  /** [[calibrationBins]] over a pre-aggregated (x, c1, c2) count
    * frame. */
  def calibrationBinsFromCounts(byV: DataFrame, bins: Int = 10): DataFrame =
    byV.groupBy(F.least(F.floor(F.col("x") * bins), F.lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(F.sum(F.col("c1") + F.col("c2")).as("n"),
        F.sum(F.col("x") * (F.col("c1") + F.col("c2"))).as("__sp"),
        F.sum("c1").as("__pos"))
      .withColumn("__mp", F.col("__sp") / F.col("n"))
      .withColumn("__fp", F.col("__pos").cast("double") / F.col("n"))
      .select(F.col("bin"), F.col("n"),
        (F.round(F.col("__mp"), 6) + F.lit(0.0)).as("mean_pred"),
        (F.round(F.col("__fp"), 6) + F.lit(0.0)).as("frac_pos"),
        (F.round(F.abs(F.col("__fp") - F.col("__mp")), 6) + F.lit(0.0)).as("gap"))

  /** Expected calibration error: the bin-weighted mean of the
    * reliability gaps, ECE = Σ_b (n_b/n)·|frac_pos_b − mean_pred_b| —
    * the calibration diagram folded to one number (Naeini et al., AAAI
    * 2015). Decided on UNROUNDED bin means over a ≤`bins`-row frame.
    * Output: one row — (n, bins_used, ece), round 6. */
  def ece(df: DataFrame, probCol: String, labelCol: String,
          bins: Int = 10): DataFrame =
    eceFromCounts(binaryScoreCounts(df, probCol, labelCol), bins)

  /** [[ece]] over a pre-aggregated (x, c1, c2) count frame. */
  def eceFromCounts(byV: DataFrame, bins: Int = 10): DataFrame =
    byV.groupBy(F.least(F.floor(F.col("x") * bins), F.lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(F.sum(F.col("c1") + F.col("c2")).as("n"),
        F.sum(F.col("x") * (F.col("c1") + F.col("c2"))).as("__sp"),
        F.sum("c1").as("__pos"))
      .agg(F.sum("n").as("n"), F.count(F.lit(1)).as("bins_used"),
        F.sum(F.abs(F.col("__pos").cast("double") / F.col("n")
          - F.col("__sp") / F.col("n"))
          * F.col("n")).as("__wgap"))
      .select(F.col("n"), F.col("bins_used"),
        (F.round(F.col("__wgap") / F.col("n"), 6) + F.lit(0.0)).as("ece"))

  /** Per-group ROC AUC — the FAIRNESS-AUDIT read of [[rocAuc]]: a
    * scorer can hold a healthy pooled AUC while discriminating well for
    * one slice and at chance for another (the aggregation masking
    * Simpson-style). Same tie-aware midrank algebra, but the cumulative
    * runs as a window PARTITIONED by the group (the per-key window
    * class — the shuffle key IS the audit key), so no group's ranks mix
    * with another's and no global window touches the pooled value axis.
    * Groups with one class report NULL (AUC undefined there — the
    * honest answer, not 0.5). Output: one row per group — (group,
    * n_pos, n_neg, auc), round 6. */
  def rocAucByGroup(df: DataFrame, scoreCol: String, labelCol: String,
                    groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = F.col(scoreCol).cast("double")
    val y = F.col(labelCol).cast("boolean")
    val byGX = df.filter(x.isNotNull && y.isNotNull && F.col(groupCol).isNotNull)
      .groupBy(F.col(groupCol).as("group"), x.as("x"))
      .agg(F.count(F.when(y, 1)).as("c1"), F.count(F.when(!y, 1)).as("c2"))
    val w = Window.partitionBy("group").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = F.col("c1") + F.col("c2")
    val mid = (F.sum(t).over(w) - t).cast("double") + (t.cast("double") + 1.0) / 2.0
    byGX
      .withColumn("__r", F.col("c1").cast("double") * mid)
      .groupBy("group")
      .agg(F.sum("c1").as("n_pos"), F.sum("c2").as("n_neg"),
        F.sum("__r").as("__r1"))
      .select(F.col("group"), F.col("n_pos"), F.col("n_neg"),
        (F.round(F.when(F.col("n_pos") > 0 && F.col("n_neg") > 0,
          (F.col("__r1") - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos").cast("double") * F.col("n_neg"))), 6)
          + F.lit(0.0)).as("auc"))
  }

  /** Per-group classification-fairness board: for each group, the
    * selection rate (demographic parity's operand), TPR and FPR
    * (equalized odds' operands), and the group's base rate — the table
    * a curation pipeline audits before a learned filter's keep/drop
    * decisions ship. One confusion-cell scan keyed by group; rates are
    * CASE-guarded (a group with no positives has NULL TPR, not 0).
    * Output: one row per group — (group, n, n_pos, base_rate,
    * selection_rate, tpr, fpr), round 6. */
  def groupFairness(df: DataFrame, groupCol: String, predCol: String,
                    labelCol: String): DataFrame = {
    val p = F.col(predCol).cast("boolean")
    val y = F.col(labelCol).cast("boolean")
    df.filter(p.isNotNull && y.isNotNull && F.col(groupCol).isNotNull)
      .groupBy(F.col(groupCol).as("group"))
      .agg(F.count(F.lit(1)).as("n"),
        F.count(F.when(y, 1)).as("n_pos"),
        F.count(F.when(p, 1)).as("__sel"),
        F.count(F.when(p && y, 1)).as("__tp"),
        F.count(F.when(p && !y, 1)).as("__fp"))
      .select(F.col("group"), F.col("n"), F.col("n_pos"),
        (F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
          + F.lit(0.0)).as("base_rate"),
        (F.round(F.col("__sel").cast("double") / F.col("n"), 6)
          + F.lit(0.0)).as("selection_rate"),
        (F.round(F.when(F.col("n_pos") > 0,
          F.col("__tp").cast("double") / F.col("n_pos")), 6)
          + F.lit(0.0)).as("tpr"),
        (F.round(F.when(F.col("n") - F.col("n_pos") > 0,
          F.col("__fp").cast("double") / (F.col("n") - F.col("n_pos"))), 6)
          + F.lit(0.0)).as("fpr"))
  }

  /** [[groupFairness]] folded to the headline gaps: demographic-parity
    * gap = max − min selection rate across groups, and the equalized-
    * odds gap = the larger of the TPR and FPR spreads (Hardt et al.,
    * NeurIPS 2016) — the two numbers a fairness gate thresholds.
    * Spreads are over the ROUNDED per-group rates (group key space
    * bounds the fold); groups with undefined TPR/FPR drop from their
    * spread, and a board with < 2 groups reports NULL gaps. Output: one
    * row — (n_groups, parity_gap, tpr_gap, fpr_gap, eq_odds_gap),
    * round 6. */
  def fairnessGaps(df: DataFrame, groupCol: String, predCol: String,
                   labelCol: String): DataFrame =
    groupFairness(df, groupCol, predCol, labelCol).agg(
        F.count(F.lit(1)).as("n_groups"),
        (F.max("selection_rate") - F.min("selection_rate")).as("__pg"),
        (F.max("tpr") - F.min("tpr")).as("__tg"),
        (F.max("fpr") - F.min("fpr")).as("__fg"))
      .select(F.col("n_groups"),
        (F.round(F.when(F.col("n_groups") > 1, F.col("__pg")), 6)
          + F.lit(0.0)).as("parity_gap"),
        (F.round(F.when(F.col("n_groups") > 1, F.col("__tg")), 6)
          + F.lit(0.0)).as("tpr_gap"),
        (F.round(F.when(F.col("n_groups") > 1, F.col("__fg")), 6)
          + F.lit(0.0)).as("fpr_gap"),
        (F.round(F.when(F.col("n_groups") > 1,
          F.greatest(F.col("__tg"), F.col("__fg"))), 6)
          + F.lit(0.0)).as("eq_odds_gap"))

  /** Cumulative gains / lift table — the model-TARGETING read the
    * AUC's single number hides: rank the corpus by score descending,
    * cut it into `tiles` equal slices, and report how much of the
    * positive class each slice captures vs the random-targeting
    * baseline ("the top decile holds 3.1× its share"). Tile assignment
    * is per distinct-score BLOCK: a tied block lands wholly in the tile
    * of its LAST (lowest-ranked) member, tile = ⌈cum_desc·tiles/n⌉
    * computed in exact integer arithmetic ((cum−1)·tiles div n + 1) —
    * no arbitrary within-tie split, engine-exact. Rides the same
    * two-phase ascending prefix as [[rocAuc]] (descending cumulatives
    * fold as n − exclusive prefix); the per-tile cumulative is a
    * ≤`tiles`-row window (the BH-adjust family-size class, never the
    * corpus). Output: one row per non-empty tile — (tile, n, n_pos,
    * response_rate, lift, cum_pos, cum_capture, cum_lift), round 6. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                tiles: Int = 10): DataFrame =
    liftTableFromCounts(binaryScoreCounts(df, scoreCol, labelCol), tiles)

  /** [[liftTable]] over a pre-aggregated (x, c1, c2) count frame. */
  def liftTableFromCounts(byV: DataFrame, tiles: Int = 10): DataFrame = {
    require(tiles > 0, "need at least one tile")
    val (cum, n) = Drift.cdfFromCounts(byV)
    val t = F.col("c1") + F.col("c2")
    val perTile = cum.crossJoin(F.broadcast(n))
      .withColumn("tile",
        F.expr(s"(($cumDescSql - 1) * $tiles) div (n1 + n2) + 1"))
      .groupBy("tile")
      .agg(F.sum(t).as("n"), F.sum("c1").as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("tile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perTile.crossJoin(F.broadcast(n))
      .withColumn("cum_pos", F.sum("n_pos").over(w))
      .withColumn("__prev", F.col("n1").cast("double") / (F.col("n1") + F.col("n2")))
      .withColumn("__rate", F.col("n_pos").cast("double") / F.col("n"))
      .withColumn("__cumn", F.sum("n").over(w))
      .select(F.col("tile"), F.col("n"), F.col("n_pos"),
        (F.round(F.col("__rate"), 6) + F.lit(0.0)).as("response_rate"),
        (F.round(F.when(F.col("__prev") > 0.0, F.col("__rate") / F.col("__prev")), 6)
          + F.lit(0.0)).as("lift"),
        F.col("cum_pos"),
        (F.round(F.when(F.col("n1") > 0,
          F.col("cum_pos").cast("double") / F.col("n1")), 6)
          + F.lit(0.0)).as("cum_capture"),
        (F.round(F.when(F.col("__prev") > 0.0,
          (F.col("cum_pos").cast("double") / F.col("__cumn")) / F.col("__prev")), 6)
          + F.lit(0.0)).as("cum_lift"))
  }

  // the tile expression rendered once for F.expr (kept next to its
  // Column twin so the two can't drift): cum_desc = n − exclusive prefix
  private val cumDescSql =
    "((n1 + n2) - ((__k1 + __k2) - (c1 + c2)))"

  /** Uplift table — [[liftTable]]'s CAUSAL sibling (Radcliffe 2007):
    * rank EVERYONE (both arms) by the targeting score descending, cut
    * into `tiles`, and report per tile how much MORE the treated
    * respond than the control — the read that separates "the model
    * finds responders" from "the model finds people the TREATMENT
    * moves" (persuadables vs sure-things). Tile assignment is the
    * [[liftTable]] block-exact integer ceil on the COMBINED ranking, so
    * both arms share identical cuts; per-tile and cumulative uplift are
    * differences of exact-count ratios. An arm empty within a tile
    * yields NULL uplift there (no comparison), and the cumulative curve
    * keeps running past it. Output: one row per non-empty tile —
    * (tile, n_treated, n_control, rate_treated, rate_control, uplift,
    * cum_uplift), round 6. */
  def upliftTable(df: DataFrame, scoreCol: String, treatCol: String,
                  labelCol: String, tiles: Int = 10): DataFrame =
    upliftTableFromArmCounts(armCounts(df, scoreCol, treatCol, labelCol), tiles)

  /** [[upliftTable]] over a pre-aggregated (x, t1, p1, t0, p0) per-score
    * arm-count frame — the streaming re-entry point (per-arm counts per
    * distinct score are the table's complete mergeable summary). */
  def upliftTableFromArmCounts(byArm: DataFrame, tiles: Int = 10): DataFrame = {
    // per-arm counts ride the shared two-phase scaffold (the COMBINED
    // count is c1 with c2 = 0) — see upliftTileCounts
    val perTile = upliftTileCounts(byArm, tiles)
    val w = org.apache.spark.sql.expressions.Window.orderBy("tile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perTile
      .withColumn("__ct1", F.sum("n_treated").over(w))
      .withColumn("__cp1", F.sum("__p1").over(w))
      .withColumn("__ct0", F.sum("n_control").over(w))
      .withColumn("__cp0", F.sum("__p0").over(w))
      .withColumn("__rt", F.when(F.col("n_treated") > 0,
        F.col("__p1").cast("double") / F.col("n_treated")))
      .withColumn("__rc", F.when(F.col("n_control") > 0,
        F.col("__p0").cast("double") / F.col("n_control")))
      .select(F.col("tile"), F.col("n_treated"), F.col("n_control"),
        (F.round(F.col("__rt"), 6) + F.lit(0.0)).as("rate_treated"),
        (F.round(F.col("__rc"), 6) + F.lit(0.0)).as("rate_control"),
        (F.round(F.col("__rt") - F.col("__rc"), 6) + F.lit(0.0)).as("uplift"),
        (F.round(F.when(F.col("__ct1") > 0 && F.col("__ct0") > 0,
          F.col("__cp1").cast("double") / F.col("__ct1")
            - F.col("__cp0").cast("double") / F.col("__ct0")), 6)
          + F.lit(0.0)).as("cum_uplift"))
  }

  /** Qini coefficient — the [[upliftTable]] folded to ONE number
    * (Radcliffe 2007): the area between the model's incremental-gain
    * curve and the random-targeting diagonal. The gain at depth k is
    * the control-scaled incremental responders
    * q_k = cp1_k − cp0_k·(ct1_k/ct0_k); random targeting traces the
    * straight line to q_final, and the coefficient sums the trapezoid
    * area of (q_k − diagonal) over the tile fractions, normalized by
    * total treated — positive means the score ranks persuadables first,
    * ~0 means the targeting is no better than random (the honest null
    * read), negative means it ranks sure-things/lost-causes first. One
    * ≤`tiles`-row fold over the uplift tiles (the BH family-size
    * class); NULL when either arm is empty overall.
    *
    * Degenerate leading tiles: a tile whose CUMULATIVE control count is
    * still zero has undefined incremental gain (NULL q) — its segment
    * is EXCLUDED from the area (no gain estimate exists there), and the
    * first defined segment's left edge carries the last defined gain
    * forward (last_value ignore-nulls; 0 when none exists — cumulative
    * control counts are monotone, so NULL q can only be a leading
    * prefix and the carried value is then the 0-at-depth-0 origin).
    * Output: one row — (n_treated, n_control, q_final, qini),
    * round 6. */
  def qini(df: DataFrame, scoreCol: String, treatCol: String,
           labelCol: String, tiles: Int = 10): DataFrame =
    qiniFromArmCounts(armCounts(df, scoreCol, treatCol, labelCol), tiles)

  /** [[qini]] over a pre-aggregated (x, t1, p1, t0, p0) arm-count
    * frame — the streaming re-entry point. */
  def qiniFromArmCounts(byArm: DataFrame, tiles: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("tile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perTile = upliftTileCounts(byArm, tiles)
    val tot = perTile.agg(
      (F.sum("n_treated") + F.sum("n_control")).as("__n"))
    val base = perTile.crossJoin(F.broadcast(tot))
      .withColumn("__ct1", F.sum("n_treated").over(w))
      .withColumn("__cp1", F.sum("__p1").over(w))
      .withColumn("__ct0", F.sum("n_control").over(w))
      .withColumn("__cp0", F.sum("__p0").over(w))
      .withColumn("__q", F.when(F.col("__ct0") > 0,
        F.col("__cp1").cast("double")
          - F.col("__cp0").cast("double") * F.col("__ct1") / F.col("__ct0")))
      .withColumn("__frac", (F.col("__ct1") + F.col("__ct0")).cast("double")
        / F.col("__n"))
    // trapezoid area of q over the depth fractions, minus the random
    // diagonal to q_final — a tiles-sized ordered fold
    val last = base
      .withColumn("__rn", F.row_number().over(Window.orderBy(F.col("tile").desc)))
    val qf = last.filter(F.col("__rn") === 1)
      .select(F.col("__ct1").as("n_treated"), F.col("__ct0").as("n_control"),
        F.col("__q").as("__qfinal"))
    // left edge = last DEFINED gain, not lag: a bare lag(__q) would read
    // a leading control-free tile's NULL and zero the next segment's
    // edge even when a defined gain precedes it (ADVICE r14)
    val wPrev = Window.orderBy("tile")
      .rowsBetween(Window.unboundedPreceding, -1)
    val area = base
      .withColumn("__prevQ", F.coalesce(
        F.last("__q", ignoreNulls = true).over(wPrev), F.lit(0.0)))
      .withColumn("__prevF", F.coalesce(
        F.lag("__frac", 1).over(Window.orderBy("tile")), F.lit(0.0)))
      .agg(F.sum((F.col("__q") + F.col("__prevQ")) / 2.0
        * (F.col("__frac") - F.col("__prevF"))).as("__area"))
    area.crossJoin(F.broadcast(qf))
      .select(F.col("n_treated"), F.col("n_control"),
        (F.round(F.col("__qfinal"), 6) + F.lit(0.0)).as("q_final"),
        (F.round(F.when(F.col("n_treated") > 0 && F.col("n_control") > 0,
          (F.col("__area") - F.col("__qfinal") / 2.0)
            / F.col("n_treated")), 6) + F.lit(0.0)).as("qini"))
  }

  /** The per-distinct-score arm-split counts both uplift reads key on:
    * (x, t1 = treated, p1 = treated positives, t0, p0). */
  private def armCounts(df: DataFrame, scoreCol: String, treatCol: String,
                        labelCol: String): DataFrame = {
    val x = F.col(scoreCol).cast("double")
    val tr = F.col(treatCol).cast("boolean")
    val y = F.col(labelCol).cast("boolean")
    df.filter(x.isNotNull && tr.isNotNull && y.isNotNull)
      .groupBy(x.as("x"))
      .agg(F.count(F.when(tr, 1)).as("t1"),
        F.count(F.when(tr && y, 1)).as("p1"),
        F.count(F.when(!tr, 1)).as("t0"),
        F.count(F.when(!tr && y, 1)).as("p0"))
  }

  /** The shared per-tile arm-split counts behind [[upliftTable]] and
    * [[qini]], over an [[armCounts]]-shaped frame:
    * (tile, n_treated, __p1, n_control, __p0). */
  private def upliftTileCounts(byArm: DataFrame, tiles: Int): DataFrame = {
    require(tiles > 0, "need at least one tile")
    val byV = byArm
      .withColumn("c1", F.col("t1") + F.col("t0"))
      .withColumn("c2", F.lit(0L))
    val (cum, n) = Drift.cdfFromCounts(byV)
    cum.crossJoin(F.broadcast(n))
      .withColumn("tile",
        F.expr(s"(($cumDescSql - 1) * $tiles) div (n1 + n2) + 1"))
      .groupBy("tile")
      .agg(F.sum("t1").as("n_treated"), F.sum("p1").as("__p1"),
        F.sum("t0").as("n_control"), F.sum("p0").as("__p0"))
  }

  /** Retrieval-quality metrics per query over a ranked candidate list —
    * the serve-side answer to "is the index returning the RIGHT things",
    * completing the ANN surface's recall-vs-exact gates with the
    * standard IR read: `ranked` is (qid, cid, rn) with rn = 1-based rank
    * (the [[Similarity.bruteForceTopK]] / IVF serve output shape),
    * `truth` is the (qid, cid) relevant-pair universe. Per query at
    * cutoff k (binary relevance):
    *
    *   precision@k = hits/k,   recall@k = hits/n_rel,
    *   MRR         = 1/rank of the first hit (0 when none — the
    *                 convention that keeps the macro mean defined),
    *   nDCG@k      = Σ_hits 1/log₂(rn+1)  /  Σ_{i=1..min(k,n_rel)} 1/log₂(i+1),
    *
    * with the ideal DCG taken against the FULL relevant universe (a
    * query with fewer than k relevant items can still score 1.0, and
    * one with more cannot cheat by retrieving only k). The truth join is
    * a left semi-style hit flag; n_rel is a count per query — both shuffle
    * on qid, the serve partitioning. The log₂ folds are over ≤k hits per
    * query (bounded, in-row via the ideal-DCG closed sequence). Queries
    * with NO relevant items report NULL recall/ndcg (undefined, not 0).
    *
    * The qid universe is the UNION of both sides (full-outer on qid): a
    * query present in `truth` that the index returned NOTHING for (or
    * no rows at rn ≤ k) still reports a row — hits 0, precision 0,
    * mrr 0, recall/ndcg 0 when n_rel > 0 — so a broken index cannot
    * silently inflate the macro means by dropping its failures
    * (ADVICE r14). Output: one row per qid — (qid, n_rel, hits,
    * precision_at_k, recall_at_k, mrr, ndcg), round 6. */
  def retrievalEval(ranked: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, "cutoff k must be positive")
    val rel = truth.select(F.col("qid"), F.col("cid"))
      .distinct().withColumn("__rel", F.lit(1))
    val nRel = rel.groupBy("qid").agg(F.count(F.lit(1)).as("n_rel"))
    val top = ranked.filter(F.col("rn") <= k)
      .join(rel, Seq("qid", "cid"), "left")
      .withColumn("__hit", F.coalesce(F.col("__rel"), F.lit(0)))
    val perQ = top.groupBy("qid").agg(
      F.sum("__hit").as("hits"),
      F.min(F.when(F.col("__hit") === 1, F.col("rn"))).as("__first"),
      F.sum(F.when(F.col("__hit") === 1,
        F.lit(1.0) / F.log2(F.col("rn").cast("double") + 1.0))
        .otherwise(F.lit(0.0))).as("__dcg"))
    perQ.join(nRel, Seq("qid"), "full_outer")
      .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0L)))
      // a truth-only query retrieved nothing: zero hits and zero DCG
      // (its __first stays NULL, so mrr coalesces to 0 below)
      .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0L)))
      .withColumn("__dcg", F.coalesce(F.col("__dcg"), F.lit(0.0)))
      .withColumn("__ideal", F.aggregate(
        F.sequence(F.lit(1L), F.least(F.lit(k.toLong), F.col("n_rel"))),
        F.lit(0.0),
        (acc, i) => acc + F.lit(1.0) / F.log2(i.cast("double") + 1.0)))
      .select(F.col("qid"), F.col("n_rel"), F.col("hits"),
        (F.round(F.col("hits").cast("double") / k, 6) + F.lit(0.0)).as("precision_at_k"),
        (F.round(F.when(F.col("n_rel") > 0,
          F.col("hits").cast("double") / F.col("n_rel")), 6)
          + F.lit(0.0)).as("recall_at_k"),
        (F.round(F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), 6)
          + F.lit(0.0)).as("mrr"),
        (F.round(F.when(F.col("n_rel") > 0, F.col("__dcg") / F.col("__ideal")), 6)
          + F.lit(0.0)).as("ndcg"))
  }

  /** [[retrievalEval]] folded to the corpus read: the macro (unweighted
    * per-query) mean of each metric — every query votes equally, the
    * convention that stops one easy high-n_rel query from hiding broken
    * tail queries — and the per-query board's full-outer qid universe
    * means zero-result queries vote their zeros here instead of
    * vanishing. Queries with no relevant items are EXCLUDED from the
    * recall/ndcg means (their per-query value is NULL) but still count
    * in n_queries. Output: one row — (n_queries, macro_precision,
    * macro_recall, macro_mrr, macro_ndcg), round 6. */
  def retrievalEvalMacro(ranked: DataFrame, truth: DataFrame,
                         k: Int): DataFrame =
    retrievalEval(ranked, truth, k).agg(
        F.count(F.lit(1)).as("n_queries"),
        F.avg("precision_at_k").as("__p"),
        F.avg("recall_at_k").as("__r"),
        F.avg("mrr").as("__m"),
        F.avg("ndcg").as("__n"))
      .select(F.col("n_queries"),
        (F.round(F.col("__p"), 6) + F.lit(0.0)).as("macro_precision"),
        (F.round(F.col("__r"), 6) + F.lit(0.0)).as("macro_recall"),
        (F.round(F.col("__m"), 6) + F.lit(0.0)).as("macro_mrr"),
        (F.round(F.col("__n"), 6) + F.lit(0.0)).as("macro_ndcg"))

  /** Optimal decision threshold by Youden's J (Youden, Cancer 1950):
    * over every candidate cut "predict positive when score ≥ x", the x
    * maximizing J = TPR − FPR — equivalently the classifier KS distance,
    * the point where the class CDFs separate most. TPR/FPR at each cut
    * fold from the same descending cumulatives as [[averagePrecision]]
    * (one scan, exact integer operands, IEEE divisions identical in both
    * engines); the argmax tie-breaks to the SMALLEST threshold (the
    * higher-recall cut, deterministically). Precision/accuracy at the
    * winning cut ride along. EMPTY when either class is absent (no cut
    * is comparable). Output: one row — (threshold, n_pos, n_neg, tpr,
    * fpr, j_stat, precision, accuracy), round 6. */
  def bestThreshold(df: DataFrame, scoreCol: String,
                    labelCol: String): DataFrame =
    bestThresholdFromCounts(binaryScoreCounts(df, scoreCol, labelCol))

  /** [[bestThreshold]] over a pre-aggregated (x, c1, c2) count frame. */
  def bestThresholdFromCounts(byV: DataFrame): DataFrame = {
    val (cum, n) = Drift.cdfFromCounts(byV)
    val t = F.col("c1") + F.col("c2")
    val posGe = F.col("n1") - (F.col("__k1") - F.col("c1"))
    val negGe = F.col("n2") - (F.col("__k2") - (t - F.col("c1")))
    val scored = cum.crossJoin(F.broadcast(n))
      .filter(F.col("n1") > 0 && F.col("n2") > 0)
      .withColumn("tpr", posGe.cast("double") / F.col("n1"))
      .withColumn("fpr", negGe.cast("double") / F.col("n2"))
      .withColumn("__j", F.col("tpr") - F.col("fpr"))
    // argmax over the distinct-score axis: top-1 by (J desc, x asc) as
    // orderBy+limit — TakeOrderedAndProject, never a data-sized sort or
    // a partition-less window
    scored
      .orderBy(F.col("__j").desc, F.col("x").asc)
      .limit(1)
      .select(F.col("x").as("threshold"),
        F.col("n1").as("n_pos"), F.col("n2").as("n_neg"),
        (F.round(F.col("tpr"), 6) + F.lit(0.0)).as("tpr"),
        (F.round(F.col("fpr"), 6) + F.lit(0.0)).as("fpr"),
        (F.round(F.col("__j"), 6) + F.lit(0.0)).as("j_stat"),
        (F.round(posGe.cast("double") / (posGe + negGe), 6)
          + F.lit(0.0)).as("precision"),
        (F.round((posGe + (F.col("n2") - negGe)).cast("double")
          / (F.col("n1") + F.col("n2")), 6) + F.lit(0.0)).as("accuracy"))
  }

  /** Per-group expected calibration error — the SUFFICIENCY criterion,
    * completing the fairness triad ([[fairnessGaps]] covers
    * independence via the parity gap and separation via equalized
    * odds): a score is sufficient when P(y | score) is the same across
    * groups, i.e. each group is individually well-calibrated. One
    * (group × bin) scan; per-group ECE is the bin-weighted gap on
    * UNROUNDED bin means (the [[ece]] algebra keyed by the audit
    * group), plus the group's worst single-bin gap. Key space is
    * groups × bins, never the corpus. Output: one row per group —
    * (group, n, bins_used, ece, max_gap), round 6. */
  def eceByGroup(df: DataFrame, groupCol: String, probCol: String,
                 labelCol: String, bins: Int = 10): DataFrame = {
    val p = F.col(probCol).cast("double")
    val y = F.col(labelCol).cast("boolean")
    eceByGroupFromCounts(
      df.filter(p.isNotNull && y.isNotNull && F.col(groupCol).isNotNull)
        .groupBy(F.col(groupCol).as("group"), p.as("x"))
        .agg(F.count(F.when(y, 1)).as("c1"),
          F.count(F.when(!y, 1)).as("c2")), bins)
  }

  /** [[eceByGroup]] over a pre-aggregated (group, x, c1, c2) count
    * frame — the streaming re-entry point (the [[eceFromCounts]]
    * weighted-count algebra keyed by the audit group). */
  def eceByGroupFromCounts(byGX: DataFrame, bins: Int = 10): DataFrame = {
    byGX
      .groupBy(F.col("group"),
        F.least(F.floor(F.col("x") * bins), F.lit(bins - 1L))
          .cast("long").as("bin"))
      .agg(F.sum(F.col("c1") + F.col("c2")).as("n"),
        F.sum(F.col("x") * (F.col("c1") + F.col("c2"))).as("__sp"),
        F.sum("c1").as("__pos"))
      .withColumn("__gap", F.abs(F.col("__pos").cast("double") / F.col("n")
        - F.col("__sp") / F.col("n")))
      .groupBy("group")
      .agg(F.sum("n").as("n"), F.count(F.lit(1)).as("bins_used"),
        F.sum(F.col("__gap") * F.col("n")).as("__wgap"),
        F.max("__gap").as("__mg"))
      .select(F.col("group"), F.col("n"), F.col("bins_used"),
        (F.round(F.col("__wgap") / F.col("n"), 6) + F.lit(0.0)).as("ece"),
        (F.round(F.col("__mg"), 6) + F.lit(0.0)).as("max_gap"))
  }

  /** Isotonic calibration (PAVA — Ayer et al., Ann. Math. Stat. 1955;
    * Zadrozny & Elkan, KDD 2002 for the calibration use): the
    * nonparametric monotone fit of P(y=1 | score) — [[calibrationBins]]
    * without the arbitrary bin edges. Pool-adjacent-violators runs as a
    * driver-side stack fold over the (x, c1, n) count frame in score
    * order — the VALUE-AXIS-BOUNDED collect (the coxPh duration-axis
    * discipline: distinct scores are a vocabulary — rounded
    * probabilities, bounded features — never the corpus). Pooling
    * decisions compare block means as exact INTEGER cross-products
    * (sy_a·n_b > sy_b·n_a — no IEEE in the decision path, so the block
    * structure is bit-deterministic); each block's fitted rate is ONE
    * final division, 6-snapped HALF_UP (the F.round contract). The
    * result is the least-squares monotone regression (= the minimax
    * formula max_{i≤k} min_{j≥k} mean(i..j), which the oracle mirrors).
    * Output: one row per distinct score — (x, n, rate, iso_rate),
    * iso_rate nondecreasing in x. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
                          labelCol: String,
                          maxDistinctScores: Int = 100000): DataFrame =
    isotonicFromCounts(binaryScoreCounts(df, scoreCol, labelCol),
      maxDistinctScores)

  /** [[isotonicCalibration]] with the score PRE-ROUNDED to `decimals`
    * decimal places (HALF_UP, the F.round contract) before counting —
    * the documented escape hatch for a CONTINUOUS-scored corpus, where
    * the raw distinct-score axis is data-sized and would trip
    * [[isotonicFromCounts]]'s guard. The fit is then over the 10^decimals
    * + 1 grid (probabilities in [0, 1] → ≤ 10^decimals + 1 rows), and an
    * oracle mirroring it must round the score IDENTICALLY before its own
    * PAVA. */
  def isotonicCalibrationGridded(df: DataFrame, scoreCol: String,
                                 labelCol: String,
                                 decimals: Int = 4,
                                 maxDistinctScores: Int = 1000001): DataFrame = {
    require(decimals >= 0 && decimals <= 8,
      "isotonicCalibrationGridded: decimals must be in 0..8")
    val x = F.col(scoreCol).cast("double")
    val y = F.col(labelCol).cast("boolean")
    // the escape hatch must actually escape: a decimals >= 5 grid
    // (10^5 + 1 points) exceeds isotonicFromCounts' default cap, so
    // pass the grid's own size through (r15 ADVICE) — but only up to
    // 10^6 + 1 by default: decimals = 8 authorizes a 10^8 + 1-row
    // driver collect (multi-GB), which would silently waive the very
    // OOM protection the cap exists for (r16 ADVICE). Past 10^6 + 1
    // the caller must RAISE `maxDistinctScores` explicitly, opting in
    // to the driver-memory cost; otherwise the fold refuses loudly.
    val gridCap = math.max(100000,
      math.min(math.pow(10, decimals).toLong + 1, maxDistinctScores.toLong).toInt)
    isotonicFromCounts(df.filter(x.isNotNull && y.isNotNull)
      .groupBy(F.round(x, decimals).as("x"))
      .agg(F.count(F.when(y, 1)).as("c1"),
        F.count(F.when(!y, 1)).as("c2")), gridCap)
  }

  /** [[isotonicCalibration]] over a pre-aggregated (x, c1, c2) count
    * frame — the streaming re-entry point.
    *
    * GUARD (r14 verdict #4): the PAVA stack fold collects ONE ROW PER
    * DISTINCT SCORE to the driver — sound only when the score axis is a
    * vocabulary (rounded probabilities, bounded features), never the
    * corpus. A continuous-scored input at scale would make the collect
    * data-sized, so the fold REFUSES (fails loudly, before
    * materializing more than the cap) past `maxDistinctScores` rather
    * than OOM-ing the driver; pre-round such scores to a documented
    * grid first ([[isotonicCalibrationGridded]]). */
  def isotonicFromCounts(byV: DataFrame,
                         maxDistinctScores: Int = 100000): DataFrame = {
    val spark = byV.sparkSession
    require(maxDistinctScores > 0, "maxDistinctScores must be positive")
    val rows = byV
      .select(F.col("x").cast("double"),
        F.col("c1").cast("long"), (F.col("c1") + F.col("c2")).cast("long"))
      .orderBy("x").limit(maxDistinctScores + 1).collect()
    require(rows.length <= maxDistinctScores,
      s"isotonic: > $maxDistinctScores distinct scores — the PAVA driver " +
        "fold is bounded by the score vocabulary; pre-round a continuous " +
        "score to a grid (isotonicCalibrationGridded) or raise the cap " +
        "deliberately")
    final class Block(var sy: Long, var sn: Long, var cnt: Int)
    val st = new scala.collection.mutable.ArrayBuffer[Block]()
    rows.foreach { r =>
      st += new Block(r.getLong(1), r.getLong(2), 1)
      // pool while the previous block's mean EXCEEDS the new one's —
      // exact integer cross-product compare (BigInt: sy·sn can pass 2^63)
      while (st.length >= 2 && {
        val a = st(st.length - 2); val b = st.last
        BigInt(a.sy) * b.sn > BigInt(b.sy) * a.sn
      }) {
        val b = st.remove(st.length - 1)
        val a = st.last
        a.sy += b.sy; a.sn += b.sn; a.cnt += b.cnt
      }
    }
    def snap6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val iso = st.iterator
      .flatMap(b => Iterator.fill(b.cnt)(b.sy.toDouble / b.sn)).toArray
    val out = rows.zip(iso).map { case (r, yi) =>
      org.apache.spark.sql.Row(r.getDouble(0), r.getLong(2),
        snap6(r.getLong(1).toDouble / r.getLong(2)), snap6(yi))
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(out: _*)),
      StructType(Seq(
        StructField("x", DoubleType), StructField("n", LongType),
        StructField("rate", DoubleType), StructField("iso_rate", DoubleType))))
  }

  /** Clustering agreement: Adjusted Rand Index (Hubert & Arabie, J.
    * Classif. 1985) + normalized mutual information — "did the
    * clustering recover the known structure", the gate before cluster
    * ids feed curation (dedup clusters vs gold labels, LSH buckets vs
    * true classes). Everything folds from the k_a×k_b contingency table
    * (ONE grouped count — the key space is the label vocabularies,
    * never the corpus): pair counts Σ C(n_ij, 2) and margins are exact
    * BIGINTs, so ARI is fixed-shape IEEE over exact integers; NMI =
    * I(A;B)/√(H(A)·H(B)) sums k²-bounded ln terms (round-snap class).
    * ARI is NULL when the expected index equals the maximum (both
    * partitions trivial — agreement unmeasurable); NMI is NULL when
    * either entropy is 0 (a single cluster carries no information).
    * Output: one row — (n, k_a, k_b, ari, nmi), round 6. */
  def clusterAgreement(df: DataFrame, aCol: String, bCol: String): DataFrame =
    clusterAgreementFromCells(
      df.filter(F.col(aCol).isNotNull && F.col(bCol).isNotNull)
        .groupBy(F.col(aCol).as("a"), F.col(bCol).as("b"))
        .agg(F.count(F.lit(1)).as("nij")))

  /** [[clusterAgreement]] over a pre-aggregated (a, b, nij) contingency
    * frame — the streaming re-entry point (cells merge exactly, and
    * every statistic is a pure function of the merged cells). */
  def clusterAgreementFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    // exact: n(n−1) is even, and the halving must stay INTEGRAL — a
    // long `/ 2` is IEEE division in Spark and rounds past 2^53
    def pairs(c: Column): Column = F.shiftright(c * (c - 1), 1)
    val ij = cells.agg(F.sum(pairs(F.col("nij"))).as("sij"),
      F.sum("nij").as("n"), F.countDistinct("a").as("ka"),
      F.countDistinct("b").as("kb"))
    val ma = cells.groupBy("a").agg(F.sum("nij").as("na"))
      .agg(F.sum(pairs(F.col("na"))).as("sa"),
        F.sum(F.when(F.col("na") > 0, // H(A): −Σ p ln p over exact counts
          -(F.col("na").cast("double")) * F.log(F.col("na").cast("double")))
          .otherwise(F.lit(0.0))).as("__ha_part"))
    val mb = cells.groupBy("b").agg(F.sum("nij").as("nb"))
      .agg(F.sum(pairs(F.col("nb"))).as("sb"),
        F.sum(F.when(F.col("nb") > 0,
          -(F.col("nb").cast("double")) * F.log(F.col("nb").cast("double")))
          .otherwise(F.lit(0.0))).as("__hb_part"))
    // I(A;B) needs n_ij against BOTH margins: join the margins back to
    // the cell frame (vocabulary-sized joins)
    val mi = cells
      .join(cells.groupBy("a").agg(F.sum("nij").as("na")), Seq("a"))
      .join(cells.groupBy("b").agg(F.sum("nij").as("nb")), Seq("b"))
      .agg(F.sum(F.col("nij").cast("double")
        * F.log(F.col("nij").cast("double") / F.col("na")
          / F.col("nb"))).as("__mi_part"))
    ij.crossJoin(F.broadcast(ma)).crossJoin(F.broadcast(mb))
      .crossJoin(F.broadcast(mi))
      .filter(F.col("n").isNotNull)
      // ARI = (sij − exp) / (max − exp), exp = sa·sb/tot, max = (sa+sb)/2
      .withColumn("__tot", pairs(F.col("n")))
      .withColumn("__exp", F.when(F.col("__tot") > 0,
        F.col("sa").cast("double") * F.col("sb") / F.col("__tot")))
      .withColumn("__max", (F.col("sa") + F.col("sb")).cast("double") / 2.0)
      .withColumn("__ari", F.when(F.col("__max") - F.col("__exp") =!= 0.0,
        (F.col("sij").cast("double") - F.col("__exp"))
          / (F.col("__max") - F.col("__exp"))))
      // H and I from the count-weighted ln parts: H(A) = ln n + ha/n,
      // I = mi/n + ln n (the n·ln n terms folded analytically)
      .withColumn("__n", F.col("n").cast("double"))
      .withColumn("__ha", F.log(F.col("__n")) + F.col("__ha_part") / F.col("__n"))
      .withColumn("__hb", F.log(F.col("__n")) + F.col("__hb_part") / F.col("__n"))
      .withColumn("__i", F.col("__mi_part") / F.col("__n") + F.log(F.col("__n")))
      .withColumn("__nmi", F.when(F.col("__ha") > 0.0 && F.col("__hb") > 0.0,
        F.col("__i") / F.sqrt(F.col("__ha") * F.col("__hb"))))
      .select(F.col("n"), F.col("ka").as("k_a"), F.col("kb").as("k_b"),
        (F.round(F.col("__ari"), 6) + F.lit(0.0)).as("ari"),
        (F.round(F.col("__nmi"), 6) + F.lit(0.0)).as("nmi"))
  }

  /** MATTHEWS correlation coefficient, multiclass R_K form (Matthews
    * 1975; Gorodkin, Comput. Biol. Chem. 2004): the single number that
    * stays honest on skewed label distributions where accuracy and even
    * F1 flatter — MCC = (c·s − Σ_k p_k·t_k) /
    * √(s² − Σp²)·√(s² − Σt²), with c = correct, s = total, p_k/t_k the
    * predicted/true margins. Folds from ONE confusion-cell scan; margin
    * products run in DOUBLE (the kappa discipline — at corpus scale s²
    * outgrows BIGINT, and the statistic is a ratio anyway). NULL when
    * either margin is single-class (a constant predictor correlates
    * with nothing). Output: one row — (n, n_correct, mcc), round 6. */
  def mcc(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    mccFromCells(confusionCells(df, predCol, labelCol))

  /** [[mcc]] over a pre-aggregated (pred, label, n) cell frame. */
  def mccFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    val base = cells.agg(F.sum("n").as("n"),
      F.sum(F.when(F.col("pred") === F.col("label"), F.col("n")).otherwise(0L))
        .as("n_correct"))
    val margins = cells.groupBy(F.col("pred").as("class"))
      .agg(F.sum("n").as("np"))
      .join(cells.groupBy(F.col("label").as("class")).agg(F.sum("n").as("nt")),
        Seq("class"), "full_outer")
      .agg(
        F.sum(F.coalesce(F.col("np"), F.lit(0L)).cast("double")
          * F.coalesce(F.col("nt"), F.lit(0L))).as("__pt"),
        F.sum(F.coalesce(F.col("np"), F.lit(0L)).cast("double")
          * F.coalesce(F.col("np"), F.lit(0L))).as("__pp"),
        F.sum(F.coalesce(F.col("nt"), F.lit(0L)).cast("double")
          * F.coalesce(F.col("nt"), F.lit(0L))).as("__tt"))
    base.crossJoin(F.broadcast(margins))
      .withColumn("__s", F.col("n").cast("double"))
      .withColumn("__num",
        F.col("n_correct").cast("double") * F.col("__s") - F.col("__pt"))
      .withColumn("__dp", F.col("__s") * F.col("__s") - F.col("__pp"))
      .withColumn("__dt", F.col("__s") * F.col("__s") - F.col("__tt"))
      .select(F.col("n"), F.col("n_correct"),
        (F.round(F.when(F.col("__dp") > 0.0 && F.col("__dt") > 0.0,
          F.col("__num") / (F.sqrt(F.col("__dp")) * F.sqrt(F.col("__dt")))), 6)
          + F.lit(0.0)).as("mcc"))
  }

  /** McNEMAR's test (McNemar, Psychometrika 1947) — the PAIRED
    * accuracy comparison [[aucCompare]]'s threshold-free z leaves open:
    * two classifiers on the SAME rows, does one make fewer errors? Only
    * the DISAGREEMENT cells carry information — b = A-right/B-wrong,
    * c = A-wrong/B-right — and χ² = (b − c)²/(b + c) against χ²₁ (the
    * uncorrected form; document the convention, don't split the
    * difference with a hidden continuity correction). One combinable
    * aggregate. χ²/reject NULL when the classifiers never disagree.
    * Output: one row — (n, only_a, only_b, chi2, reject_95), χ²
    * round 4. */
  def mcnemar(df: DataFrame, predACol: String, predBCol: String,
              labelCol: String): DataFrame = {
    val a = F.col(predACol).cast("boolean")
    val b = F.col(predBCol).cast("boolean")
    val y = F.col(labelCol).cast("boolean")
    df.filter(a.isNotNull && b.isNotNull && y.isNotNull)
      .agg(F.count(F.lit(1)).as("n"),
        F.count(F.when((a === y) && (b =!= y), 1)).as("only_a"),
        F.count(F.when((a =!= y) && (b === y), 1)).as("only_b"))
      .withColumn("__chi",
        F.when(F.col("only_a") + F.col("only_b") > 0,
          (F.col("only_a") - F.col("only_b")).cast("double")
            * (F.col("only_a") - F.col("only_b"))
            / (F.col("only_a") + F.col("only_b"))))
      .select(F.col("n"), F.col("only_a"), F.col("only_b"),
        (F.round(F.col("__chi"), 4) + F.lit(0.0)).as("chi2"),
        (F.col("__chi") > 3.841459).as("reject_95"))
  }

  /** WEIGHTED kappa with quadratic weights (Cohen, Psychol. Bull.
    * 1968) — [[kappa]] for ORDINAL classes, where confusing grade 1
    * with grade 5 should cost more than with grade 2: κ_w = 1 −
    * Σw_ij·o_ij / Σw_ij·e_ij with w_ij = (i−j)² and e_ij = r_i·c_j/n.
    * CONTRACT: classes are a bounded NUMERIC vocabulary (grades,
    * buckets — the kendallTau axis discipline). The observed
    * disagreement is one cell scan; the expected one is the margin ×
    * margin cross product (vocabulary², the documented bounded kernel).
    * NULL when the expected disagreement is 0 (a single occupied grade
    * on either margin). Output: one row — (n, kappa_w), round 4. */
  def weightedKappa(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val x = F.col(predCol).cast("double")
    val y = F.col(labelCol).cast("double")
    weightedKappaFromCells(df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("pred"), y.as("label"))
      .agg(F.count(F.lit(1)).as("n")))
  }

  /** [[weightedKappa]] over a pre-aggregated (pred, label, n) NUMERIC
    * cell frame — the streaming re-entry point. */
  def weightedKappaFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    val obs = cells.agg(F.sum("n").as("n"),
      F.sum((F.col("pred") - F.col("label")) * (F.col("pred") - F.col("label"))
        * F.col("n")).as("__o"))
    val rp = cells.groupBy(F.col("pred").as("i")).agg(F.sum("n").as("ri"))
    val cp = cells.groupBy(F.col("label").as("j")).agg(F.sum("n").as("cj"))
    val exp = rp.crossJoin(F.broadcast(cp))
      .agg(F.sum((F.col("i") - F.col("j")) * (F.col("i") - F.col("j"))
        * (F.col("ri").cast("double") * F.col("cj"))).as("__ewn"))
    obs.crossJoin(F.broadcast(exp))
      .filter(F.col("n").isNotNull)
      .withColumn("__e", F.col("__ewn") / F.col("n"))
      .select(F.col("n"),
        (F.round(F.when(F.col("__e") > 0.0,
          F.lit(1.0) - F.col("__o") / F.col("__e")), 4)
          + F.lit(0.0)).as("kappa_w"))
  }

  /** The multiclass board folded to its headline numbers: overall
    * accuracy, BALANCED accuracy (the unweighted mean recall — chance
    * level 1/k on any skew, unlike raw accuracy), and macro-F1. Folds
    * over [[perClass]]'s ROUNDED per-class rates (the fairnessGaps
    * contract; class key space bounds the fold) — classes with
    * undefined recall/F1 drop from their mean. Micro-F1 for
    * single-label classification IS the accuracy, so it is not emitted
    * twice. Output: one row — (n, n_classes, accuracy,
    * balanced_accuracy, macro_f1), round 6. */
  def classSummary(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    classSummaryFromCells(confusionCells(df, predCol, labelCol))

  /** [[classSummary]] over a pre-aggregated (pred, label, n) cell
    * frame — the streaming re-entry point. */
  def classSummaryFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    val acc = cells.agg(F.sum("n").as("n"),
      F.sum(F.when(F.col("pred") === F.col("label"), F.col("n")).otherwise(0L))
        .as("__agree"))
    val per = perClassFromCells(cells).agg(
      F.count(F.lit(1)).as("n_classes"),
      F.avg("recall").as("__ba"), F.avg("f1").as("__mf"))
    acc.crossJoin(F.broadcast(per))
      .select(F.col("n"), F.col("n_classes"),
        (F.round(F.col("__agree").cast("double") / F.col("n"), 6)
          + F.lit(0.0)).as("accuracy"),
        (F.round(F.col("__ba"), 6) + F.lit(0.0)).as("balanced_accuracy"),
        (F.round(F.col("__mf"), 6) + F.lit(0.0)).as("macro_f1"))
  }

  /** HOSMER–LEMESHOW goodness-of-fit (Hosmer & Lemeshow 1980) — the
    * calibration χ² behind the reliability diagram: over probability
    * bins, χ² = Σ_g (O_g − E_g)² / (E_g·(1 − E_g/n_g)) with E_g the sum
    * of predicted probabilities in the bin. Bins with degenerate
    * expectation (E = 0 or E = n — the variance term dies) are skipped
    * and reported in bins_used vs bins_skipped. Same equal-width bin
    * convention as [[calibrationBins]] (the fixed-cut variant of the
    * classical equal-size deciles — document, don't pretend). Folds
    * from the shared (x, c1, c2) count frame, weighted-count form.
    * Output: one row — (n, bins_used, bins_skipped, chi2, df), χ²
    * round 4; df = bins_used − 2 (NULL χ²/df when < 3 usable bins). */
  def hosmerLemeshow(df: DataFrame, probCol: String, labelCol: String,
                     bins: Int = 10): DataFrame =
    hosmerLemeshowFromCounts(binaryScoreCounts(df, probCol, labelCol), bins)

  /** [[hosmerLemeshow]] over a pre-aggregated (x, c1, c2) count frame. */
  def hosmerLemeshowFromCounts(byV: DataFrame, bins: Int = 10): DataFrame =
    byV.groupBy(F.least(F.floor(F.col("x") * bins), F.lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(F.sum(F.col("c1") + F.col("c2")).as("ng"),
        F.sum(F.col("x") * (F.col("c1") + F.col("c2"))).as("__e"),
        F.sum("c1").as("__o"))
      .withColumn("__ok", F.col("__e") > 0.0 && F.col("__e") < F.col("ng"))
      .withColumn("__term", F.when(F.col("__ok"),
        (F.col("__o") - F.col("__e")) * (F.col("__o") - F.col("__e"))
          / (F.col("__e") * (F.lit(1.0) - F.col("__e") / F.col("ng")))))
      .agg(F.sum("ng").as("n"),
        F.count(F.when(F.col("__ok"), 1)).as("bins_used"),
        F.count(F.when(!F.col("__ok"), 1)).as("bins_skipped"),
        F.sum("__term").as("__chi"))
      .select(F.col("n"), F.col("bins_used"), F.col("bins_skipped"),
        (F.round(F.when(F.col("bins_used") >= 3, F.col("__chi")), 4)
          + F.lit(0.0)).as("chi2"),
        F.when(F.col("bins_used") >= 3, F.col("bins_used") - 2).as("df"))

  /** MURPHY decomposition of the Brier score (Murphy, J. Appl.
    * Meteorol. 1973): binned by DISTINCT forecast value, BS splits
    * EXACTLY into reliability − resolution + uncertainty —
    * REL = Σ_k n_k(x_k − ȳ_k)²/n (how far each forecast value sits
    * from its realized rate: the calibration debt), RES = Σ_k n_k(ȳ_k
    * − ȳ)²/n (how much the forecasts separate outcomes: the
    * discrimination credit), UNC = ȳ(1 − ȳ) (the climate's intrinsic
    * difficulty — no forecast can beat it by more than RES). The
    * identity BS = REL − RES + UNC holds exactly at distinct-value
    * "bins" (it breaks under coarser binning — which is why this
    * decomposes the [[brier]] number rather than the 10-bin diagram).
    * One scan of the shared count frame + a broadcast prevalence.
    * Output: one row — (n, n_pos, brier, reliability, resolution,
    * uncertainty), round 6. */
  def brierDecomposition(df: DataFrame, probCol: String,
                         labelCol: String): DataFrame =
    brierDecompositionFromCounts(binaryScoreCounts(df, probCol, labelCol))

  /** [[brierDecomposition]] over a pre-aggregated (x, c1, c2) frame. */
  def brierDecompositionFromCounts(byV: DataFrame): DataFrame = {
    val tot = byV.agg(F.sum("c1").as("n_pos"),
      F.sum(F.col("c1") + F.col("c2")).as("n"))
      .withColumn("__ybar", F.col("n_pos").cast("double") / F.col("n"))
    val nk = F.col("c1") + F.col("c2")
    val yk = F.col("c1").cast("double") / nk
    byV.crossJoin(F.broadcast(tot))
      .agg(F.max("n").as("n"), F.max("n_pos").as("n_pos"),
        F.max("__ybar").as("__ybar"),
        F.sum(nk * (F.col("x") - yk) * (F.col("x") - yk)).as("__rel"),
        F.sum(nk * (yk - F.col("__ybar")) * (yk - F.col("__ybar"))).as("__res"),
        F.sum(F.col("c1") * (F.col("x") - 1.0) * (F.col("x") - 1.0)
          + F.col("c2") * F.col("x") * F.col("x")).as("__se"))
      .filter(F.col("n").isNotNull)
      .select(F.col("n"), F.col("n_pos"),
        (F.round(F.col("__se") / F.col("n"), 6) + F.lit(0.0)).as("brier"),
        (F.round(F.col("__rel") / F.col("n"), 6) + F.lit(0.0)).as("reliability"),
        (F.round(F.col("__res") / F.col("n"), 6) + F.lit(0.0)).as("resolution"),
        (F.round(F.col("__ybar") * (F.lit(1.0) - F.col("__ybar")), 6)
          + F.lit(0.0)).as("uncertainty"))
  }

  /** FLEISS' kappa (Fleiss, Psychol. Bull. 1971) — chance-corrected
    * agreement for MANY raters: `df` is one row per (item, rater vote),
    * n raters per item. P_i = (Σ_j n_ij² − n)/(n(n−1)) is item i's
    * observed pair-agreement, P̄ their mean, P_e = Σ_j p_j² the chance
    * agreement of the pooled category distribution, κ = (P̄ − P_e)/(1 −
    * P_e). Everything folds from the (item, category) count frame —
    * combinable scans keyed by the item (data-sized but never
    * collected) and the category vocabulary. Requires a CONSTANT rater
    * count per item (the classical statistic): a varying count yields
    * NULL κ with the min/max counts reported rather than a silently
    * wrong number. κ NULL when P_e = 1 (all votes one category).
    * Output: one row — (n_items, n_raters, p_bar, p_e, kappa), P̄/P_e
    * round 6, κ round 4. */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String): DataFrame =
    fleissKappaFromCells(
      df.filter(F.col(itemCol).isNotNull && F.col(catCol).isNotNull)
        .groupBy(F.col(itemCol).as("item"), F.col(catCol).as("cat"))
        .agg(F.count(F.lit(1)).as("nij")))

  /** [[fleissKappa]] over a pre-aggregated (item, cat, nij) vote-count
    * frame — the streaming re-entry point (vote counts merge exactly
    * across batches and replays). */
  def fleissKappaFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.pin()
    val perItem = cells.groupBy("item")
      .agg(F.sum("nij").as("ni"), F.sum(F.col("nij") * F.col("nij")).as("__sq"))
    val items = perItem.agg(F.count(F.lit(1)).as("n_items"),
      F.min("ni").as("__nmin"), F.max("ni").as("__nmax"),
      F.sum("__sq").as("__sqs"), F.sum("ni").as("__votes"))
    val catP = cells.groupBy("cat").agg(F.sum("nij").as("cj"))
      .crossJoin(F.broadcast(items.select(F.col("__votes").as("__v"))))
      .agg(F.sum((F.col("cj").cast("double") / F.col("__v"))
        * (F.col("cj").cast("double") / F.col("__v"))).as("__pe"))
    items.crossJoin(F.broadcast(catP))
      .filter(F.col("n_items") > 0)
      .withColumn("__n", F.col("__nmax"))
      .withColumn("__ok", F.col("__nmin") === F.col("__nmax") && F.col("__n") > 1)
      // P̄ = (Σ_i Σ_j n_ij² − N·n) / (N·n·(n−1)), the item mean folded
      .withColumn("__pbar", F.when(F.col("__ok"),
        (F.col("__sqs") - F.col("n_items") * F.col("__n")).cast("double")
          / (F.col("n_items") * F.col("__n") * (F.col("__n") - 1))))
      .select(F.col("n_items"),
        F.when(F.col("__nmin") === F.col("__nmax"), F.col("__n")).as("n_raters"),
        (F.round(F.col("__pbar"), 6) + F.lit(0.0)).as("p_bar"),
        (F.round(F.when(F.col("__ok"), F.col("__pe")), 6) + F.lit(0.0)).as("p_e"),
        (F.round(F.when(F.col("__ok") && F.col("__pe") < 1.0,
          (F.col("__pbar") - F.col("__pe")) / (F.lit(1.0) - F.col("__pe"))), 4)
          + F.lit(0.0)).as("kappa"))
  }

  /** LIN's concordance correlation coefficient (Lin, Biometrics
    * 1989) — agreement of a prediction with a gold CONTINUOUS value:
    * Pearson r rewards any linear relation, CCC additionally charges
    * for being off the 45° line (scale or location shift): CCC =
    * 2·cov / (var_x + var_y + (μx − μy)²), population (1/n) moments.
    * One combinable moment scan over exact casts; NULL when both
    * variances AND the mean gap are 0 (a constant identical pair — no
    * agreement to measure). Output: one row — (n, mean_x, mean_y,
    * pearson_r, ccc), means round 6, r/ccc round 6. */
  def concordanceCcc(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = F.col(xCol).cast("double")
    val y = F.col(yCol).cast("double")
    df.filter(x.isNotNull && y.isNotNull)
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(x).as("__sx"), F.sum(y).as("__sy"),
        F.sum(x * x).as("__sxx"), F.sum(y * y).as("__syy"),
        F.sum(x * y).as("__sxy"))
      .filter(F.col("n") > 0)
      .withColumn("__mx", F.col("__sx") / F.col("n"))
      .withColumn("__my", F.col("__sy") / F.col("n"))
      .withColumn("__vx", F.col("__sxx") / F.col("n") - F.col("__mx") * F.col("__mx"))
      .withColumn("__vy", F.col("__syy") / F.col("n") - F.col("__my") * F.col("__my"))
      .withColumn("__cov", F.col("__sxy") / F.col("n") - F.col("__mx") * F.col("__my"))
      .withColumn("__den",
        F.col("__vx") + F.col("__vy")
          + (F.col("__mx") - F.col("__my")) * (F.col("__mx") - F.col("__my")))
      .select(F.col("n"),
        (F.round(F.col("__mx"), 6) + F.lit(0.0)).as("mean_x"),
        (F.round(F.col("__my"), 6) + F.lit(0.0)).as("mean_y"),
        (F.round(F.when(F.col("__vx") > 0.0 && F.col("__vy") > 0.0,
          F.col("__cov") / (F.sqrt(F.col("__vx")) * F.sqrt(F.col("__vy")))), 6)
          + F.lit(0.0)).as("pearson_r"),
        (F.round(F.when(F.col("__den") > 0.0,
          F.lit(2.0) * F.col("__cov") / F.col("__den")), 6)
          + F.lit(0.0)).as("ccc"))
  }

  /** CALIBRATION INTERCEPT + SLOPE by logistic recalibration (Cox,
    * Biometrika 1958; Miller et al. 1991 for the validation use): fit
    * y ~ σ(a + b·logit(p)) — b < 1 means the model is overconfident
    * (predictions too extreme), b > 1 underconfident, a ≠ 0 a
    * calibration-in-the-large shift the ECE number can't localize.
    * H₀: (a, b) = (0, 1) is "perfectly calibrated"; the two Wald reads
    * test each coordinate.
    *
    * The likelihood depends on the data only through per-DISTINCT-SCORE
    * counts (the shared (x, c1, c2) frame), so the Newton fit is a
    * driver-side fold over the value-bounded score axis — the PAVA /
    * coxPh collect discipline, guarded by the same `maxDistinctScores`
    * cap (fail loudly, pre-round a continuous score first). p clamps to
    * [1e-6, 1 − 1e-6] before the logit (a hard 0/1 probability is a
    * modeling error, not an infinity). Newton from (0, 1) — the
    * well-calibrated start — a FIXED `steps` (default 8), each step's
    * five sums accumulated in score order (left-associated — the
    * oracle's ordered window sums) and each coordinate 9-snapped, the
    * coxPhMulti 2×2-Cramer discipline, so the whole iteration unrolls
    * into oracle CTEs. NULL estimates when the MLE doesn't exist (a
    * single-class input) or the information degenerates (det ≤ 0 — one
    * distinct score can't identify a slope). Output: one row — (n,
    * n_pos, intercept, slope, se_intercept, se_slope,
    * intercept_reject_95, slope_reject_95), round 6. */
  def calibrationSlope(df: DataFrame, probCol: String, labelCol: String,
                       steps: Int = 8,
                       maxDistinctScores: Int = 100000): DataFrame =
    calibrationSlopeFromCounts(binaryScoreCounts(df, probCol, labelCol),
      steps, maxDistinctScores)

  /** [[calibrationSlope]] over a pre-aggregated (x, c1, c2) frame. */
  def calibrationSlopeFromCounts(byV: DataFrame, steps: Int = 8,
                                 maxDistinctScores: Int = 100000): DataFrame = {
    val spark = byV.sparkSession
    require(maxDistinctScores > 0, "maxDistinctScores must be positive")
    val rows = byV
      .select(F.col("x").cast("double"),
        F.col("c1").cast("long"), (F.col("c1") + F.col("c2")).cast("long"))
      .orderBy("x").limit(maxDistinctScores + 1).collect()
    require(rows.length <= maxDistinctScores,
      s"calibrationSlope: > $maxDistinctScores distinct scores — the " +
        "Newton driver fold is bounded by the score vocabulary; pre-round " +
        "a continuous score to a grid first")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_pos", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("intercept", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("slope", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("se_intercept", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("se_slope", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("intercept_reject_95", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("slope_reject_95", org.apache.spark.sql.types.BooleanType)))
    if (rows.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    // (z = clamped logit, c1, n) in score order — z is monotone in x,
    // so score order IS z order (the oracle windows ORDER BY z)
    val zs = rows.map { r =>
      val xc = math.min(math.max(r.getDouble(0), 0.000001), 0.999999)
      (math.log(xc / (1.0 - xc)), r.getLong(1), r.getLong(2))
    }
    val nTotal = zs.map(_._3).sum
    val nPos = zs.map(_._2).sum
    def rd9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    // five ordered sums at (a, b) — term shapes exactly as the SQL
    // mirror writes them
    def scoreInfo(a: Double, b: Double): (Double, Double, Double, Double, Double) = {
      var ua = 0.0; var ub = 0.0; var iaa = 0.0; var iab = 0.0; var ibb = 0.0
      zs.foreach { case (z, c1, n) =>
        val ph = 1.0 / (1.0 + math.exp(-(a + b * z)))
        val u = c1.toDouble - n.toDouble * ph
        val w = n.toDouble * ph * (1.0 - ph)
        ua = ua + u
        ub = ub + z * u
        iaa = iaa + w
        iab = iab + z * w
        ibb = ibb + z * z * w
      }
      (ua, ub, iaa, iab, ibb)
    }
    if (nPos == 0L || nPos == nTotal)
      // a single-class input has no logistic MLE — NULL, not a runaway
      return spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(nTotal, nPos, null, null, null, null, null, null)),
        outSchema)
    var a = 0.0; var b = 1.0
    (1 to steps).foreach { _ =>
      val (ua, ub, iaa, iab, ibb) = scoreInfo(a, b)
      val det = iaa * ibb - iab * iab
      if (det > 0) {
        val da = (ua * ibb - ub * iab) / det
        val db = (iaa * ub - iab * ua) / det
        a = rd9(a + da); b = rd9(b + db)
      }
    }
    val (_, _, iaa, iab, ibb) = scoreInfo(a, b)
    val det = iaa * ibb - iab * iab
    val row =
      if (det > 0) {
        val seA = math.sqrt(ibb / det)
        val seB = math.sqrt(iaa / det)
        org.apache.spark.sql.Row(nTotal, nPos, rd6(a), rd6(b), rd6(seA), rd6(seB),
          java.lang.Boolean.valueOf(math.abs(a / seA) > 1.96),
          java.lang.Boolean.valueOf(math.abs((b - 1.0) / seB) > 1.96))
      } else org.apache.spark.sql.Row(nTotal, nPos, null, null, null, null, null, null)
    spark.createDataFrame(java.util.Arrays.asList(row), outSchema)
  }

  /** The shared score frame: one row per distinct score with (positive,
    * negative) counts — the mergeable summary every statistic above
    * re-enters, and the two-sample drift layout with the label as the
    * slice. */
  private[operators] def binaryScoreCounts(df: DataFrame, scoreCol: String,
                                           labelCol: String): DataFrame = {
    val x = F.col(scoreCol).cast("double")
    val y = F.col(labelCol).cast("boolean")
    df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("x"))
      .agg(F.count(F.when(y, 1)).as("c1"),
        F.count(F.when(!y, 1)).as("c2"))
  }
}
