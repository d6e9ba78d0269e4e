package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

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
  def perClass(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val cells = confusionCells(df, predCol, labelCol)
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
  def kappa(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val cells = confusionCells(df, predCol, labelCol).localCheckpoint(true)
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
}
