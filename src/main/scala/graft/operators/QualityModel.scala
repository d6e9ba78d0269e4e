package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.Pin._

/** Learned quality filter — the model-based curation step of a training
  *-data pipeline (the fastText/CCNet-style classifier that replaces
  * hand-tuned thresholds once a corpus outgrows them): a logistic
  * regression over the deterministic text-quality features, trained
  * DISTRIBUTED and served from snapped literal weights.
  *
  * Training (train-rarely): full-batch gradient descent where each
  * iteration is ONE map-side-combinable aggregate — the per-row gradient
  * contribution `(σ(w·x) − y)·x` summed per feature — so an iteration
  * costs one scan + a 6-double shuffle regardless of corpus size. Only the
  * weight vector ever reaches the driver. At 100 TB, train on a hash
  * sample ([[DataShaping]]) — the serve path below is what runs corpus-wide.
  *
  * Serving (serve-always): scores are pure column algebra over the LITERAL
  * snapped weights ([[Similarity.snapCentroids]] pattern), so the scoring
  * query is engine-mirrorable: the DuckDB oracle embeds the same doubles
  * and the same left-associated dot product.
  *
  * Features (each already fixed-precision, engine-stable):
  * bias, distinct_ratio, stopword_ratio, mean_token_len/10 (rounded 4),
  * min(n_tokens, 200)/200 (rounded 4).
  */
object QualityModel {

  val nFeatures = 5

  /** The feature columns f0..f4 for a documents frame (expects `textCol`;
    * tokenization and ratios mirror [[TextAnalysis.quality]]). */
  def featureCols(textCol: String): Seq[Column] = {
    val t = F.col(textCol)
    val arr = F.split(t, " ")
    val nTok = F.size(arr)
    val stopwords = Seq("the", "a", "of", "and")
    val stopHits = F.size(F.filter(arr, x => stopwords.map(s => x === s).reduce(_ || _)))
    Seq(
      F.lit(1.0),
      F.round(F.size(F.array_distinct(arr)).cast("double") / nTok.cast("double"), 4),
      F.round(stopHits.cast("double") / nTok.cast("double"), 4),
      F.round((F.length(t) - (nTok - 1)).cast("double") / nTok.cast("double") / 10.0, 4),
      F.round(F.least(nTok, F.lit(200)).cast("double") / 200.0, 4))
  }

  /** Left-associated dot of the feature columns with literal weights —
    * index order, the same association the oracle SQL spells out. */
  def zOf(weights: Array[Double], feats: Seq[Column]): Column =
    feats.zip(weights).map { case (f, w) => f * F.lit(w) }.reduceLeft(_ + _)

  private def sigmoid(z: Column): Column = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

  /** Train by Newton/IRLS: `iters` iterations, each ONE map-side-
    * combinable aggregate of the 5 gradient sums plus the 15 upper-
    * triangle Hessian sums (σ(1−σ)·f_j·f_k); the driver solves the 5×5
    * system (tiny, ridge-regularized) and steps. Quadratic convergence
    * puts logistic regression at machine precision in well under 8
    * scans — the 30-iteration gradient loop this replaces was pure
    * driver-synchronous scheduler exposure. The label is `labelCol`
    * (0/1). Returns weights snapped to 6 decimals (exact
    * Double.toString round-trip ⇒ literal-embeddable in any engine). */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      iters: Int = 8,
      ridge: Double = 1e-8): Array[Double] = {
    // materialize the (f0..f4, y) frame ONCE — the tokenization/ratio work
    // is identical every iteration, so each of the `iters` scans should
    // read 6 doubles per row, not re-split the text. localCheckpoint (not
    // cache) severs the lineage so the loop's jobs replay nothing.
    val fcols = featureCols(textCol).zipWithIndex.map { case (f, j) => f.as(s"f$j") }
    val feats = docs.select(fcols :+ F.col(labelCol).cast("double").as("y"): _*)
      .pin()
    val fRefs = (0 until nFeatures).map(j => F.col(s"f$j"))
    val y = F.col("y")
    val pairs = for { j <- 0 until nFeatures; k <- j until nFeatures } yield (j, k)
    var w = Array.fill(nFeatures)(0.0)
    for (_ <- 0 until iters) {
      val p = sigmoid(zOf(w, fRefs))
      // clamp the weight-curvature term away from 0 so a (near-)separable
      // label can't zero the Hessian mid-run
      val s = F.greatest(p * (F.lit(1.0) - p), F.lit(1e-10))
      val err = p - y
      val gradAggs = fRefs.zipWithIndex.map { case (f, j) => F.sum(err * f).as(s"g$j") }
      val hessAggs = pairs.map { case (j, k) =>
        F.sum(s * fRefs(j) * fRefs(k)).as(s"h${j}_$k")
      }
      val row = feats.agg(gradAggs.head, (gradAggs.tail ++ hessAggs): _*).collect()(0)
      val g = Array.tabulate(nFeatures)(row.getDouble)
      val h = Array.ofDim[Double](nFeatures, nFeatures)
      pairs.zipWithIndex.foreach { case ((j, k), i) =>
        val v = row.getDouble(nFeatures + i)
        h(j)(k) = v; h(k)(j) = v
      }
      (0 until nFeatures).foreach(j => h(j)(j) += ridge)
      val step = solveSpd(h, g)
      w = w.zip(step).map { case (wj, d) => wj - d }
    }
    Similarity.snapCentroids(Array(w))(0)
  }

  /** In-place Gaussian elimination with partial pivoting for the tiny
    * (nFeatures × nFeatures) Newton system — driver-side, O(k³) on k=5. */
  private def solveSpd(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone())
    val x = b.clone()
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r
      val tr = m(col); m(col) = m(piv); m(piv) = tr
      val tx = x(col); x(col) = x(piv); x(piv) = tx
      for (r <- col + 1 until n) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col until n) m(r)(c) -= f * m(col)(c)
        x(r) -= f * x(col)
      }
    }
    for (col <- n - 1 to 0 by -1) {
      for (r <- col + 1 until n) x(col) -= m(col)(r) * x(r)
      x(col) /= m(col)(col)
    }
    x
  }

  /** Score a documents frame against LITERAL weights: `score` =
    * round(σ(w·x), 4), `keep` = score ≥ 0.5. Pure column algebra — the
    * serve half, mirrored by the oracle with the same literals. */
  def score(docs: DataFrame, idCol: String, textCol: String, weights: Array[Double]): DataFrame = {
    val feats = featureCols(textCol)
    val s = F.round(sigmoid(zOf(weights, feats)), 4)
    docs.select(F.col(idCol), s.as("score"), (s >= 0.5).as("keep"))
  }

  /** Mean log-loss of literal weights on a labelled frame (evaluation /
    * convergence evidence; clamped away from log 0). */
  def logLoss(docs: DataFrame, textCol: String, labelCol: String, weights: Array[Double]): Double = {
    val p = sigmoid(zOf(weights, featureCols(textCol)))
    val pc = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    val y = F.col(labelCol).cast("double")
    docs.agg(F.avg(-(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc))))
      .collect()(0).getDouble(0)
  }
}
