package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.functions.CovMomentsAggregator

/** Principal-component statistics over an embedding column — the
  * dimensionality diagnostics an ML data pipeline runs on its vector
  * corpus: the covariance matrix (which dimensions move together /
  * carry variance), the dominant component (what a 1-D compression
  * would keep), and per-vector projections onto it.
  *
  * Scale shape: everything flows through ONE combinable moments pass
  * ([[CovMomentsAggregator]] — d + d(d+1)/2 doubles per partial); the
  * d×d matrix itself is the only driver-side object (d² doubles, size-
  * independent of the data), and the power iteration runs on it there —
  * never an |N|-row collect. */
object Pca {

  /** Sample covariance matrix of `vecCol` (length-`dim` float vectors)
    * as upper-triangle rows (i ≤ j, 0-based): (i, j, n, cov) with
    * cov = (Σxy − Σx·Σy/n)/(n−1), round 6 (summation-order drift is far
    * below the snap; per-term arithmetic mirrors the SQL oracle). */
  def covarianceMatrix(vecs: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val agg = F.udaf(new CovMomentsAggregator(dim),
      implicitly[org.apache.spark.sql.Encoder[Seq[Float]]])
    val moments = vecs.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .agg(agg(F.col(vecCol)).as("m"))
      .select(F.col("m.n").as("n"), F.col("m.sums").as("sums"), F.col("m.prods").as("prods"))
    val grid = spark.range(0, dim.toLong).select(F.col("id").cast("int").as("i"))
      .crossJoin(spark.range(0, dim.toLong).select(F.col("id").cast("int").as("j")))
      .filter(F.col("i") <= F.col("j"))
    // pair (i, j) sits at i·d − i(i−1)/2 + (j−i) in the packed triangle
    val idx = (F.col("i") * dim - F.col("i") * (F.col("i") - 1) / 2
      + (F.col("j") - F.col("i"))).cast("int")
    grid.crossJoin(F.broadcast(moments))
      // n < 2 has no sample covariance: emit nothing, like the SQL
      // mirror's empty unnest (not 2 080 rows of 0/0 NULLs)
      .filter(F.col("n") >= 2)
      .select(F.col("i"), F.col("j"), F.col("n"),
        // + 0.0 normalizes the −0.0 a just-below-zero covariance rounds
        // to (IEEE: −0.0 + 0.0 = +0.0, identity otherwise) — −0.0 and
        // 0.0 compare equal but PRINT differently, which derails any
        // row-sort-by-representation comparison over 2 080 rows
        (F.round((F.element_at(F.col("prods"), idx + 1)
            - F.element_at(F.col("sums"), F.col("i") + 1)
            * F.element_at(F.col("sums"), F.col("j") + 1) / F.col("n"))
          / (F.col("n") - 1), 6) + F.lit(0.0)).as("cov"))
  }

  /** Dominant eigenpair of the covariance matrix by POWER ITERATION on
    * the collected d×d matrix (the only driver-side object; the data
    * pass behind it is the one-shot moments aggregate). Deterministic
    * from the uniform unit start; sign fixed so the largest-magnitude
    * coordinate is positive. Returns (eigenvalue, unit eigenvector). */
  def topComponent(vecs: DataFrame, vecCol: String, dim: Int,
                   iters: Int = 100): (Double, Array[Double]) = {
    val rows = covarianceMatrix(vecs, vecCol, dim)
      .select("i", "j", "cov").collect()
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0) {
        v = w.map(_ / norm)
        lambda = norm
      }
    }
    // Rayleigh quotient for the eigenvalue; fix the sign convention
    val mv = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    lambda = (0 until dim).map(i => v(i) * mv(i)).sum
    val kMax = v.indices.maxBy(i => math.abs(v(i)))
    val sv = if (v(kMax) < 0) v.map(-_) else v
    (lambda, sv)
  }

  /** Per-vector projection onto a (driver-supplied) component: the 1-D
    * compressed coordinate. One map-side dot product via the same
    * fold every scoring path here uses; no shuffle. */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
              component: Array[Double]): DataFrame = {
    val lit = F.array(component.map(F.lit): _*)
    vecs.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === component.length)
      .select(F.col(idCol),
        F.aggregate(
          F.zip_with(F.col(vecCol).cast("array<double>"), lit, (a, b) => a * b),
          F.lit(0.0), (acc, x) => acc + x).as("pc1"))
  }
}
