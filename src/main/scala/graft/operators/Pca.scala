package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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
  def covarianceMatrix(vecs: DataFrame, vecCol: String, dim: Int): DataFrame =
    covarianceFromMoments(moments(vecs, vecCol, dim), dim)

  /** The one-pass moments frame behind [[covarianceMatrix]]: ONE row of
    * (n, sums[d], prods[d(d+1)/2]). These are plain sums — mergeable by
    * element-wise addition — which is what makes the STREAMING twin a
    * partial-sums store rather than a re-scan. */
  def moments(vecs: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val agg = F.udaf(new CovMomentsAggregator(dim),
      implicitly[org.apache.spark.sql.Encoder[Seq[Float]]])
    vecs.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .agg(agg(F.col(vecCol)).as("m"))
      .select(F.col("m.n").as("n"), F.col("m.sums").as("sums"), F.col("m.prods").as("prods"))
  }

  /** [[covarianceMatrix]] from an explicit 1-row moments frame. */
  def covarianceFromMoments(moments: DataFrame, dim: Int): DataFrame = {
    val spark = moments.sparkSession
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

  /** TOP-K components by power iteration + HOTELLING DEFLATION on the
    * same driver-side d×d matrix (A ← A − λ·vvᵀ after each extracted
    * pair) — the embedding-diagnostics shape: intrinsic dimensionality,
    * variance-explained curves, k-dim whitening. Still exactly ONE data
    * pass (the moments aggregate behind [[covarianceMatrix]]); everything
    * after is dim²-bounded driver algebra.
    *
    * Engine-exactness is the HITS discipline, for the same reason HITS
    * uses it: (1) products and matvec sums stay UNROUNDED — IEEE
    * multiplies of identical doubles are bit-identical everywhere, and
    * per-step snapping of raw sums is actively HARMFUL here because the
    * first post-deflation matvec is catastrophically cancelled (A·v₀
    * after removing the dominant direction can be ~1e-4), so an
    * absolute 1e-9 snap is COARSE relative to the values and a single
    * grid hit amplifies 10⁴× through the normalizer (observed as
    * trajectory forks before this design); (2) each iteration
    * normalizes by the MAX-|entry| — summation-order-independent and
    * exact where an L2 norm aggregates the whole vector — and only the
    * normalized entries (all in [−1, 1], the max itself at ±1) snap to
    * 9 decimals, collapsing the ~1e-12 relative drift every round; (3)
    * the Rayleigh eigenvalue is a RATIO of two unrounded sums over the
    * same rows (order drift cancels to ~1e-16 relative), snapped at 9.
    * Driver rounding is the same scala BigDecimal HALF_UP that
    * Catalyst's Round uses, so the full trajectory (matvec, max-
    * normalize, Rayleigh, sign fix, rank-one deflation with the
    * 9-snapped ‖v‖² denominator) replays bit-identically in an
    * unrolled SQL mirror. All-ones start vector; sign convention:
    * largest-|coordinate| positive (that coordinate is exactly +1.0),
    * ties to the lowest index.
    *
    * Returns (trace, components) — trace = 9-snapped Σ diag(A) (total
    * variance, the variance_explained denominator) and one
    * (eigenvalue, MAX-normalized loading vector) per component,
    * eigenvalues descending by construction (eigenvalues and
    * variance_explained are normalization-free; rescale loadings by
    * 1/‖v‖₂ downstream if unit vectors are needed). */
  def topComponents(vecs: DataFrame, vecCol: String, dim: Int, k: Int,
                    iters: Int = 30): (Double, Seq[(Double, Array[Double])]) =
    topComponentsFromCov(covarianceMatrix(vecs, vecCol, dim), dim, k, iters)

  /** [[topComponents]] from an explicit covariance frame (i, j, cov) —
    * the streaming twin's entry point, where the matrix comes from
    * merged moment partials instead of a fresh data pass. */
  def topComponentsFromCov(cov: DataFrame, dim: Int, k: Int,
                           iters: Int = 30): (Double, Seq[(Double, Array[Double])]) = {
    def rd(x: Double, s: Int): Double = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = cov.select("i", "j", "cov").collect()
    val a = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    val trace = rd((0 until dim).map(i => a(i)(i)).sum, 9)
    val out = (1 to k).map { _ =>
      var v = Array.fill(dim)(1.0)
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * v(j)).sum)
        val mabs = w.map(math.abs).max
        v = if (mabs == 0) Array.fill(dim)(0.0) else w.map(x => rd(x / mabs, 9))
      }
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * v(j)).sum)
      val num = (0 until dim).map(i => av(i) * v(i)).sum
      val den = (0 until dim).map(i => v(i) * v(i)).sum
      val lam = if (den == 0) 0.0 else rd(num / den, 9)
      val kMax = v.indices.minBy(i => (-math.abs(v(i)), i))
      // exact negation, NOT a re-round: the entries are already 9-snapped
      // and the SQL mirror negates without rounding too
      val u = if (v(kMax) < 0) v.map(x => -x) else v
      val d2 = rd(u.map(x => x * x).sum, 9)
      for (i <- 0 until dim; j <- 0 until dim)
        // left-associated lam·u_i·u_j/d2, matching the mirror's expression
        a(i)(j) = if (d2 == 0) a(i)(j) else rd(a(i)(j) - lam * u(i) * u(j) / d2, 9)
      (lam, u)
    }
    (trace, out)
  }

  /** [[topComponents]] as a frame — one row per (component, dimension):
    * (component 1-based, i 0-based, loading, eigenvalue,
    * variance_explained), scores round 6 with the −0.0 guard, the
    * component-constant columns repeated per row (the psi layout). */
  def topComponentsDF(vecs: DataFrame, vecCol: String, dim: Int, k: Int,
                      iters: Int = 30): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    def rd6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val (trace, comps) = topComponents(vecs, vecCol, dim, k, iters)
    comps.zipWithIndex.flatMap { case ((lam, u), c) =>
      u.zipWithIndex.map { case (x, i) =>
        // trace 0 (all-constant or n < 2 input) degrades to 0 shares,
        // matching the other entry points' empty/zero degradations
        (c + 1, i, rd6(x), rd6(lam), if (trace == 0) 0.0 else rd6(lam / trace))
      }
    }.toDF("component", "i", "loading", "eigenvalue", "variance_explained")
  }

  /** k-dim projection: each vector's coordinates on the `components`
    * loading vectors — the compressed representation. One map-side
    * fused dot product per component; no shuffle. */
  def projectK(vecs: DataFrame, idCol: String, vecCol: String,
               components: Seq[Array[Double]]): DataFrame = {
    require(components.nonEmpty, "projectK needs at least one component")
    val dim = components.head.length
    val cols = components.zipWithIndex.map { case (comp, c) =>
      val lit = F.array(comp.map(F.lit): _*)
      F.aggregate(
        F.zip_with(F.col(vecCol).cast("array<double>"), lit, (a, b) => a * b),
        F.lit(0.0), (acc, x) => acc + x).as(s"pc${c + 1}")
    }
    vecs.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .select(F.col(idCol) +: cols: _*)
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

  /** Per-dimension mean of the valid vectors, 9-snapped — the centering
    * vector reconstruction needs (the covariance pass centers
    * implicitly and never materializes it). One exploded aggregate; a
    * d-bounded collect. */
  def meanVector(vecs: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    def rd9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = Array.ofDim[Double](dim)
    vecs.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .select(F.posexplode(F.col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy("i").agg(F.avg("x").as("mu"))
      .collect()
      .foreach(r => m(r.getInt(0)) = rd9(r.getDouble(1)))
    m
  }

  /** RECONSTRUCTION-ERROR outlier score — the subspace complement of the
    * centroid-distance score (q_embed_outliers): project each centered
    * vector onto the k-dim PCA subspace, reconstruct, and score
    * ‖x − x̂‖². A point far from every centroid but INSIDE the data's
    * principal plane scores low here; a point orthogonal to the plane
    * (the structurally-novel kind — corrupt encodings, wrong-modality
    * rows) scores high even when it sits near the data's mean. This is
    * classic PCA residual analysis (Jackson & Mudholkar, Technometrics
    * 1979 — the Q/SPE statistic).
    *
    * Entirely map-side per vector (the projectK fold discipline): center
    * against the driver-supplied `mean`, one fused dot product per
    * component (divided by the driver-exact ‖u‖² — deflation makes the
    * loading vectors orthogonal, so per-component coefficients ARE the
    * least-squares fit), then one LEFT-ASSOCIATED residual chain
    * c − p₀u₀ − p₁u₁ − … (the mirror subtracts in the same order) and a
    * squared-sum fold, round 6. No shuffle until the 1-row exact
    * percentile; flagging compares the ROUNDED score to the
    * percentile-of-rounded threshold, so both engines threshold
    * identical inputs.
    *
    * Output: (vec_id, recon_err, is_outlier = recon_err > pct-th
    * percentile). */
  def reconstructionErrors(vecs: DataFrame, idCol: String, vecCol: String,
                           mean: Array[Double], components: Seq[Array[Double]],
                           pct: Double = 0.95): DataFrame = {
    require(components.nonEmpty, "reconstruction needs at least one component")
    val dim = mean.length
    require(components.forall(_.length == dim), "component/mean dimension mismatch")
    val muLit = F.array(mean.map(F.lit): _*)
    val centered = vecs
      .filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .select(F.col(idCol).as("vec_id"),
        F.zip_with(F.col(vecCol).cast("array<double>"), muLit, (a, b) => a - b).as("__c"))
    val withCoefs = components.zipWithIndex.foldLeft(centered) { case (df, (u, ci)) =>
      val uu = u.map(x => x * x).sum // driver-exact, embedded in the mirror verbatim
      val uLit = F.array(u.map(F.lit): _*)
      df.withColumn(s"__p$ci",
        F.aggregate(F.zip_with(F.col("__c"), uLit, (a, b) => a * b),
          F.lit(0.0), (acc, x) => acc + x) / uu)
    }
    var resid: Column = F.col("__c")
    components.zipWithIndex.foreach { case (u, ci) =>
      val uLit = F.array(u.map(F.lit): _*)
      resid = F.zip_with(resid, uLit, (a, b) => a - F.col(s"__p$ci") * b)
    }
    val scored = withCoefs.select(F.col("vec_id"),
      (F.round(F.aggregate(resid, F.lit(0.0), (acc, x) => acc + x * x), 6)
        + F.lit(0.0)).as("recon_err"))
    val thr = scored.agg(F.expr(s"percentile(recon_err, $pct)").as("__thr"))
    scored.crossJoin(F.broadcast(thr))
      .select(F.col("vec_id"), F.col("recon_err"),
        (F.col("recon_err") > F.col("__thr")).as("is_outlier"))
  }

  /** [[reconstructionErrors]] end-to-end: fit the top-k subspace and the
    * mean, then score. */
  def reconstructionOutliers(vecs: DataFrame, idCol: String, vecCol: String,
                             dim: Int, k: Int, iters: Int = 30,
                             pct: Double = 0.95): DataFrame = {
    val (_, comps) = topComponents(vecs, vecCol, dim, k, iters)
    reconstructionErrors(vecs, idCol, vecCol, meanVector(vecs, vecCol, dim),
      comps.map(_._2), pct)
  }

  /** TwoNN INTRINSIC DIMENSION (Facco, d'Errico, Rodriguez & Laio,
    * "Estimating the intrinsic dimension of datasets by a minimal
    * neighborhood information", Sci. Rep. 2017): for each point, the
    * ratio μ = r₂/r₁ of its second- to first-nearest-neighbor distance
    * is Pareto(ID)-distributed regardless of density, so the MLE
    * ID ≈ n / Σ ln μ reads the manifold dimension from two neighbors
    * alone — the embedding-corpus diagnostic that says how much of the
    * ambient 64 dims the data actually occupies (PCA's variance-based
    * count overestimates on curved manifolds; this one doesn't).
    *
    * This entry scores from ANY (qid, d2, rn ∈ {1, 2}) neighbor frame —
    * exact brute force for the oracle row, or any of the ANN top-k paths
    * (LSH/IVF/IVF-PQ with k = 2) at scale, which is exactly how a 100 TB
    * corpus would run it: the estimator is one grouped pivot + one 1-row
    * aggregate on top of whatever neighbor search is already running.
    * Points with r₁ = 0 (exact duplicates) are excluded, the paper's
    * convention. `d2` is the SQUARED distance — μ = √(d₂/d₁) — so
    * callers can skip the sqrt in the search.
    *
    * Output: ONE row — (n_used, sum_log_mu, id_twonn), round 6; empty
    * when no point has two distinct-distance neighbors. */
  def intrinsicDimensionFromKnn(knn: DataFrame): DataFrame = {
    val two = knn.filter(F.col("rn") <= 2)
      .groupBy("qid")
      .agg(F.max(F.when(F.col("rn") === 1, F.col("d2"))).as("r1"),
        F.max(F.when(F.col("rn") === 2, F.col("d2"))).as("r2"))
      .filter(F.col("r1") > 0 && F.col("r2").isNotNull)
      .select(F.log(F.sqrt(F.col("r2") / F.col("r1"))).as("lm"))
    two.agg(F.count(F.lit(1)).as("n_used"), F.sum("lm").as("__s"))
      .filter(F.col("n_used") > 0 && F.col("__s") > 0)
      .select(F.col("n_used"),
        (F.round(F.col("__s"), 6) + F.lit(0.0)).as("sum_log_mu"),
        (F.round(F.col("n_used") / F.col("__s"), 6) + F.lit(0.0)).as("id_twonn"))
  }

  /** [[intrinsicDimensionFromKnn]] over exact brute-force euclidean
    * two-NN — the oracle-able baseline (N² pairs; swap in an ANN top-2
    * at scale). The per-pair squared distance is a STATIC left-
    * associated `dim`-term expression (element_at chains), not a
    * zip_with/aggregate fold: higher-order-function lambdas run
    * interpreted per element with boxing and are excluded from
    * whole-stage codegen — measured 36.5 s → 5.7 s (min-of-2, sf0.1's
    * 2000² grid) from this one change. The candidate side is also
    * re-spread across the shuffle width so the quadratic kernel never
    * inherits the input file's partitioning. */
  def intrinsicDimension(vecs: DataFrame, idCol: String, vecCol: String,
                         dim: Int): DataFrame = {
    val q = vecs.select(F.col(idCol).as("qid"), F.col(vecCol).cast("array<double>").as("qv"))
    val c = vecs.select(F.col(idCol).as("cid"), F.col(vecCol).cast("array<double>").as("cv"))
      .filter(F.size(F.col("cv")) === dim)
      // explicit width: AQE coalescing sizes from the tiny input bytes,
      // blind to the N^2 kernel behind it (measured: single-task at sf0.1)
      .repartition(vecs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt,
        F.col("cid"))
    val d2 = (1 to dim).map { i =>
      val d = F.element_at(F.col("qv"), i) - F.element_at(F.col("cv"), i)
      d * d
    }.reduce(_ + _) // left-assoc i = 1..dim, the fold's addition order
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("cid") =!= F.col("qid") && F.size(F.col("qv")) === dim)
      .withColumn("d2", d2)
    // smallest-2 via the bounded-heap top-k on the negated distance
    // ((−d2) desc = d2 asc, ties by candidate id asc)
    val knn = scored.groupBy("qid")
      .agg(graft.functions.TopK.collectTopK(
        F.struct((-F.col("d2")).as("nd"), (-F.col("cid")).as("nid")), 2).as("__tk"))
      .select(F.col("qid"), F.posexplode(F.col("__tk")).as(Seq("__pos", "__e")))
      .select(F.col("qid"), (-F.col("__e.nd")).as("d2"), (F.col("__pos") + 1).as("rn"))
    intrinsicDimensionFromKnn(knn)
  }
}
