package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{Pca, Similarity, TimeSeries}

/** One-pass covariance moments, power-iteration PCA, and the lead–lag
  * cross-correlation screen. */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  private def vecsDf(rows: Seq[Seq[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  it("covariance matches the textbook sample formula on a hand case") {
    // 2-dim: x = (1,2,3), y = (2,4,6): var(x)=1, var(y)=4, cov=2 (perfect line)
    val df = vecsDf(Seq(Seq(1f, 2f), Seq(2f, 4f), Seq(3f, 6f)))
    val out = Pca.covarianceMatrix(df, "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    out((0, 0)) shouldBe 1.0
    out((1, 1)) shouldBe 4.0
    out((0, 1)) shouldBe 2.0
    out.keySet should have size 3 // upper triangle only
  }

  it("the one-pass moments equal a brute-force covariance on random data, any partitioning") {
    val r = new scala.util.Random(5)
    val d = 6
    val rows = Seq.fill(200)(Seq.fill(d)(r.nextFloat() * 2 - 1))
    Seq(1, 7).foreach { parts =>
      val df = vecsDf(rows).repartition(parts)
      val got = Pca.covarianceMatrix(df, "embedding", d)
        .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(3)).toMap
      val n = rows.length
      val mean = (0 until d).map(i => rows.map(_(i).toDouble).sum / n)
      for (i <- 0 until d; j <- i until d) {
        val want = rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
        got((i, j)) shouldBe want +- 1e-5
      }
    }
  }

  it("fewer than two valid vectors yield an EMPTY frame, matching the mirror's empty unnest") {
    Pca.covarianceMatrix(vecsDf(Seq(Seq(1f, 2f))), "embedding", 2).collect() shouldBe empty
    Pca.covarianceMatrix(vecsDf(Seq.empty), "embedding", 2).collect() shouldBe empty
  }

  it("malformed and null vectors are skipped, not crashed on") {
    val df = Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 4f)), (2L, null), (3L, Seq(9f)))
      .toDF("vec_id", "embedding")
    val out = Pca.covarianceMatrix(df, "embedding", 2).collect()
    out.head.getLong(2) shouldBe 2L // n counts only the two valid rows
  }

  it("power iteration recovers a planted dominant direction and projects onto it") {
    // data concentrated along (1, 1)/√2 with tiny orthogonal noise
    val r = new scala.util.Random(9)
    val rows = Seq.fill(300) {
      val a = r.nextGaussian() * 10 // dominant coordinate
      val b = r.nextGaussian() * 0.1
      Seq((a + b).toFloat, (a - b).toFloat)
    }
    val df = vecsDf(rows)
    val (lambda, v) = Pca.topComponent(df, "embedding", 2, iters = 60)
    lambda should be > 50.0
    math.abs(v(0)) shouldBe math.abs(v(1)) +- 0.01 // ±45° direction
    v(0) should be > 0.0 // sign convention: largest coordinate positive
    // projection = the dominant coordinate (up to the √2 scale)
    val proj = Pca.project(df, "vec_id", "embedding", v)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val want = rows.zipWithIndex.map { case (row, i) =>
      i.toLong -> (row(0) * v(0) + row(1) * v(1)) }.toMap
    proj(0L) shouldBe want(0L) +- 1e-4
  }

  // ---- topComponents (deflation) -------------------------------------

  it("top-k recovers two planted orthogonal directions with descending eigenvalues") {
    // dominant along (1,1,0,0)/√2 (var ~100), second along (0,0,1,-1)/√2
    // (var ~25), tiny noise elsewhere
    val r = new scala.util.Random(13)
    val rows = Seq.fill(400) {
      val a = r.nextGaussian() * 10
      val b = r.nextGaussian() * 5
      val e = r.nextGaussian() * 0.05
      Seq((a + e).toFloat, (a - e).toFloat, (b + e).toFloat, (-b + e).toFloat)
    }
    val (trace, comps) = Pca.topComponents(vecsDf(rows), "embedding", 4, k = 3, iters = 40)
    val lams = comps.map(_._1)
    lams.sliding(2).foreach { case Seq(x, y) => x should be >= y }
    lams.head should be > 50.0
    // loadings are MAX-normalized; compare directions via normalized dots
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val u1 = unit(comps(0)._2); val u2 = unit(comps(1)._2)
    math.abs(u1(0)) shouldBe math.abs(u1(1)) +- 0.02
    math.abs(u2(2)) shouldBe math.abs(u2(3)) +- 0.02
    math.abs(u1.zip(u2).map { case (x, y) => x * y }.sum) should be < 0.05 // orthogonal
    // variance explained by the two planted directions dominates
    (lams(0) + lams(1)) / trace should be > 0.95
  }

  it("successive components are pairwise orthogonal on random data") {
    val r = new scala.util.Random(31)
    val rows = Seq.fill(300)(Seq.fill(6)(r.nextFloat() * 2 - 1))
    val (_, comps) = Pca.topComponents(vecsDf(rows), "embedding", 6, k = 4, iters = 40)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val us = comps.map(c => unit(c._2))
    for (i <- us.indices; j <- (i + 1) until us.size)
      math.abs(us(i).zip(us(j)).map { case (x, y) => x * y }.sum) should be < 0.02
    comps.map(_._1).sliding(2).foreach { case Seq(x, y) => x should be >= y }
  }

  it("topComponentsDF carries eigenvalue/variance_explained per row and projectK projects") {
    val r = new scala.util.Random(17)
    val rows = Seq.fill(100)(Seq.fill(3)(r.nextFloat()))
    val df = vecsDf(rows)
    val frame = Pca.topComponentsDF(df, "embedding", 3, k = 2, iters = 30)
    frame.count() shouldBe 6 // 2 components × 3 dims
    val ve = frame.select("component", "variance_explained").distinct().collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    ve.values.sum should be <= 1.0 + 1e-6
    val (_, comps) = Pca.topComponents(df, "embedding", 3, k = 2, iters = 30)
    val proj = Pca.projectK(df, "vec_id", "embedding", comps.map(_._2))
    proj.columns.toSeq shouldBe Seq("vec_id", "pc1", "pc2")
    val p0 = proj.filter(F.col("vec_id") === 0L).collect().head
    val want1 = rows.head.map(_.toDouble).zip(comps(0)._2).map { case (x, c) => x * c }.sum
    p0.getDouble(1) shouldBe want1 +- 1e-6
  }

  // ---- crossCorrelation ---------------------------------------------

  private def dayDf(vals: Seq[Long], col: String) =
    vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i.toLong)), v)
    }.toDF("t", col)

  it("a shifted copy of a series correlates perfectly at exactly its lag") {
    val base = Seq(3L, 9L, 2L, 14L, 5L, 11L, 7L, 4L, 12L, 6L)
    // y(t) = x(t - 2): x anticipates y by 2 days => perfect corr at lag +2
    val ys = Seq(0L, 0L) ++ base
    val out = TimeSeries.crossCorrelation(
        dayDf(base, "x"), dayDf(ys, "y"), "t", "x", "y", maxLag = 3)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    out(2) shouldBe Some(1.0)
    out.filter(_._1 != 2).values.flatten.foreach(_ should be < 1.0)
  }

  // ---- burstiness / sequenceEntropy ---------------------------------

  private def evDf(rows: Seq[(String, Long, Long, String)]) =
    rows.map { case (k, s, id, tp) =>
      (k, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)), id, tp)
    }.toDF("user_id", "ts", "event_id", "event_type")

  it("a metronome scores burstiness −1; a bursty train matches the (σ−μ)/(σ+μ) formula") {
    val metro = (0 until 10).map(i => ("m", i * 60L, i.toLong, "x"))
    val burst = Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex
      .map { case (s, i) => ("b", s, (100 + i).toLong, "x") }
    val out = TimeSeries.burstiness(evDf(metro ++ burst), "user_id", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    out("m") shouldBe ((9L, 60.0, 0.0, -1.0))
    val gaps = Seq(1.0, 1.0, 1.0, 97.0)
    val mu = gaps.sum / 4
    val sig = math.sqrt(gaps.map(g => g * g).sum / 4 - mu * mu)
    out("b")._1 shouldBe 4L
    out("b")._4 shouldBe math.round((sig - mu) / (sig + mu) * 1e4) / 1e4 +- 1e-9
    out("b")._4 should be > 0.0
  }

  it("an alternating sequence is perfectly predictable: h_cond 0, full gain of ln 2") {
    val rows = (0 until 9).map(i => ("u", i.toLong, i.toLong, if (i % 2 == 0) "a" else "b"))
    val r = TimeSeries.sequenceEntropy(evDf(rows), "user_id", "ts", "event_type", "event_id")
      .collect().head
    val ln2 = math.round(math.log(2.0) * 1e4) / 1e4
    r.getAs[Long]("n_bigrams") shouldBe 8L
    r.getAs[Double]("h_cond") shouldBe 0.0
    r.getAs[Double]("h_next") shouldBe ln2
    r.getAs[Double]("info_gain") shouldBe ln2
  }

  it("conditioning never hurts: h_cond ≤ h_next on random sequences, gain ≥ 0") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      (s"u${i % 5}", i.toLong, i.toLong, s"t${rnd.nextInt(4)}"))
    val r = TimeSeries.sequenceEntropy(evDf(rows), "user_id", "ts", "event_type", "event_id")
      .collect().head
    r.getAs[Double]("h_cond") should be <= r.getAs[Double]("h_next")
    r.getAs[Double]("info_gain") should be >= 0.0
  }

  // ---- seasonalDecompose --------------------------------------------

  private def seasonal(xs: Seq[Double]) =
    TimeSeries.seasonalDecompose(
      xs.zipWithIndex.map { case (x, i) =>
        ("k", java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 5).plusDays(i.toLong)), x)
      }.toDF("k", "t", "x"), "k", "t", "x")
      .orderBy("t").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  it("recovers a planted weekly pattern on a flat trend, interior rows exactly") {
    // pattern with median 0 over a week; x = 20 + p(phase)
    val p = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 28).map(i => 20.0 + p(i % 7))
    val out = seasonal(xs)
    // interior rows (full 7-day windows): trend = 20, seasonal = p, residual = 0
    (3 until 25).foreach { i =>
      withClue(s"row $i: ") {
        out(i)._2 shouldBe 20.0
        out(i)._3 shouldBe p(i % 7)
        out(i)._4 shouldBe 0.0
      }
    }
  }

  it("trend + seasonal + residual reassembles x on every row, edges included") {
    val r = new scala.util.Random(3)
    val xs = Seq.fill(30)((r.nextInt(50) + 10).toDouble)
    seasonal(xs).foreach { case (x, tr, se, res) =>
      (tr + se + res) shouldBe x +- 1e-6
    }
  }

  it("a single 100x spike does not bend the surrounding trend (median robustness)") {
    val base = Seq.fill(21)(10.0)
    val spiked = base.updated(10, 1000.0)
    val out = seasonal(spiked)
    out(6)._2 shouldBe 10.0 // trend before the spike's window untouched
    out(10)._2 shouldBe 10.0 // even AT the spike: 1 of 7 values cannot move a median
    out(10)._4 should be > 900.0 // the spike lands in the residual, where it belongs
  }

  // ---- reconstructionErrors ------------------------------------------

  it("a planted off-subspace point takes the top reconstruction error and the flag") {
    val r = new scala.util.Random(17)
    val dim = 8
    // 49 points living in the span of e0/e1; one point orthogonal to it
    def inPlane(): Seq[Double] = {
      val a = r.nextGaussian() * 5; val b = r.nextGaussian() * 2
      Seq.tabulate(dim)(i => if (i == 0) a else if (i == 1) b else 0.0)
    }
    // displacement 9: its induced variance 9²/49 ≈ 1.7 stays BELOW the
    // plane's weaker direction (σ² = 4), so the top-2 fit cannot be
    // hijacked into capturing the outlier direction (masking)
    val rows = (0 until 49).map(i => (i.toLong, inPlane())) :+
      (99L, Seq.tabulate(dim)(i => if (i == 4) 9.0 else 0.0))
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.reconstructionOutliers(df, "vec_id", "embedding", dim, k = 2, iters = 30)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getBoolean(2))).toMap
    out.maxBy(_._2._1)._1 shouldBe 99L
    out(99L)._1 should be > 50.0 // ~(9·48/50)² off-plane displacement
    out(99L)._2 shouldBe true
    // in-plane points only carry the mean shift the outlier induced
    (0L until 49L).foreach(i => out(i)._1 should be < 1.0)
  }

  it("TwoNN reads the manifold dimension, not the ambient one") {
    val r = new scala.util.Random(29)
    // 300 points on a 2-plane embedded in 8 ambient dims
    val plane = (0 until 300).map { i =>
      val a = r.nextGaussian() * 10; val b = r.nextGaussian() * 10
      (i.toLong, Seq(a, b, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    }
    val id2 = Pca.intrinsicDimension(plane.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 8).collect().head.getDouble(2)
    id2 should be > 1.4
    id2 should be < 2.8
    // 300 points on a 1-line: ID ≈ 1
    val line = (0 until 300).map { i =>
      val a = r.nextGaussian() * 10
      (i.toLong, Seq(a, 2 * a, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    }
    val id1 = Pca.intrinsicDimension(line.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 8).collect().head.getDouble(2)
    id1 should be > 0.7
    id1 should be < 1.5
    id1 should be < id2
  }

  it("IVF-probed TwoNN tracks the exact estimator — the sub-quadratic scale path") {
    val r = new scala.util.Random(29)
    // float vectors: the centroid trainer reads the fixture's float type
    val plane = (0 until 300).map { i =>
      val a = (r.nextGaussian() * 10).toFloat; val b = (r.nextGaussian() * 10).toFloat
      (i.toLong, Seq(a, b, 0f, 0f, 0f, 0f, 0f, 0f))
    }
    val df = plane.toDF("vec_id", "embedding")
    val exact = Pca.intrinsicDimension(df, "vec_id", "embedding", dim = 8)
      .collect().head.getDouble(2)
    val cents = Similarity.snapCentroids(
      Similarity.trainIvfCentroids(df, "vec_id", "embedding", kC = 4, iters = 2, dim = 8))
    val ann = Pca.intrinsicDimensionFromKnn(
      Similarity.ivfProbeKnnD2(df, "vec_id", "embedding", cents, nprobe = 2))
      .collect().head.getDouble(2)
    // probing 2/4 cells misses some true neighbors; the Pareto MLE is
    // ratio-based and robust to it — the estimate must stay close
    math.abs(ann - exact) / exact should be < 0.2
    ann should be > 1.4
    ann should be < 2.8
  }

  it("TwoNN excludes exact duplicates (r1 = 0) from the MLE") {
    val r = new scala.util.Random(37)
    val pts = (0 until 50).map(i =>
      (i.toLong, Seq(r.nextGaussian(), r.nextGaussian(), 0.0, 0.0)))
    val withDup = pts :+ (99L, pts.head._2) // exact copy of point 0
    val out = Pca.intrinsicDimension(withDup.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 4).collect().head
    // points 0 and 99 both have a zero first-NN distance — both excluded
    out.getLong(0) shouldBe 49L
  }

  it("projectK refuses an empty component list") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Pca.projectK(df, "vec_id", "embedding", Seq.empty)
  }

  it("topComponentsDF on a zero-variance corpus emits zero shares, not NaN") {
    val df = (0 until 5).map(i => (i.toLong, Seq.fill(4)(2.0))).toDF("vec_id", "embedding")
    Pca.topComponentsDF(df, "embedding", dim = 4, k = 2).collect().foreach { r =>
      r.getDouble(4).isNaN shouldBe false
      r.getDouble(4) shouldBe 0.0
    }
  }

  // ---- holtWintersForecast -------------------------------------------

  private def hwDf(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) =>
      ("k", java.sql.Date.valueOf(java.time.LocalDate.of(2026, 2, 2).plusDays(i.toLong)), x)
    }.toDF("k", "t", "x")

  it("a perfectly seasonal flat series is a FIXED POINT: MAE 0, exact forecasts") {
    // zero-median... zero-MEAN weekly pattern on a flat level: the init
    // (l=c, b=0, s=pattern) reproduces every observation, so level/trend/
    // seasonal never move and the projection is exact
    val p = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 28).map(i => 20.0 + p(i % 7))
    val out = TimeSeries.holtWintersForecast(hwDf(xs), "k", "t", "x")
      .orderBy("step").collect()
    out should have length 7
    out.foreach { r =>
      r.getAs[Double]("mae") shouldBe 0.0
      r.getAs[Double]("lo") shouldBe r.getAs[Double]("forecast")
    }
    // 28 points end at phase 27 % 7 = 6; step m forecasts phase (27+m) % 7
    (1 to 7).foreach { m =>
      out(m - 1).getAs[Double]("forecast") shouldBe 20.0 + p((27 + m) % 7)
    }
  }

  it("a pure linear trend forecasts its continuation within the MAE band") {
    val xs = (0 until 28).map(i => 5.0 + 2.0 * i)
    val out = TimeSeries.holtWintersForecast(hwDf(xs), "k", "t", "x")
      .orderBy("step").collect()
    // x_27 = 59; the projection must keep climbing monotonically
    val fs = out.map(_.getAs[Double]("forecast"))
    fs.sliding(2).foreach { case Array(a, b) => b should be > a }
    fs.head should be > 55.0
    out.foreach { r =>
      math.abs(r.getAs[Double]("forecast")) should be < 100.0
      r.getAs[Double]("hi") - r.getAs[Double]("lo") shouldBe
        (2 * r.getAs[Double]("mae")) +- 1e-5
    }
  }

  it("backtest on the seasonal fixed point predicts every held-out day exactly") {
    val p = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 28).map(i => 20.0 + p(i % 7))
    val out = TimeSeries.holtWintersBacktest(hwDf(xs), "k", "t", "x")
      .orderBy("day").collect()
    out should have length 14 // n − 2p: the init window is withheld
    out.foreach { r =>
      r.getAs[Double]("forecast") shouldBe r.getAs[Double]("actual")
      r.getAs[Double]("err") shouldBe 0.0
    }
    // withheld window: first emitted day is the 15th of the series
    out.head.getAs[java.sql.Date]("day").toString shouldBe "2026-02-16"
  }

  it("backtest errors reflect a level break the smoother has to chase") {
    val xs = Seq.fill(21)(10.0) ++ Seq.fill(7)(30.0) // step up in week 4
    val out = TimeSeries.holtWintersBacktest(hwDf(xs), "k", "t", "x")
      .orderBy("day").collect()
    val errByDay = out.map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("err")).toMap
    errByDay("2026-02-22") shouldBe 0.0 // last flat day: no surprise
    errByDay("2026-02-23") shouldBe 20.0 +- 1e-6 // the break day: full miss
    // the smoother closes on the new level: later misses shrink
    math.abs(errByDay("2026-03-01")) should be < 20.0
  }

  it("keys shorter than two seasons are dropped, not mis-forecast") {
    TimeSeries.holtWintersForecast(hwDf(Seq.fill(13)(1.0)), "k", "t", "x")
      .collect() shouldBe empty
  }

  // ---- holtWintersSkill ----------------------------------------------

  it("skill on the seasonal fixed point: model MAE 0, naive MAE 0, MASE NULL") {
    val p7 = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 28).map(i => 20.0 + p7(i % 7))
    val out = TimeSeries.holtWintersSkill(hwDf(xs), "k", "t", "x").collect()
    out should have length 1
    val r = out.head
    r.getAs[Long]("n_eval") shouldBe 14L // targets 15..28
    r.getAs[Double]("mae_model") shouldBe 0.0
    r.getAs[Double]("mae_naive") shouldBe 0.0 // x_t = x_{t−7} exactly
    r.isNullAt(r.fieldIndex("mase")) shouldBe true // nothing to beat
  }

  it("skill on a pure linear trend: the smoother beats seasonal-naive (MASE < 1)") {
    val xs = (0 until 28).map(i => 5.0 + 2.0 * i)
    val r = TimeSeries.holtWintersSkill(hwDf(xs), "k", "t", "x").collect().head
    r.getAs[Double]("mae_naive") shouldBe 14.0 // |x_t − x_{t−7}| = 7·slope
    r.getAs[Double]("mase") should be < 1.0
  }

  it("skill on white noise: seasonal-naive is competitive (MASE near 1)") {
    val r0 = new scala.util.Random(31)
    val xs = (0 until 42).map(_ => 50.0 + 3.0 * r0.nextGaussian())
    val r = TimeSeries.holtWintersSkill(hwDf(xs), "k", "t", "x").collect().head
    r.getAs[Double]("mase") should be > 0.4
    r.getAs[Double]("mase") should be < 2.0
  }

  // ---- holtWintersConformal ------------------------------------------

  it("conformal bands on the seasonal fixed point collapse to zero width") {
    val p7 = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 28).map(i => 20.0 + p7(i % 7))
    val out = TimeSeries.holtWintersConformal(hwDf(xs), "k", "t", "x")
      .orderBy("step").collect()
    out should have length 7
    (1 to 7).foreach { j =>
      val r = out(j - 1)
      r.getAs[Long]("n_cal") shouldBe (15L - j) // honest origins 14..(28−j)
      r.getAs[Double]("band") shouldBe 0.0 // every j-step residual is exactly 0
      r.getAs[Double]("lo") shouldBe r.getAs[Double]("forecast")
      r.getAs[Double]("hi") shouldBe r.getAs[Double]("forecast")
    }
  }

  it("conformal forecasts equal the MAE variant's forecasts exactly") {
    val r = new scala.util.Random(5)
    val xs = (0 until 35).map(i =>
      30.0 + 0.4 * i + 3.0 * math.sin(i * 2 * math.Pi / 7) + r.nextGaussian())
    val a = TimeSeries.holtWintersForecast(hwDf(xs), "k", "t", "x").orderBy("step")
      .collect().map(_.getAs[Double]("forecast")).toSeq
    val b = TimeSeries.holtWintersConformal(hwDf(xs), "k", "t", "x").orderBy("step")
      .collect().map(_.getAs[Double]("forecast")).toSeq
    b shouldBe a // same end state, same projection — only the bands differ
  }

  it("conformal bands cover a held-out tail at roughly the nominal level") {
    val r = new scala.util.Random(9)
    // 20 independent keys: train on 63 days, hold out the next 7 — the
    // bands never see the held-out week
    val keys = (0 until 20).map(k => f"k$k%02d")
    val series = keys.map { k =>
      val pat = Seq.tabulate(7)(i => 5.0 * math.sin(i * 2 * math.Pi / 7))
      k -> (0 until 70).map(i => 50.0 + 0.3 * i + pat(i % 7) + 2.0 * r.nextGaussian())
    }.toMap
    val train = keys.flatMap { k =>
      series(k).take(63).zipWithIndex.map { case (x, i) =>
        (k, java.sql.Date.valueOf(java.time.LocalDate.of(2026, 2, 2).plusDays(i.toLong)), x)
      }
    }.toDF("k", "t", "x")
    val bands = TimeSeries.holtWintersConformal(train, "k", "t", "x")
      .collect()
      .map(row => (row.getString(0), row.getInt(1)) ->
        (row.getAs[Double]("lo"), row.getAs[Double]("hi")))
      .toMap
    val hits = for (k <- keys; j <- 1 to 7) yield {
      val actual = series(k)(62 + j)
      val (lo, hi) = bands((k, j))
      if (actual >= lo && actual <= hi) 1 else 0
    }
    val coverage = hits.sum.toDouble / hits.size
    coverage should be >= 0.8 // nominal 0.9; finite-sample wobble allowed
  }

  it("a series of exactly two seasons forecasts with NULL bands (no honest j-step origin)") {
    val p7 = Seq(0.0, 4.0, -4.0, 2.0, -2.0, 6.0, -6.0)
    val xs = (0 until 14).map(i => 20.0 + p7(i % 7))
    val out = TimeSeries.holtWintersConformal(hwDf(xs), "k", "t", "x").collect()
    out should have length 7
    out.foreach { row =>
      row.getAs[Long]("n_cal") shouldBe 0L
      row.isNullAt(row.fieldIndex("band")) shouldBe true
      row.isNullAt(row.fieldIndex("lo")) shouldBe true
    }
  }

  it("overlap counts shrink with |lag| and zero-variance overlaps are NULL") {
    val out = TimeSeries.crossCorrelation(
        dayDf(Seq(1L, 2L, 3L, 4L, 5L), "x"), dayDf(Seq(7L, 7L, 7L, 7L, 7L), "y"),
        "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    out(0)._1 shouldBe 5L
    out(2)._1 shouldBe 3L
    out(-2)._1 shouldBe 3L
    out.values.foreach(_._2 shouldBe true) // constant y: no variance, NULL
  }
}
