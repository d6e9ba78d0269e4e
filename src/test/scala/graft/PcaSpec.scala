package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{Pca, TimeSeries}

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
