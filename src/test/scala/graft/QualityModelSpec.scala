package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.QualityModel

/** The learned quality filter: distributed logistic-regression training
  * (one combinable gradient aggregate per iteration) must actually learn,
  * snap to literal-embeddable weights, and score as pure column algebra. */
class QualityModelSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .withColumn("y", F.when(F.col("source") === "src0", 1).otherwise(0))

  it("training reduces log-loss vs the zero model and snaps the weights") {
    val w = QualityModel.train(docs, "text", "y")
    w should have length QualityModel.nFeatures
    w.foreach { x =>
      x.isNaN shouldBe false
      // snapped to 6 decimals: scaling by 1e6 yields an integral value
      (x * 1e6) shouldBe math.round(x * 1e6).toDouble +- 1e-6
    }
    val zero = QualityModel.logLoss(docs, "text", "y", Array.fill(QualityModel.nFeatures)(0.0))
    val trained = QualityModel.logLoss(docs, "text", "y", w)
    info(f"log-loss: zero model $zero%.4f -> trained $trained%.4f")
    trained should be < zero
  }

  it("score matches a driver-side replay of the same literal arithmetic") {
    val w = QualityModel.train(docs, "text", "y", iters = 5)
    val scored = QualityModel.score(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val sample = docs.select("doc_id", "text").orderBy("doc_id").limit(10).collect()
    sample.foreach { r =>
      val text = r.getString(1)
      val toks = text.split(" ", -1)
      val n = toks.length.toDouble
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val f = Array(
        1.0,
        r4(toks.distinct.length / n),
        r4(toks.count(Set("the", "a", "of", "and")) / n),
        r4(((text.length - (n - 1)) / n) / 10.0),
        r4(math.min(n, 200.0) / 200.0))
      val z = f.zip(w).map { case (a, b) => a * b }.reduceLeft(_ + _)
      val p = r4(1.0 / (1.0 + math.exp(-z)))
      val (score, keep) = scored(r.getLong(0))
      score shouldBe p
      keep shouldBe (p >= 0.5)
    }
  }
}
