package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.RecordLinkage

/** Fellegi-Sunter scoring: agreement adds ln(m/u), disagreement adds
  * ln((1-m)/(1-u)), and the three-way decision respects the thresholds. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val m = Seq(0.9, 0.8)
  private val u = Seq(0.1, 0.4)

  it("sums per-field log-likelihood ratios by agreement pattern") {
    val df = Seq((true, true), (true, false), (false, false))
      .toDF("a1", "a2")
    val w = RecordLinkage.weight(Seq(F.col("a1"), F.col("a2")), m, u)
    val got = df.select(F.round(w, 6).as("w")).collect().map(_.getDouble(0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val agree = m.indices.map(i => math.log(m(i) / u(i)))
    val disagree = m.indices.map(i => math.log((1 - m(i)) / (1 - u(i))))
    got(0) shouldBe r6(agree(0) + agree(1))
    got(1) shouldBe r6(agree(0) + disagree(1))
    got(2) shouldBe r6(disagree(0) + disagree(1))
    got(0) should be > got(1)
    got(1) should be > got(2)
  }

  it("classifies against the upper/lower thresholds inclusively") {
    val df = Seq(3.0, 2.99, 0.0, -0.01).toDF("w")
    val d = df.select(RecordLinkage.decision(F.col("w"), 3.0, 0.0).as("d"))
      .collect().map(_.getString(0))
    d shouldBe Array("match", "possible", "non_match", "non_match")
  }

  it("rejects malformed models") {
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.weight(Seq(F.lit(true)), Seq(0.9, 0.8), Seq(0.1, 0.4))
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.weight(Seq(F.lit(true)), Seq(1.0), Seq(0.1))
  }
}
