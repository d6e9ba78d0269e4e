package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.{functions => F}

import graft.operators.Quantization

/** Round-9 hardening of the binary (1-bit) tier:
  *
  *   - `binaryRerankTopK` reads query vectors from the QUERIES frame, so
  *     a query id absent from the corpus still gets reranked results
  *     (it used to silently vanish — round-8 advice);
  *   - `binarize` fails LOUDLY on vectors narrower than its 64-dim
  *     packing instead of silently zero-padding the code (round-8
  *     advice: element_at past the end yields NULL → 0 bits).
  */
class QuantizationEdgeSpec extends SparkSpec {

  import spark.implicits._

  /** A unit vector of dim 64 concentrated at `axis`, plus small noise at
    * `axis+1` so signs are deterministic. */
  private def v(axis: Int): Array[Float] = {
    val a = Array.fill(64)(-0.01f)
    a(axis) = 1.0f
    a
  }

  private lazy val corpus = Seq(
    (0L, v(0)), (1L, v(1)), (2L, v(2)), (3L, v(3)), (4L, v(0))
  ).toDF("vec_id", "embedding")

  it("binaryRerankTopK serves query ids that are NOT in the corpus") {
    // qid 100 exists only in the queries frame; its vector matches axis 0
    val queries = Seq((100L, v(0))).toDF("vec_id", "embedding")
    val out = Quantization
      .binaryRerankTopK(corpus, queries, "vec_id", "embedding", shortlist = 4, k = 2)
      .orderBy("qid", "rn").collect()
    out.length shouldBe 2
    out.map(_.getLong(0)).distinct shouldBe Array(100L)
    // nearest candidates are the two axis-0 corpus vectors
    out.map(_.getLong(1)).toSet shouldBe Set(0L, 4L)
  }

  it("binarize raises on vectors narrower than the 64-dim packing") {
    val short = Seq((0L, Array.fill(32)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Quantization.binarize(short, "vec_id", "embedding").collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    withClue(s"expected the loud dimension error, got: $e") {
      chain(e).exists(_.contains("binarize: expected >= 32-dim")) ||
        chain(e).exists(_.contains("binarize: expected >= 64-dim")) shouldBe true
    }
  }

  // ---- per-dim asymmetric SQ8 ----------------------------------------

  it("sq8 calibration is the per-dim range and codes hit the exact endpoints") {
    val calib = Quantization.sq8Calibrate(corpus, "embedding")
    calib.length shouldBe 64
    // dim 0: values {1.0, -0.01} over the corpus -> min -0.01, scale 1.01/255
    calib(0)._1 shouldBe -0.01 +- 1e-9
    calib(0)._2 shouldBe (1.0 - -0.01f.toDouble) / 255.0 +- 1e-9
    // dims 5..63 are constant -0.01 -> degenerate scale 1, code 0
    // (the model is 9-snapped, so the float noise rounds to -0.01 exactly)
    calib(10) shouldBe ((-0.01, 1.0))
    val stats = Quantization.sq8Stats(corpus, "vec_id", "embedding", calib)
      .collect().map(r => r.getLong(0) -> r).toMap
    // vector 0 peaks at dim 0: its code there is exactly 255; everything
    // else in it sits at each dim's min -> code 0
    stats(0L).getAs[Int]("q_max") shouldBe 255
    stats(0L).getAs[Long]("n_hi") shouldBe 1L
    stats(0L).getAs[Long]("n_lo") shouldBe 63L
    // endpoints reconstruct exactly; only interior values carry error
    stats.values.foreach(_.getAs[Double]("recon_mae") should be < 1e-6)
  }

  it("sq8 reconstruction error is bounded by half a level per dimension") {
    val r = new scala.util.Random(11)
    val df = (0L until 50L).map(i => (i, Array.fill(64)(r.nextFloat() * 4 - 2)))
      .toDF("vec_id", "embedding")
    val calib = Quantization.sq8Calibrate(df, "embedding")
    val maxScale = calib.map(_._2).max
    val stats = Quantization.sq8Stats(df, "vec_id", "embedding", calib).collect()
    stats.foreach(_.getAs[Double]("recon_mae") should be <= maxScale / 2 + 1e-9)
  }

  it("sq8 asymmetric-distance top-k agrees with exact inner product on dequantized vectors") {
    val r = new scala.util.Random(13)
    val vecs = (0L until 40L).map(i => i -> Array.fill(64)(r.nextFloat() * 2 - 1)).toMap
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val calib = Quantization.sq8Calibrate(df, "embedding")
    val out = Quantization.sq8TopK(df, df.filter(F.col("vec_id") < 2),
        "vec_id", "embedding", calib, k = 3)
      .collect().map(r0 => (r0.getLong(0), r0.getAs[Int]("rn").toLong) -> r0.getLong(1)).toMap
    // driver-side replay: dequantize with the same model, exact IP, same ranking
    def code(x: Double, d: Int) = {
      val (m, s) = calib(d)
      math.max(0.0, math.min(255.0, math.round((x - m) / s).toDouble))
    }
    def deq(id: Long) = vecs(id).zipWithIndex.map { case (x, d) =>
      calib(d)._1 + code(x.toDouble, d) * calib(d)._2 }
    for (qid <- Seq(0L, 1L)) {
      val want = vecs.keys.filter(_ != qid).map { cid =>
        val ip = vecs(qid).map(_.toDouble).zip(deq(cid)).map { case (a, b) => a * b }.sum
        cid -> BigDecimal(ip).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq.sortBy { case (cid, ip) => (-ip, cid) }.take(3).map(_._1)
      (1 to 3).map(rn => out((qid, rn.toLong))) shouldBe want
    }
  }
}
