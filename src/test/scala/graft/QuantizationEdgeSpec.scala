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
}
