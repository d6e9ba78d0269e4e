package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(0.25f, -1.5f, 3.75f, 0.125f)),
    (1L, Array(1.0f, 2.0f, -0.5f, 4.25f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  it("native fv_dot is bit-identical to the HOF formulation") {
    val out = vecs.as("a").crossJoin(vecs.as("b")).select(
      VectorFunctions.fvDot($"a.embedding", $"b.embedding").as("native"),
      Similarity.dot($"a.embedding", $"b.embedding").as("hof")).collect()
    out.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  it("computes the expected dot product") {
    val d = vecs.filter($"vec_id" === 0L).crossJoin(vecs.filter($"vec_id" === 1L).select($"embedding".as("b")))
      .select(VectorFunctions.fvDot($"embedding", $"b")).collect()(0).getDouble(0)
    d shouldBe (0.25 * 1.0 + -1.5 * 2.0 + 3.75 * -0.5 + 0.125 * 4.25) +- 1e-12
  }

  it("null array yields null; registered SQL function works") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT fv_dot(embedding, embedding) AS d FROM v WHERE vec_id = 1").collect()(0)
    r.getDouble(0) shouldBe (1.0 + 4.0 + 0.25 + 18.0625) +- 1e-12
    val n = vecs.select(VectorFunctions.fvDot(F.lit(null).cast("array<float>"), $"embedding")).collect()
    n.foreach(_.isNullAt(0) shouldBe true)
  }

  it("participates in whole-stage codegen (parquet-backed pipeline)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorFunctions.fvDot($"embedding", $"embedding").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) { plan should include("*(") }
  }
}
