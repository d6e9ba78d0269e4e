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

  it("matches the HOF form on edge cases: unequal lengths and null elements both yield null") {
    val edgy = Seq(
      (0L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),  // clean
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)),        // unequal length
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f))   // null element
    ).toDF("id", "a", "b")
    val out = edgy.select(
      $"id",
      VectorFunctions.fvDot($"a", $"b").as("native"),
      Similarity.dot($"a", $"b").as("hof")).collect()
    out.foreach { r =>
      withClue(s"id=${r.getLong(0)}:") {
        r.isNullAt(1) shouldBe r.isNullAt(2)
        if (!r.isNullAt(1)) r.getDouble(1) shouldBe r.getDouble(2)
      }
    }
    out.filter(_.getLong(0) > 0L).foreach(_.isNullAt(1) shouldBe true)
  }

  it("fd_dot / fd_distsq match the unrolled literal arithmetic bit-for-bit") {
    val w = Array(0.5, -2.25, 1.125, 3.0)
    val rows = vecs.select(
      $"embedding",
      VectorFunctions.fdDot($"embedding", F.typedlit(w.toSeq)).as("d"),
      VectorFunctions.fdDistSq($"embedding", F.typedlit(w.toSeq)).as("q")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val expDot = v.indices.map(i => v(i).toDouble * w(i)).reduceLeft(_ + _)
      val expDist = v.indices.map { i => val d = v(i).toDouble - w(i); d * d }.reduceLeft(_ + _)
      java.lang.Double.doubleToLongBits(r.getDouble(1)) shouldBe
        java.lang.Double.doubleToLongBits(expDot)
      java.lang.Double.doubleToLongBits(r.getDouble(2)) shouldBe
        java.lang.Double.doubleToLongBits(expDist)
    }
  }

  it("fd_dot / fd_distsq null out on length mismatch and null inputs") {
    val w3 = F.typedlit(Seq(1.0, 2.0, 3.0)) // 3-dim model vs 4-dim vectors
    vecs.select(VectorFunctions.fdDot($"embedding", w3)).collect()
      .foreach(_.isNullAt(0) shouldBe true)
    vecs.select(VectorFunctions.fdDistSq($"embedding", w3)).collect()
      .foreach(_.isNullAt(0) shouldBe true)
    vecs.select(VectorFunctions.fdDot(F.lit(null).cast("array<float>"), F.typedlit(Seq(1.0))))
      .collect().foreach(_.isNullAt(0) shouldBe true)
  }

  it("NativeDotRule rewrites the portable HOF dot into the native kernel (Rule[LogicalPlan])") {
    VectorFunctions.installDotRewrite(spark)
    // parquet-backed: a local relation would be constant-folded away
    // before the plan assertion could see anything
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select($"vec_id", Similarity.dot($"embedding", $"embedding").as("d"))
    df.queryExecution.optimizedPlan.toString should include("fv_dot")
    // results unchanged by the rewrite (bit-identical accumulation)
    val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = emb.select($"vec_id", VectorFunctions.fvDot($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rewritten shouldBe native
    // cosineHof end-to-end now runs on the kernel too
    val cos = emb.select(Similarity.cosineHof($"embedding", $"embedding").as("c"))
    cos.queryExecution.optimizedPlan.toString should include("fv_dot")
    // double arrays are NOT rewritten (kernel is float-only)
    val dbl = emb.select(F.transform($"embedding", _.cast("double")).as("v"))
      .select(Similarity.dot($"v", $"v").as("d"))
    dbl.queryExecution.optimizedPlan.toString should not include "fv_dot"
  }

  it("NativeDotRule does NOT match look-alike lambdas (sum of squares, degenerate merge)") {
    VectorFunctions.installDotRewrite(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // (x, y) -> x * x zipped against ANOTHER array is a sum of squares of
    // the left side, not a dot product — must stay un-rewritten
    val sumSq = emb.select($"vec_id",
      F.aggregate(
        F.zip_with($"embedding", $"embedding", (x, _) => x.cast("double") * x.cast("double")),
        F.lit(0.0), (acc, v) => acc + v).as("s"))
    sumSq.queryExecution.optimizedPlan.toString should not include "fv_dot"
    // ...and it computes the actual sum of squares, same as fv_dot(v, v)
    val bySq = sumSq.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byDot = emb.select($"vec_id", VectorFunctions.fvDot($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    bySq shouldBe byDot // equal here because both sides are the same array
    // (acc, v) -> acc + acc is not a sum — must stay un-rewritten
    val degenerate = emb.select(
      F.aggregate(
        F.zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
        F.lit(0.0), (acc, _) => acc + acc).as("s"))
    degenerate.queryExecution.optimizedPlan.toString should not include "fv_dot"
    degenerate.collect().foreach(_.getDouble(0) shouldBe 0.0) // 0 doubled forever
  }

  it("participates in whole-stage codegen (parquet-backed pipeline)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorFunctions.fvDot($"embedding", $"embedding").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) { plan should include("*(") }
  }

  it("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import org.apache.spark.sql.{functions => F}
    val rnd = new scala.util.Random(7)
    def arr() = (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(40)}").distinct.sorted
    val rows = (0 until 200).map(_ => (arr(), arr()))
    val df = rows.toDF("a", "b").select(
      org.apache.spark.sql.graftnative.SetFunctions
        .sortedIntersectCount(F.col("a"), F.col("b")).as("native"),
      F.size(F.array_intersect(F.col("a"), F.col("b"))).as("builtin"))
    df.filter(F.col("native") =!= F.col("builtin")).count() shouldBe 0L
    // empty sides
    Seq((Seq.empty[String], Seq("x"))).toDF("a", "b").select(
      org.apache.spark.sql.graftnative.SetFunctions
        .sortedIntersectCount(F.col("a"), F.col("b")).as("c"))
      .collect()(0).getInt(0) shouldBe 0
  }

  it("sorted_intersect_count_long equals size(array_intersect) on sorted distinct long arrays") {
    import org.apache.spark.sql.{functions => F}
    val rnd = new scala.util.Random(11)
    def arr() = (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong).distinct.sorted
    val rows = (0 until 200).map(_ => (arr(), arr()))
    val df = rows.toDF("a", "b").select(
      org.apache.spark.sql.graftnative.SetFunctions
        .sortedIntersectCountLong(F.col("a"), F.col("b")).as("native"),
      F.size(F.array_intersect(F.col("a"), F.col("b"))).as("builtin"))
    df.filter(F.col("native") =!= F.col("builtin")).count() shouldBe 0L
    Seq((Seq.empty[Long], Seq(3L))).toDF("a", "b").select(
      org.apache.spark.sql.graftnative.SetFunctions
        .sortedIntersectCountLong(F.col("a"), F.col("b")).as("c"))
      .collect()(0).getInt(0) shouldBe 0
  }
}
