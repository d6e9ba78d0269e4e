package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.operators.{IncrementalEmbedOutliers, Similarity}

/** Ingest-time embedding-outlier scoring across batches — the asymmetric
  * family member: scoring runs once per vector against a FROZEN model,
  * only slim (id, max_sim) rows persist, and the corpus-wide percentile
  * threshold is recomputed per flag read, so incremental(b1, b2) equals
  * batch(b1 ∪ b2) EXACTLY (no transitive cross-batch caveat — outliers
  * have no graph structure).
  *
  * Fixture: a few tight clusters on basis axes (well explained by the
  * trained centroids, max_sim ≈ 1) plus deliberate off-model noise rows
  * (diagonal directions no centroid points at). */
class IncrementalEmbedOutliersSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def axisVec(g: Int, m: Int): Array[Float] = {
    val a = Array.fill(dim)(0.0f)
    a(3 * g) = 1.0f
    a(40 + m) = 0.01f
    a
  }
  /** noise: flat diagonal across many dims — low cosine to every axis
    * centroid. Distinct seeds keep rows distinct. */
  private def noiseVec(seed: Int): Array[Float] = {
    val a = Array.tabulate(dim)(i => if ((i + seed) % 2 == 0) 0.3f else -0.3f)
    a(seed % dim) = 0.35f
    a
  }

  // 20 inliers across 4 groups + 2 noise rows per batch slice
  private def all: DataFrame = {
    val inliers = for (g <- 0 until 4; m <- 0 until 5)
      yield ((g * 5 + m + 1).toLong, axisVec(g, m))
    val noise = Seq((100L, noiseVec(1)), (101L, noiseVec(2)),
      (102L, noiseVec(3)), (103L, noiseVec(4)))
    (inliers ++ noise).toDF("vec_id", "embedding")
  }
  private def batch1: DataFrame = all.filter(F.col("vec_id") <= 10 || F.col("vec_id").isin(100L, 101L))
  private def batch2: DataFrame = all.filter(!(F.col("vec_id") <= 10 || F.col("vec_id").isin(100L, 101L)))

  // the FROZEN model trains on the clean reference slice (inliers only) —
  // the production lifecycle, and it keeps the centroids on the axis
  // clusters so off-model noise actually scores low
  private lazy val cents = Similarity.snapCentroids(
    Similarity.trainIvfCentroids(all.filter(F.col("vec_id") < 100),
      "vec_id", "embedding", kC = 4, dim = dim))

  private def newStore() = {
    val st = new IncrementalEmbedOutliers.ScoreStore(
      spark, Files.createTempDirectory("graft-embout").toString)
    st.init()
    st
  }

  /** The batch q_embed_outliers computation, verbatim. */
  private def batchFlags(df: DataFrame, q: Double): Map[Long, (Double, Boolean)] = {
    val scored = df.select(F.col("vec_id"),
      Similarity.maxCellSim(F.col("embedding"), cents).as("max_sim"))
    val thr = scored.agg(F.expr(s"percentile(max_sim, $q)").as("thr"))
    scored.crossJoin(F.broadcast(thr))
      .select(F.col("vec_id"), F.col("max_sim"), (F.col("max_sim") < F.col("thr")).as("is_outlier"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
  }

  private def incFlags(st: IncrementalEmbedOutliers.ScoreStore, q: Double): Map[Long, (Double, Boolean)] =
    IncrementalEmbedOutliers.flags(st, q).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap

  it("incremental(b1, b2) flags exactly batch(b1 UNION b2) — scores bit-identical") {
    val st = newStore()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    IncrementalEmbedOutliers.scoreBatch(batch2, st, "vec_id", "embedding", cents, batchId = 2L)
    incFlags(st, 0.10) shouldBe batchFlags(all, 0.10)
  }

  it("the threshold MOVES with new data: flags after b1 differ from flags after b1+b2") {
    val st = newStore()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    val after1 = incFlags(st, 0.10)
    after1 shouldBe batchFlags(batch1, 0.10)
    IncrementalEmbedOutliers.scoreBatch(batch2, st, "vec_id", "embedding", cents, batchId = 2L)
    val after2 = incFlags(st, 0.10)
    // b1's rows are re-judged under the union threshold — the reason the
    // flag read recomputes instead of freezing the early cutoff
    after2.keySet should contain allElementsOf after1.keySet
    after2 shouldBe batchFlags(all, 0.10)
  }

  it("noise rows are the ones flagged at a separating quantile") {
    val st = newStore()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    IncrementalEmbedOutliers.scoreBatch(batch2, st, "vec_id", "embedding", cents, batchId = 2L)
    val flagged = incFlags(st, 0.16).collect { case (id, (_, true)) => id }.toSet
    flagged shouldBe Set(100L, 101L, 102L, 103L)
  }

  it("is replay-stable: re-scoring the same batch id appends nothing") {
    val st = newStore()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    val once = st.scores.count()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    st.scores.count() shouldBe once
    incFlags(st, 0.10) shouldBe batchFlags(batch1, 0.10)
  }

  it("stores only slim score rows, never the embeddings") {
    val st = newStore()
    IncrementalEmbedOutliers.scoreBatch(batch1, st, "vec_id", "embedding", cents, batchId = 1L)
    st.scores.columns.toSeq shouldBe Seq("id", "max_sim", "batch_id")
  }

  it("streaming twin: MemoryStream micro-batches flag exactly like the batch job") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = newStore()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = graft.streaming.StreamingEmbedOutliers.attach(
      stream, Files.createTempDirectory("graft-embout-ckpt").toString,
      st, cents, triggerMillis = 50L)
    try {
      def rows(df: DataFrame) = df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      input.addData(rows(batch1)); q.processAllAvailable()
      input.addData(rows(batch2)); q.processAllAvailable()
    } finally q.stop()
    incFlags(st, 0.10) shouldBe batchFlags(all, 0.10)
  }
}
