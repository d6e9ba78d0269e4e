package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.operators.{IncrementalSemanticDedup, Similarity}

/** Ingest-time semantic dedup across batches — the embedding twin of
  * IncrementalDedupSpec: survivors' cell memberships persist against a
  * FROZEN centroid model, later batches dedup only against accumulated
  * same-cell members, and incremental processing matches the batch job.
  *
  * Fixture: 64-dim vectors in TIGHT duplicate groups (every intra-group
  * cosine ≈ 1 ≥ 0.9, every cross-group cosine ≈ 0) with ids assigned in
  * arrival order — the shape real ingest has, where first-seen = min-id
  * and incremental(b1, b2) ≡ batch(b1 ∪ b2) holds exactly. */
class IncrementalSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** group g, member m: basis vector e_{3g} plus a tiny distinct nudge on
    * a far coordinate — intra-group cos ≈ 1, cross-group cos ≈ 0. */
  private def vec(g: Int, m: Int): Array[Float] = {
    val a = Array.fill(dim)(0.0f)
    a(3 * g) = 1.0f
    a(40 + m) = 0.01f
    a
  }

  // groups: {1,2,10} ; {3,11} ; {4} ; {12}  (ids in arrival order: batch1
  // carries 1..4, batch2 carries 10..12)
  private def all: DataFrame = Seq(
    (1L, vec(0, 0)), (2L, vec(0, 1)), (3L, vec(1, 0)), (4L, vec(2, 0)),
    (10L, vec(0, 2)), (11L, vec(1, 1)), (12L, vec(3, 0))
  ).toDF("vec_id", "embedding")
  private def batch1: DataFrame = all.filter(F.col("vec_id") < 10)
  private def batch2: DataFrame = all.filter(F.col("vec_id") >= 10)

  // the FROZEN model: trained once on the first corpus slice, snapped —
  // the AnnIndexStore lifecycle (assignment never shifts under replay)
  private lazy val cents = Similarity.snapCentroids(
    Similarity.trainIvfCentroids(all, "vec_id", "embedding", kC = 4, dim = dim))

  private def newStore() = {
    val st = new IncrementalSemanticDedup.CellStore(
      spark, Files.createTempDirectory("graft-semdedup").toString)
    st.init()
    st
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq.sorted

  it("incremental(b1, b2) keeps exactly batch(b1 UNION b2)'s representatives") {
    val st = newStore()
    val k1 = ids(IncrementalSemanticDedup.dedupBatch(
      batch1, st, "vec_id", "embedding", cents, minCos = 0.9))
    val k2 = ids(IncrementalSemanticDedup.dedupBatch(
      batch2, st, "vec_id", "embedding", cents, minCos = 0.9))
    val batchReps = Similarity.semanticDedup(all, "vec_id", "embedding", cents, minCos = 0.9)
      .filter(F.col("kept")).select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    (k1 ++ k2).sorted shouldBe batchReps
    batchReps shouldBe Seq(1L, 3L, 4L, 12L)
  }

  it("keeps one representative per group within a batch (smallest id)") {
    val st = newStore()
    ids(IncrementalSemanticDedup.dedupBatch(
      batch1, st, "vec_id", "embedding", cents, minCos = 0.9)) shouldBe Seq(1L, 3L, 4L)
  }

  it("drops later-batch near-dups of already-kept vectors, not fresh content") {
    val st = newStore()
    IncrementalSemanticDedup.dedupBatch(batch1, st, "vec_id", "embedding", cents, 0.9)
    // 10 dups group {1,2}; 11 dups {3}; 12 is new
    ids(IncrementalSemanticDedup.dedupBatch(
      batch2, st, "vec_id", "embedding", cents, 0.9)) shouldBe Seq(12L)
  }

  it("is idempotent under batch replay (at-least-once delivery)") {
    val st = newStore()
    IncrementalSemanticDedup.dedupBatch(batch1, st, "vec_id", "embedding", cents, 0.9)
      .count() shouldBe 3L
    // a blind replay collides with its own stored members and drops out
    IncrementalSemanticDedup.dedupBatch(batch1, st, "vec_id", "embedding", cents, 0.9)
      .count() shouldBe 0L
  }

  it("replay-STABLE form re-yields the SAME survivors for the same batch id") {
    val st = newStore()
    val once = ids(IncrementalSemanticDedup.dedupBatchIdempotent(
      batch1, st, "vec_id", "embedding", cents, 0.9, batchId = 7L))
    val replay = ids(IncrementalSemanticDedup.dedupBatchIdempotent(
      batch1, st, "vec_id", "embedding", cents, 0.9, batchId = 7L))
    replay shouldBe once
    once shouldBe Seq(1L, 3L, 4L)
    // and a LATER batch still collides with batch 7's survivors
    ids(IncrementalSemanticDedup.dedupBatchIdempotent(
      batch2, st, "vec_id", "embedding", cents, 0.9, batchId = 8L)) shouldBe Seq(12L)
  }

  it("only survivors' memberships are persisted (dropped vectors never poison the store)") {
    val st = newStore()
    IncrementalSemanticDedup.dedupBatch(batch1, st, "vec_id", "embedding", cents, 0.9)
    st.members.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L, 4L)
  }

  it("streaming twin: MemoryStream micro-batches equal the batch job end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = newStore()
    val survivorsDir = Files.createTempDirectory("graft-semdedup-out").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = graft.streaming.StreamingSemanticDedup.attach(
      stream, Files.createTempDirectory("graft-semdedup-ckpt").toString,
      st, survivorsDir, cents, minCos = 0.9, triggerMillis = 50L)
    try {
      def rows(df: DataFrame) = df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      input.addData(rows(batch1)); q.processAllAvailable()
      input.addData(rows(batch2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingSemanticDedup.survivors(spark, survivorsDir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    streamed shouldBe Seq(1L, 3L, 4L, 12L)
  }
}
