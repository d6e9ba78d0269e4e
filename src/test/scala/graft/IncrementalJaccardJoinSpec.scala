package graft

import java.nio.file.Files

import graft.operators.{FuzzyJoin, IncrementalJaccardJoin}

/** Incremental exact Jaccard join: the union of per-batch outputs must
  * equal the one-shot prefix join over the full corpus (the frozen token
  * order is a different — but still total — order, so the prefix theorem
  * gives the same exact pair set), and a same-batch-id replay must
  * re-derive identical pairs. */
class IncrementalJaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  // near-dup clusters across batches plus unrelated docs; tau = 1/2
  private val b0 = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma epsilon"),
    (3L, "one two three four five six"),
    (4L, "unrelated words entirely here"))
  private val b1 = Seq(
    (10L, "alpha beta gamma zeta"),
    (11L, "one two three four five seven"),
    (12L, "fresh tokens only appearing now"))
  private val b2 = Seq(
    (20L, "fresh tokens only appearing today"),
    (21L, "alpha beta gamma delta")) // exact dup of 1

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jac"))).toSet

  it("union of per-batch outputs equals the one-shot batch join over the full corpus") {
    val store = new IncrementalJaccardJoin.Store(
      spark, Files.createTempDirectory("graft-ijacc").toString)
    val out0 = pairsOf(IncrementalJaccardJoin.matchBatch(
      b0.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 0L))
    val out1 = pairsOf(IncrementalJaccardJoin.matchBatch(
      b1.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 1L))
    val out2 = pairsOf(IncrementalJaccardJoin.matchBatch(
      b2.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 2L))
    val batch = pairsOf(FuzzyJoin.jaccardPrefixJoin(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", 1, 2))
    (out0 ++ out1 ++ out2) shouldBe batch
    // sanity on the shape: cross-batch, within-batch, and exact-dup pairs
    batch should contain ((1L, 21L, 1.0))  // exact duplicate across batches
    batch should contain ((1L, 2L, 0.6))   // within-batch near-dup
    batch should contain ((1L, 10L, 0.6))  // cross-batch near-dup
    out1 should not be empty
  }

  it("streamed pairs across a restart equal the one-shot batch join") {
    val docsDir = Files.createTempDirectory("graft-sjacc-docs").toString
    val ckpt = Files.createTempDirectory("graft-sjacc-ckpt").toString
    val pairsDir = Files.createTempDirectory("graft-sjacc-pairs").toString
    val store = new IncrementalJaccardJoin.Store(
      spark, Files.createTempDirectory("graft-sjacc-store").toString)

    java.nio.file.Files.writeString(java.nio.file.Paths.get(docsDir, "f1.txt"),
      b0.map { case (i, s) => s"$i\t$s" }.mkString("", "\n", "\n"))
    val q1 = graft.streaming.StreamingJaccardJoin.fromFiles(
      spark, docsDir, ckpt, store, pairsDir, 1, 2, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()

    // documents land while the query is DOWN; restart on the same checkpoint
    java.nio.file.Files.writeString(java.nio.file.Paths.get(docsDir, "f2.txt"),
      (b1 ++ b2).map { case (i, s) => s"$i\t$s" }.mkString("", "\n", "\n"))
    val q2 = graft.streaming.StreamingJaccardJoin.fromFiles(
      spark, docsDir, ckpt, store, pairsDir, 1, 2, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = pairsOf(graft.streaming.StreamingJaccardJoin.pairs(spark, pairsDir))
    val batch = pairsOf(FuzzyJoin.jaccardPrefixJoin(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", 1, 2))
    streamed shouldBe batch
  }

  it("a same-batch-id replay re-derives identical pairs and identical vocabulary") {
    val store = new IncrementalJaccardJoin.Store(
      spark, Files.createTempDirectory("graft-ijacc-replay").toString)
    IncrementalJaccardJoin.matchBatch(
      b0.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 0L).count()
    val first = pairsOf(IncrementalJaccardJoin.matchBatch(
      b1.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 1L))
    val vocabFirst = store.vocab.collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("tid"))).toSet
    val replay = pairsOf(IncrementalJaccardJoin.matchBatch(
      b1.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 1L))
    replay shouldBe first
    store.vocab.collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("tid"))).toSet shouldBe vocabFirst
    // and a later batch still matches the full prior corpus
    val out2 = pairsOf(IncrementalJaccardJoin.matchBatch(
      b2.toDF("doc_id", "text"), store, "doc_id", "text", 1, 2, batchId = 2L))
    out2 should contain ((1L, 21L, 1.0))
  }
}
