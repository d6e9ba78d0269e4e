package graft

import java.nio.file.{Files, Paths}

import graft.operators.{FuzzyJoin, IncrementalFuzzyJoin}
import graft.streaming.StreamingFuzzyJoin

/** Checkpointed streaming fuzzy join: the union of per-batch pair outputs
  * equals the batch edit-distance join over the full corpus, across a
  * stop/restart, and a replayed batch re-derives the identical pairs. */
class StreamingFuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // alpha/alphb/alphc: pairwise distance 1; beta is distance 1 from betb
  // only; gamma matches nothing.
  private val rows1 = Seq((1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "gamma"))
  private val rows2 = Seq((10L, "alphc"), (11L, "betb"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist"))).toSet

  it("streamed pairs across a restart equal the batch join over the union corpus") {
    val recDir = Files.createTempDirectory("graft-fjrec").toString
    val ckpt = Files.createTempDirectory("graft-fjckpt").toString
    val keyDir = Files.createTempDirectory("graft-fjkeys").toString
    val pairsDir = Files.createTempDirectory("graft-fjpairs").toString
    val store = new IncrementalFuzzyJoin.KeyStore(spark, keyDir)

    Files.writeString(Paths.get(recDir, "f1.txt"),
      rows1.map { case (i, s) => s"$i\t$s" }.mkString("", "\n", "\n"))
    val q1 = StreamingFuzzyJoin.fromFiles(spark, recDir, ckpt, store, pairsDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    pairsOf(StreamingFuzzyJoin.pairs(spark, pairsDir)) shouldBe Set((1L, 2L, 1L))

    // records land while the query is DOWN; restart on the same checkpoint
    Files.writeString(Paths.get(recDir, "f2.txt"),
      rows2.map { case (i, s) => s"$i\t$s" }.mkString("", "\n", "\n"))
    val q2 = StreamingFuzzyJoin.fromFiles(spark, recDir, ckpt, store, pairsDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = pairsOf(StreamingFuzzyJoin.pairs(spark, pairsDir))
    val batch = pairsOf(FuzzyJoin.editDistance1Pairs(
      (rows1 ++ rows2).toDF("id", "s"), "id", "s"))
    streamed shouldBe batch
    batch should contain allOf ((1L, 2L, 1L), (1L, 10L, 1L), (2L, 10L, 1L), (3L, 11L, 1L))
  }

  it("a replayed batch re-derives the identical pairs (crash between key append and pair sink)") {
    val keyDir = Files.createTempDirectory("graft-fjrkeys").toString
    val store = new IncrementalFuzzyJoin.KeyStore(spark, keyDir)
    val b0 = rows1.toDF("id", "s")
    IncrementalFuzzyJoin.matchBatch(b0, store, "id", "s", batchId = 0L).count()
    val b1 = rows2.toDF("id", "s")
    val first = pairsOf(IncrementalFuzzyJoin.matchBatch(b1, store, "id", "s", batchId = 1L))
    // replay of the SAME batch id: attempt 1's postings are excluded from
    // the probe side and its append overwrites the same partition
    val replay = pairsOf(IncrementalFuzzyJoin.matchBatch(b1, store, "id", "s", batchId = 1L))
    replay shouldBe first
    first shouldBe Set((1L, 10L, 1L), (2L, 10L, 1L), (3L, 11L, 1L))
  }
}
