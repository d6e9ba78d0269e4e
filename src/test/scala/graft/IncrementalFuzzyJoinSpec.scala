package graft

import java.nio.file.Files

import graft.operators.{FuzzyJoin, IncrementalFuzzyJoin}

/** Incremental entity resolution: per-batch matching against the
  * accumulated key store must equal the batch operator over the union,
  * and an at-least-once replay must be a no-op. */
class IncrementalFuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val names1 = Seq(
    (1L, "acct-0001"), (2L, "acct-0002"), (3L, "zzz-link"))
  private val names2 = Seq(
    (10L, "acct-0001"),  // exact dup of 1
    (11L, "acct-00012"), // insertion vs 1 and 2
    (12L, "zz-link"),    // deletion vs 3
    (13L, "unrelated-name"))

  it("union of per-batch matches equals the batch join over the full corpus") {
    val store = new IncrementalFuzzyJoin.KeyStore(
      spark, Files.createTempDirectory("graft-ifz").toString)
    val b1 = names1.toDF("id", "name")
    val b2 = names2.toDF("id", "name")
    val p1 = IncrementalFuzzyJoin.matchBatch(b1, store, "id", "name", 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p2 = IncrementalFuzzyJoin.matchBatch(b2, store, "id", "name", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val full = FuzzyJoin.editDistance1Pairs((names1 ++ names2).toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (p1 ++ p2).sorted shouldBe full.sorted
    p2.map(p => (p._1, p._2)) should contain allOf ((1L, 10L), (3L, 12L), (1L, 11L))
  }

  it("replaying a batch re-emits identical pairs and leaves the store unchanged") {
    val store = new IncrementalFuzzyJoin.KeyStore(
      spark, Files.createTempDirectory("graft-ifz2").toString)
    val b1 = names1.toDF("id", "name")
    val b2 = names2.toDF("id", "name")
    IncrementalFuzzyJoin.matchBatch(b1, store, "id", "name", 0L).count()
    val first = IncrementalFuzzyJoin.matchBatch(b2, store, "id", "name", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val storeRows = store.postings.count()
    val replay = IncrementalFuzzyJoin.matchBatch(b2, store, "id", "name", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    replay shouldBe first
    store.postings.count() shouldBe storeRows
  }
}
