package graft

import java.nio.file.{Files, Paths}

import graft.operators.IncrementalDedup
import graft.streaming.StreamingDedup

/** Checkpointed streaming dedup: survivors are exactly-once across a
  * stop/restart, and a replayed batch (at-least-once foreachBatch)
  * re-yields the identical survivor set instead of losing or duplicating
  * rows. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "completely different content about spark engines and shuffles here today"
  private val textC = "yet another unrelated document concerning parquet footers and row groups"

  private def dirs() = (
    Files.createTempDirectory("graft-sdocs").toString,
    Files.createTempDirectory("graft-sckpt").toString,
    Files.createTempDirectory("graft-sbuck").toString,
    Files.createTempDirectory("graft-ssurv").toString)

  it("dedups a document stream across a restart with no lost or duplicated survivors") {
    val (docsDir, ckpt, buckDir, survDir) = dirs()
    val store = new IncrementalDedup.BucketStore(spark, buckDir)
    store.init()

    Files.writeString(Paths.get(docsDir, "f1.txt"),
      s"1\t$textA\n2\t$textA\n3\t$textB\n")
    val q1 = StreamingDedup.fromDocFiles(spark, docsDir, ckpt, store, survDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    StreamingDedup.survivors(spark, survDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)

    // documents land while the query is DOWN; restart on the same checkpoint
    Files.writeString(Paths.get(docsDir, "f2.txt"),
      s"10\t$textA\n11\t$textC\n")
    val q2 = StreamingDedup.fromDocFiles(spark, docsDir, ckpt, store, survDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()
    // 10 near-dups the already-kept doc 1; 11 is new — exactly once each
    StreamingDedup.survivors(spark, survDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L, 11L)
  }

  it("a replayed batch re-yields the SAME survivors (crash between bucket append and sink write)") {
    val buckDir = Files.createTempDirectory("graft-rbuck").toString
    val store = new IncrementalDedup.BucketStore(spark, buckDir)
    store.init()
    val batch = Seq((1L, textA), (2L, textA), (3L, textB)).toDF("doc_id", "text")
    val first = IncrementalDedup.dedupBatchIdempotent(batch, store, "doc_id", "text", batchId = 7L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    first shouldBe Array(1L, 3L)
    // replay of the SAME batch id: buckets from attempt 1 are excluded from
    // the collision check, so the survivor set is identical, not empty
    val replay = IncrementalDedup.dedupBatchIdempotent(batch, store, "doc_id", "text", batchId = 7L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    replay shouldBe first
    // and a LATER batch still dedups against the stored corpus correctly
    val next = IncrementalDedup.dedupBatchIdempotent(
      Seq((20L, textA), (21L, textC)).toDF("doc_id", "text"), store, "doc_id", "text", batchId = 8L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    next shouldBe Array(21L)
  }

  it("short documents (no shingles) are still dedup-covered via the exact-content bucket row") {
    val buckDir = Files.createTempDirectory("graft-shbuck").toString
    val store = new IncrementalDedup.BucketStore(spark, buckDir)
    store.init()
    val tiny = "ok bye" // 2 tokens < shingle width 3 -> no minhash buckets
    IncrementalDedup.dedupBatch(Seq((1L, tiny)).toDF("doc_id", "text"), store, "doc_id", "text")
      .count() shouldBe 1L
    // an exact replay of the same content is suppressed by the band=-1 row
    IncrementalDedup.dedupBatch(Seq((2L, tiny)).toDF("doc_id", "text"), store, "doc_id", "text")
      .count() shouldBe 0L
  }
}
