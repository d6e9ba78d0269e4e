package graft

import java.nio.file.Files

import graft.operators.IncrementalDedup

/** Ingest-time near-dup suppression across batches: survivors' buckets
  * persist, later batches dedup against the accumulated corpus, and a
  * replayed batch drops out entirely (idempotence). */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "completely different content about spark engines and shuffles here today"
  private val textC = "yet another unrelated document concerning parquet footers and row groups"

  private def newStore() = {
    val st = new IncrementalDedup.BucketStore(
      spark, Files.createTempDirectory("graft-dedup").toString)
    st.init()
    st
  }

  it("keeps one representative per near-dup group within a batch (smallest id)") {
    val st = newStore()
    val batch = Seq((1L, textA), (2L, textA), (3L, textB)).toDF("doc_id", "text")
    val kept = IncrementalDedup.dedupBatch(batch, st, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 3L)
  }

  it("drops later-batch near-dups of already-kept documents") {
    val st = newStore()
    IncrementalDedup.dedupBatch(Seq((1L, textA)).toDF("doc_id", "text"), st, "doc_id", "text")
    val kept2 = IncrementalDedup.dedupBatch(
      Seq((10L, textA), (11L, textC)).toDF("doc_id", "text"), st, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0))
    kept2 shouldBe Array(11L) // 10 duplicates batch-1's doc 1
  }

  it("a legacy store without batch_id still contributes its rows to the collision corpus") {
    // simulate a store written by the pre-batch_id format: same path, no
    // batch_id column at all
    val dir = Files.createTempDirectory("graft-dedup-legacy").toString
    val st = new IncrementalDedup.BucketStore(spark, dir)
    graft.operators.Dedup.minhashBuckets(
        Seq((1L, textA)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc".cast("long").as("doc"), $"band", $"key")
      .write.parquet(s"$dir/minhash_buckets")
    // replay-stable path: legacy rows must read as batch_id = -1, never
    // null (null =!= b is null -> row silently dropped from the corpus)
    val kept = IncrementalDedup.dedupBatchIdempotent(
      Seq((10L, textA), (11L, textB)).toDF("doc_id", "text"), st, "doc_id", "text",
      batchId = 7L)
      .select("doc_id").collect().map(_.getLong(0))
    kept shouldBe Array(11L) // 10 collides with the legacy-stored doc 1
  }

  it("a MIXED store (legacy files + batch_id files) keeps both formats' rows and replay-idempotence") {
    // legacy file first: with schema INFERENCE, mergeSchema=false could
    // resolve the store's schema from this file's footer and drop batch_id
    // for every row — the pinned-schema read must not care which file wins
    val dir = Files.createTempDirectory("graft-dedup-mixed").toString
    val st = new IncrementalDedup.BucketStore(spark, dir)
    graft.operators.Dedup.minhashBuckets(
        Seq((1L, textA)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc".cast("long").as("doc"), $"band", $"key")
      .write.parquet(s"$dir/minhash_buckets")
    // new-format batch appends (batch_id = 7) alongside the legacy files
    val kept1 = IncrementalDedup.dedupBatchIdempotent(
      Seq((10L, textA), (11L, textB)).toDF("doc_id", "text"), st, "doc_id", "text",
      batchId = 7L).select("doc_id").collect().map(_.getLong(0))
    kept1 shouldBe Array(11L) // 10 collides with the legacy-stored doc 1
    // replay of batch 7: self-exclusion must see batch_id=7 on the stored
    // rows (not null / not -1) and re-yield the SAME survivors
    val replay = IncrementalDedup.dedupBatchIdempotent(
      Seq((10L, textA), (11L, textB)).toDF("doc_id", "text"), st, "doc_id", "text",
      batchId = 7L).select("doc_id").collect().map(_.getLong(0))
    replay shouldBe Array(11L)
    // and a later batch still collides with BOTH formats' rows
    val kept2 = IncrementalDedup.dedupBatchIdempotent(
      Seq((20L, textA), (21L, textB), (22L, textC)).toDF("doc_id", "text"),
      st, "doc_id", "text", batchId = 8L)
      .select("doc_id").collect().map(_.getLong(0))
    kept2 shouldBe Array(22L) // 20 hits legacy doc 1, 21 hits batch-7 doc 11
  }

  it("is idempotent under batch replay (at-least-once delivery)") {
    val st = newStore()
    val batch = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    IncrementalDedup.dedupBatch(batch, st, "doc_id", "text").count() shouldBe 2L
    IncrementalDedup.dedupBatch(batch, st, "doc_id", "text").count() shouldBe 0L
  }

  it("runs as the dedup stage of a streaming ingest (foreachBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = newStore()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= IncrementalDedup.dedupBatch(b, st, "doc_id", "text")
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    try {
      input.addData((1L, textA), (2L, textB)); q.processAllAvailable()
      input.addData((3L, textA), (4L, textC)); q.processAllAvailable() // 3 near-dups batch-1's 1
      kept.sorted shouldBe Seq(1L, 2L, 4L)
    } finally q.stop()
  }

  it("only survivors' buckets are persisted (dropped docs never poison the store)") {
    val st = newStore()
    val batch = Seq((5L, textA), (6L, textA)).toDF("doc_id", "text")
    IncrementalDedup.dedupBatch(batch, st, "doc_id", "text")
    st.buckets.select("doc").distinct().collect().map(_.getLong(0)) shouldBe Array(5L)
  }
}
