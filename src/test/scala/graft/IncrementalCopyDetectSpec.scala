package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.operators.IncrementalCopyDetect

/** Ingest-time copy suppression across batches — the winnowing twin of
  * IncrementalDedupSpec / IncrementalSemanticDedupSpec: survivors' capped
  * posting lists persist, later batches containment-check only against
  * accumulated postings, and incremental processing matches the batch job.
  *
  * Fixture: duplicate groups are PAIRS (so the batch-relative df floor of
  * 2 keeps their shared hashes) with distinct filler content per doc and
  * ids in arrival order — first-seen = min-id, so incremental(b1, b2) ≡
  * batch(b1 ∪ b2) holds exactly. */
class IncrementalCopyDetectSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog while rain keeps falling on the quiet hills"
  private val textB = "completely different prose about spark engines shuffling partitions across a large cluster"
  private val textC = "a third unrelated passage describing winnowing fingerprints and their selection windows"
  private val textD = "yet another body of text that shares no long substring with any of its batch companions"
  private val textE = "an entirely fresh composition mentioning neither foxes nor engines nor fingerprints at all"

  // copy groups are PAIRS (df floor = 2; a >= 3 copy group's shared hashes
  // exceed the batch cap and are, by design, the MinHash family's job):
  // {1,2} in-batch copies of A; {3,11} copies of B across batches;
  // 4, 10, 12 unique
  private def all: DataFrame = Seq(
    (1L, textA), (2L, textA), (3L, textB), (4L, textC),
    (10L, textE), (11L, textB), (12L, textD)
  ).toDF("doc_id", "text")
  private def batch1: DataFrame = all.filter(F.col("doc_id") < 10)
  private def batch2: DataFrame = all.filter(F.col("doc_id") >= 10)

  private def newStore() = {
    val st = new IncrementalCopyDetect.PostingStore(
      spark, Files.createTempDirectory("graft-copydetect").toString)
    st.init()
    st
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  it("incremental(b1, b2) keeps exactly batch(b1 UNION b2)'s representatives") {
    val st = newStore()
    val k1 = ids(IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text"))
    val k2 = ids(IncrementalCopyDetect.dedupBatch(batch2, st, "doc_id", "text"))
    val batchAll = ids(IncrementalCopyDetect.dedupBatch(
      all, newStore(), "doc_id", "text"))
    (k1 ++ k2).sorted shouldBe batchAll
  }

  it("keeps one representative per copy group within a batch (smallest id)") {
    val st = newStore()
    ids(IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")) shouldBe
      Seq(1L, 3L, 4L)
  }

  it("drops later-batch copies of already-kept documents, not fresh content") {
    val st = newStore()
    IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")
    ids(IncrementalCopyDetect.dedupBatch(batch2, st, "doc_id", "text")) shouldBe
      Seq(10L, 12L)
  }

  it("is idempotent under batch replay (at-least-once delivery)") {
    val st = newStore()
    IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")
    ids(IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")) shouldBe
      Seq.empty
  }

  it("replay-STABLE form re-yields the SAME survivors for the same batch id") {
    val st = newStore()
    IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")
    val first = ids(IncrementalCopyDetect.dedupBatchIdempotent(
      batch2, st, "doc_id", "text", batchId = 7L))
    val replay = ids(IncrementalCopyDetect.dedupBatchIdempotent(
      batch2, st, "doc_id", "text", batchId = 7L))
    first shouldBe Seq(10L, 12L)
    replay shouldBe first
  }

  it("only survivors' postings are persisted (dropped docs never poison the store)") {
    val st = newStore()
    IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")
    val docs = st.postings.select("doc").distinct()
      .collect().map(_.getLong(0)).toSet
    docs shouldBe Set(1L, 3L, 4L)
  }

  it("streaming twin: MemoryStream micro-batches equal the batch job end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = newStore()
    val survivorsDir = Files.createTempDirectory("graft-copydetect-out").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingCopyDetect.attach(
      stream, Files.createTempDirectory("graft-copydetect-ckpt").toString,
      st, survivorsDir, triggerMillis = 50L)
    try {
      def rows(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      input.addData(rows(batch1)); q.processAllAvailable()
      input.addData(rows(batch2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingCopyDetect.survivors(spark, survivorsDir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    streamed shouldBe Seq(1L, 3L, 4L, 10L, 12L)
  }

  it("compactHotHashes sheds accumulated cross-batch boilerplate lists") {
    val st = newStore()
    IncrementalCopyDetect.dedupBatch(batch1, st, "doc_id", "text")
    IncrementalCopyDetect.dedupBatch(batch2, st, "doc_id", "text")
    st.compactHotHashes(maxDf = 1L)
    val maxDf = st.postings.groupBy("h").agg(F.count(F.lit(1)).as("n"))
      .agg(F.max("n")).collect()(0).getLong(0)
    maxDf should be <= 1L
  }
}
