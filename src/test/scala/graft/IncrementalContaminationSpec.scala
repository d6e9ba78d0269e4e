package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.operators.{DataShaping, IncrementalContamination}

/** Ingest-time decontamination across batches: the benchmark side is
  * FROZEN at store init (shingles + bloom), training batches are checked
  * map-only + sliver-join, and the accumulated hits equal the batch
  * contamination job over the union of checked batches. */
class IncrementalContaminationSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 carries a distinctive trigram; train docs 1 and 11
  // leak overlapping windows of it (>= 2 shared trigrams), 2/3/12 are clean
  private def bench: DataFrame = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (101L, "one two three four five six seven")
  ).toDF("doc_id", "text")
  private def batch1: DataFrame = Seq(
    (1L, "intro alpha beta gamma delta outro words here"),
    (2L, "totally clean document with fresh words only"),
    (3L, "another clean one nothing shared at all")
  ).toDF("doc_id", "text")
  private def batch2: DataFrame = Seq(
    (11L, "two three four five prefix suffix tokens pad"),
    (12L, "yet another unrelated document entirely new")
  ).toDF("doc_id", "text")

  private val n = 3
  private val minShared = 2L

  private def newStore() = {
    val st = new IncrementalContamination.ContaminationStore(
      spark, Files.createTempDirectory("graft-contam").toString)
    st.init(bench, "doc_id", "text", n)
    st
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("train_id", "bench_id", "shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchJob(train: DataFrame): Set[(Long, Long, Long)] =
    rows(DataShaping.contamination(train, bench, "doc_id", "text", n, minShared))

  it("incremental(b1, b2) hits equal the batch job over b1 UNION b2") {
    val st = newStore()
    IncrementalContamination.checkBatch(batch1, st, "doc_id", "text", n, minShared, 1L)
    IncrementalContamination.checkBatch(batch2, st, "doc_id", "text", n, minShared, 2L)
    rows(IncrementalContamination.allHits(st)) shouldBe batchJob(batch1.unionAll(batch2))
  }

  it("finds exactly the leaked docs with their shared-window counts") {
    val st = newStore()
    val h1 = rows(IncrementalContamination.checkBatch(
      batch1, st, "doc_id", "text", n, minShared, 1L))
    h1 shouldBe Set((1L, 100L, 2L)) // alpha-beta-gamma + beta-gamma-delta
    val h2 = rows(IncrementalContamination.checkBatch(
      batch2, st, "doc_id", "text", n, minShared, 2L))
    h2 shouldBe Set((11L, 101L, 2L))
  }

  it("is replay-stable: the same batch id re-checked appends nothing") {
    val st = newStore()
    IncrementalContamination.checkBatch(batch1, st, "doc_id", "text", n, minShared, 7L)
    val once = IncrementalContamination.allHits(st).count()
    val replay = IncrementalContamination.checkBatch(
      batch1, st, "doc_id", "text", n, minShared, 7L)
    replay.count() shouldBe 0L
    IncrementalContamination.allHits(st).count() shouldBe once
  }

  it("init is idempotent and the bloom never drops a true hit") {
    val st = newStore()
    st.init(bench, "doc_id", "text", n) // second init: no-op
    val h = rows(IncrementalContamination.checkBatch(
      batch1.unionAll(batch2), st, "doc_id", "text", n, minShared, 1L))
    h shouldBe batchJob(batch1.unionAll(batch2))
  }

  it("streaming twin: MemoryStream micro-batches accumulate the batch job's hits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val st = newStore()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingContamination.attach(
      input.toDF().toDF("doc_id", "text"),
      Files.createTempDirectory("graft-contam-ckpt").toString,
      st, n, minShared, triggerMillis = 50L)
    try {
      def tup(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      input.addData(tup(batch1)); q.processAllAvailable()
      input.addData(tup(batch2)); q.processAllAvailable()
    } finally q.stop()
    rows(IncrementalContamination.allHits(st)) shouldBe batchJob(batch1.unionAll(batch2))
  }
}
