package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{AnnIndexStore, IncrementalContamination, IncrementalDedup, Similarity}
import graft.streaming.StreamingCuration

/** The composed curation pipeline as ONE streaming query: each stage's
  * drop reason is represented in the fixture — a stopword-heavy doc
  * (quality gate), a benchmark-leaking doc (decontamination), an
  * in-batch exact near-dup and a cross-batch one (dedup) — and the
  * surviving set is exactly the clean, novel documents. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  it("quality -> decontaminate -> dedup compose to exactly-once survivors in one query") {
    val contamStore = new IncrementalContamination.ContaminationStore(
      spark, Files.createTempDirectory("graft-cur-contam").toString)
    contamStore.init(
      Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text", n = 3)
    val dedupStore = new IncrementalDedup.BucketStore(
      spark, Files.createTempDirectory("graft-cur-dedup").toString)
    dedupStore.init()
    val survivorsDir = Files.createTempDirectory("graft-cur-out").toString

    val batch1 = Seq(
      (1L, "fresh document one about spark engines running fast"),
      (2L, "the a of and the a of and"),                        // quality: all stopwords
      (3L, "prefix alpha beta gamma delta suffix tokens here"), // leaks 2 bench trigrams
      (4L, "fresh document one about spark engines running fast") // in-batch dup of 1
    )
    val batch2 = Seq(
      (11L, "fresh document one about spark engines running fast"), // cross-batch dup of 1
      (12L, "completely different content about databases plus queries")
    )

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.attach(
      input.toDF().toDF("doc_id", "text"),
      Files.createTempDirectory("graft-cur-ckpt").toString,
      contamStore, dedupStore, survivorsDir,
      minTokens = 5, maxStopRatio = 0.5, contamN = 3, contamMinShared = 2L,
      triggerMillis = 50L)
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val kept = StreamingCuration.survivors(spark, survivorsDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 12L)
    // the decontamination audit table holds exactly the leaked doc
    IncrementalContamination.allHits(contamStore)
      .select("train_id").collect().map(_.getLong(0)).toSet shouldBe Set(3L)
    // and only survivors' buckets poisoned the dedup store
    dedupStore.buckets.select("doc").distinct()
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 12L)
  }

  it("the embedding leg makes the ONE query also yield the survivors' serveable ANN index") {
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat / 6f)
    // base corpus the index is TRAINED on (the train-rarely half)
    val base = (1000L until 1032L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val annStore = new AnnIndexStore(spark,
      Files.createTempDirectory("graft-cur-ann").toString)
    annStore.build(base, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    // side table carrying a vector for every streamed doc id
    val sideVecs = Seq(1L, 2L, 3L, 4L, 11L, 12L).map(id => (id, vec(id)))
      .toDF("vec_id", "embedding")

    val contamStore = new IncrementalContamination.ContaminationStore(
      spark, Files.createTempDirectory("graft-cur-contam2").toString)
    contamStore.init(
      Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text", n = 3)
    val dedupStore = new IncrementalDedup.BucketStore(
      spark, Files.createTempDirectory("graft-cur-dedup2").toString)
    dedupStore.init()
    val survivorsDir = Files.createTempDirectory("graft-cur-out2").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.attach(
      input.toDF().toDF("doc_id", "text"),
      Files.createTempDirectory("graft-cur-ckpt2").toString,
      contamStore, dedupStore, survivorsDir,
      minTokens = 5, maxStopRatio = 0.5, contamN = 3, contamMinShared = 2L,
      triggerMillis = 50L,
      annLeg = Some(StreamingCuration.AnnLeg(annStore, sideVecs)))
    try {
      input.addData(
        (1L, "fresh document one about spark engines running fast"),
        (2L, "the a of and the a of and"),
        (3L, "prefix alpha beta gamma delta suffix tokens here"),
        (4L, "fresh document one about spark engines running fast"))
      q.processAllAvailable()
      input.addData(
        (11L, "fresh document one about spark engines running fast"),
        (12L, "completely different content about databases plus queries"))
      q.processAllAvailable()
    } finally q.stop()

    val kept = StreamingCuration.survivors(spark, survivorsDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 12L)
    // the streamed index rows (batch_id >= 0 — build wrote the base as -1)
    // equal a direct batch encode of the survivors against the SAME frozen
    // model: the stream encoded exactly the curated corpus, nothing else
    val mod = annStore.model
    val streamed = annStore.codes
      .join(base.select(F.col("vec_id").as("cid")), Seq("cid"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    val direct = Similarity.ivfPqEncodeForIndex(
        sideVecs.filter(F.col("vec_id").isin(1L, 12L)), "vec_id", "embedding",
        mod.centroids, mod.codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    streamed shouldBe direct
    streamed.map(_._1) shouldBe Set(1L, 12L)
    // and the index SERVES: the full-corpus search runs off the persisted
    // codes without retraining
    annStore.search(base.unionByName(sideVecs.filter(F.col("vec_id").isin(1L, 12L))),
      "vec_id", "embedding", nprobe = 2, shortlist = 8, k = 3)
      .count() should be > 0L
  }
}
