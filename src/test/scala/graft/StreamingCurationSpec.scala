package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{IncrementalContamination, IncrementalDedup}
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
}
