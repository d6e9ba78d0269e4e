package graft

import java.nio.file.Files

import graft.operators.{DataShaping, IncrementalBoilerplate}

/** Ingest-time boilerplate removal: chunk document frequencies accumulate
  * across batches, emit-time decisions are final, replays are stable. */
class IncrementalBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() =
    new IncrementalBoilerplate.ChunkDfStore(
      spark, Files.createTempDirectory("graft-boiler").toString)

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  it("a single batch against an empty store equals the batch operator") {
    val st = newStore()
    val docs = Seq(
      (1L, "aa bb u1 v1"),
      (2L, "aa bb u2 v2"),
      (3L, "w3 x3")
    ).toDF("doc_id", "text")
    val inc = collectMap(IncrementalBoilerplate.cleanBatch(
      docs, st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 0L))
    val batch = collectMap(DataShaping.removeBoilerplate(
      docs, "doc_id", "text", chunkTokens = 2, minDocs = 2L))
    inc shouldBe batch
  }

  it("frequencies accumulate: a chunk passes batch 1, is removed from batch 2, and the past stays shipped") {
    val st = newStore()
    // "hh kk" appears once in batch 1 (under threshold -> kept), once more
    // in batch 2 (accumulated df = 2 -> removed from batch 2 only)
    val b1 = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((1L, "hh kk u1 v1")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 1L))
    b1(1L) shouldBe ((2L, 0L, "hh kk u1 v1"))
    val b2 = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((10L, "hh kk u10 v10")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 2L))
    b2(10L) shouldBe ((2L, 1L, "u10 v10"))
  }

  it("replaying a batch re-emits the SAME cleaned documents (no double counting)") {
    val st = newStore()
    IncrementalBoilerplate.cleanBatch(
      Seq((1L, "pp qq u1 v1")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 1L)
    val first = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((10L, "pp qq u10 v10"), (11L, "rr ss")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 2L))
    val replay = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((10L, "pp qq u10 v10"), (11L, "rr ss")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 2L, batchId = 2L))
    replay shouldBe first
    // and the replay did not inflate the accumulated counts for batch 3:
    // "rr ss" has been seen in ONE distinct doc (batch 2), so a batch-3
    // occurrence accumulates to 2 and is removed — but only once
    val b3 = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((20L, "rr ss u20 v20")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 3L, batchId = 3L))
    // minDocs = 3: rr ss at accumulated df 1 + 1 = 2 stays BELOW threshold
    // unless the replay double-counted batch 2
    b3(20L) shouldBe ((2L, 0L, "rr ss u20 v20"))
  }

  it("in-batch duplication combines with accumulated counts") {
    val st = newStore()
    IncrementalBoilerplate.cleanBatch(
      Seq((1L, "mm nn a1 b1")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 3L, batchId = 1L)
    // two distinct docs in batch 2 + one accumulated = 3 >= minDocs
    val b2 = collectMap(IncrementalBoilerplate.cleanBatch(
      Seq((10L, "mm nn a10 b10"), (11L, "mm nn a11 b11")).toDF("doc_id", "text"),
      st, "doc_id", "text", chunkTokens = 2, minDocs = 3L, batchId = 2L))
    b2(10L) shouldBe ((2L, 1L, "a10 b10"))
    b2(11L) shouldBe ((2L, 1L, "a11 b11"))
  }
}
