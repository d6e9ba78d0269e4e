package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{IncrementalVideoDedup, Multimodal}
import graft.streaming.StreamingVideoDedup

/** The video member of the incremental-dedup family: frame prints
  * accumulate in a store; new batches are containment-checked against it.
  * Fixture: gifPooledPayloads groups of 3 consecutive ids share one frame
  * sequence at different lengths (nf = id%4+2) — groups {3,4,5} and
  * {15,16,17} put the MIN id on the longest cut (nf 5), so the min-id
  * keep rule and the sub-clip containment direction agree. */
class IncrementalVideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vids(ids: Long*): DataFrame =
    Multimodal.gifPooledPayloads(ids.toDF("doc_id"), "doc_id")

  private def newStore(): IncrementalVideoDedup.FramePrintStore = {
    val st = new IncrementalVideoDedup.FramePrintStore(
      spark, Files.createTempDirectory("graft-viddedup").toString)
    st.init(); st
  }

  private def keptIds(df: DataFrame): Set[Long] =
    df.select("media_id").collect().map(_.getLong(0)).toSet

  it("incremental batches equal the one-shot batch run (sub-clips suppressed either way)") {
    // incremental: sources first, then their trimmed re-posts
    val st = newStore()
    keptIds(IncrementalVideoDedup.dedupBatch(vids(3L, 15L), st)) shouldBe Set(3L, 15L)
    keptIds(IncrementalVideoDedup.dedupBatch(vids(4L, 16L), st)) shouldBe Set.empty
    // one-shot over the union on a fresh store: in-batch rule keeps min ids
    val st2 = newStore()
    keptIds(IncrementalVideoDedup.dedupBatch(vids(3L, 15L, 4L, 16L), st2)) shouldBe
      Set(3L, 15L)
    // both stores hold exactly the survivors' prints
    st.prints.select("video").distinct().collect()
      .map(_.getLong(0)).toSet shouldBe Set(3L, 15L)
    st2.prints.select("video").distinct().collect()
      .map(_.getLong(0)).toSet shouldBe Set(3L, 15L)
  }

  it("a partial cut below the containment threshold survives; at threshold it is suppressed") {
    val st = newStore()
    // store the SHORT cut first: id 4 (2 frames)
    keptIds(IncrementalVideoDedup.dedupBatch(vids(4L), st)) shouldBe Set(4L)
    // id 3 (5 frames) only 2/5-covered by the stored short cut -> survives
    keptIds(IncrementalVideoDedup.dedupBatch(vids(3L), st)) shouldBe Set(3L)
    // id 5 (3 frames, all inside 3's five) is fully covered -> suppressed
    keptIds(IncrementalVideoDedup.dedupBatch(vids(5L), st)) shouldBe Set.empty
  }

  it("replayed micro-batch re-yields the same survivors (own prints excluded)") {
    val st = newStore()
    IncrementalVideoDedup.dedupBatchIdempotent(vids(3L), st, batchId = 1L)
    val first = keptIds(
      IncrementalVideoDedup.dedupBatchIdempotent(vids(15L, 16L), st, batchId = 2L))
    first shouldBe Set(15L)
    // replay of batch 2: its own stored prints must not suppress 15
    val replay = keptIds(
      IncrementalVideoDedup.dedupBatchIdempotent(vids(15L, 16L), st, batchId = 2L))
    replay shouldBe Set(15L)
  }

  it("boilerplate frames (print in > maxPrintDf videos) neither suppress nor survive compaction") {
    import org.apache.spark.sql.Row
    val st = newStore()
    // real prints of video 4 (2 frames) — then fake a "studio intro"
    // corpus: 20 stored videos all carrying BOTH of 4's frame prints
    val p4 = Multimodal.framePrints(vids(4L)).orderBy("frame_idx")
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    val fakeRows = for (sv <- 900L until 920L; (lo, hi) <- p4)
      yield Row(sv, 0L, 2L, lo, hi, -1L)
    st.append(spark.createDataFrame(
      spark.sparkContext.parallelize(fakeRows.toSeq),
      org.apache.spark.sql.types.StructType.fromDDL(
        "video BIGINT, f BIGINT, nf BIGINT, dh_lo BIGINT, dh_hi BIGINT, batch_id BIGINT")))
    // uncapped, video 4 would be 2/2-covered by every fake video and die;
    // the df cap recognizes the prints as boilerplate and keeps it
    keptIds(IncrementalVideoDedup.dedupBatch(vids(4L), st, maxPrintDf = 16L)) shouldBe
      Set(4L)
    // ...while a genuine sub-clip relation (prints below the cap, an
    // untainted group) still suppresses
    keptIds(IncrementalVideoDedup.dedupBatch(vids(15L), st, maxPrintDf = 16L)) shouldBe
      Set(15L)
    keptIds(IncrementalVideoDedup.dedupBatch(vids(16L), st, maxPrintDf = 16L)) shouldBe
      Set.empty // 16's 2 frames are a prefix of kept 15's five
    // lifecycle compaction sheds the hot prints from the table itself
    st.compactHotPrints(maxDf = 16L)
    st.prints.filter(F.col("video") >= 900L).count() shouldBe 0L
    st.prints.filter(F.col("video") === 4L).count() shouldBe 0L // its prints went hot
    st.prints.filter(F.col("video") === 15L).count() shouldBe 5L // untainted, intact
  }

  it("streaming twin: exactly-once survivors through a checkpointed stream") {
    val st = newStore()
    val survivorsDir = Files.createTempDirectory("graft-vidsurv").toString
    val payloads = vids(3L, 15L, 4L, 16L, 5L)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingVideoDedup.attach(
      input.toDF().toDF("media_id", "payload"),
      Files.createTempDirectory("graft-vidckpt").toString,
      st, survivorsDir, triggerMillis = 50L)
    try {
      input.addData((3L, payloads(3L)), (15L, payloads(15L)))
      q.processAllAvailable()
      input.addData((4L, payloads(4L)), (16L, payloads(16L)), (5L, payloads(5L)))
      q.processAllAvailable()
    } finally q.stop()
    StreamingVideoDedup.survivors(spark, survivorsDir)
      .collect().map(_.getLong(0)).toSet shouldBe Set(3L, 15L)
  }
}
