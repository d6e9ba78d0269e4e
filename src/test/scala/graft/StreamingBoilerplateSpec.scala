package graft

import java.nio.file.Files

import graft.operators.IncrementalBoilerplate
import graft.streaming.StreamingBoilerplate

/** Checkpointed streaming boilerplate removal: cleaned docs are
  * exactly-once across triggers, frequencies accumulate across batches,
  * and the stream equals the equivalent batch sequence. */
class StreamingBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  it("cleans a document stream with accumulating chunk frequencies (MemoryStream e2e)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = new IncrementalBoilerplate.ChunkDfStore(
      spark, Files.createTempDirectory("graft-sboiler").toString)
    val ckpt = Files.createTempDirectory("graft-sboiler-ckpt").toString
    val outDir = Files.createTempDirectory("graft-sboiler-out").toString

    val input = MemoryStream[(Long, String)]
    val q = StreamingBoilerplate.attach(
      input.toDS().toDF("doc_id", "text"), ckpt, store, outDir,
      chunkTokens = 2, minDocs = 2L, triggerMillis = 100)
    try {
      // batch 0: "aa bb" unique so far -> everything kept
      input.addData((1L, "aa bb u1 v1")); q.processAllAvailable()
      // batch 1: "aa bb" accumulates to df 2 -> removed from THIS batch only
      input.addData((10L, "aa bb u10 v10"), (11L, "w11 x11")); q.processAllAvailable()
    } finally q.stop()

    val out = StreamingBoilerplate.cleaned(spark, outDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((0L, "aa bb u1 v1"))   // shipped before the threshold hit
    out(10L) shouldBe ((1L, "u10 v10"))      // cleaned against accumulated df
    out(11L) shouldBe ((0L, "w11 x11"))
    out.size shouldBe 3
  }
}
