package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.streaming.StreamingIntervalOverlap

/** Watermarked stream-stream interval-OVERLAP join: pairs emit as both
  * sides arrive across triggers, each overlapping pair exactly once
  * (bucket-spanning included), equal to the batch predicate join. */
class StreamingIntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  it("streamed overlaps across triggers equal the batch predicate join, exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sessions = MemoryStream[(Long, Timestamp, Timestamp)]
    val incidents = MemoryStream[(Long, Timestamp, Timestamp)]
    val joined = StreamingIntervalOverlap.joined(
      sessions.toDS().toDF("sid", "s_lo", "s_hi"), "s_lo", "s_hi",
      incidents.toDS().toDF("iid", "i_lo", "i_hi"), "i_lo", "i_hi",
      maxSpanSec = 300L, bucketWidthSec = 100L, lateness = "600 seconds")
    val ckpt = Files.createTempDirectory("graft-ssio").toString
    val q = joined.select("sid", "iid")
      .writeStream.format("memory").queryName("ssio_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // trigger 1: a long session [100, 400) spanning buckets 1..3 and an
      // incident sharing TWO of those buckets — must pair once, not twice
      sessions.addData((1L, ts(100), ts(400)))
      incidents.addData((10L, ts(250), ts(390)))
      q.processAllAvailable()
      // trigger 2: an incident arriving later that only TOUCHES the
      // session boundary (s_hi = i_lo: half-open, no overlap) and one
      // overlapping by a single second
      incidents.addData((11L, ts(400), ts(500)), (12L, ts(399), ts(450)))
      q.processAllAvailable()
      // trigger 3: a session arriving after an incident already in state
      sessions.addData((2L, ts(480), ts(520)))
      q.processAllAvailable()

      val got = spark.table("ssio_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val bs = Seq((1L, ts(100), ts(400)), (2L, ts(480), ts(520))).toDF("sid", "s_lo", "s_hi")
      val bi = Seq((10L, ts(250), ts(390)), (11L, ts(400), ts(500)), (12L, ts(399), ts(450)))
        .toDF("iid", "i_lo", "i_hi")
      val batch = bs.join(bi,
          F.col("s_lo") < F.col("i_hi") && F.col("i_lo") < F.col("s_hi"))
        .select("sid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got shouldBe batch
      got shouldBe Seq((1L, 10L), (1L, 12L), (2L, 11L)).sorted
    } finally q.stop()
  }

  it("pairs survive a stop/restart on the checkpoint exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sessions = MemoryStream[(Long, Timestamp, Timestamp)]
    val incidents = MemoryStream[(Long, Timestamp, Timestamp)]
    val outDir = Files.createTempDirectory("graft-ssio-out").toString
    val ckpt = Files.createTempDirectory("graft-ssio-restart").toString
    def attach() = StreamingIntervalOverlap.joined(
        sessions.toDS().toDF("sid", "s_lo", "s_hi"), "s_lo", "s_hi",
        incidents.toDS().toDF("iid", "i_lo", "i_hi"), "i_lo", "i_hi",
        maxSpanSec = 300L, bucketWidthSec = 100L, lateness = "600 seconds")
      .select("sid", "iid")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def results() = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val q1 = attach()
    try {
      sessions.addData((1L, ts(100), ts(300)))
      incidents.addData((10L, ts(200), ts(350)))
      q1.processAllAvailable()
      results() shouldBe Seq((1L, 10L))
    } finally q1.stop()
    // an incident lands while the query is DOWN; restart on the checkpoint
    incidents.addData((11L, ts(250), ts(320)))
    val q2 = attach()
    try {
      q2.processAllAvailable()
      // joins the session held in RECOVERED state exactly once; the
      // pre-restart pair is not duplicated in the file sink
      results() shouldBe Seq((1L, 10L), (1L, 11L))
    } finally q2.stop()
  }
}
