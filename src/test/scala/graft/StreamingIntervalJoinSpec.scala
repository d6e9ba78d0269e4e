package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.streaming.StreamingIntervalJoin

/** Native watermarked stream-stream interval join: matches emit as both
  * sides arrive across triggers, each pair exactly once, equal to the
  * batch containment join over everything fed. */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  it("streamed matches across triggers equal the batch containment join, exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val points = MemoryStream[(Long, Timestamp)]
    val windows = MemoryStream[(Long, Timestamp, Timestamp)]
    // lateness bounds how far BEHIND one stream the other may arrive:
    // window 11 turns up two triggers after the point it matches, so the
    // test's state horizon must cover that gap (the default 10 s horizon
    // correctly DROPS such a late window — that's the eviction contract,
    // not a bug)
    val joined = StreamingIntervalJoin.joined(
      points.toDS().toDF("point_id", "p_ts"), "p_ts",
      windows.toDS().toDF("window_id", "lo_ts", "hi_ts"), "lo_ts", "hi_ts",
      maxSpanSec = 300L, bucketWidthSec = 100L, lateness = "600 seconds")
    val ckpt = Files.createTempDirectory("graft-ssij").toString
    val q = joined.select("point_id", "window_id")
      .writeStream.format("memory").queryName("ssij_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // trigger 1: a window and one early point inside it
      windows.addData((10L, ts(100), ts(300))) // [100, 300) spans 3 buckets
      points.addData((1L, ts(150)))
      q.processAllAvailable()
      // trigger 2: late-joining points — window already in state; one point
      // lands in the window's SECOND bucket (cross-bucket match), one at
      // the exclusive hi boundary must NOT match
      points.addData((2L, ts(250)), (3L, ts(300)))
      q.processAllAvailable()
      // trigger 3: a window arriving AFTER its points (point in state joins
      // a newly arriving interval), plus a second window overlapping point 2
      windows.addData((11L, ts(240), ts(260)))
      q.processAllAvailable()

      val got = spark.table("ssij_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batchPoints = Seq((1L, ts(150)), (2L, ts(250)), (3L, ts(300))).toDF("point_id", "p_ts")
      val batchWindows = Seq((10L, ts(100), ts(300)), (11L, ts(240), ts(260)))
        .toDF("window_id", "lo_ts", "hi_ts")
      val batch = batchPoints.join(batchWindows,
          F.col("p_ts") >= F.col("lo_ts") && F.col("p_ts") < F.col("hi_ts"))
        .select("point_id", "window_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got shouldBe batch
      got shouldBe Seq((1L, 10L), (2L, 10L), (2L, 11L)) // 3 at hi: excluded
    } finally q.stop()
  }

  it("sub-second interval ends still match across the bucket boundary (micros-domain buckets)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val points = MemoryStream[(Long, Timestamp)]
    val windows = MemoryStream[(Long, Timestamp, Timestamp)]
    val joined = StreamingIntervalJoin.joined(
      points.toDS().toDF("point_id", "p_ts"), "p_ts",
      windows.toDS().toDF("window_id", "lo_ts", "hi_ts"), "lo_ts", "hi_ts",
      maxSpanSec = 300L, bucketWidthSec = 100L, lateness = "600 seconds")
    val ckpt = Files.createTempDirectory("graft-ssij-subsec").toString
    val q = joined.select("point_id", "window_id")
      .writeStream.format("memory").queryName("ssij_subsec")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // window [150 s, 200.5 s): its end crosses the 200 s bucket edge by
      // half a second; a point at 200.3 s lives in the NEXT bucket and is
      // inside the window. Second-truncated bucketing would explode the
      // window only to bucket 1 and silently lose this match.
      windows.addData((70L, new Timestamp(150000L), new Timestamp(200500L)))
      points.addData((7L, new Timestamp(200300L)), (8L, new Timestamp(200600L)))
      q.processAllAvailable()
      spark.table("ssij_subsec")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq shouldBe
        Seq((7L, 70L)) // 8 at 200.6 s is past the exclusive end
    } finally q.stop()
  }

  it("matches survive a stop/restart on the checkpoint exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val points = MemoryStream[(Long, Timestamp)]
    val windows = MemoryStream[(Long, Timestamp, Timestamp)]
    val outDir = Files.createTempDirectory("graft-ssij-out").toString
    val ckpt = Files.createTempDirectory("graft-ssij-restart").toString
    def attach() = StreamingIntervalJoin.joined(
        points.toDS().toDF("point_id", "p_ts"), "p_ts",
        windows.toDS().toDF("window_id", "lo_ts", "hi_ts"), "lo_ts", "hi_ts",
        maxSpanSec = 300L, bucketWidthSec = 100L, lateness = "600 seconds")
      .select("point_id", "window_id")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def results() = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val q1 = attach()
    try {
      windows.addData((10L, ts(100), ts(300)))
      points.addData((1L, ts(150)))
      q1.processAllAvailable()
      results() shouldBe Seq((1L, 10L))
    } finally q1.stop()
    // a point lands while the query is DOWN; restart on the same checkpoint
    points.addData((2L, ts(250)))
    val q2 = attach()
    try {
      q2.processAllAvailable()
      // the new point matches the window held in RECOVERED state, exactly
      // once; the pre-restart match is not duplicated in the file sink
      results() shouldBe Seq((1L, 10L), (2L, 10L))
    } finally q2.stop()
  }
}
