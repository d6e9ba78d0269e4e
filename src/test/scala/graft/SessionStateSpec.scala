package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.StatefulCounts
import graft.streaming.StatefulCounts.{KeyedEvent, RunningCount}

class SessionStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  describe("Sessionize (batch)") {
    it("splits on gaps larger than the threshold, per user") {
      val df = Seq(
        (1L, 10L, ts("2024-01-01T10:00:00Z")),
        (1L, 11L, ts("2024-01-01T10:10:00Z")), // same session (10m gap)
        (1L, 12L, ts("2024-01-01T11:30:00Z")), // new session (80m gap)
        (2L, 20L, ts("2024-01-01T10:00:00Z"))
      ).toDF("user_id", "event_id", "ts")
      val out = Sessionize.assign(df, "user_id", "ts", "event_id", gapMinutes = 30)
        .select("event_id", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      out(10L) shouldBe 0L
      out(11L) shouldBe 0L
      out(12L) shouldBe 1L
      out(20L) shouldBe 0L
    }
    it("session aggregate computes count and span") {
      val df = Seq(
        (1L, 10L, ts("2024-01-01T10:00:00Z")),
        (1L, 11L, ts("2024-01-01T10:10:00Z"))
      ).toDF("user_id", "event_id", "ts")
      val s = Sessionize.sessions(df, "user_id", "ts", "event_id", 30).collect()(0)
      s.getLong(2) shouldBe 2L // n_events
      s.getLong(3) shouldBe 600L * 1000000L // span_us
    }
  }

  describe("StreamingSessionize (flatMapGroupsWithState)") {
    import graft.streaming.StreamingSessionize
    import graft.streaming.StreamingSessionize.{SessionAssignment, SessionEvent}

    it("assigns identical sessions to the batch operator on a MemoryStream replay of the fixture") {
      // events fixture replayed in event-time order across 4 micro-batches
      val fixture = graft.sources.EventsFixture
        .read(spark, "/root/testdata/sf0.001/events.parquet")
        .selectExpr("user_id", "event_id", "unix_micros(ts) as ts_us")
      val batchExpected = Sessionize.assign(
        fixture.selectExpr("user_id", "event_id", "timestamp_micros(ts_us) as ts"),
        "user_id", "ts", "event_id", gapMinutes = 30)
        .select("event_id", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      implicit val sqlCtx = spark.sqlContext
      val replay = fixture.as[SessionEvent].collect()
        .sortBy(e => (e.ts_us, e.event_id)) // arrival order = event-time order
      val input = MemoryStream[SessionEvent]
      val q = StreamingSessionize.assign(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("stream_sessions")
        .outputMode(OutputMode.Append())
        .start()
      try {
        replay.grouped(math.max(1, replay.length / 4 + 1)).foreach { chunk =>
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        val streamed = spark.table("stream_sessions").as[SessionAssignment].collect()
          .map(a => a.event_id -> a.session_idx).toMap
        streamed.size shouldBe batchExpected.size
        streamed shouldBe batchExpected
      } finally q.stop()
    }
  }

  describe("StreamingFunnel (flatMapGroupsWithState)") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelProgress}

    it("per-stage user counts equal the batch funnel on a MemoryStream replay of the fixture") {
      val stages = Seq("view", "click", "purchase")
      val fixture = graft.sources.EventsFixture
        .read(spark, "/root/testdata/sf0.001/events.parquet")
        .selectExpr("user_id", "event_type", "unix_micros(ts) as ts_us")
      val batchExpected = graft.operators.TimeSeries.funnel(
        fixture.selectExpr("user_id", "event_type", "timestamp_micros(ts_us) as ts"),
        "user_id", "event_type", "ts", stages)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap

      implicit val sqlCtx = spark.sqlContext
      val replay = fixture.as[FunnelEvent].collect()
        .sortBy(e => (e.ts_us, e.event_type)) // in-order arrival contract
      val input = MemoryStream[FunnelEvent]
      val q = StreamingFunnel.track(input.toDS(), stages)
        .writeStream.format("memory").queryName("stream_funnel")
        .outputMode(OutputMode.Append())
        .start()
      try {
        replay.grouped(math.max(1, replay.length / 4 + 1)).foreach { chunk =>
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        val streamed = spark.table("stream_funnel").as[FunnelProgress].collect()
        // one progress row per (user, reached stage), never duplicated
        streamed.groupBy(p => (p.user_id, p.stage_idx)).values.foreach(_.length shouldBe 1)
        val perStage = streamed.groupBy(_.stage_idx).view.mapValues(_.map(_.user_id).distinct.length.toLong).toMap
        (1 to stages.length).foreach { i =>
          perStage.getOrElse(i, 0L) shouldBe batchExpected(i)
        }
      } finally q.stop()
    }

    it("a stage event before its anchor does not count; a later one does — across batches") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[FunnelEvent]
      val q = StreamingFunnel.track(input.toDS(), Seq("view", "click"))
        .writeStream.format("memory").queryName("stream_funnel2")
        .outputMode(OutputMode.Append())
        .start()
      try {
        input.addData(FunnelEvent(1L, "click", 5L), FunnelEvent(1L, "view", 10L),
          FunnelEvent(2L, "view", 10L))
        q.processAllAvailable()
        // batch 2: user 1 clicks after the anchor; user 2's click ties the
        // anchor timestamp (strictly-after required -> no)
        input.addData(FunnelEvent(1L, "click", 20L), FunnelEvent(2L, "click", 10L))
        q.processAllAvailable()
        val rows = spark.table("stream_funnel2").as[FunnelProgress].collect()
        rows.filter(_.stage_idx == 2).map(_.user_id).toSeq shouldBe Seq(1L)
        rows.filter(p => p.user_id == 1L && p.stage_idx == 2).head.stage_ts_us shouldBe 20L
      } finally q.stop()
    }
  }

  describe("StatefulCounts (mapGroupsWithState)") {
    it("carries per-key state across micro-batches") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[KeyedEvent]
      val q = StatefulCounts.userRunningCounts(input.toDS())
        .writeStream.format("memory").queryName("running_counts")
        .outputMode(OutputMode.Update())
        .start()
      try {
        input.addData(KeyedEvent(1L, 2.0), KeyedEvent(1L, 3.0), KeyedEvent(2L, 1.0))
        q.processAllAvailable()
        input.addData(KeyedEvent(1L, 5.0))
        q.processAllAvailable()
        val rows = spark.table("running_counts").as[RunningCount].collect()
        // Update mode emits one row per key per batch; the LAST row per key
        // carries the cumulative state.
        val latest = rows.groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.total) }
        latest(1L).total shouldBe 3L
        latest(1L).sum shouldBe 10.0
        latest(2L).total shouldBe 1L
      } finally q.stop()
    }
  }
}
