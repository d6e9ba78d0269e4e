package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row, functions => F}

import graft.model.Schemas
import graft.operators.AuditQueries
import graft.operators.AuditQueries.RawEventFilter

/** Golden tests for the five reference query shapes — coverage the
  * reference itself lacks (its SQL is asserted nowhere, SURVEY §5). */
class AuditQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def ev(guid: String, at: String, kind: String = "audit.app.update"): (String, Timestamp, String) =
    (guid, ts(at), kind)

  private def eventsDf(rows: (String, Timestamp, String)*): DataFrame =
    rows.toSeq.toDF("guid", "created_at", "event_type")
      .withColumn("id", F.monotonically_increasing_id())

  private def cursorsDf(rows: (String, Timestamp, String)*): DataFrame =
    rows.toSeq.toDF("name", "updated_at", "shipped_id")

  private val emptyCursors =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.shipperCursors)

  describe("latestEventTime (R14)") {
    it("returns max(created_at)") {
      val df = eventsDf(ev("a", "2024-01-01T10:00:00Z"), ev("b", "2024-01-02T10:00:00Z"))
      AuditQueries.latestEventTime(df).collect()(0).getTimestamp(0) shouldBe ts("2024-01-02T10:00:00Z")
    }
    it("returns the epoch sentinel on an empty table (store.go:302-307)") {
      val df = eventsDf().filter(F.lit(false))
      AuditQueries.latestEventTime(df).collect()(0).getTimestamp(0) shouldBe Schemas.epoch
    }
  }

  describe("unshipped (store.go:191-225)") {
    val events = eventsDf(
      ev("g1", "2024-01-01T00:00:00Z"),
      ev("g2", "2024-01-02T00:00:00Z"),
      ev("g3", "2024-01-02T00:00:00Z"), // shares the boundary timestamp with g2
      ev("g4", "2024-01-03T00:00:00Z"))

    it("with no cursor, ships everything from the epoch default (R10 union default)") {
      val out = AuditQueries.unshipped(events, emptyCursors, "s", payloadCols = Seq("guid"))
      out.collect().map(_.getString(0)).sorted shouldBe Array("g1", "g2", "g3", "g4")
    }

    it("resumes from the cursor, re-ships boundary-timestamp events but excludes the exact last-shipped guid (R5/R6)") {
      val cursors = cursorsDf(("s", ts("2024-01-02T00:00:00Z"), "g2"))
      val out = AuditQueries.unshipped(events, cursors, "s", payloadCols = Seq("guid"))
      // g1 is before the cursor; g2 is the last-shipped; g3 shares its
      // timestamp and IS re-shipped (at-least-once); g4 follows.
      out.collect().map(_.getString(0)).sorted shouldBe Array("g3", "g4")
    }

    it("caps the batch and keeps the earliest events (R15)") {
      val out = AuditQueries.unshipped(events, emptyCursors, "s", batchCap = 2, payloadCols = Seq("guid"))
      out.collect().map(_.getString(0)).sorted shouldBe Array("g1", "g2")
    }

    it("ignores other shippers' cursors (R7)") {
      val cursors = cursorsDf(("other", ts("2024-01-02T00:00:00Z"), "g2"))
      val out = AuditQueries.unshipped(events, cursors, "s", payloadCols = Seq("guid"))
      out.collect().length shouldBe 4
    }
  }

  describe("dedupAgainst (R18/S7)") {
    it("drops in-batch duplicates and already-stored guids") {
      val batch = eventsDf(ev("a", "2024-01-01T00:00:00Z"), ev("a", "2024-01-01T00:00:00Z"),
        ev("b", "2024-01-01T00:00:00Z"), ev("c", "2024-01-01T00:00:00Z"))
      val existing = eventsDf(ev("b", "2024-01-01T00:00:00Z"))
      val out = AuditQueries.dedupAgainst(batch, existing)
      out.select("guid").collect().map(_.getString(0)).sorted shouldBe Array("a", "c")
    }
    it("is idempotent: storing a batch twice equals storing it once") {
      val batch = eventsDf(ev("a", "2024-01-01T00:00:00Z"), ev("b", "2024-01-01T00:00:00Z"))
      val once = AuditQueries.dedupAgainst(batch, eventsDf().filter(F.lit(false)))
      val twice = AuditQueries.dedupAgainst(batch.unionAll(batch), eventsDf().filter(F.lit(false)))
      twice.select("guid").collect().map(_.getString(0)).sorted shouldBe
        once.select("guid").collect().map(_.getString(0)).sorted
    }
  }

  describe("eventsPage (R11/R13/R23)") {
    it("orders by id, honors reverse/limit/kind") {
      val df = Seq(
        (1L, "g1", "a.b"), (2L, "g2", "x.y"), (3L, "g3", "a.b")
      ).toDF("id", "guid", "event_type")
      AuditQueries.eventsPage(df, RawEventFilter()).collect().map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
      AuditQueries.eventsPage(df, RawEventFilter(reverse = true, limit = Some(2)))
        .collect().map(_.getLong(0)) shouldBe Array(3L, 2L)
      AuditQueries.eventsPage(df, RawEventFilter(kind = Some("a.b")))
        .collect().map(_.getLong(0)) shouldBe Array(1L, 3L)
    }
  }

  describe("splitOnCheck (R21)") {
    it("quarantines zero-value timestamps") {
      val df = eventsDf(ev("a", "1970-01-01T00:00:00Z"), ev("b", "2024-01-01T00:00:00Z"))
      val (ok, bad) = AuditQueries.splitOnCheck(df)
      ok.collect().map(_.getString(0)) shouldBe Array("b")
      bad.collect().map(_.getString(0)) shouldBe Array("a")
    }
  }

  describe("ingest sequence (R20)") {
    it("assigns a dense total order by (created_at, guid) above the base") {
      val df = eventsDf(ev("b", "2024-01-01T00:00:00Z"), ev("a", "2024-01-01T00:00:00Z"),
        ev("c", "2024-01-02T00:00:00Z")).drop("id")
      val out = AuditQueries.assignIngestSeq(df, base = 10L)
        .orderBy("id").select("id", "guid").collect()
      out.map(r => (r.getLong(0), r.getString(1))) shouldBe
        Array((11L, "a"), (12L, "b"), (13L, "c"))
    }
    it("distributed assignment matches the single-window assignment") {
      val df = (1 to 500).map(i => (f"g$i%04d", ts("2024-01-01T00:00:00Z"), "t"))
        .toDF("guid", "created_at", "event_type")
      val simple = AuditQueries.assignIngestSeq(df, 0L).select("id", "guid").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      val dist = AuditQueries.assignIngestSeqDistributed(df, 0L).select("id", "guid").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      dist shouldBe simple
    }
  }

  describe("'' <-> NULL edge convention (R2/R3)") {
    it("round-trips empty strings through NULL") {
      val df = Seq("", "abc").toDF("g")
      val out = df.select(
        Schemas.emptyToNull(F.col("g")).as("n"),
        Schemas.nullToEmpty(Schemas.emptyToNull(F.col("g"))).as("e")).collect()
      out(0).isNullAt(0) shouldBe true
      out(0).getString(1) shouldBe ""
      out(1).getString(0) shouldBe "abc"
    }
  }
}
