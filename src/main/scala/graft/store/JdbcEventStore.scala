package graft.store

import java.sql.{Connection, DriverManager, Timestamp}
import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}

import graft.model.Schemas
import graft.operators.AuditQueries
import graft.operators.AuditQueries.RawEventFilter

/** JDBC (Postgres-parity) `EventStore` — the reference's actual backend
  * (`BASELINE.json: "JDBC sink to Postgres"`). Reads go through Spark's
  * JDBC source with predicate pushdown; writes use `INSERT … ON CONFLICT`
  * passthrough per partition, because Spark's JDBC sink has no native
  * upsert (SURVEY §7.3).
  *
  * DDL mirrors `pkg/db/sql/create_cf_audit_events.sql` /
  * `create_shipper_cursors.sql`, including the idempotent `metadata`
  * column migration (`:32`) and both CHECK constraints.
  *
  * Scale notes: each executor partition opens one connection and writes a
  * multi-row batched upsert — |partitions| parallel streams into the DB.
  * For true 100 TB ingest the ParquetEventStore is the primary store and
  * this sink is the egress-compatibility path, so its scale envelope is
  * the DB's, not Spark's.
  */
final class JdbcEventStore(spark: SparkSession, url: String, props: java.util.Properties)
    extends EventStore {

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  override def init(): Unit = withConn { c =>
    c.setAutoCommit(false) // one transaction, like store.go:331-343
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE IF NOT EXISTS cf_audit_events (
        |  id SERIAL,
        |  guid uuid UNIQUE NOT NULL PRIMARY KEY,
        |  created_at timestamptz NOT NULL CHECK (created_at > 'epoch'),
        |  event_type text NOT NULL,
        |  actor text NOT NULL, actor_type text NOT NULL,
        |  actor_name text NOT NULL, actor_username text NOT NULL,
        |  actee text NOT NULL, actee_type text NOT NULL, actee_name text NOT NULL,
        |  organization_guid uuid, space_guid uuid)""".stripMargin)
    st.execute("ALTER TABLE cf_audit_events ADD COLUMN IF NOT EXISTS metadata JSONB")
    st.execute(
      """CREATE TABLE IF NOT EXISTS shipper_cursors (
        |  name text PRIMARY KEY,
        |  updated_at timestamptz NOT NULL CHECK (updated_at > 'epoch'),
        |  shipped_id text NOT NULL)""".stripMargin)
    Seq("id", "guid", "created_at", "organization_guid", "space_guid", "event_type").foreach { col =>
      st.execute(s"CREATE INDEX IF NOT EXISTS idx_cf_audit_events_$col ON cf_audit_events ($col)")
    }
    c.commit()
  }

  override def events: DataFrame =
    spark.read.jdbc(url, "cf_audit_events", props)

  override def cursors: DataFrame =
    spark.read.jdbc(url, "shipper_cursors", props)

  override def storeCFAuditEvents(batch: DataFrame): Long = {
    val (valid, _) = AuditQueries.splitOnCheck(batch)
    val u = url; val p = props
    val stored = spark.sparkContext.longAccumulator("stored")
    valid.dropDuplicates("guid")
      .select("guid", "created_at", "event_type", "actor", "actor_type", "actor_name",
        "actor_username", "actee", "actee_type", "actee_name",
        "organization_guid", "space_guid", "metadata")
      .foreachPartition { (rows: Iterator[Row]) =>
        val c = DriverManager.getConnection(u, p)
        try {
          c.setAutoCommit(false) // one tx per partition (store.go:76-99 per page)
          val ps = c.prepareStatement(
            """INSERT INTO cf_audit_events (
              |  guid, created_at, event_type, actor, actor_type, actor_name,
              |  actor_username, actee, actee_type, actee_name,
              |  organization_guid, space_guid, metadata)
              |VALUES (?::uuid, ?, ?, ?, ?, ?, ?, ?, ?, ?, NULLIF(?,'')::uuid, NULLIF(?,'')::uuid, ?::jsonb)
              |ON CONFLICT (guid) DO NOTHING""".stripMargin)
          var n = 0L
          rows.foreach { r =>
            ps.setString(1, r.getString(0))
            ps.setTimestamp(2, r.getTimestamp(1))
            (3 to 10).foreach(i => ps.setString(i, r.getString(i - 1)))
            ps.setString(11, Option(r.getString(10)).getOrElse(""))
            ps.setString(12, Option(r.getString(11)).getOrElse(""))
            ps.setString(13, r.getString(12))
            n += ps.executeUpdate()
          }
          c.commit()
          stored.add(n)
        } finally c.close()
      }
    stored.value
  }

  override def getCFAuditEvents(filter: RawEventFilter): DataFrame =
    AuditQueries.eventsPage(events, filter)

  override def getLatestCFEventTime(): Timestamp = withConn { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT created_at FROM cf_audit_events ORDER BY created_at DESC LIMIT 1")
    if (rs.next()) rs.getTimestamp(1) else Schemas.epoch
  }

  override def getCFEventCount(): Long = withConn { c =>
    // reltuples statistics read, exactly store.go:310-329
    val rs = c.createStatement().executeQuery(
      "SELECT reltuples::numeric FROM pg_class WHERE relname = 'cf_audit_events'")
    if (rs.next()) rs.getBigDecimal(1).longValue() else 0L
  }

  override def getUnshippedCFAuditEventsForShipper(shipperName: String): DataFrame =
    AuditQueries.unshipped(events, cursors, shipperName)

  override def updateShipperCursor(shipperName: String, updatedAt: String, shippedId: String): Unit =
    withConn { c =>
      val ps = c.prepareStatement(
        """INSERT INTO shipper_cursors (name, updated_at, shipped_id)
          |VALUES (?, ?::timestamptz, ?)
          |ON CONFLICT (name) DO UPDATE
          |SET updated_at = excluded.updated_at, shipped_id = excluded.shipped_id""".stripMargin)
      ps.setString(1, shipperName)
      ps.setString(2, updatedAt) // raw string; DB casts (store.go:271-281)
      ps.setString(3, shippedId)
      ps.executeUpdate()
    }
}
