package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Fixture-contract guard: the driver regenerates /root/testdata between
  * rounds and has already changed column encodings once (events.ts went
  * TIMESTAMP(NANOS) → timestamp[us] in round 7, silently breaking all 24
  * events-backed oracle queries). This spec pins the contract in-repo so
  * the NEXT schema drift breaks a named test with a readable message, not
  * two dozen silent oracle rows.
  *
  * Every table must load through the same `SparkEntry.t()` path the
  * queries use, carry the columns they select, and be non-empty.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** table -> columns the engine's queries actually select. */
  private val contract: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey"),
    "part"       -> Seq("p_partkey", "p_name"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
    "lineitem"   -> Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
                        "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label")
  )

  contract.foreach { case (table, cols) =>
    it(s"$table loads via SparkEntry.t() with its contracted columns and rows") {
      val df =
        try SparkEntry.t(spark, dir, table)
        catch {
          case e: Throwable =>
            fail(s"FIXTURE DRIFT: $dir/$table.parquet no longer loads through " +
              s"SparkEntry.t() — the driver likely regenerated testdata with a new " +
              s"encoding. Root error: ${e.getClass.getSimpleName}: ${e.getMessage}", e)
        }
      val missing = cols.filterNot(df.columns.contains)
      withClue(s"FIXTURE DRIFT: $table.parquet lost contracted columns $missing " +
        s"(has ${df.columns.toSeq}): ") { missing shouldBe empty }
      withClue(s"FIXTURE DRIFT: $table.parquet is empty: ") { df.count() should be > 0L }
    }
  }

  it("events.ts is normalized to a session-zoned micros TIMESTAMP whatever the file carries") {
    val dt = SparkEntry.t(spark, dir, "events").schema("ts").dataType
    withClue("EventsFixture must normalize ts to TimestampType for every fixture " +
      s"generation (nanos-as-long, micros, micros-NTZ); got $dt: ") {
      (dt == TimestampType || dt == TimestampNTZType) shouldBe true
      dt shouldBe TimestampType
    }
  }

  it("embeddings.embedding is a float array of consistent dimension") {
    val df = SparkEntry.t(spark, dir, "embeddings")
    val dims = df.selectExpr("size(embedding) as d").distinct().collect().map(_.getInt(0))
    withClue(s"FIXTURE DRIFT: embedding dimensions not uniform: ${dims.toSeq}: ") {
      dims.length shouldBe 1
    }
    dims.head should be > 0
  }
}
