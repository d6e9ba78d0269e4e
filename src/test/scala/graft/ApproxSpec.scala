package graft

import org.apache.spark.sql.{functions => F}

/** Sketch aggregates for the 100 TB path: HLL++ distinct counts and
  * quantile sketches are the right answer when an exact groupBy-distinct
  * would shuffle the key universe. They cannot be DuckDB-oracle-gated
  * (each engine's sketch differs by design), so they are gated here by
  * error bounds against the exact answers on the fixtures — the same
  * spec-equivalence treatment as SkewJoin.
  *
  * Scale note: both are single-pass, fixed-size, mergeable state — the
  * map-side-combine profile that makes them usable where exact
  * countDistinct (expand + two-phase shuffle of every key) is not. */
class ApproxSpec extends SparkSpec {

  private lazy val events =
    graft.sources.EventsFixture.read(spark, "/root/testdata/sf0.01/events.parquet")
  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  it("approx_count_distinct (HLL++) lands within its rsd bound of the exact count") {
    val r = events.agg(
      F.countDistinct(F.col("user_id")).as("exact"),
      F.approx_count_distinct(F.col("user_id"), rsd = 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    math.abs(approx - exact) / exact should be < 0.05 // 2% rsd, 5% hard ceiling
  }

  it("per-group approx distinct tracks exact within 5% on every event_type") {
    val rows = events.groupBy("event_type").agg(
      F.countDistinct(F.col("user_id")).as("exact"),
      F.approx_count_distinct(F.col("user_id"), rsd = 0.02).as("approx")).collect()
    rows.length should be > 1
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      math.abs(r.getLong(2) - exact) / exact should be < 0.05
    }
  }

  it("approx_percentile stays within 1% relative error of the exact quantile") {
    val r = lineitem.agg(
      F.expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_p50"),
      F.expr("percentile(l_extendedprice, 0.99)").as("exact_p99"),
      F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("approx_p99")).collect()(0)
    math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0) should be < 0.01
    math.abs(r.getDouble(3) - r.getDouble(2)) / r.getDouble(2) should be < 0.01
  }

  it("freqItems (heavy hitters) returns a superset of the truly-frequent event types") {
    // the single-pass frequent-items sketch guarantees NO false negatives
    // above the support threshold — the property that makes it usable as
    // a pre-filter at 100 TB (false positives just take the exact count)
    val support = 0.1
    val total = events.count().toDouble
    val truth = events.groupBy("event_type").count()
      .filter(F.col("count") > total * support)
      .collect().map(_.getString(0)).toSet
    val sketched = events.stat.freqItems(Array("event_type"), support)
      .collect()(0).getSeq[String](0).toSet
    truth should not be empty
    truth.subsetOf(sketched) shouldBe true
  }
}
