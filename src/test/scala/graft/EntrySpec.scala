package graft

/** Mirror of the driver's smoke check: the flagship entry query returns
  * rows on sf0.001. */
class EntrySpec extends SparkSpec {
  it("entry() returns a non-empty pricing summary") {
    val rows = SparkEntry.entry(spark).collect()
    rows.length should be > 0
    rows.map(_.getAs[Long]("count_order")).sum should be > 1000L
  }

  it("every query is oracle-gated — including the real-codec decode round-trip") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    (o -- q) shouldBe empty
    (q -- o) shouldBe empty
  }
}
