package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.graftnative.TopKFunctions.collectTopK

/** Pins the semantics the ANN shortlist paths rely on: `collectTopK` keeps
  * the k LARGEST elements under struct-lexicographic ordering and returns
  * them DESCENDING — so struct(score, -id) reproduces the
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k` shortlist
  * exactly, while staying map-side combinable (each partition holds at most
  * k elements per group before the shuffle; the window form shuffles and
  * sorts every candidate row). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 7.0, 9L), (1L, 2.0, 1L), (1L, 7.0, 2L),
    (2L, 1.0, 4L)).toDF("g", "s", "id")

  it("keeps the k largest structs, descending, with -id giving ASC id tie-break") {
    val out = rows.groupBy("g")
      .agg(collectTopK(F.struct(F.col("s"), (-F.col("id")).as("nid")), 3, reverse = false).as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), -x.getLong(1))))
      .toMap
    // group 1 ranked by (s DESC, id ASC): (7.0,2), (7.0,9), (5.0,3)
    out(1L) shouldBe Seq((7.0, 2L), (7.0, 9L), (5.0, 3L))
    out(2L) shouldBe Seq((1.0, 4L))
  }

  it("matches the row_number window form on random data (membership AND order)") {
    val rnd = new scala.util.Random(42)
    val big = Seq.fill(5000)((rnd.nextInt(50).toLong, rnd.nextInt(1000) / 7.0, rnd.nextInt(100000).toLong))
      .toDF("g", "s", "id")
      .dropDuplicates("g", "id")
    val k = 8
    val viaTopK = big.groupBy("g")
      .agg(collectTopK(F.struct(F.col("s"), (-F.col("id")).as("nid")), k, reverse = false).as("tk"))
      .select(F.col("g"), F.posexplode(F.col("tk")))
      .select(F.col("g"), (F.col("pos") + 1).cast("long").as("rn"), F.col("col.s").as("s"), (-F.col("col.nid")).as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(F.col("s").desc, F.col("id").asc)
    val viaWindow = big
      .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
      .select(F.col("g"), F.col("rn").cast("long"), F.col("s"), F.col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    viaTopK shouldBe viaWindow
  }

  it("is map-side combinable: the plan carries a partial aggregate, not a window sort") {
    val plan = rows.groupBy("g")
      .agg(collectTopK(F.struct(F.col("s"), F.col("id")), 3, reverse = false))
      .queryExecution.executedPlan.toString
    plan should include("partial_collect_top_k")
    plan should not include "Window"
  }
}
