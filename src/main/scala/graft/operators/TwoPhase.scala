package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** The TWO-PHASE DISTRIBUTED PREFIX scaffold behind every corpus-wide
  * running total in this library (sequence assignment, token packing,
  * budget selection, two-sample CDFs): range-repartition on the order so
  * partition id order IS the global order, tag rows with their partition
  * id, and compute each partition's EXCLUSIVE offset for every requested
  * total — a ≤ shuffle-partitions-row frame, broadcast to the join.
  * Callers lay their own within-partition window on top (inclusive or
  * exclusive, sums or row_number), so each call site keeps its exact
  * plan shape while the scaffold lives in one place.
  *
  * The offsets window is the only partition-less window and runs over
  * the per-partition totals frame — tiny by construction (the contract
  * PlanSpec pins for each caller). Totals are LONG-summed (every caller
  * accumulates exact integers — the determinism anchor). */
private[operators] object TwoPhase {

  /** Returns (parted, offsets): `parted` is `df` range-partitioned by
    * `order` with a `__pid` column; `offsets` has one row per partition
    * with `__pid` plus one exclusive-prefix column per `aggs` entry
    * (per-partition aggregate expression → offset column name). Join
    * `offsets` back with `F.broadcast` on `__pid`. */
  def partitionOffsets(df: DataFrame, order: Seq[Column],
                       aggs: Seq[(Column, String)]): (DataFrame, DataFrame) = {
    require(aggs.nonEmpty, "need at least one total")
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", F.spark_partition_id())
    val totCols = aggs.zipWithIndex.map { case ((e, _), i) => e.as(s"__tot$i") }
    val totals = parted.groupBy(F.col("__pid")).agg(totCols.head, totCols.tail: _*)
    val offWin = Window.orderBy(F.col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = aggs.zipWithIndex.foldLeft(totals) { case (t, ((_, name), i)) =>
        t.withColumn(name, F.coalesce(F.sum(F.col(s"__tot$i")).over(offWin), F.lit(0L)))
      }
      .select(F.col("__pid") +: aggs.map(a => F.col(a._2)): _*)
    (parted, offsets)
  }
}
