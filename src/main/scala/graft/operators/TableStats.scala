package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Table statistics collection (the ANALYZE shape): per-column row count,
  * null count, and exact distinct count in ONE scan — all measures ride a
  * single aggregate row which a stack() projection unpivots to long form.
  * This is the statistics surface a cost-based planner (broadcast
  * decisions, join reorder) and the reference's informer loop (DB stats
  * poller, `pkg/db/store.go` reltuples analog) both feed on.
  *
  * Exact NDV is one shuffle per expand-group under Spark's single-pass
  * multi-distinct planning; for the 100 TB monitoring cadence swap
  * `countDistinct` for `approx_count_distinct` (HLL++, merge-combinable,
  * error-bound spec'd in ApproxSpec) — same output schema. */
object TableStats {

  def columnStats(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        (F.count(F.lit(1)) - F.count(F.col(c))).as(s"__nulls_$c"),
        (if (approx) F.approx_count_distinct(c) else F.countDistinct(F.col(c)))
          .as(s"__ndv_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __n_$c, __nulls_$c, __ndv_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_nulls, ndv)")
  }
}
