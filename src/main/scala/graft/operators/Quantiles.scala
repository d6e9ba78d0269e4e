package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Histogram (fixed-grid) quantiles — the scale-first alternative to
  * sort-based exact percentiles: TWO map-side-combinable scans (bounds,
  * then bucket counts) replace the per-group sort, with a deterministic
  * VALUE-SPACE error bound of (max - min) / buckets. The per-group
  * histogram is trivially mergeable (counts add), so the same shape
  * serves incremental/streaming distribution monitoring.
  *
  * The estimate is the UPPER EDGE of the first bucket whose cumulative
  * count reaches ceil(q * n) — a deterministic formula mirrored verbatim
  * by the SQL oracle (identical IEEE arithmetic, no interpolation
  * ambiguity), never more than one bucket width above the exact
  * quantile. */
object Quantiles {

  /** Per-group quantile estimates over the NON-NULL population (the SQL
    * percentile convention — an unfiltered null would otherwise fall
    * through `least` into the top bucket while still inflating n): one
    * output row per (group, q). Output columns: groupCol, q, est. */
  def gridQuantiles(df0: DataFrame, valueCol: String, groupCol: String,
                    buckets: Int, qs: Seq[Double]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
    val df = df0.filter(F.col(valueCol).isNotNull)
    val v = F.col(valueCol).cast("double")
    val bounds = df.groupBy(groupCol).agg(
      F.min(v).as("__lo"), F.max(v).as("__hi"), F.count(F.lit(1)).as("__n"))
    val width = (F.col("__hi") - F.col("__lo")) / buckets
    // degenerate constant group: every value in bucket 0
    val idx = F.when(F.col("__hi") === F.col("__lo"), F.lit(0L))
      .otherwise(F.least(F.lit(buckets - 1L),
        F.floor((v - F.col("__lo")) / width)))
    val counts = df.join(F.broadcast(bounds), Seq(groupCol))
      .groupBy(F.col(groupCol), idx.as("__b"))
      .agg(F.count(F.lit(1)).as("__c"))
    val cum = counts.withColumn("__cum",
      F.sum("__c").over(Window.partitionBy(groupCol).orderBy("__b")))
    val withBounds = cum.join(F.broadcast(bounds), Seq(groupCol))
    val perQ = qs.map { q =>
      val est = F.when(F.col("__hi") === F.col("__lo"), F.col("__hi"))
        .otherwise(F.col("__lo") + (F.col("__b") + 1) * width)
      withBounds
        .filter(F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")))
        .groupBy(groupCol)
        .agg(F.lit(q).as("q"), F.round(F.min(est), 4).as("est"))
    }
    perQ.reduce(_.unionByName(_))
  }
}
