package graft.operators

import org.apache.spark.sql.{Column, functions => F}

/** The six-exact-sum Pearson correlation, defined ONCE: r = (n·Σxy −
  * Σx·Σy) / √((n·Σxx − Σx²)(n·Σyy − Σy²)) over exact BIGINT sums
  * (order-independent — the cross-engine determinism anchor), NULL when
  * either variance is zero, round 6, −0.0 normalized. Both consumers
  * ([[Graph.assortativity]], [[TimeSeries.crossCorrelation]]) must stay
  * operand-for-operand identical to their SQL mirrors, so the operand
  * shape lives here and nowhere else.
  *
  * Range caveat (documented at both call sites' inputs): the Σxy/Σx²
  * sums are BIGINT — values ≫ 10⁶ over ≫ 10⁹ rows approach the 9.2e18
  * boundary, where Spark's non-ANSI multiply would wrap while the
  * DuckDB mirror (HUGEINT accumulate, CAST back) would error; such
  * inputs need a decimal widening on both sides. */
private[operators] object Pearson {

  /** Expects columns sx, sy, sxy, sxx, syy alongside the count column
    * `cnt`. */
  def fromSums(cnt: Column): Column = {
    val nd = cnt.cast("double")
    val vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    val vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    F.when(vx * vy > 0.0,
      F.round((nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / F.sqrt(vx * vy), 6) + F.lit(0.0))
  }
}
