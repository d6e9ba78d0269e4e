package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Probabilistic record linkage (Fellegi–Sunter): score candidate pairs
  * by per-field agreement log-likelihood ratios and classify against
  * upper/lower thresholds — the decision layer that sits ON TOP of the
  * blocking joins ([[FuzzyJoin]] / [[IncrementalFuzzyJoin]]) in an
  * entity-resolution pipeline.
  *
  * For field i with match probability m_i (P(agree | same entity)) and
  * chance-agreement probability u_i (P(agree | different entities)), an
  * agreeing field contributes ln(m_i/u_i) > 0 and a disagreeing field
  * ln((1-m_i)/(1-u_i)) < 0; the pair weight is the sum. m/u are model
  * LITERALS (trained offline or set by a steward), so the whole score is
  * engine-mirrorable column algebra — no UDF, one map-only projection
  * over the candidate-pair frame. At 100 TB the cost profile is the
  * blocking join's, not the scorer's. */
object RecordLinkage {

  /** The summed log-likelihood weight of agreement indicator columns
    * (each a BooleanType) under literal (m, u) per field. */
  def weight(agreements: Seq[Column], m: Seq[Double], u: Seq[Double]): Column = {
    require(agreements.size == m.size && m.size == u.size,
      "one (m, u) pair per agreement field")
    m.indices.map { i =>
      require(m(i) > 0 && m(i) < 1 && u(i) > 0 && u(i) < 1, s"m/u in (0,1) at field $i")
      F.when(agreements(i), F.lit(math.log(m(i) / u(i))))
        .otherwise(F.lit(math.log((1.0 - m(i)) / (1.0 - u(i)))))
    }.reduce(_ + _)
  }

  /** Fellegi–Sunter three-way decision: weight ≥ upper → `match`,
    * ≤ lower → `non_match`, between → `possible` (clerical review). */
  def decision(w: Column, upper: Double, lower: Double): Column =
    F.when(w >= upper, F.lit("match"))
      .when(w <= lower, F.lit("non_match"))
      .otherwise(F.lit("possible"))
}
