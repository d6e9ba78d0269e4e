package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Embedding quantization for storage/serving: symmetric per-vector int8
  * (the standard "scale = max|v|/127" scheme used to shrink embedding
  * tables 4× before ANN serving). All arithmetic is plain double column
  * algebra — map-only, no shuffle — and every emitted statistic is
  * engine-reproducible (the DuckDB oracle computes the identical codes).
  *
  * At 100 TB the point of int8 is that the CODES (dim bytes/vector)
  * replace the float vectors in every downstream scan; here the operator
  * emits per-vector quantization quality stats; the code array itself
  * stays a column (`__q`) callers can persist. */
object Quantization {

  private def dequant(q: Column, scale: Column): Column = q.cast("double") * scale

  /** Per-vector symmetric int8 quantization + reconstruction-quality stats:
    * (id, scale8, q_min, q_max, n_sat, recon_mae).
    *  - `scale8` = max|v| / 127 (0 for the all-zero vector);
    *  - codes are round(v/scale) clamped to [-127, 127] (`n_sat` counts
    *    components at the clamp boundary — ≥ 1 by construction for any
    *    non-zero vector, since the max-magnitude component maps to ±127);
    *  - `recon_mae` = mean |v − dequant(q)|, rounded to 6 decimals (the
    *    rounding absorbs last-ulp division noise across engines). */
  def int8Symmetric(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = F.col(vecCol)
    val absMax = F.array_max(F.transform(v, x => F.abs(x.cast("double"))))
    val scale = F.when(absMax > 0.0, absMax / 127.0).otherwise(F.lit(1.0))
    val q = F.transform(v, x =>
      F.greatest(F.lit(-127.0), F.least(F.lit(127.0), F.round(x.cast("double") / F.col("__scale"), 0))).cast("int"))
    val errSum = F.aggregate(
      F.zip_with(v, F.col("__q"), (x, c) => F.abs(x.cast("double") - dequant(c, F.col("__scale")))),
      F.lit(0.0), (acc, x) => acc + x)
    embeddings
      .withColumn("__scale", scale)
      .withColumn("__q", q)
      .select(
        F.col(idCol),
        F.round(F.col("__scale"), 6).as("scale8"),
        F.array_min(F.col("__q")).as("q_min"),
        F.array_max(F.col("__q")).as("q_max"),
        F.size(F.filter(F.col("__q"), c => F.abs(c) === 127)).cast("long").as("n_sat"),
        F.round(errSum / F.size(v), 6).as("recon_mae"))
  }
}
