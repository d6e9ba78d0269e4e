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
  /** The (id, rounded scale, int8 codes) frame behind [[int8Symmetric]] —
    * what a production table persists: codes are computed against the
    * UNROUNDED scale (identical to int8Symmetric's), the emitted scale is
    * rounded to 6 decimals so both engines score from the same literal. */
  private def codesFrame(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = F.col(vecCol)
    val absMax = F.array_max(F.transform(v, x => F.abs(x.cast("double"))))
    val scale = F.when(absMax > 0.0, absMax / 127.0).otherwise(F.lit(1.0))
    df.withColumn("__scale", scale)
      .select(F.col(idCol).as("id"),
        F.round(F.col("__scale"), 6).as("s"),
        F.transform(v, x => F.greatest(F.lit(-127.0),
          F.least(F.lit(127.0), F.round(x.cast("double") / F.col("__scale"), 0)))
          .cast("long")).as("q"))
  }

  /** Top-k retrieval ENTIRELY in the quantized domain — the memory-bound
    * serving path int8 exists for: candidates are scored by the integer
    * dot of their codes (exact int64 arithmetic, engine-identical by
    * construction) rescaled by the two per-vector scales,
    * `i8_sim = idot·s_q·s_c ≈ ⟨q, c⟩`. No float vector is touched after
    * encode, so a 100 TB deployment scans dim bytes/vector instead of
    * 4·dim, and the bounded-heap shortlist keeps the exchange O(k) per
    * query. Ranking is deterministic: integer dot, 6-decimal snapped
    * scales, 4-decimal rounded product, cid tiebreak. */
  def int8TopK(embeddings: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = codesFrame(embeddings, idCol, vecCol)
      .select(F.col("id").as("cid"), F.col("s").as("cs"), F.col("q").as("cq"))
    val qs = codesFrame(queries, idCol, vecCol)
      .select(F.col("id").as("qid"), F.col("s").as("qsc"), F.col("q").as("qq"))
    val scored = corpus.crossJoin(F.broadcast(qs))
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("__idot", F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), (a, b) => a * b),
        F.lit(0L), (acc, x) => acc + x))
      .withColumn("i8_sim",
        F.round(F.col("__idot").cast("double") * F.col("qsc") * F.col("cs"), 4))
    Similarity.topKPerQuery(scored.select("qid", "cid", "i8_sim"), "i8_sim", k)
  }

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
