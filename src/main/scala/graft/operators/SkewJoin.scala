package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Skew-mitigation utilities for large joins and aggregations.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) is the
  * first line of defense and is on by default; these helpers cover the
  * cases AQE can't re-plan — e.g. a hot key whose *build* side must be
  * replicated, or a two-phase aggregation over a heavily skewed group key.
  */
object SkewJoin {

  /** Salted equi-join for a skewed LEFT side: left rows get a random salt
    * in [0, buckets), the right side is replicated `buckets` times, and the
    * join key becomes (key, salt). Equivalent rows to a plain inner join,
    * but the hot key's rows spread over `buckets` reducers instead of one.
    *
    * Use when a handful of keys dominate (power-law fact tables); keep
    * `buckets` ≈ ceil(hot-key rows / target-partition rows). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", (F.rand(42) * buckets).cast("int"))
    val replicated = right
      .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation over a skewed group key:
    * phase 1 aggregates (key, salt) — spreading a hot key over `buckets`
    * partial groups — phase 2 merges the partials. `partials` maps the
    * input columns to partial aggregate columns; `merge` folds partials.
    *
    * Example: skewedAgg(df, "user_id", 16,
    *   Seq(count(lit(1)).as("n"), sum("value").as("s")),
    *   Seq(sum("n").as("n"), sum("s").as("s")))
    */
  def skewedAgg(
      df: DataFrame,
      key: String,
      buckets: Int,
      partials: Seq[Column],
      merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", (F.rand(42) * buckets).cast("int"))
      .groupBy(F.col(key), F.col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(F.col(key))
      .agg(merge.head, merge.tail: _*)

  /** Top-frequency keys of a column — for choosing explicit skew handling
    * (`threshold` = min rows to be considered hot). */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(F.col(key)).agg(F.count(F.lit(1)).as("n"))
      .filter(F.col("n") >= threshold)

  /** Bloom-reduced shuffle join (semi-join reduction): build a bloom
    * filter over the dim side's join keys in one combinable aggregate,
    * broadcast the few-hundred-KB bitset, and pre-filter the fact side
    * BEFORE its shuffle. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling only rows that can
    * possibly match a selective dim — the same row-level runtime
    * filtering Spark injects when statistics allow, here as an explicit
    * operator for the cases the optimizer can't see (dim selectivity
    * from an upstream computed filter, pre-shuffled inputs, non-equi
    * follow-ups). Bloom false positives only cost shuffle bytes — the
    * exact join behind the filter removes them — and the underlying
    * expression pair has a spec'd no-false-negative contract, so the
    * result is row-identical to the plain join.
    *
    * `expectedDimKeys` sizes the filter (bits = 8x keys ≈ 2% FP rate);
    * oversizing is cheap, undersizing only raises the FP (shuffle) rate. */
  def bloomReducedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      expectedDimKeys: Long = 1000000L): DataFrame = {
    // 1-row bounded collect: the serialized filter becomes a literal in
    // the fact-side scan predicate (might_contain requires a constant
    // filter — the contaminationBloom pattern).
    val bloomBytes = dim.agg(
      graft.functions.BloomSupport.bloomAgg(
        F.col(key), expectedDimKeys, expectedDimKeys * 8).as("__bf"))
      .head.getAs[Array[Byte]]("__bf")
    fact
      .filter(graft.functions.BloomSupport.mightContain(F.lit(bloomBytes), F.col(key)))
      .join(dim, Seq(key))
  }
}
