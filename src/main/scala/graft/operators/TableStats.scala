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

  /** Mergeable per-batch statistics — the incremental ANALYZE: each ingest
    * batch emits (col_name, n_rows, n_nulls, ndv_sketch) where the sketch
    * is a Datasketches HLL (binary, associatively mergeable). Partials
    * from any partition of the data union into [[mergeStats]] with no
    * rescan — maintain stats AT INGEST and never read 100 TB to refresh
    * the planner's inputs. Values are sketched via their string form
    * (injective, and uniform across batches/types). */
  def partialStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        (F.count(F.lit(1)) - F.count(F.col(c))).as(s"__nulls_$c"),
        F.hll_sketch_agg(F.col(c).cast("string")).as(s"__sk_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __n_$c, __nulls_$c, __sk_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_nulls, ndv_sketch)")
  }

  /** Merge any union of [[partialStats]] frames into final per-column
    * stats; counts sum exactly, sketches union with the HLL error bound. */
  def mergeStats(partials: DataFrame): DataFrame =
    partials.groupBy("col_name")
      .agg(F.sum("n_rows").as("n_rows"), F.sum("n_nulls").as("n_nulls"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("ndv_sketch"))).as("ndv_est"))

  /** Key-skew profile: Gini coefficient + max key share of the per-key
    * row-count distribution — the "is this join/aggregate key safe to
    * shuffle on" planner input (gini → 1 or a large max_share flags the
    * hot keys the SkewJoin salting path exists for).
    *
    * G = 2·Σ rank·cnt / (n·Σcnt) − (n+1)/n over counts ranked ascending
    * (ties broken by key — any tie order yields the same sum, but the
    * fixed order keeps the trajectory engine-exact). Ranking uses the
    * distributed two-phase sequencer ([[AuditQueries
    * .assignIngestSeqDistributed]]) over the KEY-level count frame —
    * never a single-partition window over data. The rank-weighted sum is
    * exact BIGINT arithmetic in both engines (Σ rank·cnt ≤ n·Σcnt;
    * overflow needs n·rows > 2^63 — re-express in double first at that
    * scale). Output: one row (n_keys, n_rows, gini, max_share). */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(F.col(keyCol).as("k")).agg(F.count(F.lit(1)).as("c"))
    val ranked = AuditQueries.assignIngestSeqDistributed(counts, 0L, Seq("c", "k"))
    ranked
      .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("c")).as("tot"),
        F.sum(F.col("id") * F.col("c")).as("wsum"), F.max(F.col("c")).as("mx"))
      .select(
        F.col("n").as("n_keys"), F.col("tot").as("n_rows"),
        F.round((F.lit(2.0) * F.col("wsum")) / (F.col("n").cast("double") * F.col("tot"))
          - (F.col("n") + F.lit(1.0)) / F.col("n"), 6).as("gini"),
        F.round(F.col("mx").cast("double") / F.col("tot"), 6).as("max_share"))
  }

  /** Predicted inner equi-join output cardinality WITHOUT executing the
    * join: sum over keys of count_a(key) * count_b(key). Two map-side-
    * combinable aggregates to key-level frames plus one key join — at
    * 100 TB this costs two shuffles of the KEY sets, vs materializing a
    * possibly-exploding join to count it. Exact for equi-joins (it is the
    * join-size identity, not an estimate); feed [[partialStats]] NDVs in
    * instead when even one key-level pass is too much. */
  def joinCardinality(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ca = a.groupBy(F.col(key)).agg(F.count(F.lit(1)).as("__na"))
    val cb = b.groupBy(F.col(key)).agg(F.count(F.lit(1)).as("__nb"))
    ca.join(cb, key)
      .agg(F.coalesce(F.sum(F.col("__na") * F.col("__nb")), F.lit(0L)).as("est_rows"))
  }
}
