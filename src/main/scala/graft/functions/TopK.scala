package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing surface for the native bounded top-k collect
  * (implementation in `org.apache.spark.sql.graftnative`). */
object TopK {
  /** Largest `k` values of `e` (struct-lexicographic), descending; with
    * `reverse = true`, smallest `k` ascending. Map-side combinable: each
    * partition holds at most k elements per group before the shuffle. */
  def collectTopK(e: Column, k: Int, reverse: Boolean = false): Column =
    org.apache.spark.sql.graftnative.TopKFunctions.collectTopK(e, k, reverse)
}
