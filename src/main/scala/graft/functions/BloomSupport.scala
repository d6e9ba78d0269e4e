package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing surface for the native bloom-filter expressions
  * (implementation in `org.apache.spark.sql.graftnative` for private[sql]
  * access — the same aggregate/probe pair Spark's runtime filtering uses). */
object BloomSupport {
  /** Binary-typed aggregate: a serialized sketch BloomFilter over
    * xxhash64 of `value`, sized (items, numBits). */
  def bloomAgg(value: Column, items: Long, numBits: Long): Column =
    org.apache.spark.sql.graftnative.BloomFunctions.bloomAgg(value, items, numBits)

  /** Probe a serialized filter (no false negatives; false positives at the
    * sized rate). */
  def mightContain(bloom: Column, value: Column): Column =
    org.apache.spark.sql.graftnative.BloomFunctions.mightContain(bloom, value)
}
