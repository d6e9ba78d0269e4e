package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequency summary for heavy hitters. */
final case class HeavyHitters(items: Map[String, Long])

/** Misra–Gries heavy-hitters sketch as a typed mergeable `Aggregator` —
  * the 100 TB answer to "which tokens/domains/actors dominate?" without a
  * full `groupBy` over the key space: the summary holds at most `k`
  * counters regardless of cardinality, combines map-side like any
  * built-in aggregate, and the MERGE (Agarwal et al., "Mergeable
  * Summaries": sum counters, subtract the (k+1)-th largest, keep
  * positives) preserves the classic guarantee —
  *
  *  - every item with true count > n/(k+1) is PRESENT in the summary;
  *  - each reported count underestimates the true count by at most
  *    n/(k+1) (counts are lower bounds).
  *
  * With fewer than `k` distinct keys no decrement ever fires and the
  * summary is EXACT — which is what the oracle query pins (its k exceeds
  * the column's cardinality, so the sketch must equal the exact
  * `GROUP BY` counts); the spec separately asserts the approximation
  * bounds at k far below the cardinality, where the estimates are
  * order-dependent but the guarantees are not. */
final class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, HeavyHitters, HeavyHitters] {
  require(k >= 1, "heavy-hitters capacity must be >= 1")

  override def zero: HeavyHitters = HeavyHitters(Map.empty)

  override def reduce(b: HeavyHitters, x: String): HeavyHitters = {
    val m = b.items
    m.get(x) match {
      case Some(c) => HeavyHitters(m.updated(x, c + 1))
      case None if m.size < k => HeavyHitters(m.updated(x, 1L))
      case None =>
        // classic MG step: a full summary and a new key decrement ALL
        // counters by one (the new key's single occurrence included)
        HeavyHitters(m.collect { case (key, c) if c > 1 => key -> (c - 1) })
    }
  }

  override def merge(a: HeavyHitters, b: HeavyHitters): HeavyHitters = {
    val combined = b.items.foldLeft(a.items) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) HeavyHitters(combined)
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      HeavyHitters(combined.collect { case (key, c) if c > cut => key -> (c - cut) })
    }
  }

  override def finish(r: HeavyHitters): HeavyHitters = r
  override def bufferEncoder: Encoder[HeavyHitters] = Encoders.product[HeavyHitters]
  override def outputEncoder: Encoder[HeavyHitters] = Encoders.product[HeavyHitters]
}
