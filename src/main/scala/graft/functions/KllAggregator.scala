package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KLL-style quantile sketch buffer: `levels(h)` holds items of
  * weight 2^h, `flips(h)` alternates which half a compaction of level h
  * keeps, `n` is the total (weighted) item count, `compactions` counts
  * how many compaction steps have ever fired (0 = the sketch is EXACT —
  * the observable lossless-regime flag the hash-pinned oracles rely on;
  * sums under merge; not persisted by the streaming partial rows, which
  * carry only the item multiset). */
final case class KllSketch(levels: Seq[Seq[Double]], flips: Seq[Boolean], n: Long,
                           compactions: Long = 0L)

/** Estimates wrapper (product-encodable aggregator output). */
final case class KllEstimates(ests: Seq[Double])

/** KLL-style mergeable rank-error quantile sketch (Karnin–Lang–Liberty,
  * "Optimal quantile approximation in streams", FOCS 2016 — the compactor
  * hierarchy, here with deterministic alternating compaction instead of
  * coin flips: results are a pure function of the operation sequence, so
  * the per-batch STREAMING partials are replay-stable. Under distributed
  * partial aggregation the merge ORDER still varies run to run, which can
  * change which halves survive — estimates may then differ between runs,
  * each within the rank bound; only the exact (nothing-compacted) regime
  * and the streaming replay path are bitwise stable).
  *
  * Why this exists next to `Quantiles.gridQuantiles`: the grid histogram's
  * (max−min)/buckets VALUE-SPACE bound is vacuous on heavy-tailed domains
  * (doc lengths, token counts — exactly this engine's data: one 10^9
  * outlier makes every bucket 10^6 wide). A compactor sketch's guarantee
  * is a RANK bound — estimate(q) is the value at a rank within ε·n of
  * ⌈q·n⌉ — independent of the value distribution.
  *
  * Structure: a stack of buffers ("compactors"); level h items carry
  * weight 2^h. Capacity decays geometrically below the top level
  * (k·(2/3)^(top−h), floor 8), so total space is ≤ ~3k items regardless
  * of n. When a level overflows it is sorted and every other item is
  * promoted to the level above (the kept half alternates per compaction —
  * the deterministic stand-in for KLL's random offset), discarding half.
  * Each compaction at level h perturbs any rank by at most 2^h, and the
  * geometric capacity schedule keeps the summed perturbation O(n/k): the
  * classic analysis gives rank error ε·n with ε = O(1/k) in expectation
  * over offsets; the deterministic alternation preserves the same
  * magnitude empirically (gated by the spec on a 10-decade heavy-tail
  * fixture) while making merge/replay reproducible.
  *
  * EXACT regime: while total items ≤ level-0 capacity (= k when nothing
  * has compacted) no compaction ever fires and the sketch IS the sorted
  * data — `estimate(q)` equals the value at rank ⌈q·n⌉ exactly. The
  * oracle query pins this regime (k > group cardinality) with a hash
  * match; the approximation bounds are spec-gated where they belong.
  *
  * Merge concatenates levels pairwise, sums n, then re-compacts — the
  * mergeable-summaries contract: partial sketches combine map-side like
  * any built-in aggregate, and per-batch streaming partials multi-way
  * merge into a stream-wide sketch (StreamingQuantiles).
  */
object Kll {
  private val MinCap = 8

  /** Capacity of level `h` when the current top level is `top`. */
  private def cap(k: Int, top: Int, h: Int): Int =
    math.max(MinCap, math.ceil(k * math.pow(2.0 / 3.0, (top - h).toDouble)).toInt)

  def empty: KllSketch = KllSketch(Vector(Vector.empty), Vector(false), 0L)

  def insert(s: KllSketch, x: Double, k: Int): KllSketch =
    compress(KllSketch(s.levels.updated(0, x +: s.levels.head.toVector),
      s.flips, s.n + 1, s.compactions), k)

  /** Weighted insert: an item of weight `w` decomposes into its binary
    * digits — one copy at each level h where bit h of w is set (level h
    * items carry weight 2^h by construction, so the multiset semantics
    * are exact and a weighted item is indistinguishable from compaction
    * output; the rank-error analysis already counts weights in n). This
    * is the importance-weighted form: token-count-weighted doc-length
    * quantiles, sample-weight-corrected distributions. */
  def insertWeighted(s: KllSketch, x: Double, w: Long, k: Int): KllSketch = {
    require(w > 0, "weight must be positive")
    var levels = s.levels.toVector
    var flips = s.flips.toVector
    var h = 0
    var ww = w
    while (ww > 0) {
      if (levels.size <= h) { levels = levels :+ Vector.empty[Double]; flips = flips :+ false }
      if ((ww & 1L) == 1L) levels = levels.updated(h, x +: levels(h).toVector)
      ww >>= 1
      h += 1
    }
    // NOTE the capacity interaction: growing the hierarchy to bitlen(w)
    // levels shrinks LOW-level capacities to k*(2/3)^top — the effective
    // level-0 budget under max weight W is k*(2/3)^⌈log2 W⌉, which is
    // what a lossless-regime claim must be sized against (and what the
    // `compactions` counter makes checkable instead of assumed).
    compress(KllSketch(levels, flips, s.n + w, s.compactions), k)
  }

  /** Compact the lowest overflowing level until every level fits. */
  @annotation.tailrec
  def compress(s: KllSketch, k: Int): KllSketch = {
    val top = s.levels.size - 1
    val h = (0 to top).find(i => s.levels(i).size >= cap(k, top, i) && s.levels(i).size >= 2).getOrElse(-1)
    if (h < 0) s
    else {
      val sorted = s.levels(h).toVector.sorted
      val even = sorted.size - (sorted.size % 2)
      val offset = if (s.flips(h)) 1 else 0
      val kept = (offset until even by 2).map(sorted)
      // an odd leftover item stays at this level (it has no pair partner)
      val stay: Vector[Double] = if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
      val levels0 = s.levels.toVector.updated(h, stay)
      val levels1 =
        if (h + 1 <= top) levels0.updated(h + 1, levels0(h + 1).toVector ++ kept)
        else levels0 :+ kept.toVector
      val flips0 = s.flips.toVector.updated(h, !s.flips(h))
      val flips1 = if (h + 1 <= top) flips0 else flips0 :+ false
      compress(KllSketch(levels1, flips1, s.n, s.compactions + 1), k)
    }
  }

  /** True iff no compaction has ever fired: estimates are the EXACT
    * value-at-rank answers and bitwise stable under any merge order. */
  def isExact(s: KllSketch): Boolean = s.compactions == 0L

  def merge(a: KllSketch, b: KllSketch, k: Int): KllSketch = {
    val depth = math.max(a.levels.size, b.levels.size)
    val levels = Vector.tabulate(depth) { h =>
      val la = if (h < a.levels.size) a.levels(h).toVector else Vector.empty[Double]
      val lb = if (h < b.levels.size) b.levels(h).toVector else Vector.empty[Double]
      la ++ lb
    }
    val flips = Vector.tabulate(depth) { h =>
      val fa = h < a.flips.size && a.flips(h)
      val fb = h < b.flips.size && b.flips(h)
      fa ^ fb
    }
    compress(KllSketch(levels, flips, a.n + b.n, a.compactions + b.compactions), k)
  }

  /** The value whose cumulative weight first reaches ⌈q·n⌉ in the
    * weight-expanded sorted multiset (exact-regime twin: the value at
    * rank ⌈q·n⌉). NaN on an empty sketch. */
  def estimate(s: KllSketch, q: Double): Double = estimates(s, Seq(q)).head

  /** Batch form: ONE sort of the retained items serves every requested
    * rank (finish() would otherwise re-expand and re-sort per quantile). */
  def estimates(s: KllSketch, qs: Seq[Double]): Seq[Double] = {
    require(qs.forall(q => q > 0 && q <= 1), "q in (0, 1]")
    if (s.n == 0L) return qs.map(_ => Double.NaN)
    val items = (for {
      (lvl, h) <- s.levels.zipWithIndex
      x <- lvl
    } yield (x, 1L << h)).sortBy(_._1).toIndexedSeq
    qs.map { q =>
      val target = math.ceil(q * s.n).toLong
      var cum = 0L
      var i = 0
      var out = items.last._1
      var found = false
      while (i < items.size && !found) {
        cum += items(i)._2
        if (cum >= target) { out = items(i)._1; found = true }
        i += 1
      }
      out
    }
  }

  /** Total retained items (space probe for specs). */
  def size(s: KllSketch): Int = s.levels.map(_.size).sum
}

/** Sketch-valued aggregator: partial sketches for streaming/incremental
  * pipelines (explode `levels` into (level, value) partial rows). */
final class KllSketchAggregator(k: Int) extends Aggregator[Double, KllSketch, KllSketch] {
  require(k >= 8, "sketch capacity must be >= 8")
  override def zero: KllSketch = Kll.empty
  override def reduce(b: KllSketch, x: Double): KllSketch = Kll.insert(b, x, k)
  override def merge(a: KllSketch, b: KllSketch): KllSketch = Kll.merge(a, b, k)
  override def finish(r: KllSketch): KllSketch = r
  override def bufferEncoder: Encoder[KllSketch] = Encoders.product[KllSketch]
  override def outputEncoder: Encoder[KllSketch] = Encoders.product[KllSketch]
}

/** Shared scaffold of the quantile-valued aggregators: everything except
  * the per-row reduce (unweighted vs weighted insert) lives once here. */
sealed abstract class KllQuantilesAggBase[I](k: Int, qs: Seq[Double])
    extends Aggregator[I, KllSketch, KllEstimates] {
  require(k >= 8, "sketch capacity must be >= 8")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
  protected final def capacity: Int = k
  override final def zero: KllSketch = Kll.empty
  override final def merge(a: KllSketch, b: KllSketch): KllSketch = Kll.merge(a, b, k)
  override final def finish(r: KllSketch): KllEstimates = KllEstimates(Kll.estimates(r, qs))
  override final def bufferEncoder: Encoder[KllSketch] = Encoders.product[KllSketch]
  override final def outputEncoder: Encoder[KllEstimates] = Encoders.product[KllEstimates]
}

/** Quantile-valued aggregator: finish collapses the sketch to estimates
  * at the requested ranks (one array column; zip with the q list). */
final class KllQuantilesAggregator(k: Int, qs: Seq[Double])
    extends KllQuantilesAggBase[Double](k, qs) {
  override def reduce(b: KllSketch, x: Double): KllSketch = Kll.insert(b, x, capacity)
}

/** Weighted-input twin: rows are (value, weight); quantiles are over the
  * weight-expanded multiset (rank target ⌈q·Σw⌉). */
final class KllWeightedQuantilesAggregator(k: Int, qs: Seq[Double])
    extends KllQuantilesAggBase[(Double, Long)](k, qs) {
  override def reduce(b: KllSketch, xw: (Double, Long)): KllSketch =
    Kll.insertWeighted(b, xw._1, xw._2, capacity)
}
