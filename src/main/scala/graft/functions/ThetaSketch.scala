package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable k-minimum-values ("theta") distinct-value sketch buffer.
  *
  * `retained` is the committed sample: the ≤ k smallest DISTINCT 62-bit
  * item hashes seen so far, sorted ascending. `pending` is the unsorted
  * recent-insert buffer that amortizes per-row cost (a purely functional
  * k-min set would pay an O(k) copy per row); it folds into `retained`
  * when it reaches k, so per-row cost is O(1) amortized and buffer space
  * is ≤ 2k longs. A consolidated sketch has `pending` empty. */
final case class ThetaSketch(k: Int, retained: Seq[Long], pending: Seq[Long])

/** Deterministic theta (KMV) sketch for distinct counting AND set algebra
  * — the sketch family where intersections/differences are estimable,
  * which HLL fundamentally cannot do (Dasgupta, Lang, Rhodes, Thaler,
  * "A framework for estimating stream expression cardinalities" /
  * the Theta Sketch framework; Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD 2007).
  *
  * Items hash through FNV-1a over UTF-8 bytes then a splitmix64
  * finalizer, shifted into [0, 2^62): a pure function of the value, so
  * sketches are REPLAY-STABLE — the same input multiset yields the same
  * sketch under any partitioning, merge order, or streaming batch
  * boundaries (unlike sampled synopses). The k smallest distinct hashes
  * are kept; the k-th smallest is the implicit threshold θ.
  *
  * Estimators (D = 2^62, the hash-space size):
  *   - cardinality: exact `|retained|` while unsaturated (< k distinct
  *     values seen — the LOSSLESS regime, observable via [[Theta.saturated]]);
  *     once saturated, the unbiased KMV estimator (k−1)·D/θ with relative
  *     standard error ≈ 1/√(k−2).
  *   - set ops: for sketches A, B let t = min(θ_A, θ_B). Both retained
  *     sets restricted to hashes < t are uniform samples of A and B at
  *     the SAME inclusion threshold, so |{h < t} ∩| / (t/D) estimates
  *     |A ∩ B|, and likewise union / difference — the theta framework's
  *     composability. In the lossless regime t = D and every estimate is
  *     EXACT (hash-injective modulo 2^-62 collisions).
  *
  * The set-op arithmetic lives in `operators.SetSketches` as plain
  * column algebra over EXPLODED retained-hash rows — sketch partials are
  * data, so overlap estimation between N corpus slices is a k-bounded
  * join, not a driver loop. */
object Theta {
  /** Hash-space size as a double: hashes are uniform in [0, 2^62). */
  val D: Double = 4611686018427387904.0 // 2^62

  /** Sentinel θ for an unsaturated sketch: no threshold (all hashes kept);
    * strictly greater than any 62-bit hash, so `h < Unsaturated` is true. */
  val Unsaturated: Long = Long.MaxValue

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a over UTF-8 bytes + splitmix64 finalizer, top bit pair shifted
    * out → uniform in [0, 2^62). Pure, engine-independent, stable. */
  def hash(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    // splitmix64 finalizer: full-avalanche mix of the FNV state
    h += 0x9e3779b97f4a7c15L
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z >>> 2
  }

  def empty(k: Int): ThetaSketch = {
    require(k >= 16, "sketch capacity must be >= 16")
    ThetaSketch(k, Vector.empty, Vector.empty)
  }

  /** Fold `pending` into the sorted-distinct k-min `retained` set. */
  def consolidate(s: ThetaSketch): ThetaSketch =
    if (s.pending.isEmpty) s
    else ThetaSketch(s.k,
      (s.retained ++ s.pending).distinct.sorted.take(s.k).toVector, Vector.empty)

  /** Current θ upper bound (exact on a consolidated sketch). */
  def thetaRaw(s: ThetaSketch): Long =
    if (s.retained.size >= s.k) s.retained.last else Unsaturated

  def saturated(s: ThetaSketch): Boolean =
    consolidate(s).retained.size >= s.k

  def insert(s: ThetaSketch, item: String): ThetaSketch =
    insertHash(s, hash(item))

  /** Insert a pre-computed hash (the streaming-partial replay path). */
  def insertHash(s: ThetaSketch, h: Long): ThetaSketch = {
    // skip-ahead: θ of the consolidated prefix only shrinks as pending
    // folds in, so h ≥ that bound can never enter the k-min set
    if (s.retained.size >= s.k && h >= s.retained.last) s
    else {
      val grown = ThetaSketch(s.k, s.retained, h +: s.pending.toVector)
      if (grown.pending.size >= s.k) consolidate(grown) else grown
    }
  }

  /** Rebuild from exploded hash rows (streaming partials, any order). */
  def fromHashes(k: Int, hs: Iterable[Long]): ThetaSketch =
    consolidate(hs.foldLeft(empty(k))(insertHash))

  /** Union = k-min of the merged hash sets (associative, commutative). */
  def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = {
    val ca = consolidate(a)
    val cb = consolidate(b)
    ThetaSketch(a.k,
      (ca.retained ++ cb.retained).distinct.sorted.take(a.k).toVector, Vector.empty)
  }

  /** Distinct-count estimate: exact below saturation, KMV above. */
  def estimate(s: ThetaSketch): Double = {
    val c = consolidate(s)
    if (c.retained.size < c.k) c.retained.size.toDouble
    else (c.k - 1).toDouble * D / c.retained.last.toDouble
  }
}

/** Typed sketch-valued aggregator over string-form values (the
  * TableStats convention: sketch values via their string form). Null
  * inputs are skipped, matching COUNT(DISTINCT col) semantics. finish()
  * consolidates, so downstream readers see `pending` empty. */
final class ThetaSketchAggregator(k: Int) extends Aggregator[String, ThetaSketch, ThetaSketch] {
  override def zero: ThetaSketch = Theta.empty(k)
  override def reduce(b: ThetaSketch, x: String): ThetaSketch =
    if (x == null) b else Theta.insert(b, x)
  override def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = Theta.merge(a, b)
  override def finish(r: ThetaSketch): ThetaSketch = Theta.consolidate(r)
  override def bufferEncoder: Encoder[ThetaSketch] = Encoders.product[ThetaSketch]
  override def outputEncoder: Encoder[ThetaSketch] = Encoders.product[ThetaSketch]
}

/** Pre-hashed-input twin: re-aggregates EXPLODED sketch partials (the
  * streaming/incremental rebuild path — retained hashes are themselves
  * the mergeable summary, so folding them back through the k-min rule IS
  * the multi-way sketch union, distributed). */
final class ThetaHashAggregator(k: Int) extends Aggregator[Long, ThetaSketch, ThetaSketch] {
  override def zero: ThetaSketch = Theta.empty(k)
  override def reduce(b: ThetaSketch, h: Long): ThetaSketch = Theta.insertHash(b, h)
  override def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = Theta.merge(a, b)
  override def finish(r: ThetaSketch): ThetaSketch = Theta.consolidate(r)
  override def bufferEncoder: Encoder[ThetaSketch] = Encoders.product[ThetaSketch]
  override def outputEncoder: Encoder[ThetaSketch] = Encoders.product[ThetaSketch]
}
