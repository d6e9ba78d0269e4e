package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Moment sums for a d-dimensional covariance matrix: count, per-dim
  * sums, and the upper-triangle pairwise product sums (packed row-major:
  * pair (i ≤ j) at i·d − i(i−1)/2 + (j−i)). */
final case class CovPartial(n: Long, sums: Seq[Double], prods: Seq[Double])

/** One-pass mergeable covariance moments over a vector column — the
  * 100 TB shape for Σ/PCA statistics: a single combinable aggregate
  * carrying d + d(d+1)/2 doubles (d=64 → 2 144), instead of a
  * d(d+1)/2-expression aggregate (codegen collapse) or a d²-fold row
  * explosion (data inflation the scan would pay, not the summary).
  * Float elements are widened to double BEFORE multiplying (the same
  * per-term IEEE ops the SQL mirror runs); only summation order differs
  * across engines, collapsed by the consumer's rounding. */
final class CovMomentsAggregator(dim: Int)
    extends Aggregator[Seq[Float], CovPartial, CovPartial] {
  require(dim >= 1, "dimension must be positive")
  private val nProds = dim * (dim + 1) / 2

  override def zero: CovPartial =
    CovPartial(0L, new Array[Double](dim), new Array[Double](nProds))

  override def reduce(b: CovPartial, x: Seq[Float]): CovPartial = {
    if (x == null || x.length != dim) return b // skip malformed rows
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) { xs(i) = x(i).toDouble; i += 1 }
    val sums = b.sums.toArray
    val prods = b.prods.toArray
    var idx = 0
    i = 0
    while (i < dim) {
      sums(i) += xs(i)
      var j = i
      while (j < dim) { prods(idx) += xs(i) * xs(j); idx += 1; j += 1 }
      i += 1
    }
    CovPartial(b.n + 1, sums, prods)
  }

  override def merge(a: CovPartial, b: CovPartial): CovPartial = {
    val sums = a.sums.toArray
    val prods = a.prods.toArray
    var i = 0
    while (i < dim) { sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < nProds) { prods(i) += b.prods(i); i += 1 }
    CovPartial(a.n + b.n, sums, prods)
  }

  override def finish(r: CovPartial): CovPartial = r
  override def bufferEncoder: Encoder[CovPartial] = Encoders.product[CovPartial]
  override def outputEncoder: Encoder[CovPartial] = Encoders.product[CovPartial]
}
