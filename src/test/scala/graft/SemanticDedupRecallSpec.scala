package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Similarity

/** Quality evidence for the semantic-dedup pair stage (the AnnRecallSpec
  * discipline applied to q_semantic_dedup's blocking): cluster blocking
  * buys Σ cell² pair cost at the price of CROSS-CELL misses — a near-dup
  * pair whose members land in different cells is never compared. Both
  * sides of that trade are measured here against exhaustive all-pairs
  * ground truth on the sf0.01 embeddings fixture (500 × 64-dim):
  *
  *  - measured pair recall at the grid's kC=8: 0.4375 (119/272 true
  *    cos ≥ 0.35 pairs survive blocking; cross-cell miss rate ≈ 56%) —
  *    floor-gated at 0.40. The fixture is near-isotropic, the HARD case:
  *    real duplicate pairs sit at cos ≈ 1 where both members share a
  *    nearest cell far more often than these barely-over-threshold pairs;
  *  - recall falls and cost shrinks together as kC grows (kC=2: 0.63 at
  *    62k candidates → kC=16: 0.27 at 7.7k candidates) — kC is the knob,
  *    and the candidate count tracks Σ cell·(cell−1)/2 EXACTLY, which is
  *    what keeps the stage near-linear at kC ≈ √N ([[Similarity.defaultKC]]).
  */
class SemanticDedupRecallSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private lazy val vecs: Array[(Long, Array[Double])] =
    emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  private def cos(u: Array[Double], w: Array[Double]): Double = {
    var d = 0.0; var un = 0.0; var wn = 0.0; var i = 0
    while (i < u.length) { d += u(i) * w(i); un += u(i) * u(i); wn += w(i) * w(i); i += 1 }
    BigDecimal(d / (math.sqrt(un) * math.sqrt(wn)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exhaustive ground truth, computed DRIVER-side: a DataFrame self-join
    * truth query is exactly the self-join-ambiguity trap (both vector
    * columns can resolve to the same input and every pair scores cos=1). */
  private lazy val truth: Set[(Long, Long)] =
    (for {
      i <- vecs.indices
      j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= 0.35
    } yield (vecs(i)._1, vecs(j)._1)).toSet

  private def model(kC: Int): Array[Array[Double]] =
    Similarity.snapCentroids(
      Similarity.trainIvfCentroids(emb, "vec_id", "embedding", kC))

  private def blockedPairs(kC: Int): Set[(Long, Long)] =
    Similarity.semanticDedupPairs(emb, "vec_id", "embedding", model(kC), 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  it("pair recall vs all-pairs ground truth is floor-gated at kC=8 (the grid setting)") {
    truth should not be empty
    val blocked = blockedPairs(8)
    // blocking only ever DROPS true pairs (precision is 1 by construction:
    // every surviving pair re-verified the exact cosine)
    (blocked -- truth) shouldBe empty
    val recall = (blocked intersect truth).size.toDouble / truth.size
    info(f"kC=8 pair recall = $recall%.4f (${(blocked intersect truth).size}/${truth.size}; " +
      f"cross-cell miss rate ${1 - recall}%.2f)")
    recall should be >= 0.40
  }

  it("candidate-pair cost tracks Sigma cell^2 exactly and shrinks ~1/kC as kC grows") {
    val costs = Seq(2, 4, 8, 16).map { kC =>
      val cents = model(kC)
      // Σ n_c·(n_c−1)/2 from the actual assignment histogram
      val sigma = emb.select(Similarity.nearestCell(F.col("embedding"), cents).as("cell"))
        .groupBy("cell").count().collect()
        .map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
      // the pair stage with the threshold disabled compares EXACTLY the
      // same-cell pairs — no hidden cross-cell work, no hidden pruning
      val cand = Similarity.semanticDedupPairs(emb, "vec_id", "embedding", cents, -1.0).count()
      cand shouldBe sigma
      kC -> cand
    }.toMap
    info(s"candidate pairs by kC: $costs")
    // balanced cells give ≈ n²/(2·kC): doubling kC halves the work; allow
    // slack for imbalance but require at least a 3x drop over the 8x range
    costs(16).toDouble should be < costs(2).toDouble / 3
    // and recall declines with kC — the documented trade (cost shrinks,
    // cross-cell misses grow); defaultKC picks √N on the cost side
    blockedPairs(2).size should be >= blockedPairs(16).size
    Similarity.defaultKC(500L) shouldBe 23
    Similarity.defaultKC(1000000L) shouldBe 1000
  }
}
