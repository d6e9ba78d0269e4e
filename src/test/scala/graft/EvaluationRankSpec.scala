package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Evaluation

/** Score-based evaluation: ROC AUC / average precision (rank algebra,
  * tie handling), Brier + skill, reliability bins + ECE, and the
  * retrieval metrics (precision/recall@k, MRR, nDCG). Every case is
  * hand-worked — the pair-counting cross-checks are in the comments. */
class EvaluationRankSpec extends SparkSpec {
  import spark.implicits._

  // pos scores [3, 5, 5, 7], neg scores [1, 3, 5, 6]:
  // concordant/tied pairs = 1.5 + 2.5 + 2.5 + 4 = 10.5 of 16 -> 0.65625
  private def tiedScores =
    Seq((3.0, true), (5.0, true), (5.0, true), (7.0, true),
      (1.0, false), (3.0, false), (5.0, false), (6.0, false))
      .toDF("score", "y")

  it("rocAuc matches the hand pair count, half-crediting ties") {
    val r = Evaluation.rocAuc(tiedScores, "score", "y").collect().head
    r.getAs[Long]("n_pos") shouldBe 4L
    r.getAs[Long]("n_neg") shouldBe 4L
    r.getAs[Double]("auc") shouldBe 0.65625 +- 1e-9
  }

  it("rocAuc is 1 for perfect separation, 0.5 expected for a constant score, NULL for one class") {
    val perfect = Seq((2.0, true), (3.0, true), (0.0, false), (1.0, false)).toDF("s", "y")
    Evaluation.rocAuc(perfect, "s", "y").collect().head.getAs[Double]("auc") shouldBe 1.0
    // constant score: every pair is a tie -> exactly 0.5
    val const = Seq((1.0, true), (1.0, false), (1.0, false)).toDF("s", "y")
    Evaluation.rocAuc(const, "s", "y").collect().head.getAs[Double]("auc") shouldBe 0.5
    val onlyPos = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val r = Evaluation.rocAuc(onlyPos, "s", "y").collect().head
    r.isNullAt(r.fieldIndex("auc")) shouldBe true
  }

  it("rocAucCi matches the hand DeLong variance and degenerates honestly") {
    // placements on the tied fixture: V10 = {.375, .625, .625, 1},
    // V01 = {1, .875, .5, .25}; S10 = .06640625, S01 = .11848958;
    // se = sqrt(S10/4 + S01/4) ~= .214997
    val r = Evaluation.rocAucCi(tiedScores, "score", "y").collect().head
    r.getAs[Double]("auc") shouldBe 0.65625 +- 1e-9
    r.getAs[Double]("se") shouldBe 0.214997 +- 1e-5
    r.getAs[Double]("ci_lo") shouldBe (0.65625 - 1.96 * 0.2149966) +- 1e-4
    r.getAs[Double]("ci_hi") shouldBe 1.0 // clipped
    // perfect separation: zero variance, a degenerate [1, 1] interval
    val perfect = Seq((2.0, true), (3.0, true), (0.0, false), (1.0, false)).toDF("s", "y")
    val p = Evaluation.rocAucCi(perfect, "s", "y").collect().head
    p.getAs[Double]("auc") shouldBe 1.0
    p.getAs[Double]("se") shouldBe 0.0
    p.getAs[Double]("ci_lo") shouldBe 1.0
    // a single positive cannot carry a variance: NULL se and bands
    val one = Seq((2.0, true), (1.0, false), (0.0, false)).toDF("s", "y")
    val o = Evaluation.rocAucCi(one, "s", "y").collect().head
    o.isNullAt(o.fieldIndex("se")) shouldBe true
    o.isNullAt(o.fieldIndex("ci_lo")) shouldBe true
  }

  it("averagePrecision matches the hand step walk over tied blocks") {
    // thresholds desc: 7 -> (1/4)(1/1); 5 -> (2/4)(3/5); 3 -> (1/4)(4/7)
    // AP = 0.25 + 0.3 + 1/7 = 0.692857
    val r = Evaluation.averagePrecision(tiedScores, "score", "y").collect().head
    r.getAs[Double]("prevalence") shouldBe 0.5
    r.getAs[Double]("pr_auc") shouldBe 0.692857 +- 1e-6
    // perfect ranking -> AP 1; no positives -> NULL
    val perfect = Seq((2.0, true), (1.0, false)).toDF("s", "y")
    Evaluation.averagePrecision(perfect, "s", "y")
      .collect().head.getAs[Double]("pr_auc") shouldBe 1.0
    val nopos = Seq((2.0, false), (1.0, false)).toDF("s", "y")
    val n = Evaluation.averagePrecision(nopos, "s", "y").collect().head
    n.isNullAt(n.fieldIndex("pr_auc")) shouldBe true
  }

  it("brier matches the hand mean-squared gap and skill vs climatology") {
    // (0.9,1)(0.8,1)(0.4,1)(0.3,0)(0.2,0): SE = .01+.04+.36+.09+.04 = .54
    // brier = .108; prev = .6 -> ref = .24; skill = 1 - .45 = .55
    val df = Seq((0.9, true), (0.8, true), (0.4, true), (0.3, false), (0.2, false))
      .toDF("p", "y")
    val r = Evaluation.brier(df, "p", "y").collect().head
    r.getAs[Long]("n") shouldBe 5L
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Double]("brier") shouldBe 0.108 +- 1e-9
    r.getAs[Double]("brier_ref") shouldBe 0.24 +- 1e-9
    r.getAs[Double]("skill") shouldBe 0.55 +- 1e-9
    // single-class input: BS_ref = 0, skill unmeasurable -> NULL
    val one = Seq((0.9, true), (0.7, true)).toDF("p", "y")
    val d = Evaluation.brier(one, "p", "y").collect().head
    d.isNullAt(d.fieldIndex("skill")) shouldBe true
  }

  it("calibrationBins clamps p = 1.0 into the top bin and reports hand gaps; ECE folds them") {
    val df = Seq((0.05, false), (0.15, false), (0.15, true), (0.95, true), (1.0, true))
      .toDF("p", "y")
    val bins = Evaluation.calibrationBins(df, "p", "y").collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    bins.keySet shouldBe Set(0L, 1L, 9L)
    bins(1L).getAs[Long]("n") shouldBe 2L
    bins(1L).getAs[Double]("mean_pred") shouldBe 0.15 +- 1e-9
    bins(1L).getAs[Double]("frac_pos") shouldBe 0.5
    bins(1L).getAs[Double]("gap") shouldBe 0.35 +- 1e-9
    bins(9L).getAs[Long]("n") shouldBe 2L // 0.95 and the clamped 1.0
    bins(9L).getAs[Double]("mean_pred") shouldBe 0.975 +- 1e-9
    bins(9L).getAs[Double]("gap") shouldBe 0.025 +- 1e-9
    // ECE = (1*0.05 + 2*0.35 + 2*0.025)/5 = 0.16
    val e = Evaluation.ece(df, "p", "y").collect().head
    e.getAs[Long]("n") shouldBe 5L
    e.getAs[Long]("bins_used") shouldBe 3L
    e.getAs[Double]("ece") shouldBe 0.16 +- 1e-9
  }

  it("eceByGroup keys the calibration read by the audit group") {
    val df = Seq(("g1", 0.15, true), ("g1", 0.15, false),
      ("g2", 0.95, true), ("g2", 0.95, true)).toDF("g", "p", "y")
    val out = Evaluation.eceByGroup(df, "g", "p", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    // g1: one bin, frac .5 vs mean .15 -> gap .35; g2: |1 - .95| = .05
    out("g1").getAs[Double]("ece") shouldBe 0.35 +- 1e-9
    out("g1").getAs[Double]("max_gap") shouldBe 0.35 +- 1e-9
    out("g2").getAs[Double]("ece") shouldBe 0.05 +- 1e-9
    out("g2").getAs[Long]("bins_used") shouldBe 1L
  }

  it("upliftTable separates the arms on the combined ranking and finds the planted top-tile effect") {
    // scores 4..1, each with one treated and one control row; only the
    // top two scores respond, and only under treatment
    val rows = Seq(
      (4.0, true, true), (4.0, false, false),
      (3.0, true, true), (3.0, false, false),
      (2.0, true, false), (2.0, false, false),
      (1.0, true, false), (1.0, false, false)).toDF("s", "t", "y")
    val out = Evaluation.upliftTable(rows, "s", "t", "y", tiles = 2)
      .collect().map(r => r.getAs[Long]("tile") -> r).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L).getAs[Long]("n_treated") shouldBe 2L
    out(1L).getAs[Double]("rate_treated") shouldBe 1.0
    out(1L).getAs[Double]("rate_control") shouldBe 0.0
    out(1L).getAs[Double]("uplift") shouldBe 1.0
    out(2L).getAs[Double]("uplift") shouldBe 0.0
    // cumulative through tile 2: 2/4 treated vs 0/4 control
    out(2L).getAs[Double]("cum_uplift") shouldBe 0.5
    // a tile with an empty arm reports NULL uplift, not a blowup
    val oneArm = Seq((2.0, true, true), (1.0, false, false)).toDF("s", "t", "y")
    val oa = Evaluation.upliftTable(oneArm, "s", "t", "y", tiles = 2)
      .collect().map(r => r.getAs[Long]("tile") -> r).toMap
    oa(1L).isNullAt(oa(1L).fieldIndex("rate_control")) shouldBe true
    oa(1L).isNullAt(oa(1L).fieldIndex("uplift")) shouldBe true
  }

  it("qini matches the hand trapezoid walk and reads ~0 for random targeting") {
    // the planted-uplift fixture: q = 2 at both tiles -> area 1.5,
    // random diagonal area 1, qini = (1.5 - 1)/4 treated = 0.125
    val rows = Seq(
      (4.0, true, true), (4.0, false, false),
      (3.0, true, true), (3.0, false, false),
      (2.0, true, false), (2.0, false, false),
      (1.0, true, false), (1.0, false, false)).toDF("s", "t", "y")
    val r = Evaluation.qini(rows, "s", "t", "y", tiles = 2).collect().head
    r.getAs[Long]("n_treated") shouldBe 4L
    r.getAs[Double]("q_final") shouldBe 2.0
    r.getAs[Double]("qini") shouldBe 0.125 +- 1e-9
    // uniform uplift (every score carries the full arm x outcome grid):
    // the gain curve IS the diagonal, qini exactly 0
    val unif = (for {
      sc <- 1 to 4; t <- Seq(true, false); y <- Seq(true, false)
    } yield (sc.toDouble, t, y)).toDF("s", "t", "y")
    Evaluation.qini(unif, "s", "t", "y", tiles = 4)
      .collect().head.getAs[Double]("qini") shouldBe 0.0 +- 1e-9
    // an anti-ranker (persuadables ranked LAST) goes negative
    val anti = rows.withColumn("s", -F.col("s"))
    Evaluation.qini(anti, "s", "t", "y", tiles = 2)
      .collect().head.getAs[Double]("qini") should be < 0.0
  }

  it("aucCompare detects the better scorer with a paired z; identical scorers are NULL") {
    // A separates perfectly, B ranks backwards — the paired diff is 1
    val df = Seq(
      (10.0, 1.0, true), (9.0, 2.0, true), (8.0, 3.0, true), (7.0, 4.0, true),
      (4.0, 7.0, false), (3.0, 8.0, false), (2.0, 9.0, false), (1.0, 10.0, false))
      .toDF("a", "b", "y")
    val r = Evaluation.aucCompare(df, "a", "b", "y").collect().head
    r.getAs[Double]("auc_a") shouldBe 1.0
    r.getAs[Double]("auc_b") shouldBe 0.0
    r.getAs[Double]("diff") shouldBe 1.0
    // both scorers are deterministic on this fixture: every placement
    // is 0 or 1 with no within-class spread, so the paired variance is
    // 0 and the honest z is NULL, not infinite
    r.isNullAt(r.fieldIndex("z")) shouldBe true
    // a real scorer vs a chance scorer on the same rows: rejects, and
    // swapping the operands negates z
    val rnd2 = new scala.util.Random(41)
    val mix = Seq.fill(300) {
      val y = rnd2.nextBoolean()
      ((if (y) 8 else 0) + rnd2.nextInt(10).toDouble, rnd2.nextInt(20).toDouble, y)
    }.toDF("a", "b", "y")
    val m = Evaluation.aucCompare(mix, "a", "b", "y").collect().head
    m.getAs[Boolean]("reject_95") shouldBe true
    m.getAs[Double]("z") should be > 1.96
    val rev = Evaluation.aucCompare(mix, "b", "a", "y").collect().head
    rev.getAs[Double]("z") shouldBe -m.getAs[Double]("z")
    // the same scorer twice: zero diff, degenerate variance -> NULL z
    val same = Evaluation.aucCompare(
      df.withColumn("a2", F.col("a")), "a", "a2", "y").collect().head
    same.getAs[Double]("diff") shouldBe 0.0
    same.isNullAt(same.fieldIndex("z")) shouldBe true
    // paired beats unpaired: correlated noisy scorers with a planted
    // gap — the paired SE must be smaller than either solo DeLong SE
    val rnd = new scala.util.Random(23)
    val corr = Seq.fill(400) {
      val y = rnd.nextBoolean()
      val base = rnd.nextInt(30) + (if (y) 6 else 0)
      (base + rnd.nextInt(3).toDouble, base + rnd.nextInt(6).toDouble, y)
    }.toDF("a", "b", "y")
    val pairedSe = Evaluation.aucCompare(corr, "a", "b", "y")
      .collect().head.getAs[Double]("se")
    val soloSe = Evaluation.rocAucCi(corr, "a", "y").collect().head.getAs[Double]("se")
    pairedSe should be < soloSe
  }

  it("clusterAgreement: identity scores 1, independence ~0, degenerate partitions NULL honestly") {
    import graft.operators.Evaluation
    val ident = (0 until 60).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r1 = Evaluation.clusterAgreement(ident, "a", "b").collect().head
    r1.getAs[Double]("ari") shouldBe 1.0
    r1.getAs[Double]("nmi") shouldBe 1.0
    // balanced independent partitions: I(A;B) = 0 exactly; ARI the
    // small hand-computed negative (1200 - 1212.62...)/(2450 - 1212.62...)
    val indep = (0 until 100).map(i => (i % 2, (i / 2) % 2)).toDF("a", "b")
    val r2 = Evaluation.clusterAgreement(indep, "a", "b").collect().head
    r2.getAs[Double]("nmi") shouldBe 0.0
    r2.getAs[Double]("ari") shouldBe -0.010204 +- 1e-4
    // one side a single cluster: ARI 0 (chance), NMI undefined
    val onec = (0 until 40).map(i => (i % 4, 0)).toDF("a", "b")
    val r3 = Evaluation.clusterAgreement(onec, "a", "b").collect().head
    r3.getAs[Double]("ari") shouldBe 0.0
    r3.isNullAt(r3.fieldIndex("nmi")) shouldBe true
    // both trivial: agreement unmeasurable, not perfect
    val triv = (0 until 10).map(_ => (1, 1)).toDF("a", "b")
    val r4 = Evaluation.clusterAgreement(triv, "a", "b").collect().head
    r4.isNullAt(r4.fieldIndex("ari")) shouldBe true
    // a label permutation is still a perfect recovery
    val perm = (0 until 60).map(i => (i % 3, (i % 3 + 1) % 3)).toDF("a", "b")
    Evaluation.clusterAgreement(perm, "a", "b")
      .collect().head.getAs[Double]("ari") shouldBe 1.0
  }

  it("vocabOverlap reports hand Jaccard/containment and keeps zero-overlap pairs") {
    import graft.operators.TextAnalysis
    val df = Seq(("A", "a b c"), ("B", "b c d"), ("C", "x")).toDF("src", "text")
    val out = TextAnalysis.vocabOverlap(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    out.keySet shouldBe Set(("A", "B"), ("A", "C"), ("B", "C"))
    val ab = out(("A", "B"))
    ab.getAs[Long]("v1") shouldBe 3L
    ab.getAs[Long]("n_inter") shouldBe 2L // {b, c}
    ab.getAs[Double]("jaccard") shouldBe 0.5
    ab.getAs[Double]("containment") shouldBe 0.666667 +- 1e-9
    // the disjoint pair is PRESENT at zero, not missing
    out(("A", "C")).getAs[Long]("n_inter") shouldBe 0L
    out(("A", "C")).getAs[Double]("jaccard") shouldBe 0.0
    // a subset source reads containment 1.0 while Jaccard stays < 1
    val sub = Seq(("A", "a b c d"), ("B", "b c")).toDF("src", "text")
    val s2 = TextAnalysis.vocabOverlap(sub, "src", "text").collect().head
    s2.getAs[Double]("containment") shouldBe 1.0
    s2.getAs[Double]("jaccard") shouldBe 0.5
  }

  it("vocabCoverage matches the hand Good-Turing/Chao1 numbers") {
    import graft.operators.TextAnalysis
    // tokens: a a b c -> N=4, V=3, f1=2, f2=1; coverage .5; chao1 = 3 + 4/2
    val r = TextAnalysis.vocabCoverage(Seq("a a", "b c").toDF("text"), "text")
      .collect().head
    r.getAs[Long]("n_tokens") shouldBe 4L
    r.getAs[Long]("n_types") shouldBe 3L
    r.getAs[Long]("f1") shouldBe 2L
    r.getAs[Long]("f2") shouldBe 1L
    r.getAs[Double]("coverage") shouldBe 0.5
    r.getAs[Double]("p_unseen") shouldBe 0.5
    r.getAs[Double]("chao1") shouldBe 5.0
    // f2 = 0: the bias-corrected Chao1 form, not a division blowup
    val z = TextAnalysis.vocabCoverage(Seq("a b").toDF("text"), "text")
      .collect().head
    z.getAs[Double]("chao1") shouldBe 3.0
    // a saturated corpus (every type repeated) reads coverage 1
    val sat = TextAnalysis.vocabCoverage(Seq("x x y y").toDF("text"), "text")
      .collect().head
    sat.getAs[Double]("coverage") shouldBe 1.0
    sat.getAs[Double]("chao1") shouldBe 2.0
    // empty corpus -> EMPTY, not a NULL row
    TextAnalysis.vocabCoverage(Seq("").toDF("text"), "text")
      .collect() shouldBe empty
  }

  it("isotonicCalibration pools adjacent violators to the least-squares monotone fit") {
    // rates by x: 1.0, 0.0, 1.0 -> PAVA pools the first two to 0.5
    val df = Seq((1.0, true), (2.0, false), (3.0, true)).toDF("s", "y")
    val out = Evaluation.isotonicCalibration(df, "s", "y")
      .orderBy("x").collect()
    out.map(_.getAs[Double]("rate")).toSeq shouldBe Seq(1.0, 0.0, 1.0)
    out.map(_.getAs[Double]("iso_rate")).toSeq shouldBe Seq(0.5, 0.5, 1.0)
    // a fully decreasing input pools to the global mean everywhere
    val dec = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false)).toDF("s", "y")
    Evaluation.isotonicCalibration(dec, "s", "y").collect()
      .map(_.getAs[Double]("iso_rate")).toSet shouldBe Set(0.5)
    // an already-monotone input is a fixed point
    val mono = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)).toDF("s", "y")
    val m = Evaluation.isotonicCalibration(mono, "s", "y").orderBy("x").collect()
    m.map(_.getAs[Double]("iso_rate")).toSeq shouldBe Seq(0.0, 0.0, 1.0, 1.0)
    // monotonicity is structural: iso_rate never decreases in x
    val rand = new scala.util.Random(17)
    val noisy = Seq.fill(300)(((rand.nextInt(40) + 1).toDouble, rand.nextInt(3) > 0))
      .toDF("s", "y")
    val fit = Evaluation.isotonicCalibration(noisy, "s", "y")
      .orderBy("x").collect().map(_.getAs[Double]("iso_rate"))
    fit.sliding(2).foreach { case Array(a, b) => a should be <= b }
  }

  it("bestThreshold picks the max-J cut, tie-broken to the smallest threshold") {
    // J over cuts of the tied fixture: x=3 -> 0.25, x=5 -> 0.25, x=7 ->
    // 0.25 (three-way tie) -> smallest cut 3 wins
    val r = Evaluation.bestThreshold(tiedScores, "score", "y").collect().head
    r.getAs[Double]("threshold") shouldBe 3.0
    r.getAs[Double]("tpr") shouldBe 1.0
    r.getAs[Double]("fpr") shouldBe 0.75
    r.getAs[Double]("j_stat") shouldBe 0.25
    r.getAs[Double]("precision") shouldBe 0.571429 +- 1e-9 // 4 of 7 kept
    r.getAs[Double]("accuracy") shouldBe 0.625
    // perfect separation: J = 1 at the positive class's minimum
    val perfect = Seq((2.0, true), (3.0, true), (0.0, false), (1.0, false)).toDF("s", "y")
    val p = Evaluation.bestThreshold(perfect, "s", "y").collect().head
    p.getAs[Double]("threshold") shouldBe 2.0
    p.getAs[Double]("j_stat") shouldBe 1.0
    // one-class input: no cut is comparable -> EMPTY
    Evaluation.bestThreshold(Seq((1.0, true), (2.0, true)).toDF("s", "y"),
      "s", "y").collect() shouldBe empty
  }

  it("rocAucByGroup scores each slice independently; a one-class slice is NULL, not 0.5") {
    // slice A = the tied fixture (0.65625), B perfectly separated, C one-class
    val rows =
      Seq((3.0, true), (5.0, true), (5.0, true), (7.0, true),
        (1.0, false), (3.0, false), (5.0, false), (6.0, false)).map(r => ("A", r._1, r._2)) ++
      Seq(("B", 2.0, true), ("B", 1.0, false)) ++
      Seq(("C", 4.0, true), ("C", 9.0, true))
    val out = Evaluation.rocAucByGroup(rows.toDF("g", "s", "y"), "s", "y", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    out("A").getAs[Double]("auc") shouldBe 0.65625 +- 1e-9
    out("B").getAs[Double]("auc") shouldBe 1.0
    out("C").isNullAt(out("C").fieldIndex("auc")) shouldBe true
    // pooled-vs-sliced masking: the pooled AUC is NOT the slice A value
    Evaluation.rocAuc(rows.toDF("g", "s", "y"), "s", "y")
      .collect().head.getAs[Double]("auc") should not be 0.65625
  }

  it("groupFairness reports the hand per-group rates; fairnessGaps folds the spreads") {
    // g1: y [1,1,0,0] pred [1,0,1,0]; g2: y [1,0,0,0] pred [1,1,0,0]
    val rows = Seq(
      ("g1", true, true), ("g1", false, true), ("g1", true, false), ("g1", false, false),
      ("g2", true, true), ("g2", true, false), ("g2", false, false), ("g2", false, false))
      .toDF("g", "pred", "y")
    val b = Evaluation.groupFairness(rows, "g", "pred", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    b("g1").getAs[Double]("base_rate") shouldBe 0.5
    b("g1").getAs[Double]("selection_rate") shouldBe 0.5
    b("g1").getAs[Double]("tpr") shouldBe 0.5
    b("g1").getAs[Double]("fpr") shouldBe 0.5
    b("g2").getAs[Double]("base_rate") shouldBe 0.25
    b("g2").getAs[Double]("tpr") shouldBe 1.0
    b("g2").getAs[Double]("fpr") shouldBe 0.333333 +- 1e-9
    val gaps = Evaluation.fairnessGaps(rows, "g", "pred", "y").collect().head
    gaps.getAs[Long]("n_groups") shouldBe 2L
    gaps.getAs[Double]("parity_gap") shouldBe 0.0
    gaps.getAs[Double]("tpr_gap") shouldBe 0.5
    gaps.getAs[Double]("fpr_gap") shouldBe 0.166667 +- 1e-9
    gaps.getAs[Double]("eq_odds_gap") shouldBe 0.5
    // a single-group board has no spread to report
    val one = Evaluation.fairnessGaps(rows.filter(F.col("g") === "g1"),
      "g", "pred", "y").collect().head
    one.isNullAt(one.fieldIndex("parity_gap")) shouldBe true
  }

  it("liftTable matches the hand decile walk; a tie block lands in its last member's tile") {
    // scores 10..1, positives at {10, 9, 8, 5}; 5 tiles of 2
    val df = (1 to 10).map(i => (i.toDouble, Set(10, 9, 8, 5).contains(i)))
      .toDF("s", "y")
    val tl = Evaluation.liftTable(df, "s", "y", tiles = 5).collect()
      .map(r => r.getAs[Long]("tile") -> r).toMap
    tl.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)
    tl(1L).getAs[Long]("n") shouldBe 2L
    tl(1L).getAs[Long]("n_pos") shouldBe 2L
    tl(1L).getAs[Double]("response_rate") shouldBe 1.0
    tl(1L).getAs[Double]("lift") shouldBe 2.5 // prevalence 0.4
    tl(1L).getAs[Double]("cum_capture") shouldBe 0.5
    tl(2L).getAs[Double]("lift") shouldBe 1.25
    tl(2L).getAs[Long]("cum_pos") shouldBe 3L
    tl(2L).getAs[Double]("cum_lift") shouldBe 1.875
    tl(3L).getAs[Double]("cum_capture") shouldBe 1.0
    tl(5L).getAs[Double]("lift") shouldBe 0.0
    // one tie block of 3 with 2 tiles over n = 4: the block's LAST
    // member ranks 3rd -> tile 2; tile 1 is empty, never split
    val tied = Seq((5.0, true), (5.0, true), (5.0, false), (2.0, false)).toDF("s", "y")
    val t2 = Evaluation.liftTable(tied, "s", "y", tiles = 2).collect()
    t2.map(_.getAs[Long]("tile")).toSet shouldBe Set(2L)
    t2.head.getAs[Long]("n") shouldBe 4L
  }

  it("retrievalEval matches the hand DCG walk; ideal DCG uses the FULL relevant universe") {
    // qid 1 retrieved [10, 20, 30], relevant {20, 40, 50}: hit at rank 2
    // DCG = 1/log2(3); IDCG(min(3, 3)) = 1 + 1/log2(3) + 1/2
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L)).toDF("qid", "cid", "rn")
    val truth = Seq((1L, 20L), (1L, 40L), (1L, 50L)).toDF("qid", "cid")
    val out = Evaluation.retrievalEval(ranked, truth, 3).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    val q1 = out(1L)
    q1.getAs[Long]("n_rel") shouldBe 3L
    q1.getAs[Long]("hits") shouldBe 1L
    q1.getAs[Double]("precision_at_k") shouldBe 0.333333 +- 1e-6
    q1.getAs[Double]("recall_at_k") shouldBe 0.333333 +- 1e-6
    q1.getAs[Double]("mrr") shouldBe 0.5
    val dcg = 1.0 / (math.log(3.0) / math.log(2.0))
    val ideal = 1.0 + dcg + 0.5
    q1.getAs[Double]("ndcg") shouldBe (dcg / ideal) +- 1e-6
    // qid 2 has NO relevant items: recall/ndcg undefined, MRR 0
    val q2 = out(2L)
    q2.getAs[Long]("n_rel") shouldBe 0L
    q2.getAs[Double]("mrr") shouldBe 0.0
    q2.isNullAt(q2.fieldIndex("recall_at_k")) shouldBe true
    q2.isNullAt(q2.fieldIndex("ndcg")) shouldBe true
    // macro means average the per-query board; NULLs drop from the mean
    val m = Evaluation.retrievalEvalMacro(ranked, truth, 3).collect().head
    m.getAs[Long]("n_queries") shouldBe 2L
    m.getAs[Double]("macro_mrr") shouldBe 0.25
    m.getAs[Double]("macro_recall") shouldBe 0.333333 +- 1e-6
  }

  it("a query whose relevant universe is smaller than k can still reach nDCG 1") {
    // 1 relevant item, retrieved first, k = 3: ideal = min(k, n_rel) = 1 term
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)).toDF("qid", "cid", "rn")
    val truth = Seq((1L, 10L)).toDF("qid", "cid")
    val r = Evaluation.retrievalEval(ranked, truth, 3).collect().head
    r.getAs[Double]("ndcg") shouldBe 1.0
    r.getAs[Double]("recall_at_k") shouldBe 1.0
    r.getAs[Double]("precision_at_k") shouldBe 0.333333 +- 1e-6
  }

  it("a truth-only query the index returned NOTHING for reports zeros, not a missing row") {
    // qid 2 has relevant items but no ranked rows: a broken index must
    // not inflate the macro means by dropping its failures (ADVICE r14)
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "cid", "rn")
    val truth = Seq((1L, 10L), (2L, 30L), (2L, 40L)).toDF("qid", "cid")
    val out = Evaluation.retrievalEval(ranked, truth, 2).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    out.keySet shouldBe Set(1L, 2L)
    val q2 = out(2L)
    q2.getAs[Long]("n_rel") shouldBe 2L
    q2.getAs[Long]("hits") shouldBe 0L
    q2.getAs[Double]("precision_at_k") shouldBe 0.0
    q2.getAs[Double]("recall_at_k") shouldBe 0.0
    q2.getAs[Double]("mrr") shouldBe 0.0
    q2.getAs[Double]("ndcg") shouldBe 0.0
    // the macro board counts it AND averages its zeros in
    val m = Evaluation.retrievalEvalMacro(ranked, truth, 2).collect().head
    m.getAs[Long]("n_queries") shouldBe 2L
    m.getAs[Double]("macro_recall") shouldBe 0.5 +- 1e-9 // (1.0 + 0.0) / 2
    m.getAs[Double]("macro_mrr") shouldBe 0.5 +- 1e-9
  }

  it("qini excludes leading control-free tiles from the area and carries the origin forward") {
    // tile 1 is treated-only (cumulative control 0 -> q undefined): its
    // segment drops from the area; tile 2's left edge carries the last
    // DEFINED gain (none -> the 0 origin). Hand walk: tile2 q = 1,
    // frac1 = 1/3, area = (1+0)/2 * (1 - 1/3) = 1/3, qini =
    // (1/3 - 1/2) / 4 = -1/24
    val rows = Seq(
      (4.0, true, true), (3.0, true, false),
      (2.0, true, false), (2.0, false, false),
      (1.0, true, false), (1.0, false, false)).toDF("s", "t", "y")
    val r = Evaluation.qini(rows, "s", "t", "y", tiles = 2).collect().head
    r.getAs[Long]("n_treated") shouldBe 4L
    r.getAs[Long]("n_control") shouldBe 2L
    r.getAs[Double]("q_final") shouldBe 1.0
    r.getAs[Double]("qini") shouldBe -0.041667 +- 1e-6
  }

  it("brierDecomposition satisfies BS = REL − RES + UNC exactly at distinct-value bins") {
    // x=0.25 ×4 (2 pos): REL term 4·(.25−.5)²; x=0.75 ×4 (3 pos): 0.
    // ȳ = 5/8 -> REL .03125, RES .015625, UNC .234375, BS .25
    val rows = Seq((0.25, true), (0.25, true), (0.25, false), (0.25, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false))
    val r = Evaluation.brierDecomposition(rows.toDF("p", "y"), "p", "y")
      .collect().head
    r.getAs[Long]("n") shouldBe 8L
    r.getAs[Double]("brier") shouldBe 0.25
    r.getAs[Double]("reliability") shouldBe 0.03125
    r.getAs[Double]("resolution") shouldBe 0.015625
    r.getAs[Double]("uncertainty") shouldBe 0.234375
    // the Murphy identity, off the emitted (rounded) terms
    (r.getAs[Double]("reliability") - r.getAs[Double]("resolution")
      + r.getAs[Double]("uncertainty")) shouldBe r.getAs[Double]("brier") +- 2e-6
    // a perfectly calibrated forecaster has zero reliability debt
    val calib = Seq((0.5, true), (0.5, false), (1.0, true)).toDF("p", "y")
    Evaluation.brierDecomposition(calib, "p", "y").collect().head
      .getAs[Double]("reliability") shouldBe 0.0
  }

  it("fleissKappa matches the hand 3-item walk; varying rater counts refuse a number") {
    // items: AA, BB, AB with 2 raters -> P̄ = 2/3, P_e = .5, κ = 1/3
    val votes = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "B")).toDF("item", "vote")
    val r = Evaluation.fleissKappa(votes, "item", "vote").collect().head
    r.getAs[Long]("n_items") shouldBe 3L
    r.getAs[Long]("n_raters") shouldBe 2L
    r.getAs[Double]("p_bar") shouldBe 0.666667 +- 1e-6
    r.getAs[Double]("p_e") shouldBe 0.5
    r.getAs[Double]("kappa") shouldBe 0.3333 +- 1e-9
    // a varying rater count is NOT the classical statistic: NULL, loud
    val vary = votes.union(Seq((3L, "A")).toDF("item", "vote"))
    val v = Evaluation.fleissKappa(vary, "item", "vote").collect().head
    v.isNullAt(v.fieldIndex("n_raters")) shouldBe true
    v.isNullAt(v.fieldIndex("kappa")) shouldBe true
    // unanimous single category: P_e = 1, agreement unmeasurable
    val mono = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A")).toDF("item", "vote")
    val m = Evaluation.fleissKappa(mono, "item", "vote").collect().head
    m.getAs[Double]("p_bar") shouldBe 1.0
    m.isNullAt(m.fieldIndex("kappa")) shouldBe true
  }

  it("mcc matches the hand binary computation and degenerates to NULL on a constant margin") {
    // TP=4 TN=3 FP=1 FN=2: binary MCC = (4·3 − 1·2)/√(5·6·4·5) = 0.408248;
    // the multiclass R_K form reproduces it (num 20, dp 50, dt 48)
    val df = (Seq.fill(4)(("t", "t")) ++ Seq.fill(3)(("f", "f")) ++
      Seq.fill(1)(("t", "f")) ++ Seq.fill(2)(("f", "t"))).toDF("p", "y")
    val r = Evaluation.mcc(df, "p", "y").collect().head
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Long]("n_correct") shouldBe 7L
    r.getAs[Double]("mcc") shouldBe 0.408248 +- 1e-6
    // perfect prediction is 1; label swap on balanced classes is −1
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("p", "y")
    Evaluation.mcc(perfect, "p", "y").collect().head.getAs[Double]("mcc") shouldBe 1.0
    val anti = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")).toDF("p", "y")
    Evaluation.mcc(anti, "p", "y").collect().head.getAs[Double]("mcc") shouldBe -1.0
    // a constant predictor: dp = 0 -> NULL, not 0
    val const = Seq(("a", "a"), ("a", "b")).toDF("p", "y")
    val c = Evaluation.mcc(const, "p", "y").collect().head
    c.isNullAt(c.fieldIndex("mcc")) shouldBe true
  }

  it("mcnemar counts only disagreements; never-disagreeing classifiers are NULL") {
    // A right/B wrong 6 times, reverse 2: χ² = (6−2)²/8 = 2.0 < 3.84
    val df = (Seq.fill(6)((true, false, true)) ++ Seq.fill(2)((false, true, true)) ++
      Seq.fill(5)((true, true, true))).toDF("a", "b", "y")
    val r = Evaluation.mcnemar(df, "a", "b", "y").collect().head
    r.getAs[Long]("n") shouldBe 13L
    r.getAs[Long]("only_a") shouldBe 6L
    r.getAs[Long]("only_b") shouldBe 2L
    r.getAs[Double]("chi2") shouldBe 2.0
    r.getAs[Boolean]("reject_95") shouldBe false
    // identical classifiers never disagree: χ² undefined, not 0
    val same = Seq((true, true, true), (false, false, true)).toDF("a", "b", "y")
    val s = Evaluation.mcnemar(same, "a", "b", "y").collect().head
    s.isNullAt(s.fieldIndex("chi2")) shouldBe true
    // a one-sided 10-0 disagreement rejects (χ² = 10)
    val oneSided = Seq.fill(10)((true, false, true)).toDF("a", "b", "y")
    Evaluation.mcnemar(oneSided, "a", "b", "y").collect().head
      .getAs[Boolean]("reject_95") shouldBe true
  }

  it("weightedKappa charges quadratic grade distance; perfect agreement is 1") {
    // pairs (0,0),(1,1),(2,2),(0,2): observed Σ(i−j)²n = 4; expected
    // Σ(i−j)²·ri·cj/n = 26/4 = 6.5 -> κ_w = 1 − 4/6.5 = 0.3846
    val df = Seq((0, 0), (1, 1), (2, 2), (0, 2)).toDF("p", "y")
    Evaluation.weightedKappa(df, "p", "y").collect().head
      .getAs[Double]("kappa_w") shouldBe 0.3846 +- 1e-9
    val perfect = Seq((0, 0), (1, 1), (2, 2)).toDF("p", "y")
    Evaluation.weightedKappa(perfect, "p", "y").collect().head
      .getAs[Double]("kappa_w") shouldBe 1.0
    // single occupied grade on both margins: expected disagreement 0 -> NULL
    val const = Seq((1, 1), (1, 1)).toDF("p", "y")
    val c = Evaluation.weightedKappa(const, "p", "y").collect().head
    c.isNullAt(c.fieldIndex("kappa_w")) shouldBe true
  }

  it("classSummary folds the per-class board: balanced accuracy is the mean recall") {
    // labels: a×3 (2 right), b×1 (0 right), c×2 (2 right); pred-only
    // class d exists -> recalls {2/3, 0, 1}, balanced = 5/9
    val df = Seq(("a", "a"), ("a", "a"), ("d", "a"), ("a", "b"),
      ("c", "c"), ("c", "c")).toDF("p", "y")
    val r = Evaluation.classSummary(df, "p", "y").collect().head
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Long]("n_classes") shouldBe 4L // a, b, c, d (pred-only counts)
    r.getAs[Double]("accuracy") shouldBe 0.666667 +- 1e-6
    r.getAs[Double]("balanced_accuracy") shouldBe (5.0 / 9.0) +- 1e-4
    // macro-F1 averages only defined F1s (b has no predictions and no
    // hits -> NULL F1; d has no recall basis but precision 0 -> NULL F1)
    val f1a = 2.0 * (2.0 / 3.0) * (2.0 / 3.0) / (4.0 / 3.0) // = 2/3
    r.getAs[Double]("macro_f1") shouldBe ((f1a + 1.0) / 2.0) +- 1e-4
  }

  it("hosmerLemeshow matches the hand 3-bin walk and skips degenerate bins") {
    // p=0.05×4 (0 pos): term (0−0.2)²/(0.2·0.95) = 0.210526; p=0.5×4
    // (2 pos): 0; p=0.95×4 (4 pos): (4−3.8)²/(3.8·0.05) = 0.210526
    val rows = Seq.fill(4)((0.05, false)) ++
      Seq((0.5, true), (0.5, true), (0.5, false), (0.5, false)) ++
      Seq.fill(4)((0.95, true))
    val r = Evaluation.hosmerLemeshow(rows.toDF("p", "y"), "p", "y")
      .collect().head
    r.getAs[Long]("n") shouldBe 12L
    r.getAs[Long]("bins_used") shouldBe 3L
    r.getAs[Long]("bins_skipped") shouldBe 0L
    r.getAs[Double]("chi2") shouldBe 0.4211 +- 1e-9
    r.getAs[Long]("df") shouldBe 1L
    // p ≡ 0 bins die (E = 0) and under 3 usable bins χ² is NULL
    val degen = (Seq.fill(4)((0.0, false)) ++ Seq.fill(4)((0.5, true)))
      .toDF("p", "y")
    val d = Evaluation.hosmerLemeshow(degen, "p", "y").collect().head
    d.getAs[Long]("bins_skipped") shouldBe 1L
    d.isNullAt(d.fieldIndex("chi2")) shouldBe true
  }

  it("concordanceCcc charges location shift that Pearson forgives") {
    // y = x + 1: r = 1 but CCC = 2·(2/3)/(2/3 + 2/3 + 1) = 4/7
    val df = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val r = Evaluation.concordanceCcc(df, "x", "y").collect().head
    r.getAs[Double]("pearson_r") shouldBe 1.0
    r.getAs[Double]("ccc") shouldBe (4.0 / 7.0) +- 1e-6
    // perfect identity: both 1
    val id = Seq((1.0, 1.0), (2.0, 2.0), (5.0, 5.0)).toDF("x", "y")
    val i = Evaluation.concordanceCcc(id, "x", "y").collect().head
    i.getAs[Double]("ccc") shouldBe 1.0
    i.getAs[Double]("pearson_r") shouldBe 1.0
    // identical constants: nothing to agree on -> NULL, not 1
    val const = Seq((2.0, 2.0), (2.0, 2.0)).toDF("x", "y")
    val c = Evaluation.concordanceCcc(const, "x", "y").collect().head
    c.isNullAt(c.fieldIndex("ccc")) shouldBe true
  }

  it("calibrationSlope recovers (0, 1) on a saturated-exact calibrated scorer and 0.5 on a 2x-stretched one") {
    // p = k/10 with EXACTLY p·200 positives per cell: the score of
    // (0, 1) is zero at every cell, so the MLE is exactly (0, 1)
    def cells(stretch: Double) = (1 to 9).flatMap { k =>
      val p = k / 10.0
      val l = math.log(p / (1 - p))
      val x = 1.0 / (1.0 + math.exp(-stretch * l))
      Seq.fill(k * 20)((x, true)) ++ Seq.fill(200 - k * 20)((x, false))
    }
    val calib = Evaluation.calibrationSlope(cells(1.0).toDF("p", "y"), "p", "y")
      .collect().head
    calib.getAs[Long]("n") shouldBe 1800L
    calib.getAs[Double]("intercept") shouldBe 0.0 +- 1e-6
    calib.getAs[Double]("slope") shouldBe 1.0 +- 1e-6
    calib.getAs[Boolean]("intercept_reject_95") shouldBe false
    calib.getAs[Boolean]("slope_reject_95") shouldBe false
    // logits stretched 2x (overconfident): recalibration finds slope 1/2
    val over = Evaluation.calibrationSlope(cells(2.0).toDF("p", "y"), "p", "y")
      .collect().head
    over.getAs[Double]("slope") shouldBe 0.5 +- 1e-6
    over.getAs[Double]("intercept") shouldBe 0.0 +- 1e-6
    over.getAs[Boolean]("slope_reject_95") shouldBe true
    // single-class input: no MLE -> NULL estimates, counts kept
    val mono = Seq((0.3, true), (0.7, true)).toDF("p", "y")
    val m = Evaluation.calibrationSlope(mono, "p", "y").collect().head
    m.getAs[Long]("n_pos") shouldBe 2L
    m.isNullAt(m.fieldIndex("slope")) shouldBe true
    // one distinct score cannot identify a slope: det 0 -> NULL
    val one = Seq((0.5, true), (0.5, false)).toDF("p", "y")
    val o = Evaluation.calibrationSlope(one, "p", "y").collect().head
    o.isNullAt(o.fieldIndex("slope")) shouldBe true
    // the PAVA-style axis guard holds here too
    val cont = (1 to 12).map(i => (i / 13.7, i % 2 == 0)).toDF("p", "y")
    an[IllegalArgumentException] should be thrownBy
      Evaluation.calibrationSlope(cont, "p", "y", maxDistinctScores = 10)
        .collect()
  }

  it("the PAVA driver fold refuses a data-sized score axis; the gridded variant tames it") {
    // 12 distinct continuous scores against a cap of 10: fail LOUDLY
    // before the driver materializes an unbounded axis
    val cont = (1 to 12).map(i => (i / 12.345, i % 3 == 0)).toDF("s", "y")
    val e = intercept[IllegalArgumentException] {
      Evaluation.isotonicCalibration(cont, "s", "y", maxDistinctScores = 10)
        .collect()
    }
    e.getMessage should include("distinct scores")
    // pre-rounding to 1 decimal collapses the axis under the cap and
    // the fit is the PAVA of the ROUNDED counts (monotone by
    // construction)
    val fit = Evaluation.isotonicCalibrationGridded(cont, "s", "y", decimals = 1)
      .orderBy("x").collect()
    fit.length should be <= 11
    fit.map(_.getAs[Double]("iso_rate")).sliding(2).foreach {
      case Array(a, b) => a should be <= b
      case _ => ()
    }
  }

  it("gridded isotonic escapes its own guard at decimals = 5 (10^5 + 1 grid points)") {
    // before the r15 ADVICE fix the escape hatch handed the default
    // 100000 cap to isotonicFromCounts and a full decimals-5 grid
    // (100001 points) tripped the very guard it exists to avoid
    import org.apache.spark.sql.{functions => F}
    val cont = spark.range(100001)
      .select((F.col("id") / 100000.0).as("s"), (F.col("id") % 2 === 0).as("y"))
    val fit = Evaluation.isotonicCalibrationGridded(cont, "s", "y", decimals = 5)
    fit.count() shouldBe 100001L
    an[IllegalArgumentException] should be thrownBy
      Evaluation.isotonicCalibrationGridded(cont, "s", "y", decimals = 9)
  }

  it("gridded isotonic past 10^6 + 1 distinct points requires an explicit driver-memory opt-in") {
    // decimals = 8 used to authorize a 10^8 + 1-row driver collect by
    // default (r16 ADVICE) — now the default escape hatch stops at
    // 10^6 + 1 and the caller must raise maxDistinctScores explicitly
    import org.apache.spark.sql.{functions => F}
    val cont = spark.range(1100000)
      .select((F.col("id") / 99999999.0).as("s"), (F.col("id") % 2 === 0).as("y"))
    val e = intercept[IllegalArgumentException] {
      Evaluation.isotonicCalibrationGridded(cont, "s", "y", decimals = 8).collect()
    }
    e.getMessage should include("distinct scores")
    // the explicit opt-in works (and the loud guard message names it)
    Evaluation.isotonicCalibrationGridded(cont, "s", "y", decimals = 8,
      maxDistinctScores = 1200001).count() shouldBe 1100000L
  }
}
