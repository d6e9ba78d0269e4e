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
}
