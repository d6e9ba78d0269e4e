package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{Evaluation, LangIdNB, TextAnalysis}

/** Char-trigram Naive Bayes language ID: hand-worked NB arithmetic on a
  * separable toy corpus, tie-break and degenerate-input contracts, and
  * the round-15 directive's gate — κ vs truth materially above 0 on the
  * fixture where the marker heuristic scores exactly chance. */
class LangIdNBSpec extends SparkSpec {

  import spark.implicits._

  it("extracts every positional char trigram; under 3 chars yields an empty array") {
    val out = Seq("abcd", "ab", "xyz").toDF("t")
      .select(LangIdNB.gramsCol(F.col("t")).as("g"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("abc", "bcd")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq("xyz")
  }

  it("separable trigram profiles classify perfectly and match hand-worked NB scores") {
    // two 'languages' with disjoint charsets — NB must resubstitute 100%
    val docs = Seq(
      (0L, "aaaa", "aa"), (1L, "aaab", "aa"),
      (2L, "zzzz", "zz"), (3L, "zzzy", "zz"))
      .toDF("doc_id", "text", "lang")
    val out = LangIdNB.trainScore(docs, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("aa", "aa", "zz", "zz")
    // hand-worked micro-nats for doc 0 ("aaaa" → grams aaa, aaa):
    // vocab = {aaa, aab, zzz, zzy} (V = 4), tot_aa = 4 (aaa,aaa,aaa,aab)
    // lp(aa, aaa) = round(ln((3+1)/(4+4))·1e6) = round(ln(0.5)·1e6)
    val lpAaa = math.round(math.log(4.0 / 8.0) * 1e6)
    val prior = math.round(math.log(2.0 / 4.0) * 1e6)
    val m = LangIdNB.train(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    m(("aa", "aaa")) shouldBe lpAaa
    // gram unseen for a language still carries add-1 mass: lp(zz, aaa)
    m(("zz", "aaa")) shouldBe math.round(math.log(1.0 / 8.0) * 1e6)
    val p = LangIdNB.priors(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    p("aa") shouldBe prior
    val scored = LangIdNB.score(docs, "text", "doc_id",
      LangIdNB.train(docs, "text", "lang"), LangIdNB.priors(docs, "text", "lang"))
      .orderBy("doc_id").collect()
    // doc 0: prior + 2·lp(aa, aaa), exact integer arithmetic
    scored(0).getLong(2) shouldBe (prior + 2L * lpAaa)
  }

  it("breaks score ties toward the ascending language code") {
    // identical corpora per language → every doc ties on every language
    val docs = Seq((0L, "abc", "zz"), (1L, "abc", "aa"))
      .toDF("doc_id", "text", "lang")
    val out = LangIdNB.trainScore(docs, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    out.foreach(_.getString(2) shouldBe "aa")
  }

  it("a gram-less (short) document falls back to the prior argmax") {
    val docs = Seq((0L, "aaaa", "aa"), (1L, "aaab", "aa"), (2L, "zzzz", "zz"),
      (3L, "x", "zz"))
      .toDF("doc_id", "text", "lang")
    val out = LangIdNB.trainScore(docs, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    out(3).getString(2) shouldBe "aa" // majority prior (2/4 aa vs 2/4 zz → tie to aa)
  }

  it("beats the marker heuristic decisively on the fixture: κ ≥ 0.25 vs κ ≈ 0") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nb = LangIdNB.trainScore(docs, "text", "lang", "doc_id")
    val kNb = Evaluation.kappa(nb, "pred_lang", "lang")
      .collect().head.getAs[Double]("kappa")
    val kHeur = Evaluation.kappa(
      TextAnalysis.langId(docs, "text"), "pred_lang", "lang")
      .collect().head.getAs[Double]("kappa")
    kNb should be >= 0.25    // measured 0.40 on this fixture
    kHeur should be < 0.05   // the r15 board's q_kappa-at-chance finding
    kNb should be > (kHeur + 0.2)
  }
}
