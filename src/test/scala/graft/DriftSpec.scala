package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Drift

/** Distribution-shift triad: PSI, Jensen–Shannon divergence, χ². */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  // ---- psi ----------------------------------------------------------

  it("psi of a distribution against itself is ~0 and bins are exact") {
    val vals = (1 to 1000).map(i => (i % 100).toDouble)
    val df = vals.toDF("v")
    val out = Drift.psi(df, df, "v", buckets = 10).collect()
    out.length shouldBe 10
    out.foreach { r =>
      r.getAs[Long]("n_ref") shouldBe r.getAs[Long]("n_cur")
      r.getAs[Double]("psi") shouldBe 0.0
    }
  }

  it("psi grows with a genuine shift and clamps out-of-range values to edge bins") {
    val ref = (1 to 1000).map(_ % 100).map(_.toDouble).toDF("v")
    val cur = (1 to 1000).map(i => (i % 100) + 200.0).toDF("v") // fully right of ref's range
    val out = Drift.psi(ref, cur, "v", buckets = 10).collect()
    val top = out.find(_.getAs[Int]("bucket") == 9).get
    top.getAs[Long]("n_cur") shouldBe 1000L // everything clamps into bin 9
    top.getAs[Double]("psi") should be > 0.25 // "shifted" on any rule of thumb
  }

  it("psi survives a degenerate single-value reference") {
    val ref = Seq.fill(50)(7.0).toDF("v")
    val cur = Seq.fill(50)(7.0).toDF("v")
    val out = Drift.psi(ref, cur, "v", buckets = 10).collect()
    out.map(_.getAs[Long]("n_ref")).sum shouldBe 50L
    out.foreach(r => r.getAs[Double]("psi").isNaN shouldBe false)
  }

  // ---- jsDivergence -------------------------------------------------

  it("JS divergence is 0 for identical distributions and ln 2 for disjoint ones") {
    val rows =
      (1 to 300).map(i => ("a", s"t${i % 30}")) ++
        (1 to 300).map(i => ("b", s"t${i % 30}")) ++ // identical to a
        (1 to 300).map(i => ("c", s"u${i % 30}")) // disjoint vocabulary
    val out = Drift.jsDivergence(rows.toDF("slice", "tok"), "slice", F.col("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    out(("a", "b")) shouldBe 0.0
    out(("a", "c")) shouldBe math.round(math.log(2.0) * 1e4) / 1e4
    out(("b", "c")) shouldBe out(("a", "c"))
  }

  it("JS divergence matches a hand summation on a small asymmetric case") {
    // a: {x: 3/4, y: 1/4}; b: {x: 1/4, z: 3/4}
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "z"), ("b", "z"), ("b", "z"))
    def kl(p: Double, m: Double) = if (p > 0) p * math.log(p / m) / 2 else 0.0
    val want = Seq((0.75, 0.25), (0.25, 0.0), (0.0, 0.75))
      .map { case (pa, pb) => kl(pa, (pa + pb) / 2) + kl(pb, (pa + pb) / 2) }.sum
    val got = Drift.jsDivergence(rows.toDF("slice", "tok"), "slice", F.col("tok"))
      .collect().head.getDouble(2)
    got shouldBe math.round(want * 1e4) / 1e4 +- 1e-9
  }

  // ---- chiSquare ----------------------------------------------------

  it("chi2 is 0 on a perfectly independent table, with the right dof") {
    val rows = for (r <- Seq("a", "b", "c"); c <- Seq("x", "y"); _ <- 1 to 10)
      yield (r, c)
    val out = Drift.chiSquare(rows.toDF("r", "c"), F.col("r"), F.col("c")).collect().head
    out.getAs[Double]("chi2") shouldBe 0.0
    out.getAs[Long]("dof") shouldBe 2L // (3-1)*(2-1)
    out.getAs[Double]("cramers_v") shouldBe 0.0
  }

  it("chi2 matches the hand-computed 2x2 statistic") {
    // table: [[30, 10], [10, 30]] — E = 20 everywhere, chi2 = 4*100/20 = 20
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val out = Drift.chiSquare(rows.toDF("r", "c"), F.col("r"), F.col("c")).collect().head
    out.getAs[Double]("chi2") shouldBe 20.0
    out.getAs[Long]("dof") shouldBe 1L
    out.getAs[Double]("cramers_v") shouldBe 0.5 // sqrt(20 / (80 * 1))
  }

  // ---- mutualInfo ---------------------------------------------------

  private def mi(rows: Seq[(String, String)]) =
    Drift.mutualInfo(rows.toDF("r", "c"), F.col("r"), F.col("c")).collect().head

  it("MI is exactly 0 on an independent table and H(X) on a determined one") {
    val indep = for (r <- Seq("a", "b", "c"); c <- Seq("x", "y"); _ <- 1 to 5) yield (r, c)
    val o1 = mi(indep)
    o1.getAs[Double]("mi") shouldBe 0.0
    o1.getAs[Double]("nmi") shouldBe 0.0
    // Y = f(X), uniform over 2 levels: MI = H(X) = H(Y) = ln 2, NMI = 1
    val det = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val o2 = mi(det)
    val ln2 = math.round(math.log(2.0) * 1e4) / 1e4
    o2.getAs[Double]("mi") shouldBe ln2
    o2.getAs[Double]("h_row") shouldBe ln2
    o2.getAs[Double]("h_col") shouldBe ln2
    o2.getAs[Double]("nmi") shouldBe 1.0
  }

  it("MI matches the hand summation on a dependent 2x2 and counts n") {
    // cells: (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=3; n=8, all margins 4
    val rows = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y"), ("b", "x")) ++ Seq.fill(3)(("b", "y"))
    val want = 2 * (3.0 / 8 * math.log(1.5)) + 2 * (1.0 / 8 * math.log(0.5))
    val out = mi(rows)
    out.getAs[Long]("n") shouldBe 8L
    out.getAs[Double]("mi") shouldBe math.round(want * 1e4) / 1e4 +- 1e-9
    out.getAs[Double]("nmi") shouldBe
      math.round(want / math.log(2.0) * 1e4) / 1e4 +- 1e-9
  }

  it("a degenerate single-level margin yields NMI null, not a divide blowup") {
    val out = mi(Seq.fill(5)(("only", "x")) ++ Seq.fill(5)(("only", "y")))
    out.getAs[Double]("mi") shouldBe 0.0
    out.getAs[Double]("h_row") shouldBe 0.0
    out.isNullAt(out.fieldIndex("nmi")) shouldBe true
  }

  // ---- cusum --------------------------------------------------------

  private def cusumOut(xs: Seq[Double], slack: Double = 0.0, threshold: Double = 1e18) =
    Drift.cusum(xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("k", "t", "x"),
        "k", "t", "x", slack, threshold)
      .orderBy("t").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))

  /** The literal Page recursion the closed form must reproduce. */
  private def cusumRef(xs: Seq[Double], slack: Double): Seq[(Double, Double)] = {
    val mu = xs.sum / xs.length
    xs.scanLeft((0.0, 0.0)) { case ((sh, sl), x) =>
      (math.max(0.0, sh + (x - mu - slack)), math.max(0.0, sl - (x - mu + slack)))
    }.tail
  }

  it("a constant series never accumulates and never alarms") {
    cusumOut(Seq.fill(10)(7.0)).foreach { case (sh, sl, ah, al) =>
      sh shouldBe 0.0; sl shouldBe 0.0; ah shouldBe false; al shouldBe false
    }
  }

  it("a level step accumulates half the total shift by the end, and alarms past it") {
    // 10@10 then 10@20, mu=15: S+ climbs 5/day in the second half to 50
    val xs = Seq.fill(10)(10.0) ++ Seq.fill(10)(20.0)
    val out = Drift.cusum(xs.zipWithIndex.map { case (x, i) => ("k", i, x) }
        .toDF("k", "t", "x"), "k", "t", "x", slack = 0.0, threshold = 30.0)
      .orderBy("t").collect()
    out.last.getDouble(3) shouldBe 50.0 // cusum_hi
    out.map(_.getBoolean(5)).count(identity) shouldBe 4 // days at 35, 40, 45, 50
    // the retrospective mean makes the below-mean FIRST half a downward
    // excursion too: S- climbs to 50 then decays — 35..50 up, 45..35 down
    out.map(_.getBoolean(6)).count(identity) shouldBe 7
    out.last.getDouble(4) shouldBe 0.0 // fully decayed by the end
  }

  it("the closed form equals the literal Page recursion on a random series, both sides") {
    val r = new scala.util.Random(13)
    val xs = Seq.fill(40)((r.nextInt(30) + 1).toDouble) // integral: prefix sums exact
    val want = cusumRef(xs, slack = 1.0)
    val got = cusumOut(xs, slack = 1.0)
    got.length shouldBe want.length
    got.zip(want).foreach { case ((sh, sl, _, _), (rh, rl)) =>
      sh shouldBe rh +- 1e-6
      sl shouldBe rl +- 1e-6
    }
  }

  // ---- ksTest -------------------------------------------------------

  private def ks(a: Seq[Double], b: Seq[Double], parts: Int = 4) =
    Drift.ksTest(
      (a.map(("a", _)) ++ b.map(("b", _))).toDF("s", "v").repartition(parts),
      "s", "v", "a", "b")
      .collect().head

  /** Naive sup over the pooled value set. */
  private def ksRef(a: Seq[Double], b: Seq[Double]): Double = {
    val xs = (a ++ b).distinct.sorted
    xs.map(x => math.abs(a.count(_ <= x).toDouble / a.size
      - b.count(_ <= x).toDouble / b.size)).max
  }

  it("identical samples score 0 and never reject; disjoint supports score 1 and reject") {
    val same = ks(Seq(1, 2, 3, 4, 5).map(_.toDouble), Seq(1, 2, 3, 4, 5).map(_.toDouble))
    same.getAs[Double]("ks_stat") shouldBe 0.0
    same.getAs[Boolean]("reject_95") shouldBe false
    val far = ks((1 to 40).map(_.toDouble), (100 to 139).map(_.toDouble))
    far.getAs[Double]("ks_stat") shouldBe 1.0
    far.getAs[Boolean]("reject_95") shouldBe true
  }

  it("matches the textbook overlap case and the naive sup on random data, any partitioning") {
    val hand = ks(Seq(1.0, 2, 3, 4), Seq(3.0, 4, 5, 6))
    hand.getAs[Double]("ks_stat") shouldBe 0.5
    val r = new scala.util.Random(37)
    val a = Seq.fill(200)(r.nextGaussian())
    val b = Seq.fill(150)(r.nextGaussian() + 0.3)
    Seq(1, 7).foreach { p =>
      val got = ks(a, b, parts = p)
      got.getAs[Long]("n_a") shouldBe 200L
      got.getAs[Double]("ks_stat") shouldBe
        math.round(ksRef(a, b) * 1e6) / 1e6 +- 1e-9
    }
  }

  // ---- mannWhitney --------------------------------------------------

  private def mw(a: Seq[Double], b: Seq[Double]) =
    Drift.mannWhitney(
      (a.map(("a", _)) ++ b.map(("b", _))).toDF("s", "v").repartition(5),
      "s", "v", "a", "b").collect().head

  /** Naive midrank U and tie-corrected z. */
  private def mwRef(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    val pooled = (a.map((_, 1)) ++ b.map((_, 2))).sortBy(_._1)
    val ranks = new Array[Double](pooled.size)
    var i = 0
    while (i < pooled.size) {
      var j = i
      while (j < pooled.size && pooled(j)._1 == pooled(i)._1) j += 1
      (i until j).foreach(k => ranks(k) = (i + 1 + j).toDouble / 2)
      i = j
    }
    val r1 = pooled.zipWithIndex.collect { case ((_, 1), k) => ranks(k) }.sum
    val (n1, n2) = (a.size, b.size)
    val u = r1 - n1 * (n1 + 1) / 2.0 // U1, the scipy orientation
    val nn = (n1 + n2).toDouble
    val ties = pooled.groupBy(_._1).values
      .map { g => val t = g.size.toDouble; t * t * t - t }.sum
    val sig = math.sqrt(n1.toDouble * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1))))
    (u, (u - n1.toDouble * n2 / 2.0) / sig)
  }

  it("matches the hand case and never rejects equal tiny samples") {
    // a={1,2} b={3,4}: R1=3, U1 = 3-3 = 0, sigma=sqrt(5/3), z~-1.549
    val out = mw(Seq(1.0, 2.0), Seq(3.0, 4.0))
    out.getAs[Double]("u_stat") shouldBe 0.0
    out.getAs[Double]("z") shouldBe -(math.round(2.0 / math.sqrt(5.0 / 3.0) * 1e4) / 1e4)
    out.getAs[Boolean]("reject_95") shouldBe false
  }

  it("agrees with the naive midrank reference on tied random data, and flags a real shift") {
    val r = new scala.util.Random(43)
    val a = Seq.fill(120)((r.nextInt(30) + 1).toDouble) // heavy ties
    val b = Seq.fill(100)((r.nextInt(30) + 6).toDouble) // shifted up by 5
    val (u, z) = mwRef(a, b)
    val out = mw(a, b)
    out.getAs[Double]("u_stat") shouldBe math.round(u * 1e4) / 1e4 +- 1e-9
    out.getAs[Double]("z") shouldBe math.round(z * 1e4) / 1e4 +- 1e-9
    out.getAs[Boolean]("reject_95") shouldBe true
    out.getAs[Double]("z") should be < 0.0 // a smaller => low ranks => U1 below its mean (scipy sign)
  }

  it("a constant pooled sample has zero variance: z is NULL, not a blowup") {
    val out = mw(Seq(5.0, 5.0, 5.0), Seq(5.0, 5.0))
    out.isNullAt(out.fieldIndex("z")) shouldBe true
    out.isNullAt(out.fieldIndex("reject_95")) shouldBe true
  }

  it("duplicate values fold into one CDF step, not several") {
    // ties concentrated at 2.0: F_a jumps by 3/4 there
    val out = ks(Seq(1.0, 2, 2, 2), Seq(2.0, 3, 3, 3))
    out.getAs[Double]("ks_stat") shouldBe 0.75 // at x=2: F_a=1, F_b=0.25
  }

  // ---- welchT ---------------------------------------------------------

  private def tt(a: Seq[Double], b: Seq[Double]) =
    Drift.welchT(
      (a.map(("a", _)) ++ b.map(("b", _))).toDF("s", "v").repartition(5),
      "s", "v", "a", "b").collect().head

  it("Welch t matches the hand-worked unequal-variance case") {
    // a = {1,2,3,4}: m=2.5, v=5/3; b = {3,5,7,9,11}: m=7, v=10
    // sem = 5/12 + 2 = 2.416667, t = −4.5/√sem = −2.8947, df = 5.52
    val out = tt(Seq(1.0, 2, 3, 4), Seq(3.0, 5, 7, 9, 11))
    out.getAs[Long]("n_a") shouldBe 4L
    out.getAs[Long]("n_b") shouldBe 5L
    out.getAs[Double]("mean_a") shouldBe 2.5
    out.getAs[Double]("mean_b") shouldBe 7.0
    out.getAs[Double]("t") shouldBe -2.8947
    out.getAs[Double]("df_welch") shouldBe 5.52
    out.getAs[Boolean]("reject_95") shouldBe true
  }

  it("Welch t is exactly zero on identical samples and never rejects") {
    val xs = Seq(1.0, 2.0, 5.0, 9.0)
    val out = tt(xs, xs)
    out.getAs[Double]("t") shouldBe 0.0
    out.getAs[Boolean]("reject_95") shouldBe false
  }

  it("Welch t is NULL on degenerate inputs (n ≤ 1 or zero pooled variance)") {
    val single = tt(Seq(3.0), Seq(1.0, 2.0, 3.0))
    single.isNullAt(single.fieldIndex("t")) shouldBe true
    single.isNullAt(single.fieldIndex("reject_95")) shouldBe true
    val constant = tt(Seq(5.0, 5.0, 5.0), Seq(5.0, 5.0))
    constant.isNullAt(constant.fieldIndex("t")) shouldBe true
  }

  it("Welch t is invariant to how the rows are partitioned") {
    val r = new scala.util.Random(19)
    val a = Seq.fill(200)(r.nextGaussian() * 2 + 10)
    val b = Seq.fill(150)(r.nextGaussian() * 5 + 11)
    val rows = (a.map(("a", _)) ++ b.map(("b", _)))
    val one = Drift.welchT(rows.toDF("s", "v").repartition(1), "s", "v", "a", "b")
      .collect().head
    val many = Drift.welchT(rows.toDF("s", "v").repartition(13), "s", "v", "a", "b")
      .collect().head
    one.getAs[Double]("t") shouldBe many.getAs[Double]("t")
    one.getAs[Double]("df_welch") shouldBe many.getAs[Double]("df_welch")
  }

  // ---- cuped ----------------------------------------------------------

  it("cuped matches the hand case: θ = 2, exact corr² reduction, unchanged diff") {
    // Y = 2X within both arms (arm b shifted +1): θ = 2 exactly, the
    // adjusted diff equals the raw diff (−1, a − b), and the variance
    // reduction is corr²(X,Y) = 48²/(24·105) = 0.914286
    val units = Seq((0L, 1L, 2L), (0L, 2L, 4L), (0L, 3L, 6L),
      (1L, 1L, 3L), (1L, 2L, 5L), (1L, 3L, 7L))
    val out = Drift.cuped(units.toDF("arm", "x", "y"), "arm", "x", "y").collect().head
    out.getLong(0) shouldBe 3L
    out.getLong(1) shouldBe 3L
    out.getDouble(2) shouldBe 2.0 // theta
    out.getDouble(3) shouldBe -1.0 // diff_raw
    out.getDouble(4) shouldBe -1.0 // diff_adj (arms share the X profile)
    out.getDouble(5) shouldBe 0.914286
  }

  it("cuped shrinks the measured diff's noise when pre explains post") {
    // both arms: y = x + small noise, NO true effect; x varies a lot —
    // the adjusted diff must sit closer to 0 than the raw diff
    val r = new scala.util.Random(73)
    val units = (0 until 400).map { i =>
      val x = r.nextInt(100).toLong
      (i % 2L, x, x + r.nextInt(5).toLong)
    }
    val out = Drift.cuped(units.toDF("arm", "x", "y"), "arm", "x", "y").collect().head
    out.getDouble(5) should be > 0.95 // pre explains nearly all post variance
    math.abs(out.getDouble(4)) should be < math.abs(out.getDouble(3))
  }

  it("cuped with a constant pre-metric degrades to the raw difference (NULL θ)") {
    val units = Seq((0L, 5L, 2L), (0L, 5L, 4L), (1L, 5L, 3L), (1L, 5L, 9L))
    val out = Drift.cuped(units.toDF("arm", "x", "y"), "arm", "x", "y").collect().head
    out.isNullAt(2) shouldBe true // theta
    out.getDouble(3) shouldBe -3.0 // raw diff still reported
    out.isNullAt(4) shouldBe true // adjusted diff undefined
  }

  it("cuped with a single arm is empty (not a bogus null-effect row)") {
    val units = Seq((0L, 1L, 2L), (0L, 2L, 4L), (0L, 3L, 6L))
    Drift.cuped(units.toDF("arm", "x", "y"), "arm", "x", "y")
      .collect() shouldBe empty
  }

  // ---- diversityIndices -----------------------------------------------

  it("diversityIndices matches the hand entropy/Simpson numbers per group") {
    // gU: 4 equally-common cats -> H = ln 4, simpson .25, effective 4,
    // evenness 1; gS: one cat -> H 0, simpson 1, evenness NULL;
    // gM: (3,1)/4 -> H = ln4 - (3 ln3)/4, simpson = 10/16
    val rows = (1 to 4).map(i => ("gU", s"c$i")) ++
      Seq.fill(5)(("gS", "only")) ++
      (Seq.fill(3)(("gM", "a")) ++ Seq(("gM", "b")))
    val out = Drift.diversityIndices(rows.toDF("g", "c"), "g", "c")
      .collect().map(r => r.getString(0) -> r).toMap
    out("gU").getAs[Double]("shannon") shouldBe math.log(4.0) +- 1e-6
    out("gU").getAs[Double]("simpson") shouldBe 0.25
    out("gU").getAs[Double]("effective") shouldBe 4.0 +- 1e-3
    out("gU").getAs[Double]("evenness") shouldBe 1.0 +- 1e-6
    out("gS").getAs[Double]("shannon") shouldBe 0.0
    out("gS").getAs[Double]("simpson") shouldBe 1.0
    out("gS").isNullAt(out("gS").fieldIndex("evenness")) shouldBe true
    val hM = math.log(4.0) - 3.0 * math.log(3.0) / 4.0
    out("gM").getAs[Double]("shannon") shouldBe hM +- 1e-6
    out("gM").getAs[Double]("simpson") shouldBe 0.625
  }

  // ---- ipwAte ---------------------------------------------------------

  it("ipwAte undoes a planted confound exactly; constant propensity reduces to the naive diff") {
    // covariate x drives BOTH assignment (p = .8 for A, .2 for B) and
    // the outcome (y = 1 iff A); there is NO treatment effect. The
    // naive diff reads 0.6; IPW with the true propensity reads 0.
    val rows =
      Seq.fill(8)((true, 1.0, 0.8)) ++ Seq.fill(2)((false, 1.0, 0.8)) ++ // x = A
      Seq.fill(2)((true, 0.0, 0.2)) ++ Seq.fill(8)((false, 0.0, 0.2))    // x = B
    val r = Drift.ipwAte(rows.toDF("t", "y", "p"), "t", "y", "p").collect().head
    r.getAs[Long]("n") shouldBe 20L
    r.getAs[Long]("n_treated") shouldBe 10L
    r.getAs[Double]("mu_treated") shouldBe 0.5
    r.getAs[Double]("mu_control") shouldBe 0.5
    r.getAs[Double]("ate") shouldBe 0.0
    // the naive read on the same rows is the planted 0.6 bias
    val naive = rows.toDF("t", "y", "p")
      .groupBy("t").agg(F.avg("y").as("m")).collect()
      .map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
    (naive(true) - naive(false)) shouldBe 0.6 +- 1e-9
    // constant p = 0.5: IPW degenerates to exactly the naive difference
    val flat = rows.map { case (t, y, _) => (t, y, 0.5) }
    val f2 = Drift.ipwAte(flat.toDF("t", "y", "p"), "t", "y", "p").collect().head
    f2.getAs[Double]("ate") shouldBe 0.6 +- 1e-9
    // an empty arm reports NULL means, never a division blowup
    val one = Seq((true, 1.0, 0.5), (true, 0.0, 0.5)).toDF("t", "y", "p")
    val o = Drift.ipwAte(one, "t", "y", "p").collect().head
    o.isNullAt(o.fieldIndex("mu_control")) shouldBe true
    // empty input -> EMPTY
    Drift.ipwAte(Seq.empty[(Boolean, Double, Double)].toDF("t", "y", "p"),
      "t", "y", "p").collect() shouldBe empty
  }

  // ---- kendallTau -----------------------------------------------------

  it("eValue matches the hand RR walk, inverts protective effects, NULLs an undefined RR") {
    // treated 6/10 vs control 2/10: RR = 3, E = 3 + √6 = 5.4495
    val rows = (Seq.fill(6)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(8)((false, false)))
    val r = Drift.eValue(rows.toDF("t", "y"), "t", "y").collect().head
    r.getAs[Long]("n") shouldBe 20L
    r.getAs[Long]("n_treated") shouldBe 10L
    r.getAs[Double]("rr") shouldBe 3.0
    r.getAs[Double]("evalue") shouldBe 5.4495 +- 1e-9
    // a protective effect (RR = 1/3) orients to the same E
    val swapped = rows.map { case (t, y) => (!t, y) }
    val p = Drift.eValue(swapped.toDF("t", "y"), "t", "y").collect().head
    p.getAs[Double]("rr") shouldBe 0.333333 +- 1e-6
    p.getAs[Double]("evalue") shouldBe 5.4495 +- 1e-4
    // a null effect needs no confounder: E = 1
    val nullEff = Seq((true, true), (true, false), (false, true), (false, false))
    Drift.eValue(nullEff.toDF("t", "y"), "t", "y").collect().head
      .getAs[Double]("evalue") shouldBe 1.0
    // control rate 0: RR undefined -> NULL, not infinity
    val zeroCtl = Seq((true, true), (false, false)).toDF("t", "y")
    val z = Drift.eValue(zeroCtl, "t", "y").collect().head
    z.isNullAt(z.fieldIndex("rr")) shouldBe true
    z.isNullAt(z.fieldIndex("evalue")) shouldBe true
  }

  it("kendallTau counts the hand inversions and applies the tie correction") {
    // one adjacent swap among 5 ranks: P = 9, Q = 1, tau = 0.8
    val swap = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 5.0), (5.0, 4.0))
      .toDF("a", "b")
    val r = Drift.kendallTau(swap, "a", "b").collect().head
    r.getAs[Long]("concordant") shouldBe 9L
    r.getAs[Long]("discordant") shouldBe 1L
    r.getAs[Double]("tau_b") shouldBe 0.8
    // tie correction: x [1,1,2], y [1,2,2] -> P=1, tx=ty=1, tau_b = 0.5
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0)).toDF("a", "b")
    val t2 = Drift.kendallTau(tied, "a", "b").collect().head
    t2.getAs[Long]("concordant") shouldBe 1L
    t2.getAs[Double]("tau_b") shouldBe 0.5
    // perfect inversion is exactly -1; a constant margin is NULL
    val inv = (1 to 6).map(i => (i.toDouble, -i.toDouble)).toDF("a", "b")
    Drift.kendallTau(inv, "a", "b").collect().head.getAs[Double]("tau_b") shouldBe -1.0
    val const = (1 to 6).map(i => (i.toDouble, 7.0)).toDF("a", "b")
    val c = Drift.kendallTau(const, "a", "b").collect().head
    c.isNullAt(c.fieldIndex("tau_b")) shouldBe true
    // empty input -> EMPTY
    Drift.kendallTau(Seq.empty[(Double, Double)].toDF("a", "b"), "a", "b")
      .collect() shouldBe empty
  }

  // ---- spearman -------------------------------------------------------

  private def rho(pairs: Seq[(Double, Double)], parts: Int = 5) =
    Drift.spearman(pairs.toDF("a", "b").repartition(parts), "a", "b").collect().head

  it("spearman is exactly ±1 on any monotone relation, regardless of shape") {
    val xs = Seq(1.0, 2.0, 5.0, 9.0, 100.0)
    rho(xs.map(x => (x, math.exp(x / 10)))).getDouble(1) shouldBe 1.0
    rho(xs.map(x => (x, -x * x * x))).getDouble(1) shouldBe -1.0
  }

  it("spearman handles ties by midrank, matching the naive reference") {
    def naive(pairs: Seq[(Double, Double)]): Double = {
      def ranks(v: Seq[Double]): Seq[Double] = {
        val sorted = v.sorted
        v.map { x =>
          val lo = sorted.indexOf(x); val hi = sorted.lastIndexOf(x)
          (lo + hi + 2).toDouble / 2
        }
      }
      val ra = ranks(pairs.map(_._1)); val rb = ranks(pairs.map(_._2))
      val n = pairs.size.toDouble
      val (ma, mb) = (ra.sum / n, rb.sum / n)
      val num = ra.zip(rb).map { case (a, b) => (a - ma) * (b - mb) }.sum
      val den = math.sqrt(ra.map(a => (a - ma) * (a - ma)).sum
        * rb.map(b => (b - mb) * (b - mb)).sum)
      num / den
    }
    val r = new scala.util.Random(53)
    val pairs = Seq.fill(150)(((r.nextInt(12) + 1).toDouble, (r.nextInt(9) + 1).toDouble))
    rho(pairs).getDouble(1) shouldBe
      math.round(naive(pairs) * 1e6) / 1e6 +- 1e-9
  }

  it("spearman is NULL when a column is constant and partition-invariant otherwise") {
    rho(Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0))).isNullAt(1) shouldBe true
    val r = new scala.util.Random(59)
    val pairs = Seq.fill(300)((r.nextGaussian(), r.nextGaussian()))
    rho(pairs, parts = 1).toSeq shouldBe rho(pairs, parts = 11).toSeq
  }

  // ---- benford ------------------------------------------------------

  it("extracts the first significant digit across magnitudes, signs, and renderings") {
    val vals = Seq[java.lang.Double](123.45, 0.067, -200.0, 9000.0, 0.0, null)
    val out = Drift.benford(vals.toDF("v"), F.col("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out(1) shouldBe 1L // 123.45
    out(6) shouldBe 1L // 0.067
    out(2) shouldBe 1L // -200.0
    out(9) shouldBe 1L // 9000.0
    out.values.sum shouldBe 4L // 0.0 and null contribute no digit
    out.keySet shouldBe (1 to 9).toSet // grid zero-fills missing digits
  }

  it("the expected shares are the Benford law and sum to one") {
    val out = Drift.benford(Seq(1.0).toDF("v"), F.col("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    out(1) shouldBe math.round(math.log10(2.0) * 1e6) / 1e6
    out.values.sum shouldBe 1.0 +- 1e-5
  }

  it("the chi-square distance matches a scala recomputation on a random sample") {
    val r = new scala.util.Random(17)
    val vals = Seq.fill(500)((r.nextInt(9000) + 1).toDouble)
    val got = Drift.benford(vals.toDF("v"), F.col("v")).collect()
    val counts = vals.map(_.toString.dropWhile(c => !('1' to '9').contains(c)).head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = vals.length.toDouble
    val want = (1 to 9).map { d =>
      val e = n * math.log10(1.0 + 1.0 / d)
      val o = counts.getOrElse(d, 0L)
      (o - e) * (o - e) / e
    }.sum
    got.head.getDouble(4) shouldBe math.round(want * 1e4) / 1e4 +- 1e-6
    got.map(r0 => r0.getLong(1)).sum shouldBe 500L
  }

  it("a downward shift drives the LOWER statistic only") {
    val xs = Seq.fill(8)(20.0) ++ Seq.fill(8)(10.0)
    val out = cusumOut(xs, threshold = 20.0)
    out.last._2 shouldBe 40.0 // cusum_lo: 8 days falling 5 below mu=15
    out.last._1 shouldBe 0.0
    out.map(_._4).count(identity) shouldBe 4 // lo alarms at 25, 30, 35, 40 > 20
  }

  // ---- diffInDiff -----------------------------------------------------

  it("DiD cancels the group fixed effect and the common time trend, keeping the planted effect") {
    // ctl: 5 -> 6 (trend +1); treat: 15 -> 19 (fixed +10, trend +1,
    // EFFECT +3). Naive post-gap = 13; DiD = (19-15) - (6-5) = 3.
    // deterministic +-1 dither: every cell has the identical noise
    // composition, so the null design nulls out EXACTLY
    def cellRows(g: String, per: String, mu: Double, n: Int) =
      (1 to n).map(i => (g, per, mu + (i % 3) - 1))
    val rows = cellRows("t", "pre", 15, 200) ++ cellRows("t", "post", 19, 200) ++
      cellRows("c", "pre", 5, 200) ++ cellRows("c", "post", 6, 200)
    val out = Drift.diffInDiff(rows.toDF("g", "per", "v"), "g", "per", "v",
        "t", "c", "pre", "post")
      .collect().head
    out.getAs[Long]("n_tp") shouldBe 200L
    out.getAs[Double]("did") shouldBe 3.0 // exact: cell dithers cancel
    out.getAs[Boolean]("reject_95") shouldBe true
    // a pure fixed-effect + trend design (no differential change) nulls out
    val nullRows = cellRows("t", "pre", 15, 200) ++ cellRows("t", "post", 16, 200) ++
      cellRows("c", "pre", 5, 200) ++ cellRows("c", "post", 6, 200)
    val nr = Drift.diffInDiff(nullRows.toDF("g", "per", "v"), "g", "per", "v",
        "t", "c", "pre", "post")
      .collect().head
    nr.getAs[Double]("did") shouldBe 0.0
    nr.getAs[Boolean]("reject_95") shouldBe false
  }

  it("DiD with an empty cell yields NULL estimate, not a throw") {
    val rows = Seq(("t", "pre", 1.0), ("t", "post", 2.0), ("c", "pre", 1.0))
    val out = Drift.diffInDiff(rows.toDF("g", "per", "v"), "g", "per", "v",
        "t", "c", "pre", "post")
      .collect().head
    out.getAs[Long]("n_cq") shouldBe 0L
    out.isNullAt(out.fieldIndex("did")) shouldBe true
    out.isNullAt(out.fieldIndex("z")) shouldBe true
  }

  // ---- msprt ----------------------------------------------------------

  it("mSPRT always-valid p is monotone, stays high under the null, and crosses under a real effect") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 5, 1).plusDays(i.toLong))
    val r = new scala.util.Random(17)
    def arm(shiftB: Double) = (0 until 20).flatMap { d =>
      (0 until 40).map(j => (day(d), "a", 10.0 + (j % 7) - 3 + r.nextInt(3))) ++
        (0 until 40).map(j => (day(d), "b", 10.0 + (j % 7) - 3 + r.nextInt(3) + shiftB))
    }
    // null: identical generators -> p never rejects and is non-increasing
    val nullP = Drift.msprt(arm(0.0).toDF("t", "g", "v"), "t", "g", "v",
        "a", "b", tau = 1.0)
      .orderBy("t").collect()
    val ps = nullP.map(_.getAs[Double]("p_always_valid"))
    ps.zip(ps.tail).foreach { case (hi, lo) => lo should be <= hi }
    nullP.foreach(_.getAs[Boolean]("reject") shouldBe false)
    // planted +2 shift on arm b: evidence accumulates, the sequence
    // crosses alpha and STAYS crossed (the always-valid guarantee shape)
    val eff = Drift.msprt(arm(2.0).toDF("t", "g", "v"), "t", "g", "v",
        "a", "b", tau = 1.0)
      .orderBy("t").collect()
    eff.last.getAs[Boolean]("reject") shouldBe true
    val firstRej = eff.indexWhere(_.getAs[Boolean]("reject"))
    eff.drop(firstRej).foreach(_.getAs[Boolean]("reject") shouldBe true)
    // the effect estimate is near the planted -2 (a - b)
    eff.last.getAs[Double]("diff") shouldBe -2.0 +- 0.5
  }

  // ---- ewmaChart ----------------------------------------------------

  it("EWMA tracks a constant series flat at the mean with widening-then-plateau limits") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 4, 1).plusDays(i.toLong))
    val rows = (0 until 10).map(i => ("c", day(i), if (i % 2 == 0) 9.0 else 11.0))
    val out = Drift.ewmaChart(rows.toDF("k", "t", "x"), "k", "t", "x",
        lambda = 0.2, limitL = 3.0)
      .orderBy("t").collect()
    // mu = 10; z oscillates around it and never alarms
    out.foreach(_.getAs[Boolean]("alarm") shouldBe false)
    // limits widen monotonically toward the asymptote
    val widths = out.map(r => r.getAs[Double]("ucl") - r.getAs[Double]("lcl"))
    widths.zip(widths.tail).foreach { case (a, b) => b should be >= a }
    // first step: z1 = 0.2*x1 + 0.8*mu = 0.2*9 + 0.8*10 = 9.8
    out.head.getAs[Double]("ewma") shouldBe 9.8
  }

  it("EWMA alarms on a sustained shift once z accumulates past the limit") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 4, 1).plusDays(i.toLong))
    // 40 points at 10 (+-1 alternation), then 8 at 14. The retrospective
    // mu/sigma absorb some of the shift (mu ~ 10.67, sigma ~ 1.77,
    // ucl ~ 13.3 at lambda=0.4), so single base points can never alarm,
    // but z = 14 - 4*0.6^m crosses ucl at the 4th shifted point.
    val rows = (0 until 40).map(i => ("s", day(i), 10.0 + (if (i % 2 == 0) -1 else 1))) ++
      (40 until 48).map(i => ("s", day(i), 14.0))
    val out = Drift.ewmaChart(rows.toDF("k", "t", "x"), "k", "t", "x",
        lambda = 0.4, limitL = 3.0)
      .orderBy("t").collect()
    out.take(40).foreach(_.getAs[Boolean]("alarm") shouldBe false)
    out.takeRight(5).foreach(_.getAs[Boolean]("alarm") shouldBe true) // shift caught
  }

  // ---- anovaF -------------------------------------------------------

  it("one-way ANOVA matches the hand-worked 3-group case") {
    // a:[1..4] b:[2..5] c:[10..13] — SSB=194.666667, SSW=15, F=58.4
    val rows = Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(2, 3, 4, 5).map(("b", _)) ++
      Seq(10, 11, 12, 13).map(("c", _))
    val r = Drift.anovaF(rows.toDF("g", "v"), "g", "v").collect().head
    r.getAs[Long]("k") shouldBe 3L
    r.getAs[Long]("n") shouldBe 12L
    r.getAs[Double]("ss_between") shouldBe 194.67 +- 1e-9
    r.getAs[Double]("ss_within") shouldBe 15.0 +- 1e-9
    r.getAs[Double]("f_stat") shouldBe 58.4 +- 1e-9
    r.getAs[Long]("df_between") shouldBe 2L
    r.getAs[Long]("df_within") shouldBe 9L
    r.getAs[Double]("eta2") shouldBe 0.928458 +- 1e-6
  }

  it("ANOVA F is NULL when every group is constant-identical (zero within AND between)") {
    val rows = Seq.fill(5)(("a", 7)) ++ Seq.fill(5)(("b", 7))
    val r = Drift.anovaF(rows.toDF("g", "v"), "g", "v").collect().head
    r.isNullAt(r.fieldIndex("f_stat")) shouldBe true
    r.isNullAt(r.fieldIndex("eta2")) shouldBe true
  }

  // ---- kruskalWallis ------------------------------------------------

  it("Kruskal-Wallis matches the hand-worked tie-corrected case") {
    // same fixture as the ANOVA case: H=7.855769, H/C=7.939046 (ties
    // at 2,3,4 across groups), df=2; WH chi2(2) crit ~5.9367 -> reject
    val rows = Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(2, 3, 4, 5).map(("b", _)) ++
      Seq(10, 11, 12, 13).map(("c", _))
    val r = Drift.kruskalWallis(rows.toDF("g", "v"), "g", "v").collect().head
    r.getAs[Long]("k") shouldBe 3L
    r.getAs[Long]("n") shouldBe 12L
    r.getAs[Double]("h") shouldBe 7.8558 +- 1e-9
    r.getAs[Double]("h_adj") shouldBe 7.939 +- 1e-9
    r.getAs[Long]("df") shouldBe 2L
    r.getAs[Boolean]("reject_95") shouldBe true
  }

  it("Kruskal-Wallis on identical group distributions does not reject") {
    val rows = (1 to 40).flatMap(i => Seq(("a", i % 10), ("b", i % 10)))
    val r = Drift.kruskalWallis(rows.toDF("g", "v"), "g", "v").collect().head
    r.getAs[Double]("h_adj") shouldBe 0.0 // equal rank sums exactly
    r.getAs[Boolean]("reject_95") shouldBe false
  }

  it("Kruskal-Wallis all-values-tied gives NULL h_adj (zero tie-correction denominator)") {
    val rows = Seq.fill(4)(("a", 5)) ++ Seq.fill(4)(("b", 5))
    val r = Drift.kruskalWallis(rows.toDF("g", "v"), "g", "v").collect().head
    r.isNullAt(r.fieldIndex("h_adj")) shouldBe true
  }

  // ---- cliffsDelta --------------------------------------------------

  it("Cliff's delta matches the exact hand count and Romano label") {
    // a=[1,2,3,4] b=[2,3,4,5]: gt=3, lt=10, eq=3 -> delta=-7/16=-0.4375
    val rows = Seq(1, 2, 3, 4).map(x => ("a", x)) ++ Seq(2, 3, 4, 5).map(x => ("b", x))
    val r = Drift.cliffsDelta(rows.toDF("g", "v"), "g", "v", "a", "b").collect().head
    r.getAs[Long]("n_gt") shouldBe 3L
    r.getAs[Long]("n_lt") shouldBe 10L
    r.getAs[Double]("delta") shouldBe -0.4375
    r.getAs[String]("magnitude") shouldBe "medium" // |delta| in [0.33, 0.474)
  }

  it("Cliff's delta is +1/-1 on fully separated slices and 0 on identical ones") {
    val sep = (1 to 5).map(x => ("a", x + 100)) ++ (1 to 5).map(x => ("b", x))
    Drift.cliffsDelta(sep.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head.getAs[Double]("delta") shouldBe 1.0
    val same = (1 to 5).flatMap(x => Seq(("a", x), ("b", x)))
    val r = Drift.cliffsDelta(same.toDF("g", "v"), "g", "v", "a", "b").collect().head
    r.getAs[Double]("delta") shouldBe 0.0
    r.getAs[String]("magnitude") shouldBe "negligible"
  }

  // ---- twoProportionZ -----------------------------------------------

  it("two-proportion z matches the hand-worked pooled-null case") {
    // a: 30/100 vs b: 20/100 -> pooled .25, se = sqrt(.25*.75*.02),
    // z = .1/0.0612372 = 1.633 (no reject); 40/100 vs 20/100 -> 3.0861
    def rows(sa: Int) = (1 to 100).map(i => ("a", i <= sa)) ++
      (1 to 100).map(i => ("b", i <= 20))
    val r1 = Drift.twoProportionZ(rows(30).toDF("g", "s"), "g", F.col("s"), "a", "b")
      .collect().head
    r1.getAs[Long]("n_a") shouldBe 100L
    r1.getAs[Long]("s_a") shouldBe 30L
    r1.getAs[Double]("rate_a") shouldBe 0.3
    r1.getAs[Double]("z") shouldBe 1.633 +- 1e-9
    r1.getAs[Boolean]("reject_95") shouldBe false
    val r2 = Drift.twoProportionZ(rows(40).toDF("g", "s"), "g", F.col("s"), "a", "b")
      .collect().head
    r2.getAs[Double]("z") shouldBe 3.0861 +- 1e-9
    r2.getAs[Boolean]("reject_95") shouldBe true
  }

  it("two-proportion z is NULL on a degenerate pooled rate or an empty arm") {
    val allTrue = Seq(("a", true), ("a", true), ("b", true))
    val r = Drift.twoProportionZ(allTrue.toDF("g", "s"), "g", F.col("s"), "a", "b")
      .collect().head
    r.isNullAt(r.fieldIndex("z")) shouldBe true // pooled p = 1 -> se = 0
    val oneArm = Seq(("a", true), ("a", false))
    val r2 = Drift.twoProportionZ(oneArm.toDF("g", "s"), "g", F.col("s"), "a", "b")
      .collect().head
    r2.getAs[Long]("n_b") shouldBe 0L
    r2.isNullAt(r2.fieldIndex("z")) shouldBe true
  }

  // ---- pFromZ / bhAdjust --------------------------------------------

  it("the A&S normal tail matches published two-sided p-values to 1e-7") {
    val zs = Seq(0.0 -> 1.0, 1.96 -> 0.0499958, 2.5 -> 0.0124193, 3.29 -> 0.0010016)
    val df = zs.map(_._1).toDF("z")
      .select(F.col("z"), Drift.pFromZ(F.col("z")).as("p"))
    df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).foreach { case (z, p) =>
      p shouldBe zs.toMap.apply(z) +- 1e-6
    }
  }

  it("BH step-up reproduces the textbook adjustment and monotone rejection set") {
    // p=[.01,.02,.03,.04,.5], m=5: q=[.05,.05,.05,.05,.5], running min
    // from the bottom keeps them; all but the last reject at alpha=.05
    val tests = Seq(("m1", 0.01), ("m2", 0.02), ("m3", 0.03), ("m4", 0.04), ("m5", 0.5))
    val out = Drift.bhAdjust(tests.toDF("g", "p"), "g", "p", alpha = 0.05)
      .orderBy("rank").collect()
    out.map(_.getAs[Double]("p_adj")).toSeq shouldBe Seq(0.05, 0.05, 0.05, 0.05, 0.5)
    out.map(_.getAs[Boolean]("reject")).toSeq shouldBe Seq(true, true, true, true, false)
    // rejection set is a prefix of the p-ordered family (step-up shape)
    val rejects = out.map(_.getAs[Boolean]("reject"))
    rejects.zip(rejects.tail).foreach { case (hi, lo) => (hi || !lo) shouldBe true }
  }

  it("BH adjusted p is capped at 1 and a single test passes through unchanged") {
    val out = Drift.bhAdjust(Seq(("only", 0.7)).toDF("g", "p"), "g", "p").collect().head
    out.getAs[Double]("p_adj") shouldBe 0.7
    val big = Drift.bhAdjust(Seq(("a", 0.9), ("b", 0.95)).toDF("g", "p"), "g", "p")
      .orderBy("rank").collect()
    big.map(_.getAs[Double]("p_adj")).foreach(_ should be <= 1.0)
  }
}
