package graft

import java.nio.file.{Files => JFiles, Paths}

import org.apache.spark.sql.{functions => F}

import graft.operators.Drift
import graft.streaming.{StreamingDrift, StreamingPaths}

/** Streaming drift counts are a pure function of the input multiset, so
  * streamed == batch must hold EXACTLY, across a checkpointed restart. */
class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  it("streamed PSI across a restart equals the batch PSI exactly") {
    val r = new scala.util.Random(31)
    val refVals = Seq.fill(400)(r.nextGaussian() * 10 + 50)
    val curVals = Seq.fill(500)(r.nextGaussian() * 12 + 58) // shifted + widened
    val ref = refVals.toDF("v")

    val inDir = JFiles.createTempDirectory("graft-psi-in").toString
    val ckpt = JFiles.createTempDirectory("graft-psi-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-psi-counts").toString
    val (lo, hi) = StreamingDrift.refBounds(ref, "v")
    val refCounts = Drift.bucketCounts(ref, "v", lo, hi, buckets = 10)

    val half = curVals.length / 2
    JFiles.writeString(Paths.get(inDir, "f1.txt"), curVals.take(half).mkString("\n"))
    val src = () => spark.readStream.text(inDir)
      .select(F.col("value").cast("double").as("v"))
    val q1 = StreamingDrift.attachNumeric(src(), ckpt, cDir, "v", lo, hi,
      buckets = 10, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    JFiles.writeString(Paths.get(inDir, "f2.txt"), curVals.drop(half).mkString("\n"))
    val q2 = StreamingDrift.attachNumeric(src(), ckpt, cDir, "v", lo, hi,
      buckets = 10, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = StreamingDrift.psiNow(spark, refCounts, cDir, buckets = 10)
      .collect().map(x => x.getInt(0) -> x.toSeq).toMap
    val batch = Drift.psi(ref, curVals.toDF("v"), "v", buckets = 10)
      .collect().map(x => x.getInt(0) -> x.toSeq).toMap
    streamed shouldBe batch
    // and the shift is actually visible
    batch.values.head.last.asInstanceOf[Double] should be > 0.1
  }

  it("streamed JS divergence across slices equals the batch computation exactly") {
    val r = new scala.util.Random(47)
    val rows = r.shuffle(
      (1 to 300).map(i => ("src_a", s"t${i % 40}")) ++
        (1 to 300).map(i => ("src_b", s"t${(i % 40) + 10}")) ++ // overlapping, shifted vocab
        (1 to 100).map(i => ("src_c", s"t${i % 7}"))).toVector

    val inDir = JFiles.createTempDirectory("graft-js-in").toString
    val ckpt = JFiles.createTempDirectory("graft-js-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-js-counts").toString
    val half = rows.length / 2
    def write(name: String, part: Seq[(String, String)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (s, c) => s"$s,$c" }.mkString("\n"))
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = StreamingDrift.jsNow(spark, cDir)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    val batch = Drift.jsDivergence(rows.toDF("slice", "cat"), "slice", F.col("cat"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    streamed shouldBe batch
    streamed.keySet should have size 3
    streamed(("src_a", "src_b")) should be > 0.0
  }

  it("streamed CUSUM over day-bucketed counts equals the batch statistic exactly") {
    val r = new scala.util.Random(61)
    // 20 days of 'api' volume with a level shift at day 12
    val days = (0 until 20).map(d => java.time.LocalDate.of(2026, 3, 1).plusDays(d.toLong))
    val rows = r.shuffle(days.zipWithIndex.flatMap { case (d, i) =>
      Seq.fill(if (i < 12) 10 + (i % 3) else 25 + (i % 3))(("api", d.toString))
    }).toVector

    val inDir = JFiles.createTempDirectory("graft-cusum-in").toString
    val ckpt = JFiles.createTempDirectory("graft-cusum-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-cusum-counts").toString
    def write(name: String, part: Seq[(String, String)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (k, d) => s"$k,$d" }.mkString("\n"))
    val half = rows.length / 2 // days straddle the batch boundary: counts must merge
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = StreamingDrift.cusumNow(spark, cDir, slack = 0.0, threshold = 20.0)
      .collect().map(x => (x.getString(0), x.getDate(1).toString) -> x.toSeq.drop(2)).toMap
    val batch = Drift.cusum(
        rows.groupBy(identity).map { case ((k, d), g) =>
          (k, java.sql.Date.valueOf(d), g.size.toDouble) }.toSeq.toDF("k", "t", "x"),
        "k", "t", "x", slack = 0.0, threshold = 20.0)
      .collect().map(x => (x.getString(0), x.getDate(1).toString) -> x.toSeq.drop(2)).toMap
    streamed shouldBe batch
    // the planted shift is seen
    streamed.values.map(_(1).asInstanceOf[Double]).max should be > 20.0

    // Mann-Kendall + Theil-Sen ride the SAME per-(key, day) partials:
    // streamed == batch, and the planted upward shift trends
    val daily = rows.groupBy(identity).map { case ((k, d), g) =>
      (k, java.sql.Date.valueOf(d), g.size.toLong) }.toSeq.toDF("k", "t", "x")
    val mkS = StreamingDrift.mannKendallNow(spark, cDir).collect().head
    mkS.toSeq shouldBe graft.operators.TimeSeries.mannKendall(daily, "k", "t", "x")
      .collect().head.toSeq
    mkS.getAs[Boolean]("reject_95") shouldBe true
    val tsDaily = daily.select(F.col("k"),
      F.datediff(F.col("t"), F.to_date(F.lit("1970-01-01"))).as("t"), F.col("x"))
    StreamingDrift.theilSenNow(spark, cDir).collect().head.toSeq shouldBe
      graft.operators.TimeSeries.theilSen(tsDaily, "k", "t", "x").collect().head.toSeq
    // ACF + EWMA consume the same merged daily counts
    StreamingDrift.acfNow(spark, cDir, maxLag = 3)
      .collect().map(_.toSeq).toSet shouldBe
      graft.operators.TimeSeries.acf(daily, "k", "t", "x", maxLag = 3)
        .collect().map(_.toSeq).toSet
    StreamingDrift.ewmaNow(spark, cDir).collect().map(_.toSeq).toSet shouldBe
      Drift.ewmaChart(daily.select(F.col("k"), F.col("t"),
          F.col("x").cast("double").as("x")), "k", "t", "x")
        .collect().map(_.toSeq).toSet
  }

  it("streamed mSPRT p-sequence equals the batch test exactly across a restart") {
    val r = new scala.util.Random(89)
    def day(i: Int) = java.time.LocalDate.of(2026, 6, 1).plusDays(i.toLong).toString
    // (day, arm, integral value): the arm b carries a +2 shift so the
    // p-sequence actually moves; x2 = value*100 rides the category
    val rows = for (d <- 0 until 12; j <- 0 until 25; g <- Seq("a", "b"))
      yield (day(d), g, (10 + (j % 5) + r.nextInt(3) + (if (g == "b") 2 else 0)).toDouble)
    val inDir = JFiles.createTempDirectory("graft-sprt-in").toString
    val ckpt = JFiles.createTempDirectory("graft-sprt-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-sprt-counts").toString
    def enc(part: Seq[(String, String, Double)]) =
      part.map { case (d, g, v) => s"$d|$g,${(v * 100).toLong}" }.mkString("\n")
    val half = rows.length / 2
    JFiles.writeString(Paths.get(inDir, "f1.txt"), enc(rows.take(half)))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    JFiles.writeString(Paths.get(inDir, "f2.txt"), enc(rows.drop(half)))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val batch = Drift.msprt(
        rows.map { case (d, g, v) => (java.sql.Date.valueOf(d), g, v) }.toDF("t", "g", "v"),
        "t", "g", "v", "a", "b", tau = 1.0)
      .orderBy("t").collect().map(_.toSeq)
    val streamed = StreamingDrift.msprtNow(spark, cDir, "a", "b", tau = 1.0)
      .orderBy("t").collect().map(_.toSeq)
    streamed shouldBe batch
    // the planted shift eventually rejects (sanity that the fixture bites)
    batch.last.last shouldBe true
  }

  it("streamed two-proportion z equals the batch test exactly") {
    val r = new scala.util.Random(83)
    val rows = Vector.fill(400)((if (r.nextBoolean()) "even" else "odd",
      (r.nextInt(10) < 3).toString))
    val inDir = JFiles.createTempDirectory("graft-pz-in").toString
    val ckpt = JFiles.createTempDirectory("graft-pz-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-pz-counts").toString
    JFiles.writeString(Paths.get(inDir, "f1.txt"),
      rows.take(200).map { case (a, s) => s"$a,$s" }.mkString("\n"))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    JFiles.writeString(Paths.get(inDir, "f2.txt"),
      rows.drop(200).map { case (a, s) => s"$a,$s" }.mkString("\n"))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val batch = Drift.twoProportionZ(
        rows.map { case (a, s) => (a, s.toBoolean) }.toDF("g", "s"),
        "g", F.col("s"), "even", "odd")
      .collect().head.toSeq
    StreamingDrift.propTestNow(spark, cDir, "even", "odd")
      .collect().head.toSeq shouldBe batch
  }

  it("streamed two-sample KS and Mann-Whitney equal the batch tests exactly") {
    val r = new scala.util.Random(67)
    val rows = r.shuffle(
      Seq.fill(300)(("a", (r.nextInt(40) + 1).toDouble)) ++
        Seq.fill(250)(("b", (r.nextInt(40) + 9).toDouble))).toVector // shifted, tied

    val inDir = JFiles.createTempDirectory("graft-ks-in").toString
    val ckpt = JFiles.createTempDirectory("graft-ks-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-ks-counts").toString
    def write(name: String, part: Seq[(String, Double)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (s, v) => s"$s,$v" }.mkString("\n"))
    val half = rows.length / 2
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val batchDf = rows.toDF("s", "v")
    StreamingDrift.ksNow(spark, cDir, "a", "b").collect().head.toSeq shouldBe
      Drift.ksTest(batchDf, "s", "v", "a", "b").collect().head.toSeq
    StreamingDrift.mannWhitneyNow(spark, cDir, "a", "b").collect().head.toSeq shouldBe
      Drift.mannWhitney(batchDf, "s", "v", "a", "b").collect().head.toSeq
    // integer-valued fixture → the Welch moment sums are exact in any
    // order, so streamed == batch bit-for-bit here too
    StreamingDrift.welchTNow(spark, cDir, "a", "b").collect().head.toSeq shouldBe
      Drift.welchT(batchDf, "s", "v", "a", "b").collect().head.toSeq
    // and the gini reader folds the SAME value counts (pooled slices)
    val pooled = rows.map(_._2)
    StreamingDrift.giniNow(spark, cDir).collect().head.toSeq shouldBe
      graft.operators.RobustStats.gini(
        pooled.zipWithIndex.map { case (v, i) => (i.toString, v) }.toDF("k", "v"),
        "k", "v").collect().head.toSeq
  }

  it("streamed spearman / theil / hill equal the batch operators across a restart") {
    val r = new scala.util.Random(71)
    // integer-valued monotone-ish pairs with ties: (x, y = x/2 + noise);
    // the slice carries x, the category y — pair counts are spearman's
    // complete summary. For theil/hill the group rides the slice.
    val rows = Vector.fill(400)((r.nextInt(30) + 1, r.nextInt(15) + r.nextInt(30) / 2 + 1))
    val inDir = JFiles.createTempDirectory("graft-sp-in").toString
    val ckpt = JFiles.createTempDirectory("graft-sp-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-sp-counts").toString
    def write(name: String, part: Seq[(Int, Int)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (x, y) => s"$x,$y" }.mkString("\n"))
    val half = rows.length / 2
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half)) // restart: new query, same checkpoint
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val pairsDf = rows.toDF("x", "y")
    // spearman: exact dyadic rank sums — bit-for-bit
    StreamingDrift.spearmanNow(spark, cDir).collect().head.toSeq shouldBe
      Drift.spearman(pairsDf, "x", "y").collect().head.toSeq
    // theil: group = the slice column (x here), value = y
    val theilStreamed = StreamingDrift.theilNow(spark, cDir)
      .collect().map(rr => rr.getString(0) -> rr.toSeq.drop(1)).toMap
    val theilBatch = graft.operators.RobustStats.theil(
        rows.map { case (x, y) => (x.toString, y) }.toDF("g", "v"), "g", "v")
      .collect().map(rr => rr.getString(0) -> rr.toSeq.drop(1)).toMap
    theilStreamed shouldBe theilBatch
    // hill: top-(k+1) order stats from merged value counts — bit-for-bit
    StreamingDrift.hillNow(spark, cDir, k = 20).collect().head.toSeq shouldBe
      graft.operators.RobustStats.hillTailIndex(
        rows.map(_._2).toDF("v"), "v", k = 20).collect().head.toSeq
  }

  it("streamed ANOVA / Kruskal-Wallis / Cliff's delta equal the batch operators across a restart") {
    val r = new scala.util.Random(79)
    // two groups with a real location shift and heavy ties; the group
    // rides the slice, the (integer) value the category — one partial
    // layout serves all three readers
    val rows = Vector.fill(300)(("a", r.nextInt(20) + 1)) ++
      Vector.fill(280)(("b", r.nextInt(20) + 4))
    val inDir = JFiles.createTempDirectory("graft-kw-in").toString
    val ckpt = JFiles.createTempDirectory("graft-kw-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-kw-counts").toString
    def write(name: String, part: Seq[(String, Int)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (g, v) => s"$g,$v" }.mkString("\n"))
    val half = rows.length / 2
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half)) // restart: new query, same checkpoint
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val df = rows.toDF("g", "v")
    StreamingDrift.kruskalNow(spark, cDir).collect().head.toSeq shouldBe
      Drift.kruskalWallis(df, "g", "v").collect().head.toSeq
    StreamingDrift.anovaNow(spark, cDir).collect().head.toSeq shouldBe
      Drift.anovaF(df, "g", "v").collect().head.toSeq
    StreamingDrift.cliffsDeltaNow(spark, cDir, "a", "b").collect().head.toSeq shouldBe
      Drift.cliffsDelta(df, "g", "v", "a", "b").collect().head.toSeq
  }

  it("streamed zipf and CUPED equal the batch operators across a restart") {
    val r = new scala.util.Random(73)
    // CUPED units: (arm, pre, post) integer metrics with pre→post signal;
    // zipf reuses the same layout with the token as the category
    val units = Vector.fill(300) {
      val x = r.nextInt(20) + 1
      (r.nextInt(2).toLong, x.toLong, (2 * x + r.nextInt(7)).toLong)
    }
    val inDir = JFiles.createTempDirectory("graft-cp-in").toString
    val ckpt = JFiles.createTempDirectory("graft-cp-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-cp-counts").toString
    def write(name: String, part: Seq[(Long, Long, Long)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (a, x, y) => s"$a|$x,$y" }.mkString("\n"))
    val half = units.length / 2
    write("f1.txt", units.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", units.drop(half))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    StreamingDrift.cupedNow(spark, cDir).collect().head.toSeq shouldBe
      Drift.cuped(units.toDF("arm", "x", "y"), "arm", "x", "y").collect().head.toSeq

    // zipf over a token stream: same categorical layout, term = category
    val docs = Vector.fill(200)(
      Seq.fill(r.nextInt(6) + 2)("tok" + (r.nextInt(40) + 1)).mkString(" "))
    val zDir = JFiles.createTempDirectory("graft-zp-counts").toString
    val zIn = JFiles.createTempDirectory("graft-zp-in").toString
    val zCk = JFiles.createTempDirectory("graft-zp-ckpt").toString
    JFiles.writeString(Paths.get(zIn, "f1.txt"),
      docs.take(100).flatMap(_.split(" ")).map(t => s"_,$t").mkString("\n"))
    val zsrc = () => spark.readStream.text(zIn)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val z1 = StreamingDrift.attachCategorical(zsrc(), zCk, zDir, triggerMillis = 100)
    try z1.processAllAvailable() finally z1.stop()
    JFiles.writeString(Paths.get(zIn, "f2.txt"),
      docs.drop(100).flatMap(_.split(" ")).map(t => s"_,$t").mkString("\n"))
    val z2 = StreamingDrift.attachCategorical(zsrc(), zCk, zDir, triggerMillis = 100)
    try z2.processAllAvailable() finally z2.stop()
    StreamingDrift.zipfNow(spark, zDir, topN = 30).collect().head.toSeq shouldBe
      graft.operators.TextAnalysis.zipfFit(docs.toDF("text"), "text", topN = 30)
        .collect().head.toSeq
    // the vocabulary-coverage reader folds the SAME term-count store
    StreamingDrift.vocabCoverageNow(spark, zDir).collect().head.toSeq shouldBe
      graft.operators.TextAnalysis.vocabCoverage(docs.toDF("text"), "text")
        .collect().head.toSeq
  }

  it("streamed top user journeys equal the batch ranking across a restart") {
    val r = new scala.util.Random(79)
    val types = Seq("view", "click", "cart", "purchase")
    val events = Vector.tabulate(300) { i =>
      (r.nextInt(40).toLong, 1000L + r.nextInt(500), types(r.nextInt(4)), i.toLong)
    }
    val inDir = JFiles.createTempDirectory("graft-tp-in").toString
    val ckpt = JFiles.createTempDirectory("graft-tp-ckpt").toString
    val pDir = JFiles.createTempDirectory("graft-tp-parts").toString
    def write(name: String, part: Seq[(Long, Long, String, Long)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (u, t, et, id) => s"$u,$t,$et,$id" }.mkString("\n"))
    val half = events.length / 2
    write("f1.txt", events.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).cast("long").as("u"),
        F.split(F.col("value"), ",").getItem(1).cast("long").as("t"),
        F.split(F.col("value"), ",").getItem(2).as("et"),
        F.split(F.col("value"), ",").getItem(3).cast("long").as("id"))
    val q1 = StreamingPaths.attach(src(), ckpt, pDir, "u", "t", "et", "id", depth = 3)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", events.drop(half)) // later batch may carry EARLIER events
    val q2 = StreamingPaths.attach(src(), ckpt, pDir, "u", "t", "et", "id", depth = 3)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = StreamingPaths.topPathsNow(spark, pDir, depth = 3, k = 10)
      .collect().map(_.toSeq)
    val batch = graft.operators.TimeSeries.topPaths(
        events.toDF("u", "t", "et", "id"), "u", "t", "et", "id", depth = 3, k = 10)
      .collect().map(_.toSeq)
    streamed shouldBe batch
  }

  it("streamed ROC AUC / AP / Brier / calibration equal the batch evaluators across a restart") {
    import graft.operators.Evaluation
    val r = new scala.util.Random(59)
    // probabilities on the 1/64 grid (dyadic — every count-frame moment
    // is exact in any accumulation order), biased so positives score
    // higher and the AUC actually separates
    val rows = Vector.fill(500) {
      val pos = r.nextBoolean()
      val p = (r.nextInt(49) + (if (pos) 16 else 0)) / 64.0
      (if (pos) "pos" else "neg", p)
    }
    val inDir = JFiles.createTempDirectory("graft-auc-in").toString
    val ckpt = JFiles.createTempDirectory("graft-auc-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-auc-counts").toString
    def write(name: String, part: Seq[(String, Double)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (s, v) => s"$s,$v" }.mkString("\n"))
    val half = rows.length / 2
    write("f1.txt", rows.take(half))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(half))
    val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val batchDf = rows.map { case (s, v) => (v, s == "pos") }.toDF("p", "y")
    StreamingDrift.rocAucNow(spark, cDir, "pos", "neg").collect().head.toSeq shouldBe
      Evaluation.rocAuc(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.averagePrecisionNow(spark, cDir, "pos", "neg")
      .collect().head.toSeq shouldBe
      Evaluation.averagePrecision(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.brierNow(spark, cDir, "pos", "neg").collect().head.toSeq shouldBe
      Evaluation.brier(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.calibrationNow(spark, cDir, "pos", "neg")
      .orderBy("bin").collect().map(_.toSeq) shouldBe
      Evaluation.calibrationBins(batchDf, "p", "y").orderBy("bin").collect().map(_.toSeq)
    StreamingDrift.eceNow(spark, cDir, "pos", "neg").collect().head.toSeq shouldBe
      Evaluation.ece(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.liftNow(spark, cDir, "pos", "neg")
      .orderBy("tile").collect().map(_.toSeq) shouldBe
      Evaluation.liftTable(batchDf, "p", "y").orderBy("tile").collect().map(_.toSeq)
    StreamingDrift.bestThresholdNow(spark, cDir, "pos", "neg")
      .collect().head.toSeq shouldBe
      Evaluation.bestThreshold(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.isotonicNow(spark, cDir, "pos", "neg")
      .orderBy("x").collect().map(_.toSeq) shouldBe
      Evaluation.isotonicCalibration(batchDf, "p", "y").orderBy("x").collect().map(_.toSeq)
    StreamingDrift.hosmerNow(spark, cDir, "pos", "neg").collect().head.toSeq shouldBe
      Evaluation.hosmerLemeshow(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.brierDecompositionNow(spark, cDir, "pos", "neg")
      .collect().head.toSeq shouldBe
      Evaluation.brierDecomposition(batchDf, "p", "y").collect().head.toSeq
    StreamingDrift.calibrationSlopeNow(spark, cDir, "pos", "neg")
      .collect().head.toSeq shouldBe
      Evaluation.calibrationSlope(batchDf, "p", "y").collect().head.toSeq
    // the planted separation bites: AUC well above chance
    StreamingDrift.rocAucNow(spark, cDir, "pos", "neg")
      .collect().head.getAs[Double]("auc") should be > 0.6
  }

  it("streamed confusion-cell family (per-class / kappa / ARI+NMI / Kendall) equals batch across a restart") {
    import graft.operators.Evaluation
    val r = new scala.util.Random(61)
    // a 5-class labeler that's right ~60% of the time
    val cells = Vector.fill(400) {
      val label = s"c${r.nextInt(5)}"
      val pred = if (r.nextInt(10) < 6) label else s"c${r.nextInt(5)}"
      (pred, label)
    }
    // bounded ordinal pair axes for tau-b (both vocabularies size ≤ 8)
    val pairs = Vector.fill(400) {
      val x = r.nextInt(8)
      val y = math.min(7, math.max(0, x + r.nextInt(5) - 2))
      (x.toString, y.toString)
    }
    def run(rows: Vector[(String, String)], tag: String): String = {
      val inDir = JFiles.createTempDirectory(s"graft-$tag-in").toString
      val ckpt = JFiles.createTempDirectory(s"graft-$tag-ckpt").toString
      val cDir = JFiles.createTempDirectory(s"graft-$tag-counts").toString
      def write(name: String, part: Seq[(String, String)]): Unit =
        JFiles.writeString(Paths.get(inDir, name),
          part.map { case (s, c) => s"$s,$c" }.mkString("\n"))
      val src = () => spark.readStream.text(inDir)
        .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
          F.split(F.col("value"), ",").getItem(1).as("cat"))
      write("f1.txt", rows.take(rows.length / 2))
      val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
      try q1.processAllAvailable() finally q1.stop()
      write("f2.txt", rows.drop(rows.length / 2))
      val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
      try q2.processAllAvailable() finally q2.stop()
      cDir
    }
    val cellsDir = run(cells, "cells")
    val pairDir = run(pairs, "kt")
    val batchCells = cells.toDF("pred", "label")
    StreamingDrift.perClassNow(spark, cellsDir)
      .orderBy("class").collect().map(_.toSeq) shouldBe
      Evaluation.perClass(batchCells, "pred", "label")
        .orderBy("class").collect().map(_.toSeq)
    StreamingDrift.kappaNow(spark, cellsDir).collect().head.toSeq shouldBe
      Evaluation.kappa(batchCells, "pred", "label").collect().head.toSeq
    StreamingDrift.clusterAgreementNow(spark, cellsDir).collect().head.toSeq shouldBe
      Evaluation.clusterAgreement(batchCells, "pred", "label").collect().head.toSeq
    StreamingDrift.mccNow(spark, cellsDir).collect().head.toSeq shouldBe
      Evaluation.mcc(batchCells, "pred", "label").collect().head.toSeq
    StreamingDrift.classSummaryNow(spark, cellsDir).collect().head.toSeq shouldBe
      Evaluation.classSummary(batchCells, "pred", "label").collect().head.toSeq
    val batchPairs = pairs.map { case (x, y) => (x.toDouble, y.toDouble) }
      .toDF("x", "y")
    StreamingDrift.kendallNow(spark, pairDir).collect().head.toSeq shouldBe
      Drift.kendallTau(batchPairs, "x", "y").collect().head.toSeq
    StreamingDrift.weightedKappaNow(spark, pairDir).collect().head.toSeq shouldBe
      Evaluation.weightedKappa(batchPairs, "x", "y").collect().head.toSeq
    // Fleiss over an (item, rater vote) store: 4 deterministic raters
    val fleissRows = (for {
      item <- 0 until 100; rater <- 0 until 4
    } yield (s"i$item", if ((item + rater) % 3 == 0) "yes" else "no")).toVector
    val fleissDir = run(fleissRows, "fleiss")
    StreamingDrift.fleissKappaNow(spark, fleissDir).collect().head.toSeq shouldBe
      Evaluation.fleissKappa(fleissRows.toDF("item", "vote"), "item", "vote")
        .collect().head.toSeq
    // the planted agreement bites: kappa above chance, tau positive
    StreamingDrift.kappaNow(spark, cellsDir)
      .collect().head.getAs[Double]("kappa") should be > 0.3
    StreamingDrift.kendallNow(spark, pairDir)
      .collect().head.getAs[Double]("tau_b") should be > 0.3
  }

  it("numeric-pair readers drop non-numeric store rows instead of NULLing the statistic (r15 ADVICE)") {
    import java.nio.file.{Files => JFiles, Paths}
    import graft.operators.{Drift, Evaluation}
    val r = new scala.util.Random(71)
    val clean = Vector.fill(200)((r.nextInt(5).toString, ((r.nextInt(5) + r.nextInt(2))).toString))
    // a polluted store: numeric pairs plus rows whose slice/cat can't
    // cast to double (e.g. another attach convention sharing the dir)
    val rows = clean ++ Vector(("junk", "3"), ("2", "junk"), ("a|b", "x"))
    val inDir = JFiles.createTempDirectory("graft-nn-in").toString
    val ckpt = JFiles.createTempDirectory("graft-nn-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-nn-counts").toString
    JFiles.writeString(Paths.get(inDir, "f1.txt"),
      rows.map { case (s, c) => s"$s,$c" }.mkString("\n"))
    val src = spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("cat"))
    val q = StreamingDrift.attachCategorical(src, ckpt, cDir, triggerMillis = 100)
    try q.processAllAvailable() finally q.stop()
    val batch = clean.map { case (x, y) => (x.toDouble, y.toDouble) }.toDF("x", "y")
    val kt = StreamingDrift.kendallNow(spark, cDir).collect().head
    kt.toSeq shouldBe Drift.kendallTau(batch, "x", "y").collect().head.toSeq
    kt.isNullAt(kt.fieldIndex("tau_b")) shouldBe false
    val wk = StreamingDrift.weightedKappaNow(spark, cDir).collect().head
    wk.toSeq shouldBe Evaluation.weightedKappa(batch, "x", "y").collect().head.toSeq
    wk.isNullAt(wk.fieldIndex("kappa_w")) shouldBe false
    StreamingDrift.spearmanNow(spark, cDir).collect().head.toSeq shouldBe
      Drift.spearman(batch, "x", "y").collect().head.toSeq
  }

  it("streamed fairness/uplift family (per-group ECE / uplift tiles / qini) equals batch across a restart") {
    import graft.operators.Evaluation
    val r = new scala.util.Random(67)
    // groups g0..g3, dyadic-grid probabilities, outcomes tracking p
    val calib = Vector.fill(500) {
      val g = s"g${r.nextInt(4)}"
      val p = r.nextInt(65) / 64.0
      val y = r.nextDouble() < p
      (s"$g|$y", p.toString)
    }
    // treat|y slices over a dyadic targeting score with planted uplift
    val uplift = Vector.fill(500) {
      val t = r.nextBoolean()
      val s = r.nextInt(33) / 32.0
      val y = r.nextDouble() < (if (t) s * 0.8 else 0.2)
      (s"$t|$y", s.toString)
    }
    def run(rows: Vector[(String, String)], tag: String): String = {
      val inDir = JFiles.createTempDirectory(s"graft-$tag-in").toString
      val ckpt = JFiles.createTempDirectory(s"graft-$tag-ckpt").toString
      val cDir = JFiles.createTempDirectory(s"graft-$tag-counts").toString
      def write(name: String, part: Seq[(String, String)]): Unit =
        JFiles.writeString(Paths.get(inDir, name),
          part.map { case (s, c) => s"$s,$c" }.mkString("\n"))
      val src = () => spark.readStream.text(inDir)
        .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
          F.split(F.col("value"), ",").getItem(1).as("cat"))
      write("f1.txt", rows.take(rows.length / 2))
      val q1 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
      try q1.processAllAvailable() finally q1.stop()
      write("f2.txt", rows.drop(rows.length / 2))
      val q2 = StreamingDrift.attachCategorical(src(), ckpt, cDir, triggerMillis = 100)
      try q2.processAllAvailable() finally q2.stop()
      cDir
    }
    val calibDir = run(calib, "gece")
    val upliftDir = run(uplift, "uplt")
    val batchCalib = calib.map { case (sl, p) =>
      (sl.split('|')(0), p.toDouble, sl.split('|')(1).toBoolean)
    }.toDF("g", "p", "y")
    StreamingDrift.eceByGroupNow(spark, calibDir)
      .orderBy("group").collect().map(_.toSeq) shouldBe
      Evaluation.eceByGroup(batchCalib, "g", "p", "y")
        .orderBy("group").collect().map(_.toSeq)
    val batchUplift = uplift.map { case (sl, s) =>
      (s.toDouble, sl.split('|')(0).toBoolean, sl.split('|')(1).toBoolean)
    }.toDF("s", "t", "y")
    StreamingDrift.upliftNow(spark, upliftDir)
      .orderBy("tile").collect().map(_.toSeq) shouldBe
      Evaluation.upliftTable(batchUplift, "s", "t", "y")
        .orderBy("tile").collect().map(_.toSeq)
    StreamingDrift.qiniNow(spark, upliftDir).collect().head.toSeq shouldBe
      Evaluation.qini(batchUplift, "s", "t", "y").collect().head.toSeq
    // the planted uplift bites: qini positive
    StreamingDrift.qiniNow(spark, upliftDir)
      .collect().head.getAs[Double]("qini") should be > 0.0
  }

  it("an empty stream reads as zero current counts, not a throw") {
    val dir = JFiles.createTempDirectory("graft-drift-empty").toString
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val (lo, hi) = StreamingDrift.refBounds(ref, "v")
    val refCounts = Drift.bucketCounts(ref, "v", lo, hi, 4)
    val out = StreamingDrift.psiNow(spark, refCounts, dir, 4).collect()
    out should have size 4
    out.map(_.getAs[Long]("n_cur")).sum shouldBe 0L
    StreamingDrift.jsNow(spark, dir).collect() shouldBe empty
  }
}
