package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.Theta
import graft.operators.SetSketches

/** Deterministic theta (KMV) sketch: exact below saturation, bounded
  * error above, merge/replay stability, and the distributed pairwise
  * set-operation estimates. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int) =
    Theta.consolidate(items.foldLeft(Theta.empty(k))(Theta.insert))

  it("is exact (and reports unsaturated) below k distinct values") {
    val items = (1 to 900).map(i => s"v$i")
    val s = sketchOf(items ++ items, k = 1024) // duplicates must not count
    Theta.saturated(s) shouldBe false
    Theta.estimate(s) shouldBe 900.0
  }

  it("estimates within the KMV error bound once saturated") {
    val n = 200000
    val s = sketchOf((1 to n).map(i => s"item$i"), k = 1024)
    Theta.saturated(s) shouldBe true
    val rse = 1.0 / math.sqrt(1024 - 2)
    math.abs(Theta.estimate(s) - n) / n should be < 3 * rse
  }

  it("merge is associative, commutative, and equals the one-pass sketch") {
    val all = (1 to 5000).map(i => s"x$i")
    val Seq(a, b, c) = all.grouped(1700).toSeq.map(g => sketchOf(g, 256)).padTo(3, Theta.empty(256))
    val onePass = sketchOf(all, 256)
    Theta.merge(Theta.merge(a, b), c).retained shouldBe onePass.retained
    Theta.merge(a, Theta.merge(b, c)).retained shouldBe onePass.retained
    Theta.merge(c, Theta.merge(a, b)).retained shouldBe onePass.retained
  }

  it("replays from exploded hash rows (the streaming-partial path)") {
    val items = (1 to 3000).map(i => s"h$i")
    val s = sketchOf(items, 512)
    val replayed = Theta.fromHashes(512, scala.util.Random.shuffle(s.retained.toVector))
    replayed.retained shouldBe s.retained
    Theta.estimate(replayed) shouldBe Theta.estimate(s)
  }

  it("pairwise estimates are exact in the lossless regime") {
    val rows = (1 to 50).map(i => ("a", s"u$i")) ++ (26 to 75).map(i => ("b", s"u$i"))
    val sk = SetSketches.sketchSets(rows.toDF("slice", "uid"), "slice", F.col("uid"), k = 64)
    val out = SetSketches.pairOverlap(sk, 64).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Double]("est_a") shouldBe 50.0
    r.getAs[Double]("est_b") shouldBe 50.0
    r.getAs[Double]("est_intersect") shouldBe 25.0
    r.getAs[Double]("est_union") shouldBe 75.0
    r.getAs[Double]("est_diff_ab") shouldBe 25.0
    r.getAs[Double]("est_jaccard") shouldBe 25.0 / 75.0
    r.getAs[Boolean]("saturated_a") shouldBe false
  }

  it("pairwise estimates hold their bounds in the saturated regime") {
    val rows = (1 to 60000).map(i => ("a", s"u$i")) ++
      (30001 to 90000).map(i => ("b", s"u$i"))
    val sk = SetSketches.sketchSets(rows.toDF("slice", "uid"), "slice", F.col("uid"), k = 2048)
    val r = SetSketches.pairOverlap(sk, 2048).collect().head
    r.getAs[Boolean]("saturated_a") shouldBe true
    math.abs(r.getAs[Double]("est_a") - 60000) / 60000.0 should be < 0.1
    math.abs(r.getAs[Double]("est_intersect") - 30000) / 30000.0 should be < 0.1
    math.abs(r.getAs[Double]("est_union") - 90000) / 90000.0 should be < 0.1
    math.abs(r.getAs[Double]("est_diff_ab") - 30000) / 30000.0 should be < 0.15
    math.abs(r.getAs[Double]("est_jaccard") - 1.0 / 3.0) should be < 0.05
  }

  it("disjoint slices estimate an empty intersection") {
    val rows = (1 to 5000).map(i => ("a", s"l$i")) ++ (1 to 5000).map(i => ("b", s"r$i"))
    val sk = SetSketches.sketchSets(rows.toDF("slice", "uid"), "slice", F.col("uid"), k = 512)
    val r = SetSketches.pairOverlap(sk, 512).collect().head
    r.getAs[Double]("est_jaccard") should be < 0.01
    r.getAs[Double]("est_intersect") should be < 100.0
  }

  it("skips nulls like COUNT(DISTINCT)") {
    val rows = Seq(("a", "x"), ("a", null), ("a", "y"), ("b", null))
    val sk = SetSketches.sketchSets(rows.toDF("slice", "uid"), "slice", F.col("uid"), k = 64)
    val ests = SetSketches.estimates(sk, 64).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    ests("a") shouldBe 2.0
    ests("b") shouldBe 0.0
  }

  it("streamed partials across a restart equal the batch overlap EXACTLY") {
    import java.nio.file.{Files => JFiles, Paths}
    val r = new scala.util.Random(23)
    // saturating volume (k=128) with real overlap between three slices
    val rows = r.shuffle(
      (1 to 900).map(i => s"a,u$i") ++
        (450 to 1350).map(i => s"b,u$i") ++
        (1 to 80).map(i => s"c,u${i * 10}")).toVector
    val inDir = JFiles.createTempDirectory("graft-theta-in").toString
    val ckpt = JFiles.createTempDirectory("graft-theta-ckpt").toString
    val sumDir = JFiles.createTempDirectory("graft-theta-sum").toString
    val half = rows.length / 2
    JFiles.writeString(Paths.get(inDir, "f1.txt"), rows.take(half).mkString("\n"))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("value"))
    val q1 = graft.streaming.StreamingSetSketches.attach(
      src(), ckpt, sumDir, k = 128, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    JFiles.writeString(Paths.get(inDir, "f2.txt"), rows.drop(half).mkString("\n"))
    val q2 = graft.streaming.StreamingSetSketches.attach(
      src(), ckpt, sumDir, k = 128, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = graft.streaming.StreamingSetSketches.overlap(spark, sumDir, k = 128)
      .collect().map(r0 => (r0.getString(0), r0.getString(1)) -> r0).toMap
    val batchDf = rows.map { s => val p = s.split(","); (p(0), p(1)) }.toDF("slice", "value")
    val batch = SetSketches.pairOverlap(
      SetSketches.sketchSets(batchDf, "slice", F.col("value"), 128), 128)
      .collect().map(r0 => (r0.getString(0), r0.getString(1)) -> r0).toMap

    streamed.keySet shouldBe batch.keySet
    streamed.keySet should have size 3
    streamed.foreach { case (key, srow) =>
      val brow = batch(key)
      Seq("est_a", "est_b", "est_intersect", "est_union", "est_jaccard").foreach { c =>
        withClue(s"$key $c: ") {
          srow.getAs[Double](c) shouldBe brow.getAs[Double](c)
        }
      }
    }
    // and the stream actually saturated (the non-trivial regime)
    streamed.values.exists(_.getAs[Boolean]("saturated_a")) shouldBe true
  }

  it("empty stream directory yields an empty overlap frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-empty").toString
    graft.streaming.StreamingSetSketches.overlap(spark, dir, k = 64).collect() shouldBe empty
  }

  // ---- slidingDistinct ----------------------------------------------

  private def dayRows(rows: Seq[(Int, String)]) =
    rows.map { case (d, u) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 2, 1).plusDays(d.toLong)), u)
    }.toDF("day", "uid")

  it("sliding distinct equals the exact windowed COUNT DISTINCT while lossless") {
    val r = new scala.util.Random(29)
    val rows = Seq.fill(600)((r.nextInt(10), s"u${r.nextInt(80)}"))
    val got = SetSketches.slidingDistinct(dayRows(rows), F.col("day"), F.col("uid"),
        window = 3, k = 512)
      .collect().map(x => x.getDate(0).toString -> ((x.getDouble(1), x.getBoolean(2)))).toMap
    val byDay = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 to 9).foreach { d =>
      val want = (math.max(0, d - 2) to d).flatMap(byDay.getOrElse(_, Set.empty)).toSet.size
      val day = java.time.LocalDate.of(2026, 2, 1).plusDays(d.toLong).toString
      withClue(s"day $day: ") {
        got(day)._1 shouldBe want.toDouble
        got(day)._2 shouldBe false
      }
    }
  }

  it("window=1 degenerates to per-day distincts; saturated windows stay inside 3x RSE") {
    val r = new scala.util.Random(71)
    val rows = Seq.fill(400)((r.nextInt(5), s"u${r.nextInt(50)}"))
    val one = SetSketches.slidingDistinct(dayRows(rows), F.col("day"), F.col("uid"), 1, 256)
      .collect().map(x => x.getDate(0).toString -> x.getDouble(1)).toMap
    rows.groupBy(_._1).foreach { case (d, g) =>
      val day = java.time.LocalDate.of(2026, 2, 1).plusDays(d.toLong).toString
      one(day) shouldBe g.map(_._2).distinct.size.toDouble
    }
    // k far below cardinality: estimates bounded, saturation OBSERVABLE
    val big = Seq.tabulate(3000)(i => (i % 3, s"u$i"))
    val sat = SetSketches.slidingDistinct(dayRows(big), F.col("day"), F.col("uid"), 3, 64)
      .collect().map(x => (x.getDouble(1), x.getBoolean(2)))
    val full = sat.maxBy(_._1)
    full._2 shouldBe true
    full._1 shouldBe 3000.0 +- 3 * 3000.0 / math.sqrt(62.0)
  }

  it("streamed day sketches across a restart yield the batch sliding counts exactly") {
    import java.nio.file.{Files => JFiles, Paths}
    val r = new scala.util.Random(53)
    val rows = r.shuffle(Seq.fill(500)((r.nextInt(8), s"u${r.nextInt(90)}"))).toVector
    def dayStr(d: Int) = java.time.LocalDate.of(2026, 2, 1).plusDays(d.toLong).toString
    val inDir = JFiles.createTempDirectory("graft-slide-in").toString
    val ckpt = JFiles.createTempDirectory("graft-slide-ckpt").toString
    val sumDir = JFiles.createTempDirectory("graft-slide-sum").toString
    def write(name: String, part: Seq[(Int, String)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (d, u) => s"${dayStr(d)},$u" }.mkString("\n"))
    write("f1.txt", rows.take(250)) // days straddle the restart: k-min folds must merge
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("slice"),
        F.split(F.col("value"), ",").getItem(1).as("value"))
    val q1 = graft.streaming.StreamingSetSketches.attach(src(), ckpt, sumDir, 256, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", rows.drop(250))
    val q2 = graft.streaming.StreamingSetSketches.attach(src(), ckpt, sumDir, 256, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = graft.streaming.StreamingSetSketches
      .slidingDistinctNow(spark, sumDir, k = 256, window = 3)
      .collect().map(x => x.getDate(0).toString -> ((x.getDouble(1), x.getBoolean(2)))).toMap
    val batch = SetSketches.slidingDistinct(dayRows(rows), F.col("day"), F.col("uid"), 3, 256)
      .collect().map(x => x.getDate(0).toString -> ((x.getDouble(1), x.getBoolean(2)))).toMap
    streamed shouldBe batch
    streamed.size shouldBe 8
  }
}
