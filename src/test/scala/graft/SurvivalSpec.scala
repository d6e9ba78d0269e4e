package graft

import graft.operators.Survival

/** Kaplan–Meier: hand-computed product-limit values, censoring
  * semantics, and degenerate regimes. */
class SurvivalSpec extends SparkSpec {

  import spark.implicits._

  private def km(rows: Seq[(Int, Int)]): Map[Long, (Long, Long, Long, Double)] =
    Survival.kaplanMeier(rows.toDF("dur", "obs"), "dur", "obs")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  it("matches the textbook example: censored subjects leave the risk set without an event") {
    // events at 1, 2, 4; censored at 3, 5
    val out = km(Seq((1, 1), (2, 1), (3, 0), (4, 1), (5, 0)))
    out(1L) shouldBe ((5L, 1L, 0L, 0.8))
    out(2L) shouldBe ((4L, 1L, 0L, 0.6))
    out(3L) shouldBe ((3L, 0L, 1L, 0.6)) // censoring alone never moves the curve
    out(4L) shouldBe ((2L, 1L, 0L, 0.3))
    out(5L) shouldBe ((1L, 0L, 1L, 0.3))
  }

  it("with no censoring the curve IS the empirical survival function") {
    val out = km(Seq((1, 1), (2, 1), (3, 1), (4, 1)))
    out(1L)._4 shouldBe 0.75
    out(2L)._4 shouldBe 0.5
    out(3L)._4 shouldBe 0.25
    out(4L)._4 shouldBe 0.0 // the last subject dying sends S to exactly 0
  }

  it("ties at one duration fold into a single step") {
    val out = km(Seq((2, 1), (2, 1), (2, 0), (5, 1)))
    out(2L) shouldBe ((4L, 2L, 1L, 0.5)) // 1 - 2/4
    out(5L) shouldBe ((1L, 1L, 0L, 0.0))
  }

  it("an all-censored cohort keeps survival at 1 the whole way") {
    val out = km(Seq((1, 0), (2, 0), (3, 0)))
    out.values.map(_._4).toSet shouldBe Set(1.0)
    out.values.map(_._2).sum shouldBe 0L
  }

  it("duration zero (event on the entry day) is a valid first step") {
    val out = km(Seq((0, 1), (3, 0)))
    out(0L) shouldBe ((2L, 1L, 0L, 0.5))
    out(3L)._4 shouldBe 0.5
  }

  it("streamed subjects across a restart yield the batch curve exactly") {
    import java.nio.file.{Files => JFiles, Paths}
    import org.apache.spark.sql.{functions => F}
    val r = new scala.util.Random(41)
    val subjects = Seq.fill(120)((r.nextInt(12), if (r.nextInt(4) == 0) 0 else 1))
    val inDir = JFiles.createTempDirectory("graft-km-in").toString
    val ckpt = JFiles.createTempDirectory("graft-km-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-km-counts").toString
    def write(name: String, part: Seq[(Int, Int)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (d, o) => s"$d,$o" }.mkString("\n"))
    write("f1.txt", subjects.take(60))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).cast("int").as("dur"),
        F.split(F.col("value"), ",").getItem(1).cast("int").as("obs"))
    val q1 = graft.streaming.StreamingSurvival.attach(src(), ckpt, cDir, "dur", "obs", 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", subjects.drop(60))
    val q2 = graft.streaming.StreamingSurvival.attach(src(), ckpt, cDir, "dur", "obs", 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = graft.streaming.StreamingSurvival.kmNow(spark, cDir)
      .collect().map(x => x.getLong(0) -> x.toSeq).toMap
    val batch = Survival.kaplanMeier(subjects.toDF("dur", "obs"), "dur", "obs")
      .collect().map(x => x.getLong(0) -> x.toSeq).toMap
    streamed shouldBe batch
    streamed.size should be > 5
  }
}
