package graft

import org.apache.spark.sql.{Encoders, functions => F}

import graft.functions.HeavyHittersAggregator

/** Misra-Gries heavy hitters: the mergeable-summary guarantees must hold
  * under distributed partial aggregation for ANY partitioning — presence
  * of every item above the n/(k+1) threshold, counts that are lower
  * bounds within n/(k+1) of truth — and the sketch must be exact when k
  * exceeds the cardinality. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: item i appears ~ 2000/i times, 60 distinct items.
  private lazy val rows: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
  private lazy val truth: Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private lazy val n = rows.size.toLong

  private def sketch(k: Int, partitions: Int): Map[String, Long] = {
    val hh = F.udaf(new HeavyHittersAggregator(k), Encoders.STRING)
    rows.toDF("item").repartition(partitions)
      .agg(hh(F.col("item")).as("hh"))
      .select(F.explode(F.col("hh.items")).as(Seq("item", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  it("is exact when capacity exceeds the cardinality") {
    sketch(k = 64, partitions = 8) shouldBe truth
  }

  it("keeps every heavy item and underestimates by at most n/(k+1) at small capacity") {
    val k = 10
    val est = sketch(k, partitions = 8)
    est.size should be <= k
    val bound = n / (k + 1) // MG error bound
    truth.foreach { case (item, c) =>
      if (c > bound) withClue(s"$item (true $c > bound $bound) missing: ") {
        est.contains(item) shouldBe true
      }
    }
    est.foreach { case (item, e) =>
      val c = truth(item)
      withClue(s"$item est $e true $c: ") {
        e should be <= c // lower bound
        (c - e) should be <= bound
      }
    }
  }

  it("streaming summaries across a restart merge to the exact counts at ample capacity") {
    import java.nio.file.{Files => JFiles, Paths}
    val inDir = JFiles.createTempDirectory("graft-hh-in").toString
    val ckpt = JFiles.createTempDirectory("graft-hh-ckpt").toString
    val sumDir = JFiles.createTempDirectory("graft-hh-sum").toString
    val half = rows.length / 2

    JFiles.writeString(Paths.get(inDir, "f1.txt"), rows.take(half).mkString("\n"))
    val src = () => spark.readStream.text(inDir).select(F.col("value").as("item"))
    val q1 = graft.streaming.StreamingHeavyHitters.attach(
      src(), ckpt, sumDir, k = 64, triggerMillis = 100)
    try q1.processAllAvailable() finally q1.stop()

    JFiles.writeString(Paths.get(inDir, "f2.txt"), rows.drop(half).mkString("\n"))
    val q2 = graft.streaming.StreamingHeavyHitters.attach(
      src(), ckpt, sumDir, k = 64, triggerMillis = 100)
    try q2.processAllAvailable() finally q2.stop()

    val merged = graft.streaming.StreamingHeavyHitters.summary(spark, sumDir, k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged shouldBe truth // cardinality 60 <= 64: exact across the whole stream
  }

  it("guarantees hold regardless of partitioning (merge order)") {
    Seq(1, 3, 17).foreach { p =>
      val est = sketch(k = 10, partitions = p)
      val bound = n / 11
      truth.filter(_._2 > bound).keys.foreach(item => est.contains(item) shouldBe true)
      est.foreach { case (item, e) => e should be <= truth(item) }
    }
  }
}
