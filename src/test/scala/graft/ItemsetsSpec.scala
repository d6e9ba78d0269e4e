package graft

import graft.operators.Itemsets

/** Association rules: hand-computed baskets, apriori pruning, the
  * confidence filter's direction asymmetry, lift vs independence. */
class ItemsetsSpec extends SparkSpec {

  import spark.implicits._

  // t1 {milk,bread} t2 {milk,bread} t3 {milk} t4 {bread,butter} t5 {milk,bread,butter}
  private val baskets = Seq(
    (1, "milk"), (1, "bread"),
    (2, "milk"), (2, "bread"),
    (3, "milk"),
    (4, "bread"), (4, "butter"),
    (5, "milk"), (5, "bread"), (5, "butter"))

  private def rules(minSup: Long, minConf: Double): Map[(String, String), (Long, Double, Double, Double)] =
    Itemsets.assocRules(baskets.toDF("tid", "item"), minSup, minConf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  it("computes support, confidence, and lift by hand on the classic basket") {
    // N=5; milk 4, bread 4, butter 2; pairs: bread+milk 3, bread+butter 2
    val out = rules(minSup = 2, minConf = 0.5)
    out(("bread", "milk")) shouldBe ((3L, 0.6, 0.75, 0.9375))
    out(("milk", "bread")) shouldBe ((3L, 0.6, 0.75, 0.9375))
    out(("bread", "butter")) shouldBe ((2L, 0.4, 0.5, 1.25))
    out(("butter", "bread")) shouldBe ((2L, 0.4, 1.0, 1.25))
    out.keySet should have size 4 // butter+milk co-occurs once: below support
  }

  it("the confidence filter is DIRECTIONAL: butter→bread survives 0.8, bread→butter does not") {
    rules(minSup = 2, minConf = 0.8).keySet shouldBe Set(("butter", "bread"))
  }

  it("raising min support to 3 leaves only the bread–milk pair") {
    rules(minSup = 3, minConf = 0.0).keySet shouldBe
      Set(("bread", "milk"), ("milk", "bread"))
  }

  it("duplicate (tid, item) rows do not inflate any count") {
    val dup = baskets ++ baskets
    val a = Itemsets.assocRules(dup.toDF("tid", "item"), 2, 0.5).collect().toSet
    val b = Itemsets.assocRules(baskets.toDF("tid", "item"), 2, 0.5).collect().toSet
    a shouldBe b
  }

  it("lift above 1 marks super-independent co-occurrence, below 1 sub-independent") {
    val out = rules(minSup = 2, minConf = 0.0)
    out(("butter", "bread"))._4 should be > 1.0 // butter implies bread strongly
    out(("bread", "milk"))._4 should be < 1.0 // both common, co-occurrence below product
  }

  it("streamed batch-complete baskets across a restart yield the batch rules exactly") {
    import java.nio.file.{Files => JFiles, Paths}
    import org.apache.spark.sql.{functions => F}
    val r = new scala.util.Random(19)
    // 60 baskets of 2-4 items from a 12-item vocabulary
    val all = (1 to 60).map { tid =>
      tid -> r.shuffle((1 to 12).toList).take(2 + r.nextInt(3)).map(i => s"i$i")
    }
    val inDir = JFiles.createTempDirectory("graft-rules-in").toString
    val ckpt = JFiles.createTempDirectory("graft-rules-ckpt").toString
    val cDir = JFiles.createTempDirectory("graft-rules-counts").toString
    def write(name: String, part: Seq[(Int, List[String])]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.flatMap { case (t, items) => items.map(i => s"$t,$i") }.mkString("\n"))
    write("f1.txt", all.take(30)) // whole baskets per file: the batch-complete contract
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).as("tid"),
        F.split(F.col("value"), ",").getItem(1).as("item"))
    val q1 = graft.streaming.StreamingItemsets.attach(src(), ckpt, cDir, "tid", "item", 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", all.drop(30))
    val q2 = graft.streaming.StreamingItemsets.attach(src(), ckpt, cDir, "tid", "item", 100)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = graft.streaming.StreamingItemsets.rulesNow(spark, cDir, 3, 0.2)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.toSeq.drop(2)).toMap
    val batchDf = all.flatMap { case (t, items) => items.map(i => (t, i)) }.toDF("tid", "item")
    val batch = Itemsets.assocRules(batchDf, 3, 0.2)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.toSeq.drop(2)).toMap
    streamed shouldBe batch
    streamed should not be empty
  }

  it("an empty stream directory yields an empty rule board, not a throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rules-empty").toString
    graft.streaming.StreamingItemsets.rulesNow(spark, dir, 1, 0.0).collect() shouldBe empty
  }
}
