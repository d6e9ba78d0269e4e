package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{DataShaping, Dedup}

/** Span-granular duplication stats + leakage-safe cluster splits. */
class CurationSplitSpec extends SparkSpec {

  import spark.implicits._

  private val twin = "alpha beta gamma delta epsilon zeta eta theta"

  describe("Dedup.corpusDupSpans") {
    it("scores full twins 1.0, partial overlap in between, unique docs 0.0") {
      val docs = Seq(
        (1L, twin),
        (2L, twin), // exact twin of 1 -> every span duplicated
        (3L, "alpha beta gamma completely different tail words here"),
        (4L, "nothing shared with anyone in this document at all")
      ).toDF("doc_id", "text")

      val out = Dedup.corpusDupSpans(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap

      // "alpha beta gamma" lives in docs 1, 2 AND 3 -> max df 3
      out(1L) shouldBe (6L, 6L, 1.0, 3L)
      out(2L) shouldBe (6L, 6L, 1.0, 3L)
      // doc 3 shares exactly its leading "alpha beta gamma" 3-gram
      out(3L)._2 shouldBe 1L
      out(3L)._3 shouldBe (1.0 / 6.0 +- 0.0001)
      out(4L) shouldBe (7L, 0L, 0.0, 1L)
    }

    it("never counts within-doc repetition as duplication") {
      val docs = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
      val row = Dedup.corpusDupSpans(docs, "doc_id", "text").collect().head
      row.getLong(2) shouldBe 0L // n_dup_spans
      row.getLong(4) shouldBe 1L // max_span_df: distinct-per-doc
    }
  }

  describe("Dedup.removeDuplicatedSpans") {
    it("cuts cross-doc duplicated spans and keeps unique tails") {
      val docs = Seq(
        (1L, twin), // full twin -> everything covered
        (2L, twin),
        (3L, "alpha beta gamma delta unique tail of document three"),
        (4L, "nothing shared with anyone in this document at all")
      ).toDF("doc_id", "text")

      val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap

      out(1L) shouldBe (8L, 8L, "") // twins collapse entirely
      out(2L) shouldBe (8L, 8L, "")
      // doc 3 shares "alpha beta gamma" and "beta gamma delta" with the
      // twins -> starts 1 and 2 cover positions 1..4; tail survives
      out(3L) shouldBe (9L, 4L, "unique tail of document three")
      out(4L) shouldBe (9L, 0L, "nothing shared with anyone in this document at all")
    }

    it("ignores within-doc repetition and short docs") {
      val docs = Seq(
        (1L, "x y z x y z x y z"), // repeats only within itself
        (2L, "a b") // shorter than one shingle
      ).toDF("doc_id", "text")
      val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      out(1L) shouldBe (0L, "x y z x y z x y z")
      out(2L) shouldBe (0L, "a b")
    }

    it("is idempotent: cleaning a cleaned corpus removes nothing") {
      val docs = Seq(
        (1L, twin + " one extra"),
        (2L, twin + " two other"),
        (3L, "alpha beta gamma and then some novel words")
      ).toDF("doc_id", "text")
      val once = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
        .select(F.col("doc_id"), F.col("clean_text").as("text"))
      val twice = Dedup.removeDuplicatedSpans(once, "doc_id", "text")
      twice.agg(F.sum("n_removed")).collect().head.getLong(0) shouldBe 0L
    }
  }

  describe("DataShaping.leakageSafeSplit") {
    it("assigns every member of a near-dup cluster to the same split") {
      // 3 exact-twin groups + isolated docs; twins must co-locate
      val docs = (0L until 30L).map { i =>
        val text = if (i < 6) twin + " groupA"
        else if (i < 12) twin.reverse.split(" ").mkString(" ") + " groupB padding words"
        else s"unique document number $i with its own content stream ${i * 7} ${i * 13} tail"
        (i, text)
      }.toDF("doc_id", "text")

      val out = DataShaping.leakageSafeSplit(docs, "doc_id", "text")
      out.count() shouldBe 30L

      val perCluster = out.groupBy("cluster")
        .agg(F.countDistinct("split").as("n_splits"))
        .collect()
      all(perCluster.map(_.getLong(1))) shouldBe 1L

      // group A docs 0..5 form one cluster labelled by the min id
      val a = out.filter(F.col("doc_id") < 6).collect()
      a.map(_.getLong(1)).distinct shouldBe Array(0L)
      a.map(_.getString(2)).distinct.length shouldBe 1
    }

    it("reduces to splitAssign's per-doc hash for singleton clusters") {
      val docs = (0L until 20L)
        .map(i => (i, s"totally distinct content row $i marker ${i * 31} ${i * 17} end"))
        .toDF("doc_id", "text")
      val safe = DataShaping.leakageSafeSplit(docs, "doc_id", "text")
      val singles = safe.filter(F.col("doc_id") === F.col("cluster"))
      val base = DataShaping.splitAssign(docs, "doc_id")
        .select(F.col("doc_id"), F.col("split").as("base_split"))
      singles.join(base, "doc_id")
        .filter(F.col("split") =!= F.col("base_split"))
        .count() shouldBe 0L
    }
  }
}
