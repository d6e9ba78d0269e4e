package graft

import org.apache.spark.sql.graftnative.JaroWinklerSimilarity
import org.apache.spark.sql.{functions => F}

import graft.functions.JaroWinklerAlgo

/** Jaro–Winkler: classic literature values (cross-checked against
  * DuckDB's jaro_winkler_similarity, the oracle function), edge
  * semantics, and codegen/interpreted agreement of the native
  * expression. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  it("reproduces the DuckDB-verified reference values") {
    // each expected double is DuckDB 1.0.0's output for the same pair
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0: no boost
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("abc", "abc", 1.0))
    cases.foreach { case (a, b, want) =>
      JaroWinklerAlgo.similarity(a, b) shouldBe want +- eps
    }
  }

  it("agrees with DuckDB on ODD out-of-order counts (the integer-halving branch)") {
    // (m − t/2)/m floors the transposition halving with INTEGER division;
    // every literature pair above happens to have an even out-of-order
    // count, so this branch was previously covered only by offline fuzz.
    // Each pair below has an odd count (t in the comment = out-of-order
    // matched positions before halving); expected doubles are DuckDB
    // 1.0.0's jaro_winkler_similarity on the same pair.
    val cases = Seq(
      ("prefixabcde", "prefixbcade", 0.9818181818181818), // 3-cycle tail, t=3
      ("eadbdba", "bddabae", 0.7428571428571429), // t=3, below the boost gate
      ("caaeddb", "cddaeab", 0.7685714285714286), // t=3, boosted (prefix 1)
      ("bbdcbcace", "dbecbccab", 0.7566137566137566), // t=5
      ("dedaaaead", "aaeddeaad", 0.8888888888888888)) // t=7
    cases.foreach { case (a, b, want) =>
      withClue(s"$a / $b: ") { JaroWinklerAlgo.similarity(a, b) shouldBe want +- eps }
    }
  }

  it("returns 0.0 when either side is empty (the DuckDB convention)") {
    JaroWinklerAlgo.similarity("", "") shouldBe 0.0
    JaroWinklerAlgo.similarity("a", "") shouldBe 0.0
    JaroWinklerAlgo.similarity("", "abc") shouldBe 0.0
  }

  it("is symmetric and bounded on random pairs") {
    val r = new scala.util.Random(3)
    def word() = (0 until r.nextInt(12)).map(_ => ('a' + r.nextInt(6)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (word(), word())
      val s = JaroWinklerAlgo.similarity(a, b)
      s shouldBe JaroWinklerAlgo.similarity(b, a) +- eps
      s should (be >= 0.0 and be <= 1.0)
    }
  }

  it("the native expression matches the algorithm through codegen") {
    val r = new scala.util.Random(9)
    def word() = (0 until (1 + r.nextInt(10))).map(_ => ('a' + r.nextInt(5)).toChar).mkString
    val pairs = Seq.fill(500)((word(), word()))
    val out = pairs.toDF("a", "b")
      .select(F.col("a"), F.col("b"),
        JaroWinklerSimilarity.sim(F.col("a"), F.col("b")).as("s"))
      .collect()
    out.foreach { row =>
      // bit-exact: codegen dispatches to the very same static method
      row.getDouble(2) shouldBe
        JaroWinklerAlgo.similarity(row.getString(0), row.getString(1))
    }
  }

  it("propagates nulls") {
    val out = Seq(("x", null: String), (null: String, "y"), ("x", "y"))
      .toDF("a", "b")
      .select(JaroWinklerSimilarity.sim(F.col("a"), F.col("b")).as("s"))
      .collect()
    out(0).isNullAt(0) shouldBe true
    out(1).isNullAt(0) shouldBe true
    out(2).isNullAt(0) shouldBe false
  }
}
