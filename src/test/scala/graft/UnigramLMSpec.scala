package graft

import graft.operators.UnigramLM

/** Unigram-LM tokenizer: hand-worked Viterbi arithmetic, the textbook
  * EM behavior (a dominant multi-char piece wins over its char split),
  * tie-break and fallback contracts, the SQL mirror's agreement, and
  * the dictionary-encode serve path. */
class UnigramLMSpec extends SparkSpec {

  import spark.implicits._

  it("Viterbi picks the higher-likelihood decomposition with exact integer scores") {
    // lp in micro-nats: 'ab' much likelier than 'a'+'b'
    val lp = Map("a" -> -3000000L, "b" -> -3000000L, "ab" -> -1000000L)
    val (score, seg) = UnigramLM.viterbi("abab", lp, maxPieceLen = 4).get
    seg shouldBe "|ab|ab|"
    score shouldBe -2000000L
    // and the reverse weighting flips it
    val lp2 = Map("a" -> -500000L, "b" -> -500000L, "ab" -> -2000000L)
    UnigramLM.viterbi("ab", lp2, 4).get._2 shouldBe "|a|b|"
  }

  it("ties break to the lexicographically smallest segmentation string") {
    // |ab|c|, |a|bc| and |a|b|c| all tie at -3e6; smallest string is
    // "|ab|c|" ('b' = 0x62 sorts before '|' = 0x7c at index 2)
    val lp = Map("a" -> -1000000L, "b" -> -1000000L, "c" -> -1000000L,
      "ab" -> -2000000L, "bc" -> -2000000L)
    UnigramLM.viterbi("abc", lp, 4).get._2 shouldBe "|ab|c|"
  }

  it("an uncovered character makes the word unsegmentable (None)") {
    UnigramLM.viterbi("axb", Map("a" -> -1L, "b" -> -1L), 4) shouldBe None
  }

  it("EM promotes the dominant piece: 'abab' words collapse to |ab|ab|") {
    val vocab = Seq(("abab", 50L), ("ab", 30L), ("cd", 5L))
    val model = UnigramLM.trainFromVocab(vocab)
    val lp = model.toMap
    // single-char coverage is force-kept
    Seq("a", "b", "c", "d").foreach(ch => lp.keySet should contain(ch))
    UnigramLM.viterbi("abab", lp, 4).get._2 shouldBe "|abab|"
    UnigramLM.viterbi("ab", lp, 4).get._2 shouldBe "|ab|"
    // the learned tokenization never beats chars on total corpus tokens
    val emTokens = vocab.map { case (w, c) =>
      c * UnigramLM.viterbi(w, lp, 4).get._2.split('|').count(_.nonEmpty) }.sum
    val charTokens = vocab.map { case (w, c) => c * w.length }.sum
    emTokens should be < charTokens
  }

  it("segmentVocab serves the trained model over a documents frame; unseen chars fall to per-char") {
    val docs = Seq((0L, "abab ab abab"), (1L, "ab cd")).toDF("doc_id", "text")
    val model = UnigramLM.train(docs, "text")
    val segs = UnigramLM.segmentVocab(docs, "text", model)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    segs("abab") shouldBe (("|abab|", 1L))
    segs("ab") shouldBe (("|ab|", 1L))
    // serve a frame containing a char the model never saw
    val other = Seq((0L, "ab zz")).toDF("doc_id", "text")
    val segs2 = UnigramLM.segmentVocab(other, "text", model)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    segs2("zz") shouldBe "|z|z|"
  }

  it("tokenCounts is the dictionary-encode serve: per-doc sums under the model") {
    val docs = Seq((0L, "abab ab"), (1L, "cd cd cd")).toDF("doc_id", "text")
    val model = UnigramLM.train(docs, "text")
    val out = UnigramLM.tokenCounts(docs, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(0L)._1 shouldBe 2L // words
    out(0L)._2 shouldBe 2L // |abab| + |ab|
    out(1L)._1 shouldBe 3L
  }

  it("the SQL mirror's unrolled Viterbi agrees with the driver fold on every vocab word") {
    // executed through Spark SQL (same semantics class as the DuckDB
    // mirror: standard windowed SQL over the VALUES model) — the
    // DuckDB-side agreement is the driver's oracle gate
    val docs = Seq((0L, "abab ab ba bab"), (1L, "abc cab ab")).toDF("doc_id", "text")
    val model = UnigramLM.train(docs, "text")
    docs.createOrReplaceTempView("documents")
    val sql = "WITH words AS (SELECT DISTINCT explode(split(text, ' ')) AS word FROM documents), " +
      "w AS (SELECT word FROM words WHERE length(word) > 0), " +
      UnigramLM.viterbiSql(model)
        .replace("CAST(NULL AS VARCHAR)", "CAST(NULL AS STRING)")
        .replace("list_filter(string_split(", "filter(split(")
        .replace("CAST(len(filter(split(", "CAST(size(filter(split(")
        // Spark's split() takes a regex where DuckDB's string_split is
        // literal — escape the pipe delimiter for the Spark run
        .replace("split(dsg || '|', '|')", "split(dsg || '|', '\\\\|')") + " " +
      "SELECT word, seg, n_tokens FROM fin ORDER BY word"
    val viaSql = spark.sql(sql).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val viaFold = UnigramLM.segmentVocab(docs, "text", model)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    viaSql shouldBe viaFold
  }
}
