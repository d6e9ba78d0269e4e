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

  it("likelihood pruning reaches the target size and beats frequency truncation on corpus likelihood") {
    // 'ab' is the FREQUENT piece (100 occurrences) but its characters
    // are themselves common standalone words, so losing it is cheap —
    // the fallback '|a|b|' rides high char probabilities; 'wxyz' is
    // rare (15) but its characters appear nowhere else, so losing it
    // costs 4 bottom-probability chars per occurrence. Frequency
    // ranking keeps 'ab' and drops 'wxyz'; the likelihood objective
    // must do the opposite.
    val vocab = Seq(("a", 50L), ("b", 50L), ("ab", 100L), ("wxyz", 15L))
    val base = UnigramLM.trainFromVocab(vocab)
    val chars = base.map(_._1).filter(_.length == 1)
    base.map(_._1).filter(_.length > 1).toSet shouldBe Set("ab", "wxyz")
    val target = chars.size + 1
    val pruned = UnigramLM.trainPruned(vocab, target)
    pruned.size should be <= target
    pruned.map(_._1) should contain("wxyz")
    pruned.map(_._1) should not contain "ab"
    val trunc = UnigramLM.truncateByFrequency(vocab, base, target)
    trunc.map(_._1) should contain("ab")
    trunc.map(_._1) should not contain "wxyz"
    UnigramLM.corpusScore(vocab, pruned) should be >
      UnigramLM.corpusScore(vocab, trunc)
  }

  it("trainPruned refuses a target below the single-char coverage floor; no-op above current size") {
    val vocab = Seq(("abab", 50L), ("ab", 30L))
    intercept[IllegalArgumentException] {
      UnigramLM.trainPruned(vocab, 1)
    }.getMessage should include("coverage floor")
    // already at/below target → unchanged model
    val base = UnigramLM.trainFromVocab(vocab)
    UnigramLM.trainPruned(vocab, base.size) shouldBe base
  }

  it("the pruned model serves through the same segmentVocab/dictionary-encode path") {
    val docs = Seq((0L, "a b ab wxyz"), (1L, "ab ab a wxyz b")).toDF("doc_id", "text")
    val model = UnigramLM.trainPrunedFromDocs(docs, "text", targetSize = 7)
    val segs = UnigramLM.segmentVocab(docs, "text", model)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    segs("wxyz") shouldBe (("|wxyz|", 1L))
    segs("ab") shouldBe (("|a|b|", 2L)) // the pruned piece falls back to chars
  }

  it("the SQL mirror's unrolled Viterbi agrees with the driver fold on every vocab word") {
    // executed through Spark SQL (same semantics class as the DuckDB
    // mirror: standard windowed SQL over the VALUES model) — the
    // DuckDB-side agreement is the driver's oracle gate
    val docs = Seq((0L, "abab ab ba bab"), (1L, "abc cab ab")).toDF("doc_id", "text")
    val model = UnigramLM.train(docs, "text")
    // the served corpus carries 'zz' — characters unseen in training —
    // so the mirror's per-char COALESCE fallback is exercised alongside
    // the Viterbi path (r16 ADVICE: the fin fallback must match
    // segmentVocab's, not drop the word)
    val served = docs.union(Seq((2L, "zz abc")).toDF("doc_id", "text"))
    served.createOrReplaceTempView("documents")
    val sql = "WITH words AS (SELECT DISTINCT explode(split(text, ' ')) AS word FROM documents), " +
      "w AS (SELECT word FROM words WHERE length(word) > 0), " +
      UnigramLM.viterbiSql(model)
        .replace("CAST(NULL AS VARCHAR)", "CAST(NULL AS STRING)")
        .replace("list_filter(string_split(", "filter(split(")
        .replace("THEN len(filter(split(", "THEN size(filter(split(")
        // DuckDB's array_to_string/len over full-match extract-all →
        // Spark's array_join/size with an explicit group index 0
        .replace("array_to_string(regexp_extract_all(word, '.'), '|')",
          "array_join(regexp_extract_all(word, '.', 0), '|')")
        .replace("ELSE len(regexp_extract_all(word, '.'))",
          "ELSE size(regexp_extract_all(word, '.', 0))")
        // Spark's split() takes a regex where DuckDB's string_split is
        // literal — escape the pipe delimiter for the Spark run
        .replace("split(dsg || '|', '|')", "split(dsg || '|', '\\\\|')") + " " +
      "SELECT word, seg, n_tokens FROM fin ORDER BY word"
    val viaSql = spark.sql(sql).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val viaFold = UnigramLM.segmentVocab(served, "text", model)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    viaSql shouldBe viaFold
    viaSql("zz") shouldBe (("|z|z|", 2L))
  }
}
