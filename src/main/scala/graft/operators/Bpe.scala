package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.Pin._

/** Distributed byte-pair-encoding tokenizer — the train/serve pair of a
  * training-data pipeline's tokenization stage.
  *
  * TRAIN is the classic vocabulary-weighted BPE loop, distributed: the
  * corpus collapses to a (word, count) vocabulary once (combinable
  * aggregate — at 100 TB the vocabulary, not the corpus, is what each
  * merge iteration touches), each word is segmented as a `|tok|tok|`
  * string, and every iteration counts adjacent token pairs weighted by
  * word count (explode + one combinable sum per pair) and takes the most
  * frequent pair (ties: lexicographic) as the next merge. Only the K
  * (x, y) merge pairs — the model — ever reach the driver.
  *
  * ENCODE applies the learned merges in order as a chain of
  * `regexp_replace('|x|y|' → '|xy|')` passes, run a FIXED `passes` times
  * per merge (a single non-overlapping pass consumes the shared delimiter
  * of an adjacent chain, so repeats are needed to reach the fixpoint).
  * The chain IS the canonical encode semantics of this tokenizer: for
  * every x ≠ y merge it is exactly textbook greedy BPE (x≠y occurrences
  * cannot overlap), and for the x = y case on odd runs of ≥ 5 identical
  * tokens the grouping differs from leftmost-greedy (`|aa|a|aa|` instead
  * of `|aa|aa|a|` — pinned in BpeSpec) while staying deterministic. What
  * the chain buys is ENGINE PORTABILITY: the identical expression runs
  * under Java regex and RE2 ([[encodeSql]] mirrors it for the DuckDB
  * oracle) — no per-row UDF, just codegen'd string expressions, and train
  * segments with the same chain so learned merges and served encodes
  * always agree.
  */
object Bpe {

  /** `'word'` → `'|w|o|r|d|'` — the initial character segmentation. */
  def segInit(word: Column): Column =
    F.concat(F.lit("|"), F.regexp_replace(word, "(.)", "$1|"))

  /** Apply one merge (x, y) → xy with `passes` non-overlapping sweeps. */
  def applyMerge(seg: Column, x: String, y: String, passes: Int): Column = {
    val pat = java.util.regex.Pattern.quote(s"|$x|$y|")
    (1 to passes).foldLeft(seg)((c, _) =>
      F.regexp_replace(c, pat, s"|$x$y|"))
  }

  /** Full encode: initial char split, then every merge in learned order. */
  def encode(word: Column, merges: Seq[(String, String)], passes: Int): Column =
    merges.foldLeft(segInit(word)) { case (c, (x, y)) => applyMerge(c, x, y, passes) }

  /** Token count of a `|tok|tok|` segmentation. */
  def nTokens(seg: Column): Column =
    F.size(F.filter(F.split(seg, "\\|"), t => F.length(t) > 0)).cast("long")

  /** The DuckDB mirror of [[encode]]: the SAME chain, RE2 syntax. Tokens
    * are alphanumeric (corpus words), so the only metacharacter to escape
    * is the delimiter itself. */
  def encodeSql(wordExpr: String, merges: Seq[(String, String)], passes: Int): String = {
    val init = s"'|' || regexp_replace($wordExpr, '(.)', '\\1|', 'g')"
    merges.foldLeft(init) { case (e, (x, y)) =>
      (1 to passes).foldLeft(e)((inner, _) =>
        s"regexp_replace($inner, '\\|$x\\|$y\\|', '|$x$y|', 'g')")
    }
  }

  /** Train `numMerges` merges over the corpus vocabulary. Deterministic:
    * counts are exact longs, ties break to the lexicographically smallest
    * (x, y). Stops early if no adjacent pair remains. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      passes: Int = 8): Seq[(String, String)] = {
    // corpus → (word, count) ONCE; every later iteration works on the
    // vocabulary (distinct-content-sized, not corpus-sized)
    val vocab = df
      .select(F.explode(F.split(F.col(textCol), " ")).as("word"))
      .filter(F.length(F.col("word")) > 0)
      .groupBy("word").agg(F.count(F.lit(1)).as("wc"))
    var segged = vocab
      .select(F.col("wc"), segInit(F.col("word")).as("seg"))
      .pin()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 0 until numMerges if !exhausted) {
      val toks = F.filter(F.split(F.col("seg"), "\\|"), t => F.length(t) > 0)
      val top = segged
        .select(F.col("wc"), toks.as("ts"))
        .filter(F.size(F.col("ts")) >= 2)
        .select(F.col("wc"), F.explode(
          F.zip_with(
            F.slice(F.col("ts"), F.lit(1), F.size(F.col("ts")) - 1),
            F.slice(F.col("ts"), F.lit(2), F.size(F.col("ts")) - 1),
            (a, b) => F.struct(a.as("x"), b.as("y")))).as("p"))
        .groupBy(F.col("p.x").as("x"), F.col("p.y").as("y"))
        .agg(F.sum("wc").as("cnt"))
        .orderBy(F.col("cnt").desc, F.col("x").asc, F.col("y").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y) = (top(0).getString(0), top(0).getString(1))
        merges += ((x, y))
        segged = segged
          .select(F.col("wc"), applyMerge(F.col("seg"), x, y, passes).as("seg"))
          .pin()
      }
    }
    merges.toSeq
  }
}
