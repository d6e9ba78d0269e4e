package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Unigram-LM tokenizer trainer (Kudo 2018, the SentencePiece unigram
  * model) — the likelihood-pruned half of the production tokenizer
  * space next to [[Bpe]]'s merge-based half: a piece VOCABULARY with
  * log-probabilities, served by Viterbi segmentation (the
  * highest-likelihood decomposition of each word into pieces).
  *
  * Train→snap→serve with the [[LangIdNB]] integer-model twist: piece
  * log-probs snap to MICRO-NATS (round(ln·10⁶) as Long), so Viterbi
  * path scores are exact integer sums — deterministic, order-free, and
  * tie-broken totally (max score, then the lexicographically smallest
  * segmentation string), which makes the segmentation REPLAYABLE
  * bit-for-bit by the DuckDB mirror's unrolled dynamic program over the
  * same stashed integer table ([[viterbiSql]]).
  *
  * Scale shape (the Bpe discipline): the corpus collapses ONCE to its
  * (word, count) vocabulary — one combinable aggregate; at 100 TB the
  * vocabulary (language-bounded), not the corpus, is what training
  * touches. Seeding, hard-EM (Viterbi E-step, count M-step with add-1
  * smoothing, zero-count pruning) and segmentation run as a
  * vocabulary-sized driver fold under a loud guard ([[maxVocabWords]],
  * the Cox/PAVA axis-guard shape). Serving corpus-wide is DICTIONARY
  * ENCODE: the per-word segmentations broadcast-join to the corpus by
  * word (the q_bpe_tokens pattern) — never per-occurrence work.
  *
  * Comparisons use Java lexicographic string order == UTF-8 byte order
  * on the ASCII corpora this serves; the mirror's binary collation
  * agrees. */
object UnigramLM {

  val maxVocabWords = 100000
  val maxWordLen = 24

  private def micro(x: Double): Long = math.round(math.log(x) * 1e6)

  /** The corpus (word, count) vocabulary — the one corpus-sized
    * aggregate of the whole trainer. */
  def vocabCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(F.explode(F.split(F.col(textCol), " ")).as("word"))
      .filter(F.length(F.col("word")) > 0)
      .groupBy("word").agg(F.count(F.lit(1)).as("wc"))

  private def collectVocab(docs: DataFrame, textCol: String): Seq[(String, Long)] = {
    val rows = vocabCounts(docs, textCol)
      .orderBy("word").limit(maxVocabWords + 1).collect()
    require(rows.length <= maxVocabWords,
      s"UnigramLM: > $maxVocabWords distinct words — the trainer's driver " +
        "fold is vocabulary-bounded; pre-truncate or raise the cap deliberately")
    rows.foreach { r =>
      require(r.getString(0).length <= maxWordLen,
        s"UnigramLM: word longer than $maxWordLen chars ('${r.getString(0).take(32)}…') " +
          "— the unrolled Viterbi mirror is written to a fixed position cap")
    }
    rows.map(r => (r.getString(0), r.getLong(1)))
  }

  /** Viterbi segmentation of one word under integer micro-nat piece
    * scores: max total score, ties to the lexicographically smallest
    * segmentation string — the exact rule [[viterbiSql]] unrolls. None
    * when some character has no piece (cannot happen on the training
    * corpus: single chars are force-kept). Returns (score, "|p|q|"). */
  def viterbi(word: String, lp: Map[String, Long],
              maxPieceLen: Int): Option[(Long, String)] = {
    val n = word.length
    val best = new Array[(Long, String)](n + 1)
    best(0) = (0L, "")
    var k = 1
    while (k <= n) {
      var cur: (Long, String) = null
      var l = 1
      while (l <= math.min(maxPieceLen, k)) {
        val prev = best(k - l)
        if (prev != null) {
          val p = word.substring(k - l, k)
          lp.get(p) match {
            case Some(w) =>
              val cand = (prev._1 + w, prev._2 + "|" + p)
              if (cur == null || cand._1 > cur._1 ||
                (cand._1 == cur._1 && cand._2 < cur._2)) cur = cand
            case None => ()
          }
        }
        l += 1
      }
      best(k) = cur
      k += 1
    }
    Option(best(n)).map { case (s, seg) => (s, seg + "|") }
  }

  /** Hard-EM unigram training over a (word, count) vocabulary: seed
    * with every substring up to `maxPieceLen` (all single chars kept
    * for coverage, multi-char pieces pruned to the `seedSize` most
    * frequent), then `iters` rounds of Viterbi-segment → count → re-snap
    * (add-1 smoothed, zero-count multi-char pieces pruned). Returns the
    * final (piece, micro-nat lp) table, piece-sorted — the model. */
  def trainFromVocab(vocab: Seq[(String, Long)], maxPieceLen: Int = 4,
                     seedSize: Int = 200, iters: Int = 3): Seq[(String, Long)] = {
    require(vocab.nonEmpty, "UnigramLM: empty vocabulary")
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, w.length - i)) {
          freq(w.substring(i, i + l)) += c
          l += 1
        }
        i += 1
      }
    }
    val chars = freq.keysIterator.filter(_.length == 1).toSeq
    val multis = freq.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(seedSize).map(_._1)
    var pieces: Seq[String] = (chars ++ multis).distinct.sorted
    def snap(counts: String => Long, total: Long, k: Int): Map[String, Long] =
      pieces.map(p => p -> micro((counts(p) + 1.0) / (total + k.toDouble))).toMap
    val seedTotal = pieces.map(freq).sum
    var lp: Map[String, Long] = snap(freq, seedTotal, pieces.size)
    (1 to iters).foreach { _ =>
      val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      vocab.foreach { case (w, c) =>
        viterbi(w, lp, maxPieceLen).foreach { case (_, seg) =>
          seg.split('|').foreach(p => if (p.nonEmpty) counts(p) += c)
        }
      }
      pieces = pieces.filter(p => p.length == 1 || counts(p) > 0)
      val total = pieces.map(counts).sum
      lp = snap(counts, total, pieces.size)
    }
    pieces.map(p => (p, lp(p)))
  }

  /** Train over a documents frame: the corpus-sized vocabulary
    * aggregate, then [[trainFromVocab]] on the guarded collect. */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            seedSize: Int = 200, iters: Int = 3): Seq[(String, Long)] =
    trainFromVocab(collectVocab(docs, textCol), maxPieceLen, seedSize, iters)

  /** Segment the corpus vocabulary under a trained model: one row per
    * distinct word — (word, seg, n_tokens), the dictionary the serve
    * path broadcast-joins ([[tokenCounts]]). */
  def segmentVocab(docs: DataFrame, textCol: String,
                   model: Seq[(String, Long)],
                   maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val lp = model.toMap
    val out = collectVocab(docs, textCol).map { case (w, _) =>
      val seg = viterbi(w, lp, maxPieceLen)
        .map(_._2)
        // a serve-time word with an uncovered char: per-char split with
        // unknown chars kept as single-char tokens (the ⟨unk⟩-free
        // fallback — deterministic, mirrorable)
        .getOrElse("|" + w.toCharArray.mkString("|") + "|")
      val n = seg.split('|').count(_.nonEmpty).toLong
      org.apache.spark.sql.Row(w, seg, n)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(out: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seg", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType))))
  }

  /** Per-document token counts under the trained model — dictionary
    * encode: the vocabulary segments once ([[segmentVocab]]), documents
    * broadcast-join it by word (the corpus-scale serve path). */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
                  model: Seq[(String, Long)],
                  maxPieceLen: Int = 4): DataFrame = {
    val dict = segmentVocab(docs, textCol, model, maxPieceLen)
      .select(F.col("word"), F.col("n_tokens").as("wtok"))
    docs.select(F.col(idCol), F.explode(F.split(F.col(textCol), " ")).as("word"))
      .filter(F.length(F.col("word")) > 0)
      .join(F.broadcast(dict), "word")
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_words"),
        F.sum("wtok").as("n_unigram_tokens"))
      .withColumn("fertility",
        F.round(F.col("n_unigram_tokens").cast("double") / F.col("n_words"), 4))
  }

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The SQL mirror of [[viterbi]] over the stashed integer model: the
    * dynamic program unrolled position-by-position to [[maxWordLen]] as
    * a LINEAR state chain — each st_k is referenced by EXACTLY ONE later
    * CTE (an engine that inlines CTEs would blow a multi-referenced
    * chain up exponentially), carrying a 4-slot window of the best
    * (score, seg) at positions k..k−3 plus the SETTLED answer for words
    * whose length has been reached. One LEFT JOIN against the piece
    * table per step (the slot to extend selected by CASE on the piece
    * length), candidates ranked (score DESC, seg ASC) NULLS LAST —
    * exactly the driver fold's comparison. Emits the CTE members
    * `pieces, st0..st{maxWordLen}, fin(word, seg, n_tokens)`; callers
    * prepend WITH and a word-source CTE `w(word)`. */
  def viterbiSql(model: Seq[(String, Long)], maxPieceLen: Int = 4): String = {
    require(maxPieceLen >= 1 && maxPieceLen <= 4,
      "viterbiSql is written for piece lengths 1..4")
    val values = model.map { case (p, l) =>
      s"(${sqlQuote(p)}, CAST($l AS BIGINT))" }.mkString(", ")
    val st0 = "st0 AS (SELECT word, CAST(0 AS BIGINT) AS sc0, '' AS sg0, " +
      "CAST(NULL AS BIGINT) AS sc1, CAST(NULL AS VARCHAR) AS sg1, " +
      "CAST(NULL AS BIGINT) AS sc2, CAST(NULL AS VARCHAR) AS sg2, " +
      "CAST(NULL AS BIGINT) AS sc3, CAST(NULL AS VARCHAR) AS sg3, " +
      "CAST(NULL AS BIGINT) AS dsc, CAST(NULL AS VARCHAR) AS dsg FROM w)"
    def slotSc(l: Int): String = s"WHEN ${l} THEN s.sc${l - 1}"
    def slotSg(l: Int): String = s"WHEN ${l} THEN s.sg${l - 1}"
    val sts = (1 to maxWordLen).map { k =>
      val scSel = "CASE length(p.piece) " +
        (1 to maxPieceLen).map(slotSc).mkString(" ") + " END"
      val sgSel = "CASE length(p.piece) " +
        (1 to maxPieceLen).map(slotSg).mkString(" ") + " END"
      s"st$k AS (SELECT word, cand_sc AS sc0, cand_sg AS sg0, " +
        "psc0 AS sc1, psg0 AS sg1, psc1 AS sc2, psg1 AS sg2, psc2 AS sc3, psg2 AS sg3, " +
        s"CASE WHEN length(word) = $k THEN cand_sc ELSE pdsc END AS dsc, " +
        s"CASE WHEN length(word) = $k THEN cand_sg ELSE pdsg END AS dsg FROM (" +
        "SELECT s.word AS word, s.sc0 AS psc0, s.sg0 AS psg0, s.sc1 AS psc1, s.sg1 AS psg1, " +
        "s.sc2 AS psc2, s.sg2 AS psg2, s.dsc AS pdsc, s.dsg AS pdsg, " +
        s"$scSel + p.lp AS cand_sc, $sgSel || '|' || p.piece AS cand_sg, " +
        s"row_number() OVER (PARTITION BY s.word ORDER BY $scSel + p.lp DESC NULLS LAST, " +
        s"$sgSel || '|' || p.piece ASC NULLS LAST) AS rn " +
        s"FROM st${k - 1} s LEFT JOIN pieces p ON length(s.word) >= $k " +
        s"AND length(p.piece) <= ${math.min(maxPieceLen, k)} " +
        s"AND substr(s.word, $k - length(p.piece) + 1, length(p.piece)) = p.piece " +
        s"AND ($scSel) IS NOT NULL" +
        ") WHERE rn = 1)"
    }
    val fin = s"fin AS (SELECT word, dsg || '|' AS seg, " +
      "CAST(len(list_filter(string_split(dsg || '|', '|'), t -> length(t) > 0)) AS BIGINT) AS n_tokens " +
      s"FROM st$maxWordLen WHERE dsc IS NOT NULL)"
    (Seq(s"pieces(piece, lp) AS (VALUES $values)", st0) ++ sts :+ fin).mkString(", ")
  }
}
