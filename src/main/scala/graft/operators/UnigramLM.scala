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
    val seedTotal = pieces.map(freq).sum
    var lp: Map[String, Long] =
      pieces.map(p => p -> micro((freq(p) + 1.0) / (seedTotal + pieces.size.toDouble))).toMap
    (1 to iters).foreach { _ =>
      val (kept, nlp) = countSnap(vocab, pieces, lp, maxPieceLen)
      pieces = kept
      lp = nlp
    }
    pieces.map(p => (p, lp(p)))
  }

  /** One hard-EM M-step: Viterbi-segment the vocabulary under `lp`
    * (restricted to `pieces`), count piece usage, prune zero-count
    * multi-char pieces (single chars always survive — coverage), add-1
    * snap over the survivors. Returns (kept pieces, new lp). */
  private def countSnap(vocab: Seq[(String, Long)], pieces: Seq[String],
                        lp: Map[String, Long],
                        maxPieceLen: Int): (Seq[String], Map[String, Long]) = {
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, c) =>
      viterbi(w, lp, maxPieceLen).foreach { case (_, seg) =>
        seg.split('|').foreach(p => if (p.nonEmpty) counts(p) += c)
      }
    }
    val kept = pieces.filter(p => p.length == 1 || counts(p) > 0)
    val total = kept.map(counts).sum
    (kept, kept.map(p => p -> micro((counts(p) + 1.0) / (total + kept.size.toDouble))).toMap)
  }

  /** Total corpus (Viterbi) likelihood of a model over a (word, count)
    * vocabulary, integer micro-nats — Σ_w c_w · score_w. The prune
    * loop's objective, exposed so specs can compare vocabularies.
    * Words with no path under the model score the per-char fallback's
    * pieces where covered; strictly, uncovered words contribute the
    * worst representable score so coverage loss is never free. */
  def corpusScore(vocab: Seq[(String, Long)], model: Seq[(String, Long)],
                  maxPieceLen: Int = 4): Long = {
    val lp = model.toMap
    vocab.foldLeft(0L) { case (acc, (w, c)) =>
      acc + c * viterbi(w, lp, maxPieceLen).map(_._1).getOrElse(Long.MinValue / (1L << 20))
    }
  }

  /** The naive same-size baseline [[trainPruned]] must beat: keep the
    * single chars plus the most RAW-SUBSTRING-FREQUENT multi-char
    * pieces of `model` up to `targetSize`, then one M-step
    * re-normalize — selection by frequency instead of likelihood loss,
    * everything else identical. Frequency ranks a piece by how often
    * it occurs, not by how costly its removal is; a frequent piece
    * whose characters are themselves common is cheap to lose, a rare
    * piece over otherwise-unseen characters is not — the gap the
    * likelihood objective sees and this baseline cannot. */
  def truncateByFrequency(vocab: Seq[(String, Long)],
                          model: Seq[(String, Long)], targetSize: Int,
                          maxPieceLen: Int = 4): Seq[(String, Long)] = {
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
    val chars = model.map(_._1).filter(_.length == 1)
    val multis = model.map(_._1).filter(_.length > 1)
      .sortBy(p => (-freq(p), p)).take(math.max(0, targetSize - chars.size))
    val kept = (chars ++ multis).sorted
    val lp = model.toMap
    val (pieces2, lp2) = countSnap(vocab, kept,
      lp.view.filterKeys(kept.toSet).toMap, maxPieceLen)
    pieces2.map(p => (p, lp2(p)))
  }

  /** Kudo 2018's LIKELIHOOD-BASED vocabulary pruning on top of the
    * hard-EM trainer — the "train me a 32k-piece vocab" knob
    * ([[trainFromVocab]] prunes only zero-count pieces, so its final
    * size is an accident of the corpus): train as usual, then
    * repeatedly drop the multi-char pieces whose REMOVAL COSTS THE
    * LEAST total corpus likelihood until at most `targetSize` pieces
    * remain, re-running a count/snap M-step after each prune round so
    * the surviving pieces' probabilities re-normalize.
    *
    * Per round: loss(p) = Σ_{w : best seg uses p} c_w·(score_w −
    * score_w without p) — exact integer micro-nats, only words whose
    * CURRENT Viterbi segmentation uses p re-segment (all others are
    * unaffected by p's removal, their loss term is zero), and the
    * re-segmentation always succeeds because single chars never prune.
    * The `pruneFrac` lowest-loss pieces drop per round (ties to the
    * lexicographically smaller piece), Kudo's batched-prune schedule.
    * Everything stays in the trainer's deterministic integer-model
    * discipline, so the pruned model serves through the SAME
    * [[viterbiSql]] mirror. */
  def trainPruned(vocab: Seq[(String, Long)], targetSize: Int,
                  maxPieceLen: Int = 4, seedSize: Int = 200, iters: Int = 3,
                  pruneFrac: Double = 0.2): Seq[(String, Long)] = {
    require(pruneFrac > 0.0 && pruneFrac <= 1.0,
      "UnigramLM.trainPruned: pruneFrac must be in (0, 1]")
    var model = trainFromVocab(vocab, maxPieceLen, seedSize, iters)
    val nChars = model.count(_._1.length == 1)
    require(targetSize >= nChars,
      s"UnigramLM.trainPruned: targetSize $targetSize is below the corpus's " +
        s"$nChars single-char coverage floor — those pieces cannot prune")
    while (model.size > targetSize) {
      val lp = model.toMap
      // current segmentations + which words each multi-char piece serves
      val usedBy = scala.collection.mutable.Map[String, List[(String, Long, Long)]]()
        .withDefaultValue(Nil)
      vocab.foreach { case (w, c) =>
        viterbi(w, lp, maxPieceLen).foreach { case (sc, seg) =>
          seg.split('|').filter(_.length > 1).distinct
            .foreach(p => usedBy(p) = (w, c, sc) :: usedBy(p))
        }
      }
      val multi = model.map(_._1).filter(_.length > 1)
      val losses = multi.map { p =>
        val without = lp - p
        val loss = usedBy(p).foldLeft(0L) { case (acc, (w, c, sc)) =>
          // single chars survive, so a path always exists without p
          acc + c * (sc - viterbi(w, without, maxPieceLen).map(_._1).get)
        }
        (loss, p)
      }
      val nDrop = math.min(model.size - targetSize,
        math.max(1, (multi.size * pruneFrac).toInt))
      val drop = losses.sortBy { case (l, p) => (l, p) }.take(nDrop).map(_._2).toSet
      val kept = model.map(_._1).filterNot(drop)
      // M-step under the survivors: re-segment (old scores, restricted),
      // recount, re-snap — the trainer's own normalization
      val (pieces2, lp2) = countSnap(vocab, kept, lp -- drop, maxPieceLen)
      model = pieces2.map(p => (p, lp2(p)))
    }
    model
  }

  /** Train over a documents frame: the corpus-sized vocabulary
    * aggregate, then [[trainFromVocab]] on the guarded collect. */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            seedSize: Int = 200, iters: Int = 3): Seq[(String, Long)] =
    trainFromVocab(collectVocab(docs, textCol), maxPieceLen, seedSize, iters)

  /** [[trainPruned]] over a documents frame — same guarded vocabulary
    * collect as [[train]]. */
  def trainPrunedFromDocs(docs: DataFrame, textCol: String, targetSize: Int,
                          maxPieceLen: Int = 4, seedSize: Int = 200,
                          iters: Int = 3,
                          pruneFrac: Double = 0.2): Seq[(String, Long)] =
    trainPruned(collectVocab(docs, textCol), targetSize, maxPieceLen,
      seedSize, iters, pruneFrac)

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
    * exactly the driver fold's comparison. A word with no path (an
    * uncovered character) falls back to the per-char split, matching
    * [[segmentVocab]]. Emits the CTE members
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
    // A word with no Viterbi path (a character unseen in training —
    // impossible on the training corpus, possible on a serve corpus)
    // falls back to the per-char split, EXACTLY [[segmentVocab]]'s
    // fallback — the mirror must not silently drop what the Scala
    // serve path emits (r16 ADVICE).
    val fin = s"fin AS (SELECT word, " +
      "COALESCE(dsg || '|', '|' || array_to_string(regexp_extract_all(word, '.'), '|') || '|') AS seg, " +
      "CAST(CASE WHEN dsc IS NOT NULL " +
      "THEN len(list_filter(string_split(dsg || '|', '|'), t -> length(t) > 0)) " +
      "ELSE len(regexp_extract_all(word, '.')) END AS BIGINT) AS n_tokens " +
      s"FROM st$maxWordLen)"
    (Seq(s"pieces(piece, lp) AS (VALUES $values)", st0) ++ sts :+ fin).mkString(", ")
  }
}
