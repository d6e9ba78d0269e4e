package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Dataset-shaping operators for training-data pipelines: deterministic
  * sampling, split assignment, per-group quotas, global shuffle ranks, and
  * cross-corpus contamination checks.
  *
  * Everything is hash-deterministic (md5 over ids) rather than RNG-based:
  * at 100 TB, reproducibility across reruns/engines matters more than
  * statistical purity, and a uniform cryptographic hash gives both. No
  * shuffles beyond the operator's intrinsic groupBy/window.
  */
object DataShaping {

  private def idHash(id: Column): Column = F.md5(id.cast("string"))

  /** Deterministic ~`hexThreshold/256` sample: keep rows whose id-hash is
    * lexicographically below the 2-hex-digit threshold (e.g. "28" ≈ 15.6%).
    * Pure filter — pushes down, no shuffle, identical on any engine. */
  def hashSample(df: DataFrame, idCol: String, hexThreshold: String): DataFrame =
    df.filter(idHash(F.col(idCol)) < F.lit(hexThreshold))

  /** Stratified deterministic sampling: a per-stratum hex threshold on the
    * id-hash (e.g. upsample a rare source at "80" ≈ 50% while default
    * strata keep "20" ≈ 12.5%) — the corpus-mixing knob of training-data
    * curation. Same pure-filter, pushdown-friendly shape as
    * [[hashSample]]; reproducible on any engine with md5. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, String], defaultRate: String): DataFrame = {
    val threshold = rates.foldLeft(F.lit(defaultRate)) { case (acc, (stratum, hex)) =>
      F.when(F.col(strataCol) === stratum, F.lit(hex)).otherwise(acc)
    }
    df.filter(idHash(F.col(idCol)) < threshold)
  }

  /** Deterministic train/val/test assignment from the id-hash's first hex
    * nibble: 0–b → train (75%), c–d → val (12.5%), e–f → test (12.5%). */
  def splitAssign(df: DataFrame, idCol: String): DataFrame = {
    val nib = F.substring(idHash(F.col(idCol)), 1, 1)
    df.withColumn("split",
      F.when(nib.isin("c", "d"), F.lit("val"))
        .when(nib.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train")))
  }

  /** Leakage-safe train/val/test assignment: split by NEAR-DUP CLUSTER,
    * not by document. [[splitAssign]]'s per-doc hash can strand two
    * near-duplicates on opposite sides of the train/test wall — silent
    * eval contamination. Here the split key is the document's connected
    * near-dup component ([[Dedup.minhashCandidates]] banded LSH pairs →
    * [[Dedup.connectedComponents]] min-id label), so every member of a
    * duplicate cluster lands in the SAME split by construction; singleton
    * docs (label = own id) reduce to exactly [[splitAssign]]'s hash.
    * Same nibble mapping: 0–b → train, c–d → val, e–f → test.
    *
    * Cost at 100 TB: the candidate graph + CC the dedup pass already
    * computes (rounds scale with the duplicate graph, not the corpus),
    * then a map-only hash of the label — no extra shuffle beyond CC
    * itself. Output: (id, cluster, split). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = Dedup.minhashCandidates(df, idCol, textCol)
    val cc = Dedup.connectedComponents(pairs, df.select(F.col(idCol).as("node")))
    val nib = F.substring(idHash(F.col("label")), 1, 1)
    cc.select(F.col("node").as(idCol), F.col("label").as("cluster"),
      F.when(nib.isin("c", "d"), F.lit("val"))
        .when(nib.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train")).as("split"))
  }

  /** Weighted reservoir sampling (Efraimidis–Spirakis A-Res): EXACTLY k
    * rows per group, without replacement, inclusion probability
    * proportional to `weightCol`. The classic key trick — rank by
    * u^(1/w) for uniform u — applied through the monotone-equivalent
    * `ln(u)/w` and made DETERMINISTIC by deriving u from md5(id) (the
    * hashSample uniform), so both engines rank the identical keys. The
    * per-group window is scale-safe: partitions are groups. */
  def weightedReservoir(df: DataFrame, idCol: String, groupCol: String,
                        weightCol: String, k: Int): DataFrame = {
    val u = F.expr(s"conv(substring(md5(cast($idCol as string)), 1, 8), 16, 10)")
      .cast("double") / 4294967296.0
    val key = F.round(F.lit(1000.0) * F.log(u) / F.col(weightCol), 6)
    val w = Window.partitionBy(F.col(groupCol)).orderBy(key.desc, F.col(idCol))
    df.withColumn("res_rank", F.row_number().over(w).cast("long"))
      .filter(F.col("res_rank") <= k)
  }

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * combination is shared by at least `k` rows — the release gate for
    * user-derived tables (a combination rarer than k re-identifies).
    * One map-side-combinable count to the group frame + a semi-join back;
    * no window, so a hot quasi-group costs one combiner cell, not a
    * single-task partition. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val big = df.groupBy(quasiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__n"))
      .filter(F.col("__n") >= k)
      .drop("__n")
    df.join(big, quasiCols, "left_semi")
  }

  /** l-diversity suppression (Machanavajjhala et al., ICDE 2006):
    * k-anonymity's fix for the homogeneity attack — a group of k rows
    * that all share the SAME sensitive value still discloses it. Keep
    * only rows whose quasi-identifier group carries at least `l`
    * DISTINCT sensitive values. Same shape as [[kAnonymize]]: one
    * combinable distinct-count to the group frame + a semi-join back
    * (count_distinct partials are sets over the sensitive vocabulary,
    * bounded). */
  def lDiversify(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    val ok = df.groupBy(quasiCols.map(F.col): _*)
      .agg(F.countDistinct(F.col(sensitiveCol)).as("__l"))
      .filter(F.col("__l") >= l)
      .drop("__l")
    df.join(ok, quasiCols, "left_semi")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007):
    * l-diversity's fix for the skewness attack — distinct values that
    * are still 99% one class disclose it probabilistically. Per
    * quasi-identifier group, the total-variation distance between the
    * group's sensitive-value distribution and the corpus-wide one,
    * TVD = ½ Σᵥ |p_g(v) − p(v)| (the unordered-categorical EMD). One
    * (group × sensitive) count scan joined to the broadcast global
    * value frame — key space is groups × the sensitive vocabulary,
    * never the corpus. Distances are ratios of exact BIGINTs summed
    * over the bounded vocabulary (round-snap class). A missing value
    * in a group contributes its full global mass — the per-group sum
    * adds Σ_{v∉g} p(v) = 1 − (group's covered global mass) as the
    * absent-value term. Output: one row per group — (quasi..., n,
    * tvd), round 6; `breaches(t)` = filter(tvd > t) downstream. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String): DataFrame = {
    val base = df.filter(F.col(sensitiveCol).isNotNull)
    val cells = base.groupBy(
        (quasiCols.map(F.col) :+ F.col(sensitiveCol).as("__v")): _*)
      .agg(F.count(F.lit(1)).as("__c"))
    val gTot = cells.groupBy(quasiCols.map(F.col): _*)
      .agg(F.sum("__c").as("__ng"))
    val vTot = base.groupBy(F.col(sensitiveCol).as("__v"))
      .agg(F.count(F.lit(1)).as("__cv"))
    val n = base.agg(F.count(F.lit(1)).as("__n"))
    val joined = cells
      .join(gTot, quasiCols)
      .crossJoin(F.broadcast(n))
      .join(F.broadcast(vTot), Seq("__v"))
      .withColumn("__pg", F.col("__c").cast("double") / F.col("__ng"))
      .withColumn("__pv", F.col("__cv").cast("double") / F.col("__n"))
    joined.groupBy((quasiCols.map(F.col) :+ F.col("__ng").as("n")): _*)
      .agg(
        F.sum(F.abs(F.col("__pg") - F.col("__pv"))).as("__present"),
        // global mass of the values PRESENT in this group — the
        // absent-value term is its complement
        F.sum(F.col("__pv")).as("__covered"))
      .select((quasiCols.map(F.col) :+ F.col("n") :+
        ((F.round((F.col("__present") + (F.lit(1.0) - F.col("__covered")))
          / 2.0, 6) + F.lit(0.0)).as("tvd"))): _*)
  }

  /** Per-group quota: keep at most `cap` rows per group, preferring by
    * `orderCol` (desc) with id tiebreak — e.g. "keep the 50 longest docs per
    * source domain". One shuffle on the group key. */
  def perGroupCap(df: DataFrame, groupCol: String, orderCol: String,
                  idCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(F.col(groupCol))
      .orderBy(F.col(orderCol).desc, F.col(idCol).asc)
    df.withColumn("rn", F.row_number().over(w).cast("long"))
      .filter(F.col("rn") <= cap)
  }

  /** Temperature-based corpus rebalancing — the multilingual-training
    * resampling rule (keep probability ∝ (n_group / n_max)^α, so α = 1
    * keeps everything, α → 0 flattens group sizes toward uniform): each
    * row keeps iff its id-hash falls under its group's threshold.
    *
    * Deterministic and engine-reproducible by construction: the keep
    * probability is rounded to 6 decimals (absorbing libm `pow` ulp
    * differences between engines), converted to an 8-hex-digit threshold,
    * and compared lexicographically against the first 8 hex digits of
    * md5(id) — a fixed-width hex compare IS the numeric compare of a
    * 32-bit uniform draw, with no float comparison at the boundary.
    * Plan shape: one tiny per-group count aggregate broadcast back, then a
    * pure filter (no shuffle of the data itself). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        alpha: Double): DataFrame = {
    val counts = df.groupBy(F.col(groupCol)).agg(F.count(F.lit(1)).as("__n"))
    val nmax = counts.agg(F.max(F.col("__n")).as("__nmax"))
    val q = F.round(
      F.pow(F.col("__n").cast("double") / F.col("__nmax").cast("double"), alpha), 6)
    // q >= 1 (the max group) keeps everything: 'g' sorts above every hex
    // digit, avoiding the 9-digit hex(2^32) lpad-truncation trap
    val thresh = F.when(q >= 1.0, F.lit("g")).otherwise(
      F.lpad(F.lower(F.hex(F.floor(q * 4294967296.0).cast("long"))), 8, "0"))
    df.join(F.broadcast(counts), groupCol)
      .crossJoin(F.broadcast(nmax))
      .filter(F.substring(idHash(F.col(idCol)), 1, 8) < thresh)
      .drop("__n", "__nmax")
  }

  /** Data-mixture weights: given a per-group raw weight (the recipe's
    * hand-tuned mixing ratio) and a total token budget, compute each
    * group's normalized weight, token target, epoch count (target ÷
    * available — >1 means the group repeats) and capped per-epoch
    * sampling rate. The planning step every LLM data recipe runs before
    * sampling (cf. the Pile / Llama mixture tables).
    *
    * Plan shape: one map-side-combinable aggregate collapses the corpus
    * to #groups rows, and the normalizing window runs over THAT tiny
    * frame — the unpartitioned window never sees corpus-sized data, so
    * the shape survives any corpus scale (groups = sources, typically
    * dozens). */
  def mixtureWeights(df: DataFrame, groupCol: String, tokensPerRow: Column,
                     rawWeight: Column, budgetTokens: Long): DataFrame = {
    val perGroup = df
      .withColumn("__tok", tokensPerRow)
      .withColumn("__w", rawWeight)
      .groupBy(F.col(groupCol))
      .agg(F.sum(F.col("__tok")).cast("long").as("group_tokens"),
        F.max(F.col("__w")).cast("double").as("__raw")) // __w is per-group constant
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    perGroup
      .withColumn("weight", F.round(F.col("__raw") / F.sum("__raw").over(all), 4))
      .withColumn("target_tokens",
        F.floor(F.lit(budgetTokens) * F.col("__raw") / F.sum("__raw").over(all))
          .cast("long"))
      .withColumn("epochs",
        F.round(F.col("target_tokens").cast("double") /
          F.col("group_tokens").cast("double"), 4))
      .withColumn("sampling_rate", F.least(F.lit(1.0), F.col("epochs")))
      .drop("__raw")
  }

  /** Per-row weighted rejection sampling (the FineWeb/DCLM-style
    * quality-weighted keep): each row survives with its OWN probability
    * `prob` — typically a quality score mapped into [0, 1] — decided by
    * the same deterministic hex-threshold draw as [[temperatureSample]]
    * (round to 6 decimals, convert to an 8-hex-digit threshold, compare
    * against the first 8 hex digits of md5(id)). Engine-reproducible, no
    * float boundary compare, pure per-row filter: no shuffle at any
    * scale, and re-running over a grown corpus keeps exactly the same
    * decisions for existing rows. */
  def weightedSample(df: DataFrame, idCol: String, prob: Column): DataFrame = {
    val q = F.round(prob, 6)
    val thresh = F.when(q >= 1.0, F.lit("g")).otherwise(
      F.lpad(F.lower(F.hex(F.floor(q * 4294967296.0).cast("long"))), 8, "0"))
    df.filter(F.substring(idHash(F.col(idCol)), 1, 8) < thresh)
  }

  /** Global deterministic shuffle rank: a total order by id-hash — the
    * reproducible form of "shuffle the corpus". Computed with the
    * two-phase range-partitioned assignment (no single-partition sort). */
  def shuffleRank(df: DataFrame, idCol: String): DataFrame =
    AuditQueries.assignIngestSeqDistributed(
      df.withColumn("__h", idHash(F.col(idCol))),
      base = 0L, orderCols = Seq("__h", idCol))
      .withColumnRenamed("id", "shuffle_rank")
      .drop("__h")

  /** Contiguous sequence packing: assign documents (in deterministic id
    * order) to training packs of ~`tokenBudget` tokens — pack boundary =
    * exclusive running token count ÷ budget. The contiguous form of the
    * packing step that turns a corpus into fixed-budget training sequences.
    *
    * Computed as a two-phase distributed prefix sum (the same shape as
    * [[AuditQueries.assignIngestSeqDistributed]]): range-repartition on the
    * id so partition order equals global id order, take a running token sum
    * WITHIN each partition, and add each partition's exclusive total-token
    * offset (a #partitions-row frame, broadcast). No single-partition
    * global window anywhere in the plan — the corpus-wide running sum
    * stays fully distributed at any scale. Result is identical to the
    * naive `sum() OVER (ORDER BY id)` form. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    tokenBudget: Long): DataFrame = {
    val (parted, offsets) = TwoPhase.partitionOffsets(df, Seq(F.col(idCol)),
      Seq(F.sum(F.col(tokenCol)) -> "__off"))
    val within = Window.partitionBy(F.col("__pid")).orderBy(F.col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(F.broadcast(offsets), "__pid")
      .withColumn("pack_id", // floor, not cast: cast-of-double truncates in
        // Spark but rounds in DuckDB — floor is identical in both
        F.floor(
          (F.col("__off") + F.coalesce(F.sum(F.col(tokenCol)).over(within), F.lit(0L)))
            / tokenBudget).cast("long"))
      .drop("__pid", "__off")
  }

  /** Token-BUDGET corpus selection: order the corpus by quality (score
    * desc, id tiebreak) and keep the prefix whose running token total
    * fits the training budget — the "best N tokens" data-selection step
    * between scoring and packing. Same two-phase distributed prefix sum
    * as [[packSequences]], but range-partitioned on the QUALITY order:
    * running sums stay within partitions, per-partition totals (one row
    * each) broadcast as exclusive offsets, and no single-partition
    * global window appears in the plan at any corpus size. Emits every
    * row with its `cum_tokens` and the `kept` verdict so callers can
    * re-cut at a different budget without rescoring. */
  def budgetSelect(df: DataFrame, idCol: String, tokenCol: String,
                   scoreCol: String, budget: Long): DataFrame = {
    val (parted, offsets) = TwoPhase.partitionOffsets(df,
      Seq(F.col(scoreCol).desc, F.col(idCol).asc),
      Seq(F.sum(F.col(tokenCol)) -> "__off"))
    val within = Window.partitionBy(F.col("__pid"))
      .orderBy(F.col(scoreCol).desc, F.col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(F.broadcast(offsets), "__pid")
      .withColumn("cum_tokens", F.col("__off") + F.sum(F.col(tokenCol)).over(within))
      .withColumn("kept", F.col("cum_tokens") <= budget)
      .drop("__pid", "__off")
  }

  /** Fixed-size token chunking with overlap — the step that turns long
    * documents into model-window-sized pieces before packing/training.
    * Chunk k starts at token 1 + k·(chunkTokens − overlap) and carries up
    * to `chunkTokens` tokens; consecutive chunks share `overlap` tokens.
    * Pure per-row array algebra (explode of chunk starts + slice) — no
    * shuffle at all; at 100 TB this is a map-only stage. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk size")
    val stride = chunkTokens - overlap
    val arr = F.split(F.col(textCol), " ")
    df.select(F.col(idCol), arr.as("__arr"))
      .withColumn("__n", F.size(F.col("__arr")))
      .withColumn("tok_start",
        F.explode(F.sequence(F.lit(1), F.col("__n"), F.lit(stride))))
      .select(
        F.col(idCol),
        (((F.col("tok_start") - 1) / stride).cast("long")).as("chunk_idx"),
        F.col("tok_start").cast("long").as("tok_start"),
        F.size(F.slice(F.col("__arr"), F.col("tok_start"), F.lit(chunkTokens))).cast("long").as("chunk_len"),
        F.array_join(F.slice(F.col("__arr"), F.col("tok_start"), F.lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** C4-style boilerplate removal: a chunk (fixed `chunkTokens`-word
    * window, [[chunkDocs]]) occurring in at least `minDocs` DISTINCT
    * documents is boilerplate (headers, footers, licence blurbs — content
    * shared verbatim across documents); each document is re-emitted with
    * those chunks removed, in original order, plus removal stats. The
    * "remove any line that appears ≥ N times in the corpus" cleaning pass,
    * at chunk granularity.
    *
    * Scale shape: document frequency is a hash-keyed combinable aggregate
    * (md5 of the chunk, never the chunk text, crosses the shuffle), the
    * flag join is hash-to-hash, and reassembly is one `collect_list` per
    * document whose size is bounded by the document itself — nothing is
    * ever doc×doc. Output: (id, n_chunks, n_removed, clean_text); a
    * document that is ALL boilerplate keeps its row with clean_text = ''. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        chunkTokens: Int, minDocs: Long): DataFrame = {
    val chunks = chunkDocs(df, idCol, textCol, chunkTokens, overlap = 0)
      .select(F.col(idCol), F.col("chunk_idx"), F.col("chunk_text"),
        F.md5(F.col("chunk_text")).as("h"))
    val docFreq = chunks.groupBy("h")
      .agg(F.count_distinct(F.col(idCol)).as("df"))
    val flagged = chunks.join(docFreq, "h")
      .withColumn("boiler", F.col("df") >= minDocs)
    flagged.groupBy(idCol).agg(
      F.count(F.lit(1)).as("n_chunks"),
      F.sum(F.when(F.col("boiler"), 1L).otherwise(0L)).as("n_removed"),
      // collect_list skips the nulls (= removed chunks); array_sort on the
      // (chunk_idx, text) struct restores document order deterministically
      F.array_join(
        F.transform(
          F.array_sort(F.collect_list(
            F.when(!F.col("boiler"),
              F.struct(F.col("chunk_idx"), F.col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("clean_text"))
  }

  /** Cross-corpus contamination: pairs (trainDoc, benchDoc) sharing at
    * least `minShared` word-n-gram shingles. The classic "is the eval set
    * leaking into training data" sweep; shingle-blocked join, never a
    * cross product. Inputs are (id, text)-shaped frames. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Long = 2L): DataFrame = {
    val a = Dedup.wordShingles(train, idCol, textCol, n)
      .withColumnRenamed("doc", "train_id")
    val b = Dedup.wordShingles(bench, idCol, textCol, n)
      .withColumnRenamed("doc", "bench_id")
    a.join(b, "shingle")
      .groupBy(F.col("train_id"), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("shared"))
      .filter(F.col("shared") >= minShared)
  }

  /** [[contamination]] with a bloom pre-pass on the train side — the shape
    * that survives a 100 TB corpus. The benchmark suite is tiny and fixed,
    * so its distinct shingles compress into one serialized bloom filter
    * (built with the codegen'd `BloomFilterAggregate`, a few MB of model
    * bytes on the driver — same budget class as the IVF centroids). The
    * train side then drops every bloom-negative shingle BEFORE the shuffle:
    * only the contaminated sliver of a 100 TB corpus is exchanged, instead
    * of every shingle of every document. False positives just ride into the
    * exact join and fall out; false negatives are impossible, so the result
    * is row-identical to [[contamination]] and shares its oracle. */
  def contaminationBloom(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 3, minShared: Long = 2L,
                         bloomItems: Long = 1L << 20,
                         bloomBits: Long = 1L << 23): DataFrame = {
    val b = Dedup.wordShingles(bench, idCol, textCol, n)
      .withColumnRenamed("doc", "bench_id")
    val bloomBytes = b
      .select(graft.functions.BloomSupport
        .bloomAgg(F.col("shingle"), bloomItems, bloomBits).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val a = Dedup.wordShingles(train, idCol, textCol, n)
      .withColumnRenamed("doc", "train_id")
      .filter(graft.functions.BloomSupport
        .mightContain(F.lit(bloomBytes), F.col("shingle")))
    a.join(b, "shingle")
      .groupBy(F.col("train_id"), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("shared"))
      .filter(F.col("shared") >= minShared)
  }

  /** The n-gram WIDTH SWEEP real decontamination runs: a single shared
    * width under-reports (short windows over-match boilerplate, long
    * windows miss paraphrases), so production sweeps a band of widths —
    * the WMDP/GPT-3-style 8–13-gram range — and reports per-width hit
    * stats to pick the operating point. One output row per width: pair
    * count, distinct train/bench docs hit, total and max shared windows
    * — the table a curation run reads to set its removal width.
    *
    * Scale shape: the train corpus is tokenized and position-exploded
    * ONCE for every width together (each position emits its width-tagged
    * shingles in-row), instead of `|widths|` full-corpus passes — at
    * 100 TB the sweep costs one scan plus per-width broadcast blooms
    * (built from one grouped aggregation over the bench side) pruning
    * the shuffle to the contaminated sliver, exactly the
    * [[contaminationBloom]] contract per width. */
  def contaminationSweep(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, widths: Seq[Int] = Seq(8, 10, 13),
                         minShared: Long = 1L): DataFrame = {
    val spark = train.sparkSession
    // one tokenize + position-explode pass emitting (doc, w, shingle)
    // for EVERY width that fits at the position; distinct per (doc, w)
    def multiShingles(df: DataFrame): DataFrame = {
      val arr = F.split(F.col(textCol), " ")
      val minW = widths.min
      val base = df.select(F.col(idCol).as("doc"), arr.as("__arr"))
        .withColumn("__len", F.size(F.col("__arr")))
        .filter(F.col("__len") >= minW)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__len") - (minW - 1))))
      val entries = widths.map { n =>
        F.when(F.col("__i") <= F.col("__len") - (n - 1),
          F.struct(F.lit(n).as("w"),
            F.concat_ws(" ", (0 until n).map(o =>
              F.element_at(F.col("__arr"), F.col("__i") + o)): _*).as("shingle")))
      }
      base.select(F.col("doc"), F.explode(F.array(entries: _*)).as("e"))
        .filter(F.col("e").isNotNull)
        .select(F.col("doc"), F.col("e.w").as("w"), F.col("e.shingle").as("shingle"))
        .distinct()
    }
    // per-width bench blooms from ONE grouped aggregation (bench is the
    // small fixed suite; |widths| few-MB filters on the driver)
    val benchSh = multiShingles(bench).withColumnRenamed("doc", "bench_id")
    val blooms: Map[Int, Array[Byte]] = benchSh
      .groupBy(F.col("w"))
      .agg(graft.functions.BloomSupport
        .bloomAgg(F.col("shingle"), 1L << 20, 1L << 23).as("bf"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bf")).toMap
    // bloom-negative train shingles never reach the shuffle; widths with
    // an empty bench side (no bloom row) drop entirely
    val keep = widths.filter(blooms.contains).map(n =>
        F.col("w") === n && graft.functions.BloomSupport
          .mightContain(F.lit(blooms(n)), F.col("shingle")))
      .reduceOption(_ || _).getOrElse(F.lit(false))
    val trainSh = multiShingles(train).withColumnRenamed("doc", "train_id")
      .filter(keep)
    val pairs = trainSh.join(benchSh, Seq("w", "shingle"))
      .groupBy(F.col("w"), F.col("train_id"), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("shared"))
      .filter(F.col("shared") >= minShared)
    val stats = pairs.groupBy(F.col("w").as("ngram_n"))
      .agg(
        F.count(F.lit(1)).as("n_pairs"),
        F.countDistinct(F.col("train_id")).as("n_train_docs"),
        F.countDistinct(F.col("bench_id")).as("n_bench_docs"),
        F.sum("shared").as("total_shared"),
        F.max("shared").as("max_shared"))
    // every width reports a row, zero-filled when nothing leaked
    import spark.implicits._
    widths.toDF("ngram_n").join(stats, Seq("ngram_n"), "left")
      .select(F.col("ngram_n"),
        F.coalesce(F.col("n_pairs"), F.lit(0L)).as("n_pairs"),
        F.coalesce(F.col("n_train_docs"), F.lit(0L)).as("n_train_docs"),
        F.coalesce(F.col("n_bench_docs"), F.lit(0L)).as("n_bench_docs"),
        F.coalesce(F.col("total_shared"), F.lit(0L)).as("total_shared"),
        F.coalesce(F.col("max_shared"), F.lit(0L)).as("max_shared"))
  }

  /** DoReMi-SHAPED iterative domain reweighting: multiplicative-weights
    * updates that upweight domains with EXCESS difficulty over the current
    * mixture's average (Group-DRO's exponentiated-gradient step,
    * linearized to `α ← α·(1 + η·excess)` — a standard MW variant), then
    * renormalize. The difficulty signal here is the per-domain mean token
    * count normalized to [0,1] (the slot a reference-model excess loss
    * plugs into in a real DoReMi run).
    *
    * Engine-EXACT trajectory (the snapped-model pattern, applied to an
    * iterative reweighting loop): everything runs in ×10⁶ scaled-INTEGER
    * space — weights `a6`, losses `ell6` — so every cross-domain sum is an
    * exact BIGINT (addition-order-free, unlike double sums), the per-step
    * learning-rate product uses η = 1/2 (a power of two: `0.5·x` is
    * exact), and the only rounding is one `round(IEEE division)` per
    * domain per step — identical in any engine. DuckDB replays the loop
    * unrolled and hash-matches.
    *
    * Scale shape: ONE corpus-wide groupBy produces the D-row loss frame;
    * all `iters` updates run on those D rows (window sums over D values).
    * 100 TB cost = the single aggregation pass. */
  def mwReweight(df: DataFrame, groupCol: String, tokensPerRow: Column,
                 iters: Int = 4): DataFrame = {
    val all = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val avg = df.withColumn("__t", tokensPerRow.cast("double"))
      .groupBy(F.col(groupCol))
      .agg((F.sum("__t") / F.count(F.lit(1))).as("__avgt"))
    val l = avg.select(F.col(groupCol),
      F.round(F.lit(1000000.0) * F.col("__avgt") / F.max("__avgt").over(all))
        .cast("long").as("ell6"))
    var cur = l.withColumn("a6",
      F.round(F.lit(1000000.0) / F.count(F.lit(1)).over(all)).cast("long"))
    for (_ <- 1 to iters) {
      val sumA = F.sum("a6").over(all)
      val sumAL = F.sum(F.col("a6") * F.col("ell6")).over(all)
      // excess·Σα (exact BIGINT) → η-scaled micro-delta → positive factor
      val delta = F.round(
        F.lit(0.5) * (F.col("ell6") * sumA - sumAL).cast("double") / sumA.cast("double"))
        .cast("long")
      val staged = cur.withColumn("__araw", F.col("a6") * (F.lit(1000000L) + delta))
      cur = staged.withColumn("a6",
          F.round(F.col("__araw").cast("double") * 1000000.0 /
            F.sum("__araw").over(all).cast("double")).cast("long"))
        .drop("__araw")
    }
    cur.select(F.col(groupCol),
      F.col("ell6"),
      F.col("a6").as("alpha6"),
      F.round(F.col("a6").cast("double") / 1000000.0, 6).as("weight"))
  }

  /** Curriculum INTERLEAVE ordering: rank rows within each domain by a
    * difficulty/quality score (easiest first, id tiebreak), then emit the
    * global round-robin position — rank-major, domain-minor — so training
    * consumes "everyone's easiest, then everyone's next" instead of one
    * domain at a time. The global position uses the two-phase distributed
    * assignment (no single-partition sort at any scale). */
  def curriculumOrder(df: DataFrame, idCol: String, groupCol: String,
                      score: Column): DataFrame = {
    val byGroup = Window.partitionBy(F.col(groupCol))
      .orderBy(score.asc, F.col(idCol).asc)
    val ranked = df
      .withColumn("rank_in_group", F.row_number().over(byGroup).cast("long"))
    AuditQueries.assignIngestSeqDistributed(
        ranked, base = 0L, orderCols = Seq("rank_in_group", groupCol, idCol))
      .withColumnRenamed("id", "pos")
      .select(F.col(idCol), F.col(groupCol), F.col("rank_in_group"), F.col("pos"))
  }
}
