package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.Pin._

/** Document-deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash, and n-gram Jaccard verification.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column algebra —
  * whole-stage-codegen friendly, no UDFs — and every hash is derived from
  * `md5` over explicit strings so results are engine-portable (the DuckDB
  * oracle computes the identical values).
  *
  * Scale design: the only shuffles are (a) groupBy doc for signatures and
  * (b) the bucket join for candidates. Candidate generation never compares
  * all pairs — LSH banding bounds the join to same-bucket collisions, and
  * the final Jaccard verification runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup by content hash: one output row per distinct text with the
    * representative (minimum) id kept and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(F.md5(F.col(textCol)).as("content_hash"))
      .agg(
        F.min(F.col(idCol)).as("keep_id"),
        F.count(F.lit(1)).as("n_dups"))

  /** Word n-gram shingles: one row per (id, distinct shingle). Uses
    * 1-indexed `element_at` over `split` so the DuckDB mirror
    * (`string_split(text,' ')[i]`) computes identical strings. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val arr = F.split(F.col(textCol), " ")
    val withArr = df.select(F.col(idCol).as("doc"), arr.as("__arr"))
      .withColumn("__len", F.size(F.col("__arr")))
      .filter(F.col("__len") >= n) // guards sequence(1, x<1) which would run descending
      .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__len") - (n - 1))))
    val shingle = F.concat_ws(" ", (0 until n).map(o => F.element_at(F.col("__arr"), F.col("__i") + o)): _*)
    withArr.select(F.col("doc"), shingle.as("shingle")).distinct()
  }

  /** MinHash signatures: for seed j in [0, k), h_j(doc) = min over the
    * doc's shingles of md5(j || '|' || shingle). Lexicographic min over a
    * uniform hex hash is a valid min-hash; identical in any engine with
    * md5. Output: (doc, j, h). */
  def minhashSignatures(shingles: DataFrame, k: Int = 8): DataFrame =
    shingles
      .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
      .groupBy(F.col("doc"), F.col("j"))
      .agg(F.min(F.md5(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("shingle")))).as("h"))

  /** LSH banding with 2 rows per band: band b holds seeds (2b, 2b+1); the
    * bucket key is md5 of their concatenation. Docs sharing any (band, key)
    * become candidate pairs. Output: (doc, band, key). */
  def lshBuckets(signatures: DataFrame): DataFrame =
    signatures
      .withColumn("band", (F.col("j") / 2).cast("int"))
      .groupBy(F.col("doc"), F.col("band"))
      .agg(F.md5(F.concat(
        F.max(F.when(F.col("j") % 2 === 0, F.col("h"))),
        F.max(F.when(F.col("j") % 2 === 1, F.col("h"))))).as("key"))

  /** Distinct candidate pairs (a < b) from shared LSH buckets. The join is
    * bucket-local: cost is Σ per-bucket size², not |docs|². */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val a = buckets.select(F.col("band"), F.col("key"), F.col("doc").as("a"))
    val b = buckets.select(F.col("band"), F.col("key"), F.col("doc").as("b"))
    a.join(b, Seq("band", "key"))
      .filter(F.col("a") < F.col("b"))
      .select("a", "b")
      .distinct()
  }

  /** End-to-end MinHash LSH near-duplicate candidates.
    *
    * Uses the wide-aggregation form: k min-aggregates in ONE groupBy pass
    * instead of exploding shingles ×k through the shuffle — identical
    * signatures to `minhashSignatures` (same per-seed min), k× less
    * shuffle input. Bands are then a cheap 4-row explode per doc. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 8): DataFrame =
    // PINNED: both sides of the bucket self-join derive from this frame —
    // unpinned, the whole shingle-explode + wide-signature pipeline ran
    // twice. (doc, band, key) is ~k/2 slim rows per doc at any scale.
    candidatePairs(minhashBuckets(df, idCol, textCol, shingleN, k).pin())

  /** (doc, band, key) LSH bucket rows via the wide one-pass signature
    * aggregation — the building block shared by the batch candidate
    * generator above and the incremental ingest-time dedup
    * ([[IncrementalDedup]], which persists these rows between batches). */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, k: Int = 8): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, shingleN)
    val aggs = (0 until k).map(j =>
      F.min(F.md5(F.concat(F.lit(j.toString), F.lit("|"), F.col("shingle")))).as(s"h$j"))
    val wide = sh.groupBy(F.col("doc")).agg(aggs.head, aggs.tail: _*)
    val bands = (0 until k / 2).map(b => F.struct(
      F.lit(b).as("band"),
      F.md5(F.concat(F.col(s"h${2 * b}"), F.col(s"h${2 * b + 1}"))).as("key")))
    wide
      .select(F.col("doc"), F.explode(F.array(bands: _*)).as("bk"))
      .select(F.col("doc"), F.col("bk.band").as("band"), F.col("bk.key").as("key"))
  }

  /** n-gram Jaccard similarity for all pairs sharing at least one
    * (retained) shingle: |A∩B| / |A∪B|, keeping pairs with similarity ≥
    * `minJaccard`.
    *
    * Hot-shingle suppression: shingles with doc-frequency > `maxDf` are
    * dropped from the shingle universe entirely (both the intersection
    * counts and the set sizes). A stop-phrase shingle shared by 10⁵ docs
    * carries ~no Jaccard information but would contribute df² candidate
    * rows — at 100 TB that single key is the difference between Σ df²
    * bounded by maxDf² per shingle and an effectively quadratic blowup.
    *
    * Plan shape: ONE groupBy-shingle pass collects each retained shingle's
    * doc list (arrays bounded ≤ maxDf by the semi-join pre-filter, so no
    * unbounded reducer state), pairs are exploded IN-ROW from the doc
    * array — no shingle self-join shuffle at all — and set sizes come from
    * re-exploding the same aggregated frame (Catalyst reuses the exchange).
    */
  def jaccardPairs(shingles: DataFrame, minJaccard: Double,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    // With a finite cap, per-shingle doc lists are bounded ≤ maxDf by the
    // semi-join pre-filter, so the in-row pair explosion is safe and skips
    // the self-join shuffle. WITHOUT a cap there is no such bound — a hot
    // shingle would concentrate its whole doc list in one reducer row —
    // so the uncapped path keeps the fully-distributed self-join instead.
    val (sizesSrc, shared) =
      if (maxDf == Long.MaxValue) {
        val shared2 = shingles.groupBy(F.col("shingle"))
          .agg(F.count(F.lit(1)).as("__n")).filter(F.col("__n") >= 2).select("shingle")
        val pruned = shingles.join(shared2, Seq("shingle"), "left_semi")
        val a = pruned.select(F.col("shingle"), F.col("doc").as("a"))
        val b = pruned.select(F.col("shingle"), F.col("doc").as("b"))
        (shingles,
          a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy(F.col("a"), F.col("b"))
            .agg(F.count(F.lit(1)).as("shared")))
      } else {
        val dfCounts = shingles.groupBy(F.col("shingle"))
          .agg(F.count(F.lit(1)).as("__df"))
        val kept = shingles.join(
          dfCounts.filter(F.col("__df") <= maxDf).select("shingle"),
          Seq("shingle"), "left_semi")
        val byShingle = kept.groupBy(F.col("shingle"))
          .agg(F.collect_list(F.col("doc")).as("__docs"))
        // singleton shingles (df = 1) count toward set sizes but cannot pair
        val pairs = byShingle
          .filter(F.size(F.col("__docs")) >= 2)
          .select(F.col("__docs"), F.explode(F.col("__docs")).as("a"))
          .select(F.col("a"), F.explode(F.col("__docs")).as("b"))
          .filter(F.col("a") < F.col("b"))
        (byShingle.select(F.col("shingle"), F.explode(F.col("__docs")).as("doc")),
          pairs.groupBy(F.col("a"), F.col("b")).agg(F.count(F.lit(1)).as("shared")))
      }
    val sizes = sizesSrc.groupBy(F.col("doc")).agg(F.count(F.lit(1)).as("sz"))
    shared
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        F.round(F.col("shared").cast("double") /
          (F.col("sza") + F.col("szb") - F.col("shared")).cast("double"), 4))
      .filter(F.col("jaccard") >= minJaccard)
      .select(F.col("a"), F.col("b"), F.col("shared"), F.col("jaccard"))
  }

  /** MinHash-LSH candidates → exact Jaccard verification, composed — the
    * production near-dup recipe. Candidate pairs come from banded MinHash
    * collisions ([[minhashCandidates]]: Σ bucket², never all-pairs); the
    * exact Jaccard is then computed ONLY for candidate pairs, over a
    * shingle frame semi-join-pruned to the docs that appear in any
    * candidate. At 100 TB the expensive exact set intersection runs on the
    * (tiny) candidate set instead of the corpus — the df-capped all-pairs
    * [[jaccardPairs]] stays available for exhaustive sweeps.
    *
    * Set sizes use each doc's FULL shingle set (Jaccard's denominator is
    * defined on the real sets, not a pruned universe). Output columns
    * match [[jaccardPairs]]: (a, b, shared, jaccard). */
  def jaccardVerifiedCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double,
      shingleN: Int = 3,
      k: Int = 8): DataFrame = {
    // both checkpoints pin SLIVERS, not the corpus: cands is the LSH
    // candidate-pair list and pruned holds only in-play docs' shingles —
    // without them the full minhash pipeline runs 3× (docsInPlay twice +
    // the shared join) and the shingle explode 3× (two join sides + sizes)
    val cands = minhashCandidates(df, idCol, textCol, shingleN, k)
      .pin()
    val sh = wordShingles(df, idCol, textCol, shingleN)
    val docsInPlay = cands.select(F.col("a").as("doc"))
      .union(cands.select(F.col("b").as("doc"))).distinct()
    val pruned = sh.join(docsInPlay, Seq("doc"), "left_semi")
      .pin()
    // set sizes only ever join against in-play docs, so they can come from
    // the pruned frame — one less full-corpus shingle scan
    val sizes = pruned.groupBy(F.col("doc")).agg(F.count(F.lit(1)).as("sz"))
    val shared = cands
      .join(pruned.select(F.col("doc").as("a"), F.col("shingle")), "a")
      .join(pruned.select(F.col("doc").as("b"), F.col("shingle")), Seq("b", "shingle"))
      .groupBy(F.col("a"), F.col("b")).agg(F.count(F.lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        F.round(F.col("shared").cast("double") /
          (F.col("sza") + F.col("szb") - F.col("shared")).cast("double"), 4))
      .filter(F.col("jaccard") >= minJaccard)
      .select(F.col("a"), F.col("b"), F.col("shared"), F.col("jaccard"))
  }

  /** Cross-document duplicated-SPAN statistics: for each document, how
    * much of it is built from word n-grams that also occur in OTHER
    * documents. This is the span-granular duplication signal ("what
    * fraction of this doc is corpus-boilerplate?") — finer than
    * whole/chunk-level dedup and computed WITHOUT any pair join: one
    * groupBy over the shingle universe for document frequencies, one
    * co-partitioned join back, one per-doc aggregate. Within-doc
    * repetition never counts ([[wordShingles]] is distinct per doc), so
    * `span_df ≥ 2` always means "shared with at least one other doc".
    *
    * Output per doc: `n_shingles` (distinct spans), `n_dup_spans` (spans
    * with corpus df ≥ 2), `dup_span_frac` = n_dup_spans / n_shingles
    * (round 4), `max_span_df` (how viral the doc's most-duplicated span
    * is). At 100 TB this is the cheap pre-filter that routes only
    * high-duplication docs into the expensive pairwise dedup stages: cost
    * is two shingle-keyed shuffles with map-side combine, linear in corpus
    * size, zero pair blowup. */
  def corpusDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, n)
    val dfr = sh.groupBy(F.col("shingle"))
      .agg(F.count(F.lit(1)).as("__span_df"))
    sh.join(dfr, "shingle")
      .groupBy(F.col("doc"))
      .agg(
        F.count(F.lit(1)).as("n_shingles"),
        F.sum(F.when(F.col("__span_df") >= 2, 1L).otherwise(0L)).as("n_dup_spans"),
        F.max(F.col("__span_df")).as("max_span_df"))
      .select(F.col("doc").as(idCol), F.col("n_shingles"), F.col("n_dup_spans"),
        F.round(F.col("n_dup_spans").cast("double") /
          F.col("n_shingles").cast("double"), 4).as("dup_span_frac"),
        F.col("max_span_df"))
  }

  /** Exact-substring deduplication, the REMOVAL form of
    * [[corpusDupSpans]]: rewrite each document with every word `n`-gram
    * that also occurs in at least `minDf` distinct documents cut out
    * (cf. the reference's dedup-on-write `ON CONFLICT DO NOTHING` at
    * `pkg/db/store.go:92` — here at span rather than row granularity).
    * A token survives iff NO duplicated n-gram covers its position.
    *
    * Plan shape (all linear, zero pair joins): positional shingles →
    * one groupBy(shingle) for distinct-doc df (two-phase, map-side
    * combine) → co-partitioned join back → explode each duplicated
    * start to its `n` covered positions → per-doc covered-set aggregate
    * → one join onto the corpus and an index-lambda `filter` over the
    * token array (codegen'd, no UDF). The covered-position explode is
    * bounded by n × duplicated-starts — proportional to how much
    * boilerplate exists, never to corpus². At 100 TB the shingle df
    * table is the only wide shuffle, the same one [[corpusDupSpans]]
    * already pays.
    *
    * Output per doc: `n_tokens`, `n_removed` (covered positions), and
    * `clean_text` (surviving tokens re-joined with single spaces;
    * duplicated-span docs can collapse to ''). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, minDf: Int = 2): DataFrame = {
    val arr = F.split(F.col(textCol), " ")
    val toks = df.select(F.col(idCol).as("doc"), arr.as("__arr"))
      .withColumn("__len", F.size(F.col("__arr")))
    // positional shingles: (doc, i, shingle), i 1-based start position
    val pos = toks.filter(F.col("__len") >= n)
      .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__len") - (n - 1))))
      .select(F.col("doc"), F.col("__i"),
        F.concat_ws(" ", (0 until n).map(o =>
          F.element_at(F.col("__arr"), F.col("__i") + o)): _*).as("shingle"))
    // corpus df per shingle over DISTINCT docs: within-doc repetition
    // alone never triggers removal (same rule as corpusDupSpans)
    val dup = pos.select("doc", "shingle").distinct()
      .groupBy("shingle").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") >= minDf).select("shingle")
    // duplicated starts -> covered positions [i, i+n-1], distinct per doc
    val covered = pos.join(dup, "shingle")
      .select(F.col("doc"),
        F.explode(F.sequence(F.col("__i"), F.col("__i") + (n - 1))).as("p"))
      .groupBy("doc").agg(F.sort_array(F.collect_set(F.col("p"))).as("__cov"))
      .withColumnRenamed("doc", "__cdoc")
    toks.join(covered, F.col("doc") === F.col("__cdoc"), "left")
      .select(F.col("doc").as(idCol), F.col("__len").cast("long").as("n_tokens"),
        F.coalesce(F.size(F.col("__cov")), F.lit(0)).cast("long").as("n_removed"),
        F.concat_ws(" ", F.filter(F.col("__arr"),
          (tok: Column, i0: Column) => F.not(F.array_contains(
            F.coalesce(F.col("__cov"), F.array()), i0 + 1)))).as("clean_text"))
  }

  /** SimHash near-duplicate pairs by pigeonhole banding over the 64-BIT
    * fingerprint ([[simhash64]]): the fingerprint splits into
    * `maxHamming + 1` bands, and any pair within Hamming distance
    * `maxHamming` MUST agree exactly on at least one band (pigeonhole) —
    * so candidates come from band-equality buckets (Σ bucket², never
    * all-pairs) with zero recall loss, then the exact Hamming distance
    * filters. The simhash analogue of MinHash banding: one groupBy for
    * fingerprints, one bucket join, a popcount verify.
    *
    * Band width is the scale lever: with maxHamming=3 the 64-bit print
    * gives 4 bands × 16 bits = 65,536 bucket values per band, so Σ bucket²
    * stays near-linear for realistic fingerprint distributions — unlike a
    * 16-bit print whose 4-bit bands (16 buckets) degenerate toward N²/16
    * per band. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs64(simhash64(df, idCol, textCol), "doc", "sh_lo", "sh_hi", maxHamming)

  /** The banding core of [[simhashPairs]], usable with ANY 64-bit
    * fingerprint split into two 32-bit words — text simhash, image dHash
    * ([[Multimodal.dHash]]), audio prints alike. Pigeonhole: a pair
    * within Hamming distance `maxHamming` must agree exactly on one of
    * the `maxHamming + 1` bands, so candidates come from band-equality
    * buckets (Σ bucket²) with zero recall loss; the exact popcount then
    * filters.
    *
    * Exact-duplicate prints are CONTRACTED first: banding and the
    * candidate distinct run over one row per DISTINCT fingerprint, and
    * member pairs are expanded afterwards (within-group pairs at hamming
    * 0, cross-group pairs per verified print pair — a print pair is
    * unique, so the expansion needs no dedup). At corpus scale
    * exact-dup groups are the dominant structure (boilerplate pages,
    * mirrored files), and contraction turns their Σ clique² candidate
    * blowup into |group| membership rows; the expansion stage is then
    * bounded by the OUTPUT size, which no complete pair list can beat. */
  def hammingPairs64(
      fp0: DataFrame,
      idCol: String,
      loCol: String,
      hiCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(64 % (maxHamming + 1) == 0,
      s"need 64 divisible by maxHamming+1, got ${maxHamming + 1} bands")
    val (mem0, groups) = contractPrints(fp0, idCol, loCol, hiCol)
    // PINNED: mem feeds four joins below (within ×2, cross expansion ×2);
    // unpinned each re-ran the membership join. One row per member id.
    val mem = mem0.pin()
    // within-group pairs: identical prints, hamming 0 by definition
    val within = mem.select(F.col("fid"), F.col("doc").as("a"))
      .join(mem.select(F.col("fid"), F.col("doc").as("b")), "fid")
      .filter(F.col("a") < F.col("b"))
      .select(F.col("a"), F.col("b"), F.lit(0).as("hamming"))
    if (maxHamming == 0) return within
    // cross-group: banded print pairs expanded to member pairs. Group
    // min-ids are NOT mutually ordered with member ids, so order each
    // expanded pair explicitly.
    val cross = distinctPrintPairs(groups, maxHamming)
      .join(mem.select(F.col("fid").as("fa"), F.col("doc").as("da")), "fa")
      .join(mem.select(F.col("fid").as("fb"), F.col("doc").as("db")), "fb")
      .select(F.least(F.col("da"), F.col("db")).as("a"),
        F.greatest(F.col("da"), F.col("db")).as("b"), F.col("hamming"))
    within.union(cross)
  }

  /** Connectivity-equivalent EDGE LIST for the hamming ≤ `maxHamming`
    * pair graph: each exact-duplicate group contributes a star onto its
    * min-id member, plus ONE edge per verified distinct-print pair
    * (between group representatives). Connected components over these
    * edges equal components over the full [[hammingPairs64]] expansion —
    * the input for cluster-level consumers ([[connectedComponents]]),
    * where expanding member×member pairs would only be collapsed again.
    * Σ|group| + distinct-print pairs edges instead of Σ clique². */
  def hammingEdges64(
      fp0: DataFrame,
      idCol: String,
      loCol: String,
      hiCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(64 % (maxHamming + 1) == 0,
      s"need 64 divisible by maxHamming+1, got ${maxHamming + 1} bands")
    val (mem, groups) = contractPrints(fp0, idCol, loCol, hiCol)
    val star = mem.filter(F.col("doc") =!= F.col("fid"))
      .select(F.col("doc").as("a"), F.col("fid").as("b"))
    if (maxHamming == 0) return star
    star.union(distinctPrintPairs(groups, maxHamming)
      .select(F.col("fa").as("a"), F.col("fb").as("b")))
  }

  /** Shared contraction stage: `(membership(doc, fid), groups(fid,
    * sh_lo, sh_hi))` where `fid` is the group's min member id. Both
    * frames are pinned — the slim projection cuts the upstream
    * fingerprint pipeline (token explode / codec decode) to ONE run,
    * and groups feed both the banding self-join and the expansion
    * joins. */
  private def contractPrints(
      fp0: DataFrame, idCol: String, loCol: String, hiCol: String): (DataFrame, DataFrame) = {
    val fp = fp0.select(F.col(idCol).as("doc"), F.col(loCol).as("sh_lo"),
      F.col(hiCol).as("sh_hi")).pin()
    val groups = fp.groupBy("sh_lo", "sh_hi").agg(F.min("doc").as("fid"))
      .pin()
    val mem = fp.join(groups, Seq("sh_lo", "sh_hi")).select("doc", "fid")
    (mem, groups)
  }

  /** Pigeonhole banding + popcount verify over DISTINCT fingerprints:
    * (fa, fb, hamming) with fa/fb the group representatives and 1 ≤
    * hamming ≤ `maxHamming` (identical prints were contracted away, so
    * xor is never zero). A pair can agree on several bands — distinct
    * runs at print granularity, BEFORE member expansion. */
  private def distinctPrintPairs(groups: DataFrame, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    require(32 % bandBits == 0,
      s"band width $bandBits would straddle the lo/hi words")
    val perWord = math.max(32 / bandBits, 1)
    // band b's value: bandBits-wide slice of lo (b < perWord) or hi
    val bandExprs = (0 until nBands).map { b =>
      val word = if (b < perWord) F.col("sh_lo") else F.col("sh_hi")
      F.struct(F.lit(b).as("bi"),
        F.shiftright(word, (b % perWord) * bandBits)
          .bitwiseAND(if (bandBits >= 32) -1L else (1L << bandBits) - 1).as("bval"))
    }
    val banded = groups.select(F.col("fid"), F.col("sh_lo"), F.col("sh_hi"),
      F.explode(F.array(bandExprs: _*)).as("e"))
      .select(F.col("fid"), F.col("sh_lo"), F.col("sh_hi"),
        F.col("e.bi").as("bi"), F.col("e.bval").as("bval"))
    val x = banded.select(F.col("bi"), F.col("bval"), F.col("fid").as("fa"),
      F.col("sh_lo").as("la"), F.col("sh_hi").as("ha"))
    val y = banded.select(F.col("bi"), F.col("bval"), F.col("fid").as("fb"),
      F.col("sh_lo").as("lb"), F.col("sh_hi").as("hb"))
    x.join(y, Seq("bi", "bval"))
      .filter(F.col("fa") < F.col("fb"))
      .select(F.col("fa"), F.col("fb"), F.col("la"), F.col("ha"), F.col("lb"), F.col("hb"))
      .distinct() // a pair can agree on several bands
      .withColumn("hamming",
        (F.bit_count(F.col("la").bitwiseXOR(F.col("lb"))) +
         F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))).cast("int"))
      .filter(F.col("hamming") <= maxHamming)
      .select(F.col("fa"), F.col("fb"), F.col("hamming"))
  }

  /** Connected components over an undirected near-dup pair list: every
    * node ends up labelled with the MINIMUM id reachable in its component
    * — the canonical "keep one representative per duplicate CLUSTER"
    * step (pairwise dedup alone keeps b of a~b, b~c, dropping transitive
    * duplicates inconsistently).
    *
    * Min-label propagation: labels start as the node's own id; each round
    * every node takes the min of its label and its neighbours' labels;
    * converges in `diameter` rounds. Near-dup clusters are shallow (a few
    * hops), so rounds stay single-digit; each round is one join + one
    * map-side-combinable min-aggregate, and `localCheckpoint` severs the
    * growing lineage so round N+1's plan does not replay rounds 1..N.
    *
    * NEVER returns silently-wrong labels: if the graph's diameter exceeds
    * `maxIters` rounds the call ESCALATES to the alternating
    * small-star/large-star contraction ([[connectedComponentsStar]],
    * O(log²n) rounds regardless of diameter); with `escalate = false` it
    * throws instead.
    *
    * SIZE-GATED driver fast path: every distributed round costs a fixed
    * handful of shuffles regardless of data size, so a small dup graph
    * (the common case — on the sf0.1 bench fixture the graph is 1 235
    * edges and the loop's ~20 rounds cost ~9 s of pure scheduling) pays
    * orders of magnitude more in overhead than in work. When the
    * materialized edge list is under `driverEdgeBound` rows (default 1M ≈
    * 16 MB of id pairs — a BOUNDED collect, like the ≤8192 ship batch,
    * not an unbounded corpus pull), labels come from a driver union-find
    * (union-by-min + path compression, microseconds) with bit-identical
    * results; anything larger takes the distributed loop. */
  def connectedComponents(
      pairs: DataFrame,
      nodes: DataFrame,
      maxIters: Int = 20,
      escalate: Boolean = true,
      driverEdgeBound: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(F.col("a").as("src"), F.col("b").as("dst"))
      .unionAll(pairs.select(F.col("b").as("src"), F.col("a").as("dst")))
      .pin()
    // count is ~free on the materialized checkpoint
    if (edges.count() <= driverEdgeBound * 2) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union-by-min: the root IS the component minimum
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val nodeIds = es.iterator.map(_._1).toArray.distinct
      val labelRows = nodeIds.map(n => org.apache.spark.sql.Row(n, find(n)))
      val schema = org.apache.spark.sql.types.StructType.fromDDL("node BIGINT, label BIGINT")
      val labeled = spark.createDataFrame(
        spark.sparkContext.parallelize(labelRows.toSeq, math.max(1, nodeIds.length / 500000 + 1)), schema)
      val isolated = nodes.select(F.col("node"))
        .join(labeled.select("node"), Seq("node"), "left_anti")
        .select(F.col("node"), F.col("node").as("label"))
      // same output contract as the loop: exactly one row per `nodes` row
      return labeled.join(nodes.select("node"), Seq("node"), "left_semi")
        .unionAll(isolated)
    }
    // the propagation loop runs over the PAIR GRAPH's nodes only: a node
    // with no near-dup edge keeps its own label by definition, and in a
    // big corpus the duplicate graph is a sliver of it — so every
    // per-round join/aggregate scales with |dup graph|, not |corpus|.
    // Isolated nodes get their identity labels attached once at the end.
    var labels = edges.select(F.col("src").as("node")).distinct()
      .select(F.col("node"), F.col("node").as("label"))
      .pin()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val prop = edges.join(labels, F.col("src") === F.col("node"))
        .select(F.col("dst").as("node"), F.col("label"))
      val agg = labels.unionAll(prop)
        .groupBy("node").agg(F.min("label").as("label"))
      // pointer-jump shortcut: node → label(label(node)). Labels are
      // always ids of component members, so chasing one hop through the
      // label table HALVES the remaining depth — propagation alone needs
      // `diameter` rounds (a 2¹⁰-deep chain: 1 024), propagation+jump
      // needs O(log diameter) (~10). Labels only ever decrease toward the
      // component min, so the jump never breaks the invariant. Measured on
      // the sf0.1 embedding dup graph (2 000 nodes, 1 235 near-threshold
      // edges, LONG chains): 20 prop rounds + star-contraction escalation
      // → converges in a handful of rounds, no escalation.
      val jump = agg.toDF("jn", "jl") // fresh attr ids: a bare self-join
      // of `agg` with itself hits Catalyst's ambiguous-attribute dedup
      val next = agg.join(jump, F.col("label") === F.col("jn"), "left")
        .select(F.col("node"), F.coalesce(F.col("jl"), F.col("label")).as("label"))
        .pin()
      changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(F.col("label") =!= F.col("old")).count()
      labels = next
      it += 1
    }
    if (changed > 0) {
      if (!escalate) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"($changed labels still changing — component diameter exceeds the bound)")
      connectedComponentsStar(pairs, nodes)
    } else {
      val isolated = nodes.select(F.col("node"))
        .join(labels.select("node"), Seq("node"), "left_anti")
        .select(F.col("node"), F.col("node").as("label"))
      // output contract: exactly one row per `nodes` row
      labels.join(nodes.select("node"), Seq("node"), "left_semi")
        .unionAll(isolated)
    }
  }

  /** Connected components by the alternating small-star/large-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): converges in O(log²n) rounds INDEPENDENT of component
    * diameter — the scale path for deep chain-shaped duplicate graphs
    * where label propagation would need `diameter` rounds.
    *
    * Each round rewires edges toward component minima:
    *  - large-star: every neighbour of n LARGER than n re-links to
    *    m(n) = min(n ∪ Γ(n));
    *  - small-star: every neighbour ≤ n re-links to the same minimum.
    * The fixpoint is a forest of stars rooted at each component's minimum
    * id; labels read directly off the final edges. Output matches
    * [[connectedComponents]]: (node, label). */
  def connectedComponentsStar(
      pairs: DataFrame,
      nodes: DataFrame,
      maxRounds: Int = 40): DataFrame = {
    // canonical undirected edge set: (lo, hi), lo < hi, distinct
    var edges = pairs.select(F.col("a").as("x"), F.col("b").as("y"))
      .filter(F.col("x") =!= F.col("y"))
      .select(F.least(F.col("x"), F.col("y")).as("lo"),
        F.greatest(F.col("x"), F.col("y")).as("hi"))
      .distinct()
      .pin()
    var converged = edges.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star over the symmetric adjacency: emit (m(n), x) for every
      // neighbour x > n; each emitted pair already has lo = m < n < x = hi
      val sym = edges.unionAll(edges.select(F.col("hi").as("lo"), F.col("lo").as("hi")))
        .select(F.col("lo").as("n"), F.col("hi").as("x"))
      val mTab = sym.groupBy("n").agg(F.min("x").as("mn"))
        .select(F.col("n"), F.least(F.col("n"), F.col("mn")).as("m"))
      val ls = sym.join(mTab, "n")
        .filter(F.col("x") > F.col("n")) // m ≤ n < x, so no self-loops
        .select(F.col("m").as("lo"), F.col("x").as("hi"))
        .distinct()
        .pin()
      // small-star: per node n, its SMALLER neighbours S = {lo : (lo,n)}
      // (canonical pairs make them exactly the lo side); all of S ∪ {n}
      // re-link to m = min S
      val sMin = ls.groupBy("hi").agg(F.min("lo").as("m"))
      val ssOld = ls.join(sMin, "hi")
        .filter(F.col("lo") =!= F.col("m"))
        .select(F.col("m").as("lo"), F.col("lo").as("hi"))
      val ssSelf = sMin.select(F.col("m").as("lo"), F.col("hi"))
      val next = ssOld.unionAll(ssSelf).distinct().pin()
      // fixpoint test: the round function is deterministic, so edge set
      // unchanged start-to-end ⇔ fixpoint. Both sets are distinct and
      // canonical, so equality ⇔ every (lo, hi) appears on BOTH sides of
      // the tagged union — ONE driver action over ONE map-side-combinable
      // aggregate (isEmpty short-circuits at the first one-sided key),
      // instead of the two counts + distinct-union count this used to
      // schedule per round; at O(log²n) rounds on a big graph that extra
      // scheduling was pure waste. (Counts alone would NOT suffice: a
      // round can rewire while preserving |edges| — e.g. {(1,3),(2,3)} →
      // {(1,2),(1,3)} — so the test must compare sets, not sizes.)
      converged = edges.select(F.col("lo"), F.col("hi"), F.lit(1).as("e"), F.lit(0).as("n"))
        .unionAll(next.select(F.col("lo"), F.col("hi"), F.lit(0).as("e"), F.lit(1).as("n")))
        .groupBy("lo", "hi")
        .agg(F.sum("e").as("ne"), F.sum("n").as("nn"))
        .filter(F.col("ne") =!= F.col("nn"))
        .isEmpty
      edges = next
      round += 1
    }
    require(converged || edges.isEmpty,
      s"connectedComponentsStar did not reach a fixpoint in $maxRounds rounds")
    // final stars: every (lo, hi) links node hi to its component root lo
    val lab = edges.groupBy(F.col("hi")).agg(F.min("lo").as("l"))
      .select(F.col("hi").as("node"), F.col("l"))
    nodes.select(F.col("node"))
      .join(lab, Seq("node"), "left")
      .select(F.col("node"), F.coalesce(F.col("l"), F.col("node")).as("label"))
  }

  /** SimHash fingerprint (`bits` ≤ 16): token t contributes ±1 to bit i
    * according to the top bit of the i-th hex nibble of md5(t); bit i of the
    * fingerprint is 1 iff the signed sum is ≥ 0. Near-duplicates land at
    * small Hamming distance. Engine-portable: nibble-top-bit = "hex digit in
    * 8..f", no integer parsing of hex needed. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    // Wide form: `bits` signed sums in ONE groupBy pass over tokens (no
    // ×bits explode through the shuffle), then the fingerprint is a pure
    // projection over the bit columns. Identical to the per-(doc,i) form.
    val toks = df.select(
        F.col(idCol).as("doc"),
        F.explode(F.split(F.col(textCol), " ")).as("tok"))
      .withColumn("h", F.md5(F.col("tok")))
    val hexTop = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = (1 to bits).map { i =>
      F.sum(
        F.when(F.substring(F.col("h"), i, 1).isin(hexTop: _*), F.lit(1)).otherwise(F.lit(-1))
      ).as(s"s$i")
    }
    val fingerprint = (1 to bits).map { i =>
      F.when(F.col(s"s$i") >= 0, F.lit(1L << (i - 1))).otherwise(F.lit(0L))
    }.reduce(_ + _)
    toks.groupBy(F.col("doc"))
      .agg(sums.head, sums.tail: _*)
      .select(F.col("doc"), fingerprint.as("simhash"))
  }

  /** 64-bit SimHash fingerprint as TWO 32-bit words `(sh_lo, sh_hi)`.
    *
    * md5 hex has 32 nibbles, so 64 independent ±1 decisions come from two
    * salted draws per token: bits 1..32 from the nibble top bits of
    * md5(tok), bits 33..64 from md5('s2|' ∥ tok). The fingerprint is kept
    * as two longs each < 2³² rather than one 64-bit long because bit 64
    * would be the sign bit — `1 << 63` is unrepresentable as a positive
    * signed value in either engine's BIGINT sum, while the split form is
    * overflow-free and mirrors into portable SQL verbatim. Hamming distance
    * over the pair is `bit_count(lo⊕lo') + bit_count(hi⊕hi')`.
    *
    * Same wide one-pass shape as [[simhash]]: 64 signed sums in ONE
    * groupBy over tokens, fingerprint words as a pure projection. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(
        F.col(idCol).as("doc"),
        F.explode(F.split(F.col(textCol), " ")).as("tok"))
      .withColumn("h1", F.md5(F.col("tok")))
      .withColumn("h2", F.md5(F.concat(F.lit("s2|"), F.col("tok"))))
    val hexTop = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    def bitSum(h: String, i: Int) =
      F.sum(
        F.when(F.substring(F.col(h), i, 1).isin(hexTop: _*), F.lit(1)).otherwise(F.lit(-1))
      ).as(s"${h}_s$i")
    val sums = (1 to 32).map(bitSum("h1", _)) ++ (1 to 32).map(bitSum("h2", _))
    def word(h: String) = (1 to 32).map { i =>
      F.when(F.col(s"${h}_s$i") >= 0, F.lit(1L << (i - 1))).otherwise(F.lit(0L))
    }.reduce(_ + _)
    toks.groupBy(F.col("doc"))
      .agg(sums.head, sums.tail: _*)
      .select(F.col("doc"), word("h1").as("sh_lo"), word("h2").as("sh_hi"))
  }
}
