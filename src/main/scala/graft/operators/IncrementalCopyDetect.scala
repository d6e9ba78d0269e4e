package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time COPY suppression — the substring-overlap twin of
  * [[IncrementalDedup]] (set Jaccard) and [[IncrementalSemanticDedup]]
  * (embedding cosine): instead of re-running the all-corpus
  * [[TextAnalysis.winnowPairs]] job per batch, persist each kept
  * document's winnowing posting list and check every NEW batch's
  * fingerprints only against the accumulated postings.
  *
  * Per batch:
  *  1. compute winnowing fingerprints for the batch
  *     ([[TextAnalysis.winnowSets]]) and df-cap them WITHIN the batch —
  *     the cap is computed against the batch alone, so replaying a batch
  *     re-derives the identical postings (a corpus-relative cap would
  *     shift under growth and break replay stability);
  *  2. drop documents whose fingerprint containment against any STORED
  *     document reaches `minOverlap` (a hash-keyed join whose right side
  *     grows with the corpus' kept content, not with batches replayed);
  *  3. drop in-batch copies (posting-local pairs a < b at ≥ `minOverlap`,
  *     keep the smallest id — exactly [[IncrementalDedup]]'s rule);
  *  4. append the SURVIVORS' postings.
  *
  * Because every batch is capped before writing, a single batch can never
  * install a hot posting list; a template recurring RARELY per batch but
  * in MANY batches can still accumulate one in the store, so a long-lived
  * store periodically runs [[PostingStore.compactHotHashes]] (the
  * [[IncrementalDedup.BucketStore.compactBlooms]] lifecycle slot) to shed
  * hashes whose accumulated frequency crossed the cap. Mass duplication
  * (a hash in more docs than the cap) is invisible to this detector by
  * construction — that is the exact-dedup/MinHash family's job; this one
  * catches partial copying, which whole-document signatures miss. */
object IncrementalCopyDetect {

  /** Parquet-backed posting table: (doc long, h long, ns long, batch_id
    * long) — `ns` is the doc's surviving-fingerprint count at ingest (the
    * containment denominator), `batch_id` the replay handle. Reads pin an
    * EXPLICIT schema (the [[IncrementalDedup.BucketStore]] lesson: never
    * footer-sampled). */
  final class PostingStore(spark: SparkSession, dir: String) {
    private val path = s"$dir/winnow_postings"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    private val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc BIGINT, h BIGINT, ns BIGINT, batch_id BIGINT")
    def init(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .write.parquet(path)
    def postings: DataFrame =
      spark.read.schema(schema).parquet(path)
        .withColumn("batch_id", F.coalesce(F.col("batch_id"), F.lit(-1L)))
    def append(b: DataFrame): Unit =
      b.select("doc", "h", "ns", "batch_id")
        .write.mode(SaveMode.Append).parquet(path)

    /** Shed posting lists that accumulated past `maxDf` distinct docs
      * across batches — cross-batch boilerplate convergence. Containment
      * denominators (`ns`) stay as frozen at each doc's ingest, so later
      * checks get slightly CONSERVATIVE (a doc can only look less covered,
      * never more), which errs toward keeping documents. Rewrite-then-swap
      * so readers never see a half-compacted table. */
    def compactHotHashes(maxDf: Long): Unit = {
      val kept = postings.withColumn("__df",
          F.count(F.lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("h")))
        .filter(F.col("__df") <= maxDf).drop("__df")
        .pin()
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.winnow_postings_tmp")
      kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val live = new org.apache.hadoop.fs.Path(path)
      fs.delete(live, true)
      fs.rename(tmp, live)
    }
  }

  /** Returns the batch rows that survive copy detection against the store
    * AND within the batch, and appends their postings. A replayed batch
    * collides with its own stored postings at containment 1.0 and yields
    * ZERO survivors — right when the downstream sink dedups at the row
    * level itself. For a blind append sink use [[dedupBatchIdempotent]]. */
  def dedupBatch(
      batch: DataFrame,
      store: PostingStore,
      idCol: String,
      textCol: String,
      minOverlap: Double = 0.8,
      maxDfFrac: Double = 0.05): DataFrame =
    dedupCore(batch, store, idCol, textCol, minOverlap, maxDfFrac,
      excludeBatch = None, appendBatchId = -1L)

  /** Replay-STABLE form for checkpointed streaming ingest: collision
    * checks exclude rows this very `batchId` wrote, so a re-run
    * micro-batch (foreachBatch is at-least-once) deterministically
    * re-yields the SAME survivor set — pair with an overwrite-by-batch-id
    * survivor sink for end-to-end exactly-once survivors. Re-appended
    * posting rows are harmless duplicates (collision checks are
    * per-(doc, stored-doc) containment tests on distinct hashes). */
  def dedupBatchIdempotent(
      batch: DataFrame,
      store: PostingStore,
      idCol: String,
      textCol: String,
      batchId: Long,
      minOverlap: Double = 0.8,
      maxDfFrac: Double = 0.05): DataFrame =
    dedupCore(batch, store, idCol, textCol, minOverlap, maxDfFrac,
      excludeBatch = Some(batchId), appendBatchId = batchId)

  private def dedupCore(
      batch: DataFrame,
      store: PostingStore,
      idCol: String,
      textCol: String,
      minOverlap: Double,
      maxDfFrac: Double,
      excludeBatch: Option[Long],
      appendBatchId: Long): DataFrame = {
    // batch-local winnow postings with the batch-relative df cap; the
    // (id, set) frame materializes before exploding (the winnowPairs
    // Generate lesson) and doubles as the survivors' append source
    val setsMat = TextAnalysis.winnowSets(batch, idCol, textCol)
      .select(F.col(idCol).cast("long").as("doc"), F.col("__sel"))
      .pin()
    val keyed = setsMat.select(F.col("doc"), F.explode(F.col("__sel")).as("h"))
    val nDocs = batch.agg(F.count(F.lit(1)).as("__n"))
    val rare = keyed.groupBy("h").agg(F.count(F.lit(1)).as("__df"))
      .crossJoin(F.broadcast(nDocs))
      .filter(F.col("__df") <=
        F.greatest(F.lit(2L), F.ceil(F.lit(maxDfFrac) * F.col("__n"))))
      .select("h")
    val filtered = keyed.join(rare, "h")
    val ns = filtered.groupBy("doc").agg(F.count(F.lit(1)).as("ns"))
    val posting = filtered.join(ns, "doc").pin()
    // containment vs STORED postings (minus this batch's own rows when
    // replay-stability is asked) — join on the hash key, then one
    // combinable count per (batch doc, stored doc)
    val corpus = excludeBatch.fold(store.postings)(b =>
        store.postings.filter(F.col("batch_id") =!= b))
      .select(F.col("doc").as("sdoc"), F.col("h"), F.col("ns").as("sns"))
    val dupVsStore = posting.join(corpus, "h")
      .groupBy(F.col("doc"), F.col("sdoc"))
      .agg(F.count(F.lit(1)).as("__sh"),
        F.max(F.col("ns")).as("__ns"), F.max(F.col("sns")).as("__sns"))
      .filter(F.round(F.col("__sh").cast("double") /
        F.least(F.col("__ns"), F.col("__sns")).cast("double"), 4) >= minOverlap)
      .select(F.col("doc")).distinct()
    // in-batch copies: posting-local pairs, keep the smallest id
    val x = posting.select(F.col("h"), F.col("doc").as("a"), F.col("ns").as("na"))
    val y = posting.select(F.col("h"), F.col("doc").as("b"), F.col("ns").as("nb"))
    val dupInBatch = x.join(y, "h").filter(F.col("a") < F.col("b"))
      .groupBy(F.col("a"), F.col("b"))
      .agg(F.count(F.lit(1)).as("__sh"),
        F.max(F.col("na")).as("__na"), F.max(F.col("nb")).as("__nb"))
      .filter(F.round(F.col("__sh").cast("double") /
        F.least(F.col("__na"), F.col("__nb")).cast("double"), 4) >= minOverlap)
      .select(F.col("b").as("doc")).distinct()
    val dropped = dupVsStore.union(dupInBatch).distinct()
    val kept = batch.join(
      dropped.select(F.col("doc").cast("long").as("__drop")),
      batch(idCol).cast("long") === F.col("__drop"), "left_anti")
    // materialize BEFORE appending AND sever lineage — the kept-plan reads
    // the posting table we are about to mutate (the recache lesson)
    val keptRows = kept.pin()
    store.append(posting
      .join(keptRows.select(F.col(idCol).cast("long").as("doc")), "doc")
      .withColumn("batch_id", F.lit(appendBatchId)))
    keptRows
  }
}
