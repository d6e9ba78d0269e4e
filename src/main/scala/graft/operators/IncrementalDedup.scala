package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time near-duplicate suppression — the form dedup actually takes
  * in a continuously-growing 100 TB corpus: instead of re-running an
  * all-corpus pairwise job per batch, persist each kept document's MinHash
  * LSH bucket rows and check every NEW batch against them.
  *
  * Per batch:
  *  1. compute (doc, band, key) buckets for the batch
  *     ([[Dedup.minhashBuckets]], one groupBy over the batch only);
  *  2. drop docs colliding with any STORED bucket (left-semi against the
  *     bucket table — with the table bucketed/partitioned on the key this
  *     is a pruned join, and its right side grows with the corpus'
  *     distinct content, not with batches replayed);
  *  3. drop in-batch near-dups (bucket-local candidate pairs, keep the
  *     smallest id of each pair);
  *  4. append the SURVIVORS' buckets to the store.
  *
  * At-least-once friendly: a replayed batch collides with its own stored
  * buckets and drops out entirely (idempotent, like the guid-dedup event
  * sink). */
object IncrementalDedup {

  /** Fixed bloom-sidecar parameters: every sidecar a store ever writes
    * uses the SAME (items, bits), so they all `mergeInPlace` (same bit
    * size ⇒ same hash count). 2²³ bits = 1 MiB per sidecar; at the 2²⁰
    * nominal item count that is ~2% false positives per sidecar — a
    * PERFORMANCE knob only (false positives just take the exact join),
    * never a correctness one. */
  val BloomItems: Long = 1L << 20
  val BloomBits: Long = 1L << 23

  /** Parquet-backed bucket table: (doc long, band int, key string,
    * batch_id long). `batch_id` tags which ingest batch wrote each row, the
    * handle the replay-stable [[dedupBatchIdempotent]] needs.
    *
    * Alongside the rows the store keeps bloom SIDECARS (`minhash_blooms/`,
    * one ~1 MiB filter per append, written BEFORE the rows): at 100 TB the
    * per-batch collision check against the accumulated corpus is the one
    * store cost that grows with corpus size, and for a mostly-novel batch
    * almost every key probes the store for a miss. The merged sidecars
    * answer those misses in-row (few-MiB literal, no store access), so the
    * exact semi-join runs only over the bloom-POSITIVE sliver. Ordering
    * makes the filter a SUPERSET of the stored keys in every reachable
    * state (a crash between sidecar write and row append leaves extra bloom
    * bits = more false positives, never a missed row), so the pre-pass can
    * drop a key only when the store provably lacks it. Stores created
    * before sidecars existed have no `_covered` marker and keep the full
    * join ([[bloom]] = None). */
  final class BucketStore(spark: SparkSession, dir: String) {
    private val path = s"$dir/minhash_buckets"
    private val bloomDir = s"$dir/minhash_blooms"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    private def markerPath = new org.apache.hadoop.fs.Path(s"$bloomDir/_covered")
    def init(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
        import spark.implicits._
        Seq.empty[(Long, Int, String, Long)].toDF("doc", "band", "key", "batch_id")
          .write.parquet(path)
        // marker ONLY on fresh stores: an existing legacy store has rows no
        // sidecar covers, and marking it would fabricate false negatives
        fs.mkdirs(new org.apache.hadoop.fs.Path(bloomDir))
        fs.create(markerPath, true).close()
      }
    /** Reads normalize legacy rows: a store written before the batch_id
      * column existed yields nulls, and a null would make `batch_id =!= b`
      * evaluate to null — silently excluding every legacy row from the
      * collision corpus. The read pins an EXPLICIT schema: with schema
      * inference a MIXED store (legacy + new files) resolves from one
      * file's footer arbitrarily, so batch_id could vanish for all rows
      * depending on which file Spark sampled. With the pinned schema,
      * files lacking the column deterministically yield nulls, which
      * coalesce maps to the -1 sentinel (no real batch id, so legacy rows
      * are never self-excluded). */
    def buckets: DataFrame = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc BIGINT, band INT, key STRING, batch_id BIGINT")
      spark.read.schema(schema).parquet(path)
        .withColumn("batch_id", F.coalesce(F.col("batch_id"), F.lit(-1L)))
    }
    def append(b: DataFrame): Unit = {
      val rows = b.select("doc", "band", "key", "batch_id")
      // sidecar FIRST: once the rows are visible, a bloom covering them
      // already is — the superset invariant the pre-pass relies on
      if (fs.exists(markerPath)) writeBloomSidecar(rows)
      rows.write.mode(SaveMode.Append).parquet(path)
    }

    private def writeBloomSidecar(rows: DataFrame): Unit = {
      val bytes = rows
        .select(graft.functions.BloomSupport.bloomAgg(
          bucketKey(F.col("band"), F.col("key")), BloomItems, BloomBits).as("bf"))
        .head.getAs[Array[Byte]](0)
      if (bytes != null) { // null = zero input rows, nothing to cover
        val name = java.util.UUID.randomUUID().toString
        val tmp = new org.apache.hadoop.fs.Path(s"$bloomDir/.tmp-$name")
        val out = fs.create(tmp, false)
        try out.write(bytes) finally out.close()
        fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$bloomDir/bloom-$name.bin"))
      }
    }

    private def sidecarFiles: Array[org.apache.hadoop.fs.Path] =
      fs.listStatus(new org.apache.hadoop.fs.Path(bloomDir))
        .map(_.getPath).filter(_.getName.startsWith("bloom-"))

    /** Merged filter over every append's sidecar, or None when the store
      * predates sidecars (legacy ⇒ caller keeps the full join). A fresh
      * store with zero sidecars yields the EMPTY filter — it rejects every
      * key, which is exact for an empty store. */
    def bloom: Option[org.apache.spark.util.sketch.BloomFilter] =
      if (!fs.exists(markerPath)) None
      else {
        val merged = org.apache.spark.util.sketch.BloomFilter.create(BloomItems, BloomBits)
        sidecarFiles.foreach { p =>
          val in = fs.open(p)
          try merged.mergeInPlace(
            org.apache.spark.util.sketch.BloomFilter.readFrom(in))
          finally in.close()
        }
        Some(merged)
      }

    /** Fold all sidecars into one file. Sidecars accumulate one per append;
      * the merged load stays cheap for thousands of batches, but a
      * long-lived store compacts periodically (false-positive rate is set
      * by total bits vs total keys either way — compaction changes file
      * count, not accuracy). Concurrent appenders are safe: only the files
      * the compactor actually read are deleted. */
    def compactBlooms(): Unit = if (fs.exists(markerPath)) {
      val files = sidecarFiles
      if (files.length > 1) {
        val merged = org.apache.spark.util.sketch.BloomFilter.create(BloomItems, BloomBits)
        files.foreach { p =>
          val in = fs.open(p)
          try merged.mergeInPlace(
            org.apache.spark.util.sketch.BloomFilter.readFrom(in))
          finally in.close()
        }
        val name = java.util.UUID.randomUUID().toString
        val tmp = new org.apache.hadoop.fs.Path(s"$bloomDir/.tmp-$name")
        val out = fs.create(tmp, false)
        try merged.writeTo(out) finally out.close()
        fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$bloomDir/bloom-$name.bin"))
        files.foreach(fs.delete(_, false))
      }
    }
  }

  /** The bloom key for a bucket row — band and key fused with a separator
    * no shingle hash contains. Build and probe both go through this. */
  private def bucketKey(band: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.concat_ws("", band.cast("string"), key)

  /** Returns the batch rows that survive dedup against the store AND
    * within the batch, and appends their buckets. A replayed batch
    * collides with its own stored buckets and yields ZERO survivors —
    * right when the downstream sink dedups at the row level itself (like
    * the guid-keyed event store). For a blind append sink use
    * [[dedupBatchIdempotent]], which re-yields the SAME survivors. */
  def dedupBatch(
      batch: DataFrame,
      store: BucketStore,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 8): DataFrame =
    dedupCore(batch, store, idCol, textCol, shingleN, k,
      excludeBatch = None, appendBatchId = -1L)

  /** Replay-STABLE dedup for checkpointed streaming ingest: collision
    * checks exclude rows this very `batchId` wrote, so re-running a batch
    * (foreachBatch is at-least-once) deterministically re-yields the SAME
    * survivor set instead of dropping to zero — which lets the caller pair
    * it with an overwrite-by-batch-id survivor sink for end-to-end
    * exactly-once survivors across crash/restart (see
    * [[graft.streaming.StreamingDedup]]). Re-appended bucket rows are
    * harmless duplicates (collision checks are semi-joins). */
  def dedupBatchIdempotent(
      batch: DataFrame,
      store: BucketStore,
      idCol: String,
      textCol: String,
      batchId: Long,
      shingleN: Int = 3,
      k: Int = 8): DataFrame =
    dedupCore(batch, store, idCol, textCol, shingleN, k,
      excludeBatch = Some(batchId), appendBatchId = batchId)

  private def dedupCore(
      batch: DataFrame,
      store: BucketStore,
      idCol: String,
      textCol: String,
      shingleN: Int,
      k: Int,
      excludeBatch: Option[Long],
      appendBatchId: Long): DataFrame = {
    val mh = Dedup.minhashBuckets(batch, idCol, textCol, shingleN, k)
      .select(F.col("doc").cast("long").as("doc"), F.col("band"), F.col("key"))
    // an exact-content bucket row (band = -1) for EVERY doc: documents
    // shorter than the shingle width produce no minhash buckets and would
    // otherwise pass through every replay unchecked; the exact row also
    // adds exact-dup suppression to the same pass
    val exactRow = batch.select(
      F.col(idCol).cast("long").as("doc"),
      F.lit(-1).as("band"),
      F.md5(F.col(textCol)).as("key"))
    val buckets = mh.unionAll(exactRow)
    // colliding with the stored corpus -> near-dup of something already
    // kept (minus this batch's own rows when replay-stability is asked)
    val corpus = excludeBatch.fold(store.buckets)(b =>
      store.buckets.filter(F.col("batch_id") =!= b))
    // bloom pre-pass: only bucket rows the merged sidecar filter says MIGHT
    // be stored enter the semi-join — a bloom-negative key is provably
    // absent (superset invariant), and a doc collides iff ANY of its rows
    // does, so filtering rows cannot change dupVsStore. For a mostly-novel
    // batch the join input shrinks to the false-positive sliver; the store
    // scan itself is skipped entirely when nothing survives the filter.
    // The sidecars cover the EXCLUDED batch's rows too — harmless, those
    // false positives die in the exact join against the filtered corpus.
    val probed = store.bloom.fold(buckets) { bf =>
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      buckets.filter(graft.functions.BloomSupport.mightContain(
        F.lit(bos.toByteArray), bucketKey(F.col("band"), F.col("key"))))
    }
    val dupVsStore = probed
      .join(corpus.select("band", "key"), Seq("band", "key"), "left_semi")
      .select(F.col("doc")).distinct()
    // in-batch near-dups: keep the smallest id of each candidate pair
    val dupInBatch = Dedup.candidatePairs(buckets)
      .select(F.col("b").as("doc")).distinct()
    val dropped = dupVsStore.union(dupInBatch).distinct()
    val kept = batch.join(
      dropped.withColumnRenamed("doc", idCol), Seq(idCol), "left_anti")
    // Materialize BEFORE appending AND sever lineage: the kept-plan reads
    // the bucket table we are about to mutate, and `cache()` is not enough
    // — writing the path triggers CacheManager's recache, re-evaluating
    // the plan against the mutated table (survivors would then collide
    // with their own just-appended buckets and vanish). An eager local
    // checkpoint pins the rows with no reference to the input path.
    val keptRows = kept.pin()
    val keptBuckets = buckets.join(
      keptRows.select(F.col(idCol).cast("long").as("doc")), Seq("doc"), "left_semi")
      .withColumn("batch_id", F.lit(appendBatchId))
    store.append(keptBuckets)
    keptRows
  }
}
