package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}

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

  /** Parquet-backed bucket table: (doc long, band int, key string). */
  final class BucketStore(spark: SparkSession, dir: String) {
    private val path = s"$dir/minhash_buckets"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def init(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
        import spark.implicits._
        Seq.empty[(Long, Int, String)].toDF("doc", "band", "key").write.parquet(path)
      }
    def buckets: DataFrame = spark.read.parquet(path)
    def append(b: DataFrame): Unit =
      b.select("doc", "band", "key").write.mode(SaveMode.Append).parquet(path)
  }

  /** Returns the batch rows that survive dedup against the store AND
    * within the batch, and appends their buckets. */
  def dedupBatch(
      batch: DataFrame,
      store: BucketStore,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 8): DataFrame = {
    val buckets = Dedup.minhashBuckets(batch, idCol, textCol, shingleN, k)
    // colliding with the stored corpus -> near-dup of something already kept
    val dupVsStore = buckets
      .join(store.buckets.select("band", "key"), Seq("band", "key"), "left_semi")
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
    val keptRows = kept.localCheckpoint(true)
    val keptBuckets = buckets.join(
      keptRows.select(F.col(idCol).as("doc")), Seq("doc"), "left_semi")
    store.append(keptBuckets)
    keptRows
  }
}
