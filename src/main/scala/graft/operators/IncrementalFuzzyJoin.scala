package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}

/** Incremental edit-distance entity resolution — [[FuzzyJoin]] against an
  * ACCUMULATING corpus: each ingest batch probes the persisted deletion-
  * key postings of everything seen before, reports its matches (to the
  * store AND within itself), and appends its own keys. At 100 TB of
  * entities nothing ever re-blocks the history: a batch's cost is its own
  * key volume plus the bucket-mates it touches.
  *
  * Replay contract (the [[IncrementalDedup]] recipe): the store is
  * partitioned by `batch_id` and a batch's append OVERWRITES its own
  * partition, so an at-least-once re-run of the same batch id sees the
  * same prior state (its own partition is excluded from the probe side)
  * and re-emits identical pairs — idempotent end to end.
  */
object IncrementalFuzzyJoin {

  /** Persisted deletion-key postings: (key, id, s) partitioned by batch_id. */
  final class KeyStore(spark: SparkSession, dir: String) {
    private[operators] val path = s"$dir/fuzzy_keys"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def postings: DataFrame =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("batch_id", org.apache.spark.sql.types.LongType))))
      else spark.read.option("basePath", path).parquet(path)
        .select("key", "id", "s", "batch_id")

    private[operators] def append(keys: DataFrame, batchId: Long): Unit =
      keys.select("key", "id", "s")
        .write.mode(SaveMode.Overwrite).parquet(s"$path/batch_id=$batchId")
  }

  /** Match `batch` against the accumulated corpus and itself, then append
    * its keys. Output pairs are id-normalized (id_a < id_b) across both
    * origins, so the union of per-batch outputs over any batch split
    * equals [[FuzzyJoin.editDistance1Pairs]] over the full corpus. */
  def matchBatch(batch: DataFrame, store: KeyStore, idCol: String, strCol: String,
                 batchId: Long): DataFrame = {
    val bk = FuzzyJoin.deletionKeys(batch, idCol, strCol)
    val prior = store.postings.filter(F.col("batch_id") =!= batchId)
      .select("key", "id", "s")
    val cross = FuzzyJoin.verifyPairs(bk, prior, ordered = false)
    val within = FuzzyJoin.verifyPairs(bk, bk, ordered = true)
    val pairs = cross.select(
        F.least(F.col("id_a"), F.col("id_b")).as("id_a"),
        F.greatest(F.col("id_a"), F.col("id_b")).as("id_b"),
        F.col("dist"))
      .unionByName(within)
      .distinct()
    store.append(bk, batchId)
    pairs
  }
}
