package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time DECONTAMINATION — the form the benchmark-leak check takes
  * in a continuously-growing corpus: the benchmark suite is FIXED (the
  * natural frozen model, like the ANN index's centroids), so its shingle
  * table and bloom filter are built ONCE at store init, and every NEW
  * training batch is checked map-only against the frozen bloom plus one
  * bounded join against the persisted bench shingles. Hits accumulate in
  * a parquet hit table; the flag read is a plain scan.
  *
  * Per batch:
  *  1. shingle the batch ([[Dedup.wordShingles]], batch-local);
  *  2. drop every bloom-NEGATIVE shingle in-row (the
  *     [[DataShaping.contaminationBloom]] pre-pass with the filter built
  *     once instead of per call — false positives ride into the exact
  *     join, false negatives are impossible);
  *  3. exact-join the surviving sliver against the persisted bench
  *     shingles, count shared windows per (train, bench) pair, keep
  *     pairs at `minShared`;
  *  4. append hits tagged with `batch_id` (replay-stable: rows this
  *     batch id already wrote are anti-joined first, so at-least-once
  *     delivery yields exactly-once hits).
  *
  * Scale shape: the per-batch cost is one shingle pass over the BATCH +
  * a join bounded by the contaminated sliver; nothing ever rescans the
  * accumulated corpus — the hit table grows only with actual leaks. */
object IncrementalContamination {

  /** Parquet-backed store: frozen `bench_shingles/` + one `bloom` bytes
    * file + accumulating `hits/`. Schemas pinned explicitly. */
  final class ContaminationStore(spark: SparkSession, dir: String) {
    private val benchPath = s"$dir/bench_shingles"
    private val bloomPath = new org.apache.hadoop.fs.Path(s"$dir/bench_bloom")
    private val hitsPath = s"$dir/hits"
    private val hitsDdl = "train_id BIGINT, bench_id BIGINT, shared BIGINT, batch_id BIGINT"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def initialized: Boolean = fs.exists(bloomPath)

    /** Freeze the benchmark side: persist its distinct (bench_id,
      * shingle) rows and the bloom over the shingles. Idempotent. */
    def init(bench: DataFrame, idCol: String, textCol: String, n: Int,
             bloomItems: Long = IncrementalDedup.BloomItems,
             bloomBits: Long = IncrementalDedup.BloomBits): Unit = {
      if (initialized) return
      val b = Dedup.wordShingles(bench, idCol, textCol, n)
        .withColumnRenamed("doc", "bench_id")
      b.write.mode(SaveMode.Overwrite).parquet(benchPath)
      val bytes = spark.read.parquet(benchPath)
        .select(graft.functions.BloomSupport
          .bloomAgg(F.col("shingle"), bloomItems, bloomBits).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val out = fs.create(bloomPath, true)
      out.write(bytes); out.close()
      val schema = org.apache.spark.sql.types.StructType.fromDDL(hitsDdl)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Ignore).parquet(hitsPath)
    }

    def benchShingles: DataFrame = spark.read.parquet(benchPath)
    def bloomBytes: Array[Byte] = {
      val len = fs.getFileStatus(bloomPath).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = fs.open(bloomPath)
      try in.readFully(bytes) finally in.close()
      bytes
    }
    def hits: DataFrame =
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(hitsDdl))
        .parquet(hitsPath)
    def appendHits(df: DataFrame): Unit =
      df.select("train_id", "bench_id", "shared", "batch_id")
        .write.mode(SaveMode.Append).parquet(hitsPath)
  }

  /** Check one training batch against the frozen benchmark and append
    * its hits. Returns the batch's hit rows. Replay-stable per
    * `batchId`. */
  def checkBatch(
      batch: DataFrame,
      store: ContaminationStore,
      idCol: String,
      textCol: String,
      n: Int,
      minShared: Long,
      batchId: Long): DataFrame = {
    val bloom = store.bloomBytes
    val sliver = Dedup.wordShingles(batch, idCol, textCol, n)
      .withColumnRenamed("doc", "train_id")
      .filter(graft.functions.BloomSupport
        .mightContain(F.lit(bloom), F.col("shingle")))
    val newHits = sliver.join(store.benchShingles, "shingle")
      .groupBy(F.col("train_id"), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("shared"))
      .filter(F.col("shared") >= minShared)
      .withColumn("batch_id", F.lit(batchId))
    val prior = store.hits.filter(F.col("batch_id") === batchId)
      .select("train_id", "bench_id")
    val fresh = newHits.join(prior, Seq("train_id", "bench_id"), "left_anti")
      // sever lineage from the hits path being appended to
      .pin()
    store.appendHits(fresh)
    fresh
  }

  /** All accumulated hits — identical rows to the batch
    * [[DataShaping.contamination]] over the union of checked batches. */
  def allHits(store: ContaminationStore): DataFrame =
    store.hits.select("train_id", "bench_id", "shared")
}
