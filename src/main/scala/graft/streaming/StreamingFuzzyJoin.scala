package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalFuzzyJoin

/** Streaming entity resolution at ingest: a stream of (id, s) records →
  * `foreachBatch` → [[IncrementalFuzzyJoin.matchBatch]] → matched-pair
  * parquet. Each arriving micro-batch probes the persisted deletion-key
  * postings of everything seen before, emits its edit-distance-≤1 matches
  * (cross-batch AND within-batch), and appends its own keys — the history
  * is never re-blocked.
  *
  * End-to-end exactly-once pairs under crash/restart, the
  * [[StreamingDedup]] recipe:
  *  - matchBatch is replay-STABLE: a re-run batch (foreachBatch is
  *    at-least-once) excludes its own `batch_id` partition from the probe
  *    side and its key append overwrites that same partition, so a replay
  *    sees identical prior state and re-derives identical pairs;
  *  - the pair sink is idempotent: each batch overwrites its own
  *    `batch_id=<n>` partition directory, so a replay rewrites identical
  *    rows instead of appending duplicates.
  * The union of per-batch pair outputs over any batch split equals
  * [[graft.operators.FuzzyJoin.editDistance1Pairs]] over the full corpus
  * (pairs are id-normalized across both origins).
  */
object StreamingFuzzyJoin {

  /** Attach the fuzzy-join stage to any streaming frame of (id, s). */
  def attach(
      records: DataFrame,
      checkpointDir: String,
      store: IncrementalFuzzyJoin.KeyStore,
      pairsDir: String,
      idCol: String = "id",
      strCol: String = "s",
      triggerMillis: Long = 1000L): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pairs = IncrementalFuzzyJoin.matchBatch(
          batch, store, idCol, strCol, batchId)
        pairs.write.mode(SaveMode.Overwrite)
          .parquet(s"$pairsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** File-source wiring: each line is `<id>\t<string>`. A production
    * deployment points `attach` at a Kafka topic — only this source block
    * changes. */
  def fromFiles(
      spark: SparkSession,
      recordsDir: String,
      checkpointDir: String,
      store: IncrementalFuzzyJoin.KeyStore,
      pairsDir: String,
      triggerMillis: Long = 1000L): StreamingQuery = {
    val records = spark.readStream.text(recordsDir)
      .select(F.split(F.col("value"), "\t", 2).as("p"))
      .select(
        F.element_at(F.col("p"), 1).cast("long").as("id"),
        F.element_at(F.col("p"), 2).as("s"))
    attach(records, checkpointDir, store, pairsDir)
  }

  /** All matched pairs across batches (partition-discovered batch_id
    * dirs), deduplicated: a pair that matched when B arrived is the same
    * row a later replay re-derives. */
  def pairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .select("id_a", "id_b", "dist").distinct()
}
