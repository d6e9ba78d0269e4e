package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalJaccardJoin

/** Streaming exact Jaccard similarity join at ingest: a stream of
  * (doc_id, text) documents → `foreachBatch` →
  * [[IncrementalJaccardJoin.matchBatch]] → matched-pair parquet. Each
  * micro-batch probes the persisted prefix postings of everything seen
  * before under the frozen total token order, emits its threshold-passing
  * pairs, and appends its postings — exactly-once pairs under
  * crash/restart by the [[StreamingFuzzyJoin]] argument (replay-stable
  * matchBatch + overwrite-by-batch-id pair sink). */
object StreamingJaccardJoin {

  def attach(
      docs: DataFrame,
      checkpointDir: String,
      store: IncrementalJaccardJoin.Store,
      pairsDir: String,
      tauNum: Int,
      tauDen: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      triggerMillis: Long = 1000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pairs = IncrementalJaccardJoin.matchBatch(
          batch, store, idCol, textCol, tauNum, tauDen, batchId)
        pairs.write.mode(SaveMode.Overwrite)
          .parquet(s"$pairsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** File-source wiring: each line is `<doc_id>\t<text>`. */
  def fromFiles(
      spark: SparkSession,
      docsDir: String,
      checkpointDir: String,
      store: IncrementalJaccardJoin.Store,
      pairsDir: String,
      tauNum: Int,
      tauDen: Int,
      triggerMillis: Long = 1000L): StreamingQuery = {
    val docs = spark.readStream.text(docsDir)
      .select(F.split(F.col("value"), "\t", 2).as("p"))
      .select(
        F.element_at(F.col("p"), 1).cast("long").as("doc_id"),
        F.element_at(F.col("p"), 2).as("text"))
    attach(docs, checkpointDir, store, pairsDir, tauNum, tauDen)
  }

  /** All matched pairs across batches, deduplicated. */
  def pairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .select("id_a", "id_b", "jac").distinct()
}
