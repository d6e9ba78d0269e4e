package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.HeavyHittersAggregator

/** Streaming heavy hitters: a stream of string keys → per-micro-batch
  * Misra-Gries summaries persisted as `batch_id`-partitioned partials →
  * a merged corpus summary on read. The storage IS the mergeable-summary
  * contract: each partial is ≤ k counters, a replayed batch overwrites
  * its own partition (idempotent under at-least-once foreachBatch), and
  * the read-side merge — sum per item, subtract the (k+1)-th largest
  * summed count, keep positives — is the Agarwal et al. multi-way merge,
  * so the n/(k+1) presence/error guarantees hold over the whole stream.
  * With cardinality ≤ k nothing is ever subtracted and the summary is
  * EXACT. */
object StreamingHeavyHitters {

  def attach(
      keys: DataFrame,
      checkpointDir: String,
      summariesDir: String,
      k: Int,
      keyCol: String = "item",
      triggerMillis: Long = 1000L): StreamingQuery = {
    val hh = F.udaf(new HeavyHittersAggregator(k), Encoders.STRING)
    keys.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.agg(hh(F.col(keyCol)).as("hh"))
          .select(F.explode(F.col("hh.items")).as(Seq("item", "est")))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$summariesDir/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** The merged stream-wide summary (≤ k items). The threshold collect is
    * bounded at k+1 rows — never the key space. */
  def summary(spark: SparkSession, summariesDir: String, k: Int): DataFrame = {
    val partials = spark.read.option("basePath", summariesDir).parquet(summariesDir)
      .select("item", "est")
    mergeSummaries(partials, k)
  }

  /** Multi-way MG merge over partial-summary rows (item, est): sum per
    * item, subtract the (k+1)-th largest sum, keep positives. */
  def mergeSummaries(partials: DataFrame, k: Int): DataFrame = {
    val summed = partials.groupBy("item").agg(F.sum("est").as("est"))
    val top = summed.orderBy(F.col("est").desc, F.col("item"))
      .limit(k + 1).collect() // <= k+1 rows by construction
    val cut = if (top.length <= k) 0L else top.last.getAs[Long]("est")
    summed.filter(F.col("est") > cut)
      .select(F.col("item"), (F.col("est") - cut).as("est"))
  }
}
