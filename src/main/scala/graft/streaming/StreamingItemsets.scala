package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Itemsets
import graft.Pin._

/** Streaming association-rule mining: baskets arrive as (transaction,
  * item) rows and the rule board is re-derivable at any time. The
  * miner's accumulating state is three count families — transactions,
  * items, unordered pairs — all plain sums, persisted per batch under
  * `batch_id=` (replay-idempotent overwrite, the StreamingDrift storage
  * contract) and re-entered through [[Itemsets.rulesFromCounts]].
  *
  * CONTRACT: each transaction must arrive COMPLETE within one
  * micro-batch (the session-window assumption every per-batch
  * co-occurrence count needs) — a basket split across batches would
  * under-count its cross-batch pairs. Batch-side pair counts are
  * written UNPRUNED (a global support threshold cannot be applied to a
  * batch's partial counts); thresholds bind at read time, where the
  * apriori property makes the item filter lossless. Pair volume per
  * batch is Σ per-basket k² — bounded by the item vocabulary for
  * categorical items, the intended use. */
object StreamingItemsets {

  def attach(
      baskets: DataFrame,
      checkpointDir: String,
      countsDir: String,
      tidCol: String,
      itemCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    baskets.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tx = batch
          .select(F.col(tidCol).as("tid"), F.col(itemCol).cast("string").as("item"))
          .filter(F.col("tid").isNotNull && F.col("item").isNotNull)
          .distinct()
          .pin() // three consumers below
        // the three families commit non-atomically: write the DENOMINATOR
        // first, so a read (or crash) between writes sees n_tx ahead of
        // the numerators — supports/confidences UNDER-estimate until the
        // batch replays, and no phantom rule can cross a threshold (the
        // reverse order could inflate support past 1)
        tx.agg(F.countDistinct(F.col("tid")).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$countsDir/tx/batch_id=$batchId")
        tx.groupBy("item").agg(F.count(F.lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$countsDir/items/batch_id=$batchId")
        tx.as("x").join(tx.as("y"),
            F.col("x.tid") === F.col("y.tid") && F.col("x.item") < F.col("y.item"))
          .groupBy(F.col("x.item").as("a"), F.col("y.item").as("b"))
          .agg(F.count(F.lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$countsDir/pairs/batch_id=$batchId")
        ()
      }
      .start()

  /** The rule board over everything streamed so far — the
    * [[Itemsets.assocRules]] output shape. */
  def rulesNow(spark: SparkSession, countsDir: String,
               minSupport: Long, minConfidence: Double): DataFrame = {
    def read(sub: String, keys: Seq[String]) =
      StreamingDrift.readPartials(spark, s"$countsDir/$sub", keys.map(_ -> "string"))
    val nTx = read("tx", Nil)
      .agg(F.coalesce(F.sum("n"), F.lit(0L)).as("n_tx"))
    val itemN = read("items", Seq("item"))
      .groupBy("item").agg(F.sum("n").as("n_item"))
    val pairs = read("pairs", Seq("a", "b"))
      .groupBy("a", "b").agg(F.sum("n").as("n_pair"))
    Itemsets.rulesFromCounts(nTx, itemN, pairs, minSupport, minConfidence)
  }
}
