package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Skyline

/** Streaming Pareto skyline: rows arrive in micro-batches and the
  * nondominated set over EVERYTHING streamed so far is re-derivable at
  * any time.
  *
  * The accumulating state is the batch operator's own step-3 argument
  * turned into a storage layout: skylines are CLOSED UNDER UNION (a row
  * dominated in the full set is dominated by some row of its own
  * batch's skyline or of another batch's — dominance is transitive and
  * the dominator of a dominator dominates), so persisting each batch's
  * LOCAL skyline and re-skylining the union on read is exact, the
  * StreamingItemsets partial-counts pattern with "count" replaced by
  * "nondominated subset". Each batch writes its survivors under
  * `batch_id=` (replay-idempotent overwrite — a replayed batch rewrites
  * the same rows); a crash between batches loses nothing because every
  * batch's partial is self-contained.
  *
  * State stays bounded by the skyline sizes, not the stream: a batch
  * partial is that batch's skyline only, and the read-side merge
  * re-runs the full pivot-prefilter + local/global BNL over partials
  * that are each already reduced. */
object StreamingSkyline {

  def attach(
      rows: DataFrame,
      checkpointDir: String,
      partsDir: String,
      dims: Seq[(String, Boolean)],
      triggerMillis: Long = 1000L): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Skyline.skyline(batch, dims)
          .write.mode(SaveMode.Overwrite).parquet(s"$partsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** The exact skyline over everything streamed so far: union of the
    * per-batch local skylines, re-skylined. Empty (schema-less) frame
    * before the first batch lands. */
  def skylineNow(spark: SparkSession, partsDir: String,
                 dims: Seq[(String, Boolean)]): DataFrame =
    try {
      val parts = spark.read.parquet(partsDir).drop("batch_id")
      Skyline.skyline(parts, dims)
    } catch {
      // no partials yet: directory absent or empty — an empty board, not a throw
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") || e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
        spark.emptyDataFrame
    }
}
