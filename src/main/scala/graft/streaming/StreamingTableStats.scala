package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TableStats

/** Streaming statistics maintenance — the Informer loop for table stats:
  * each micro-batch emits its [[TableStats.partialStats]] (counts + HLL
  * sketches, one scan of the BATCH) into a batch-id partition;
  * [[merged]] folds all partials into current per-column stats. The
  * table itself is never rescanned — at 100 TB the planner's statistics
  * stay fresh at ingest cost, and replay overwrites its own partition
  * (idempotent, the streaming-sink recipe used across this repo). */
object StreamingTableStats {

  def attach(
      rows: DataFrame,
      checkpointDir: String,
      statsDir: String,
      cols: Seq[String],
      triggerMillis: Long = 1000L): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TableStats.partialStats(batch, cols)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$statsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Current merged per-column stats across every batch seen so far. */
  def merged(spark: SparkSession, statsDir: String): DataFrame =
    TableStats.mergeStats(
      spark.read.option("basePath", statsDir).parquet(statsDir)
        .select("col_name", "n_rows", "n_nulls", "ndv_sketch"))
}
