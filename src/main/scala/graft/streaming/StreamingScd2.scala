package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{ManifestTable, Scd2}

/** Streaming SCD Type 2 maintenance: a stream of dimension updates →
  * `foreachBatch` → [[Scd2.applyUpdates]] against the manifest-backed
  * dimension. Each micro-batch is one atomic merge commit (changed keys
  * close + reopen, unchanged keys untouched), so readers always see a
  * consistent dimension and both time axes stay queryable mid-stream —
  * `Scd2.asOf` for business time, `snapshotAt` for commit time.
  *
  * Replay: applying an identical batch is a structural no-op (attrs
  * equal current ⇒ skipped), so at-least-once delivery of an unchanged
  * batch re-commits nothing. A replay interleaved with NEW updates for
  * the same key is the usual SCD caveat — feed in business-time order. */
object StreamingScd2 {

  def attach(
      updates: DataFrame,
      checkpointDir: String,
      table: ManifestTable,
      keyCol: String,
      attrCols: Seq[String],
      tsCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Scd2.applyUpdates(table, batch, keyCol, attrCols, tsCol)
        ()
      }
      .start()
}
