package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{ManifestTable, MaterializedView}

/** Streaming-maintained materialized view: a stream of rows →
  * `foreachBatch` → one atomic [[ManifestTable.commit]] per micro-batch →
  * [[MaterializedView.refreshIncremental]]. Appends are insert-only, so
  * every refresh after the first takes the INCREMENTAL path — each
  * micro-batch runs the view query over the batch alone and merges into
  * the cached result; the serveable aggregate is always one O(1)
  * version check behind the stream, and no batch ever rescans the table.
  *
  * Crash/restart: the manifest commit is atomic and the MV stamp trails
  * it, so a replayed batch re-commits its rows (a second manifest — the
  * at-least-once caveat of bare commit; put [[ManifestTable.merge]] here
  * if the source cannot guarantee effectively-once delivery) and the
  * next refresh folds the delta in. The view never serves a half-applied
  * batch: readers see the previous stamp until the new result swaps. */
object StreamingMaterializedView {

  def attach(
      rows: DataFrame,
      checkpointDir: String,
      table: ManifestTable,
      view: MaterializedView,
      merge: (DataFrame, DataFrame) => DataFrame,
      triggerMillis: Long = 1000L): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        table.commit(batch)
        view.refreshIncremental(merge)
        ()
      }
      .start()
}
