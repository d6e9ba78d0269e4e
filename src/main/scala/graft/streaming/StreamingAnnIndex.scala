package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.AnnIndexStore

/** Streaming maintenance of the persisted IVF+PQ index — the
  * train-rarely/encode-always split running continuously: a stream of
  * (id, vector) rows → `foreachBatch` → encode against the FROZEN model →
  * the batch's own `batch_id=<n>` codes partition.
  *
  * Exactly-once codes under crash/restart, from two pieces:
  *  - encoding is a deterministic map-only pass against the frozen model,
  *    so a replayed micro-batch produces identical rows;
  *  - [[AnnIndexStore.appendBatchIdempotent]] overwrites the batch's OWN
  *    partition directory, so the replay rewrites instead of duplicating
  *    (a duplicated cid would surface twice in search top-k).
  * Searches read the table as of any trigger boundary and serve without
  * retraining ([[AnnIndexStore.search]]). */
object StreamingAnnIndex {

  /** Attach index maintenance to any streaming frame carrying
    * (`idCol`, `vecCol`). The store must already be [[AnnIndexStore.build]]t
    * — the stream only encodes. */
  def attach(
      embeddings: DataFrame,
      checkpointDir: String,
      store: AnnIndexStore,
      idCol: String,
      vecCol: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendBatchIdempotent(batch, idCol, vecCol, batchId)
        ()
      }
      .start()
}
