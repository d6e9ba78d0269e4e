package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Materialization ("pinning") of intermediates that are consumed more
  * than once or iteratively — the every-operator idiom for cutting
  * lineage and computing a shared frame exactly once.
  *
  * The default (`spark.graft.pin.mode=local`) is an eager
  * `localCheckpoint`: cheapest, plans unchanged from every prior round,
  * and correct in local mode where executor loss cannot happen. Its
  * truncated lineage is NOT recoverable on a real cluster — an executor
  * loss mid-query kills the job — so cluster deployments set:
  *
  *  - `spark.graft.pin.mode=persist`: eager `persist` at
  *    `spark.graft.pin.storageLevel` (default MEMORY_AND_DISK). Lineage
  *    is kept, so lost blocks recompute; storage is released by [[free]]
  *    or GC.
  *  - `spark.graft.pin.mode=reliable`: reliable `checkpoint` to
  *    `spark.checkpoint.dir` (must be set to a fault-tolerant FS).
  *    Survives any executor loss; costs a write+read of the frame.
  *
  * The mode changes WHERE the materialized bytes live, never their
  * content — pinned values are identical in all three modes.
  */
object Pin {

  implicit final class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eagerly materialize this frame per `spark.graft.pin.mode`. */
    def pin(): Dataset[T] = {
      val conf = ds.sparkSession.conf
      conf.get("spark.graft.pin.mode", "local") match {
        case "reliable" => ds.checkpoint(eager = true)
        case "persist" =>
          val lvl = StorageLevel.fromString(
            conf.get("spark.graft.pin.storageLevel", "MEMORY_AND_DISK"))
          val p = ds.persist(lvl)
          p.count() // eager, like localCheckpoint(true)
          p
        case _ => ds.localCheckpoint(eager = true)
      }
    }
  }

  /** Frees the block-storage of a pinned frame, whatever the mode.
    *
    * `Dataset.unpersist` only touches cache-manager entries; an eager
    * local checkpoint's blocks belong to the internal RDD wrapped by the
    * resulting `LogicalRDD` leaf and otherwise live until GC. Iterative
    * drivers (farthest-first selection, PageRank-style loops) call this
    * on round i−1's frame after round i materializes, keeping peak
    * storage at one corpus copy instead of k. Reliable checkpoints hold
    * no executor storage; their files are cleaned by session teardown /
    * `spark.cleaner.referenceTracking.cleanCheckpoints`.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => df.unpersist(false); ()
    }
}
