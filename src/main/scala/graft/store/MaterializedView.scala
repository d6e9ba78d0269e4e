package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialized view over a [[ManifestTable]] source, invalidated by the
  * source's VERSION rather than by time: the cached result is stamped
  * with the manifest version it was computed from, a read serves the
  * parquet result while the stamp matches, and any commit (append, merge,
  * delete) moves the version and forces recomputation. At 100 TB the
  * point is that freshness checking is an O(1) metadata read — never a
  * scan, never a "is the cache stale?" heuristic.
  *
  * [[refreshIncremental]] adds self-maintenance for DISTRIBUTIVE queries
  * (per-group counts/sums — anything where result(a ∪ b) =
  * merge(result(a), result(b))): if every change since the stamp is an
  * insert (the [[ManifestTable.changes]] feed says so), the query runs
  * over the DELTA only and merges into the cached result; with an
  * `unmerge` inverse supplied, delete deltas are SUBTRACTED instead of
  * forcing a full recompute (count/sum have inverses; min/max don't).
  * That is classic incremental view maintenance, costed by the change,
  * not the table. */
final class MaterializedView(
    spark: SparkSession,
    dir: String,
    source: ManifestTable,
    query: DataFrame => DataFrame) {

  private val dataDir = s"$dir/data"
  private val stampPath = new Path(s"$dir/_source_version")
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def readStamp(): Option[Long] =
    if (!fs.exists(stampPath)) None
    else {
      val in = fs.open(stampPath)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      catch { case _: Exception => None }
      finally in.close()
    }

  private def writeResult(df: DataFrame, version: Long): Unit = {
    val tmp = s"$dataDir._tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new Path(dataDir)
    if (fs.exists(p)) fs.delete(p, true)
    // abort BEFORE stamping: a failed rename must not stamp a version
    // whose data directory is missing
    StoreIO.renameOrAbort(fs, new Path(tmp), p, "MV swap")
    val out = fs.create(stampPath, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The view contents plus whether the cache served it (false = this
    * call recomputed). */
  def readWithStatus(): (DataFrame, Boolean) = {
    val current = source.version()
    readStamp() match {
      case Some(v) if v == current && fs.exists(new Path(dataDir)) =>
        (spark.read.parquet(dataDir), true)
      case _ =>
        // Pin the data to the version we stamp: a commit landing between
        // version() and an unpinned snapshot read would cache v+1 data
        // under stamp v, and the next insert-only incremental refresh
        // would merge the v->v+1 delta a second time.
        val result = query(source.snapshotAt(current))
        writeResult(result, current)
        (spark.read.parquet(dataDir), false)
    }
  }

  def read(): DataFrame = readWithStatus()._1

  /** Incremental refresh for distributive queries: `merge(cached,
    * query(delta))` must equal `query(full)` when `delta` is pure
    * inserts. Returns "incremental" | "full" | "fresh" describing what
    * this call did; non-insert changes (merge/delete upstream) or a
    * missing cache force the full path. */
  def refreshIncremental(merge: (DataFrame, DataFrame) => DataFrame): String =
    refreshIncremental(merge, None)

  /** Delete-aware incremental refresh (round-10 verdict item 4): for
    * DISTRIBUTIVE-WITH-INVERSE aggregates (count, sum — avg as sum+count)
    * the [[ManifestTable.changes]] feed's delete side is just a
    * subtraction, so upstream MERGE/DELETE traffic no longer forces a
    * full recompute:
    *
    *   result' = unmerge(merge(cached, query(inserts)), query(deletes))
    *
    * `unmerge(acc, deleted)` must subtract the per-group contributions in
    * `deleted` from `acc` (and drop groups whose count reaches zero — the
    * caller knows its own schema). An updated key arrives as
    * delete(old) + insert(new), so the pair nets to the correct new
    * state; copy-on-write carry-over noise is already cancelled inside
    * `changes()`. Non-invertible queries (min/max, distinct counts) keep
    * the single-argument overload and fall back to the full path on any
    * delete. At 100 TB this is the difference between costing a refresh
    * by the CHANGE and re-scanning a MERGE-heavy table forever. */
  def refreshIncremental(
      merge: (DataFrame, DataFrame) => DataFrame,
      unmerge: (DataFrame, DataFrame) => DataFrame): String =
    refreshIncremental(merge, Some(unmerge))

  private def refreshIncremental(
      merge: (DataFrame, DataFrame) => DataFrame,
      unmerge: Option[(DataFrame, DataFrame) => DataFrame]): String = {
    import org.apache.spark.sql.{functions => F}
    val current = source.version()
    readStamp() match {
      case Some(v) if v == current && fs.exists(new Path(dataDir)) => "fresh"
      case Some(v) if fs.exists(new Path(dataDir)) =>
        // changes() re-reads the CDF file diff and re-runs its exceptAll
        // shuffles on EVERY evaluation — this path consults the delta up
        // to four times (emptiness, delete split, two query() legs), so
        // pin it once; the whole point is costing the refresh by the
        // change, not 4x the change
        val delta = source.changes(v, current).persist()
        try {
          if (delta.isEmpty) {
            // versions moved but the net row delta is empty: stamp only
            val out = fs.create(stampPath, true)
            try out.write(current.toString.getBytes("UTF-8")) finally out.close()
            "incremental"
          } else {
            val deletes = delta.filter(F.col("_change_type") === "delete")
            if (deletes.isEmpty) {
              val merged = merge(
                spark.read.parquet(dataDir),
                query(delta.drop("_change_type")))
              writeResult(merged, current)
              "incremental"
            } else unmerge match {
              case Some(um) =>
                val inserts = delta.filter(F.col("_change_type") === "insert")
                  .drop("_change_type")
                val added = merge(spark.read.parquet(dataDir), query(inserts))
                val merged = um(added, query(deletes.drop("_change_type")))
                writeResult(merged, current)
                "incremental"
              case None =>
                writeResult(query(source.snapshotAt(current)), current)
                "full"
            }
          }
        } finally delta.unpersist()
      case _ =>
        writeResult(query(source.snapshotAt(current)), current)
        "full"
    }
  }
}
