package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table layer for MULTI-WRITER appends — the
  * single-writer stores (ParquetEventStore) rely on one collector owning
  * the directory; when several pipelines append to a shared table on
  * object-store-like storage, bare `mode(Append)` interleaves partial
  * writes. This is the classic manifest-log design (the core idea of
  * modern table formats, reduced to appends):
  *
  *  - a commit writes its parquet files into a unique data subdirectory
  *    (invisible to readers), then publishes them by claiming the next
  *    slot in a monotonically numbered manifest log via ATOMIC RENAME —
  *    rename fails if the slot exists, so two racing writers serialize by
  *    retrying onto subsequent slots, with no lock service;
  *  - a read lists the manifest log and scans exactly the files the
  *    manifests name: a crashed commit (data written, no manifest) is
  *    invisible, and every snapshot is the result of a prefix of commits;
  *  - `vacuum()` deletes data directories no manifest references
  *    (crash debris), safe to run any time.
  *
  * Rename-if-absent is atomic on HDFS and POSIX filesystems; on S3-style
  * stores, swap the slot claim for a conditional PUT — the protocol is
  * unchanged. */
final class ManifestTable(spark: SparkSession, dir: String) {
  private val dataDir = new Path(s"$dir/data")
  private val manifestDir = new Path(s"$dir/manifests")
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  def init(): Unit = {
    fs.mkdirs(dataDir)
    fs.mkdirs(manifestDir)
  }

  private def slotPath(slot: Long): Path =
    new Path(manifestDir, f"$slot%012d.manifest")

  private def listManifests(): Seq[Path] =
    fs.listStatus(manifestDir)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .sortBy(_.getPath.getName)
      .map(_.getPath)
      .toSeq

  private def nextSlot(): Long =
    listManifests().lastOption
      .map(_.getName.stripSuffix(".manifest").toLong + 1L)
      .getOrElse(0L)

  /** Append `df` as one atomic commit; returns the claimed slot. */
  def commit(df: DataFrame): Long = {
    val batchId = java.util.UUID.randomUUID().toString
    val batchDir = new Path(dataDir, batchId)
    df.write.parquet(batchDir.toString)
    val files = fs.listStatus(batchDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s"$batchId/${s.getPath.getName}")
    val tmp = new Path(manifestDir, s"_tmp_$batchId")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    // claim a slot: atomic rename fails if a racing writer got there first
    var slot = nextSlot()
    while (!fs.rename(tmp, slotPath(slot))) slot += 1
    slot
  }

  /** Snapshot read: exactly the files named by committed manifests. */
  def snapshot: DataFrame = {
    val files = listManifests().flatMap { m =>
      val in = fs.open(m)
      try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    }.map(rel => new Path(dataDir, rel).toString)
    if (files.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Number of committed manifests (the table version). */
  def version(): Long = listManifests().size.toLong

  /** Delete data directories referenced by NO manifest (failed-commit
    * debris). Returns the number of directories removed. */
  def vacuum(): Long = {
    val referenced = listManifests().flatMap { m =>
      val in = fs.open(m)
      try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    }.map(_.split("/")(0)).toSet
    val orphans = fs.listStatus(dataDir)
      .filter(_.isDirectory)
      .filterNot(d => referenced.contains(d.getPath.getName))
    orphans.foreach(d => fs.delete(d.getPath, true))
    orphans.length.toLong
  }
}
