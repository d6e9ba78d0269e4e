package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transactional table layer for MULTI-WRITER appends — the
  * single-writer stores (ParquetEventStore) rely on one collector owning
  * the directory; when several pipelines append to a shared table on
  * object-store-like storage, bare `mode(Append)` interleaves partial
  * writes. This is the classic manifest-log design (the core idea of
  * modern table formats, reduced to appends):
  *
  *  - a commit writes its parquet files into a unique data subdirectory
  *    (invisible to readers), writes the file list to a tmp manifest, then
  *    CLAIMS the next slot in a monotonically numbered log by exclusively
  *    creating a `.claim` marker (O_EXCL — atomic on POSIX via
  *    `File.createNewFile` and on HDFS via create-no-overwrite; plain
  *    rename is NOT a safe claim because POSIX rename overwrites an
  *    existing destination). Racing writers serialize by retrying onto
  *    subsequent slots with no lock service. The claimed slot's manifest
  *    is then published by renaming the fully-written tmp file — readers
  *    never observe partial manifest content;
  *  - a read lists published manifests and scans exactly the files they
  *    name: a crashed commit (data and/or claim without a manifest) is
  *    invisible, and every snapshot is the result of a prefix of commits;
  *  - `vacuum(maxAgeMs)` deletes debris no manifest references — data
  *    directories, tmp manifests, and claims without manifests — but only
  *    when older than `maxAgeMs`, so it can never race an in-flight
  *    commit that is younger than the threshold.
  */
final class ManifestTable(spark: SparkSession, dir: String) {
  private val dataDir = new Path(s"$dir/data")
  private val manifestDir = new Path(s"$dir/manifests")
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  def init(): Unit = {
    fs.mkdirs(dataDir)
    fs.mkdirs(manifestDir)
  }

  private def slotPath(slot: Long): Path = new Path(manifestDir, f"$slot%012d.manifest")
  private def claimPath(slot: Long): Path = new Path(manifestDir, f"$slot%012d.claim")

  private def listManifests(): Seq[Path] =
    fs.listStatus(manifestDir)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .sortBy(_.getPath.getName)
      .map(_.getPath)
      .toSeq

  /** Next unclaimed slot: one past the highest claim OR manifest. */
  private def nextSlot(): Long = {
    val nums = fs.listStatus(manifestDir).map(_.getPath.getName).collect {
      case n if n.endsWith(".manifest") => n.stripSuffix(".manifest").toLong
      case n if n.endsWith(".claim") => n.stripSuffix(".claim").toLong
    }
    if (nums.isEmpty) 0L else nums.max + 1L
  }

  /** Atomic slot claim. Local filesystems go through `File.createNewFile`
    * (true O_EXCL); other filesystems use create-without-overwrite, which
    * HDFS implements atomically (on S3-style stores swap this for a
    * conditional PUT — the protocol is unchanged). */
  private def claimSlot(slot: Long): Boolean =
    try {
      val p = claimPath(slot)
      if (fs.getScheme == "file") new java.io.File(p.toUri.getPath).createNewFile()
      else { val o = fs.create(p, false); o.close(); true }
    } catch { case _: java.io.IOException => false }

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
    var slot = nextSlot()
    while (!claimSlot(slot)) slot += 1
    // uncontended publish: the slot is ours; rename is atomic, so readers
    // see either no manifest or the complete file list
    fs.rename(tmp, slotPath(slot))
    slot
  }

  /** Snapshot read: exactly the files named by published manifests. */
  def snapshot: DataFrame = snapshotWith(None)

  /** Schema-stable snapshot: readable (with zero rows) before the first
    * commit, where the schemaless default would fail to resolve columns. */
  def snapshot(schema: StructType): DataFrame = snapshotWith(Some(schema))

  private def snapshotWith(schema: Option[StructType]): DataFrame = {
    val files = listManifests().flatMap(readLines)
      .map(rel => new Path(dataDir, rel).toString)
    (files, schema) match {
      case (Nil, Some(s)) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (Nil, None) => spark.emptyDataFrame
      case (paths, Some(s)) => spark.read.schema(s).parquet(paths: _*)
      case (paths, None) => spark.read.parquet(paths: _*)
    }
  }

  private def readLines(m: Path): Seq[String] = {
    val in = fs.open(m)
    try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
    finally in.close()
  }

  /** Number of published manifests (the table version). */
  def version(): Long = listManifests().size.toLong

  /** Delete failed-commit debris older than `maxAgeMs`: data directories
    * referenced by no manifest, stale tmp manifests, and claims whose
    * manifest never published. The age gate guarantees an in-flight
    * commit younger than the threshold is never touched. Returns the
    * number of items removed. */
  def vacuum(maxAgeMs: Long = 3600000L): Long = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val referenced = listManifests().flatMap(readLines).map(_.split("/")(0)).toSet
    val published = listManifests().map(_.getName.stripSuffix(".manifest")).toSet
    val orphanDirs = fs.listStatus(dataDir)
      .filter(d => d.isDirectory && d.getModificationTime < cutoff)
      .filterNot(d => referenced.contains(d.getPath.getName))
    val staleTmp = fs.listStatus(manifestDir)
      .filter(f => f.getPath.getName.startsWith("_tmp_") && f.getModificationTime < cutoff)
    val staleClaims = fs.listStatus(manifestDir)
      .filter(f => f.getPath.getName.endsWith(".claim") && f.getModificationTime < cutoff)
      .filterNot(f => published.contains(f.getPath.getName.stripSuffix(".claim")))
    val all = orphanDirs ++ staleTmp ++ staleClaims
    all.foreach(f => fs.delete(f.getPath, true))
    all.length.toLong
  }
}
