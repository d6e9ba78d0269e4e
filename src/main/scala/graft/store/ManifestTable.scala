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

  /** The STABLE prefix of the manifest log: published manifests up to (not
    * including) the first slot whose claim has no manifest yet. Slots can
    * publish out of order under the multi-writer contract (A claims 5, B
    * claims 6 and publishes first) — counting ALL published manifests
    * would let version 5 mean {slot 6} now and {slot 5} after A lands,
    * silently shifting what a stamped snapshot/MV version refers to. By
    * stopping at the first pending claim, a manifest's position in the
    * prefix is fixed the moment it enters it: nothing can ever publish
    * into an earlier slot, because that slot would have had a pending
    * claim and the prefix would have stopped there. A CRASHED claim
    * (writer died between claim and publish) holds the version back only
    * until `vacuum` ages it out, after which the prefix resumes past the
    * dead slot — same age-gated contract as data debris. */
  private def stableManifests(): Seq[Path] = {
    val names = fs.listStatus(manifestDir).map(_.getPath.getName)
    val published = names.collect {
      case n if n.endsWith(".manifest") => n.stripSuffix(".manifest").toLong
    }.sorted
    val publishedSet = published.toSet
    val pending = names.collect {
      case n if n.endsWith(".claim") &&
        !publishedSet.contains(n.stripSuffix(".claim").toLong) =>
        n.stripSuffix(".claim").toLong
    }
    val firstPending = if (pending.isEmpty) Long.MaxValue else pending.min
    published.takeWhile(_ < firstPending).map(slotPath).toSeq
  }

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
    * conditional PUT — the protocol is unchanged). After the exclusive
    * create wins, the writer's OWNER TOKEN is written into the claim:
    * publish re-verifies the token, so a claim that was vacuumed and then
    * RE-CLAIMED by another writer (slot numbers are reused once the
    * vacuumed claim was the highest) reads as foreign and the stalled
    * writer aborts instead of publishing over the new owner. */
  private def claimSlot(slot: Long, token: String): Boolean = {
    val won =
      try {
        val p = claimPath(slot)
        if (fs.getScheme == "file") new java.io.File(p.toUri.getPath).createNewFile()
        else { val o = fs.create(p, false); o.close(); true }
      } catch { case _: java.io.IOException => false }
    if (won) {
      // we own the file now; an overwrite is safe (and a vacuum racing
      // this write just leaves a missing/foreign claim that publish
      // detects — the failure lands on the abort side, never lost-update)
      val out = fs.create(claimPath(slot), true)
      try out.write(token.getBytes("UTF-8")) finally out.close()
    }
    won
  }

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
    while (!claimSlot(slot, batchId)) slot += 1
    // uncontended publish: the slot is ours; rename is atomic, so readers
    // see either no manifest or the complete file list
    publishOrAbort(tmp, slot, batchId)
    slot
  }

  /** Snapshot read: exactly the files named by published manifests. */
  def snapshot: DataFrame = snapshotWith(None, None)

  /** Schema-stable snapshot: readable (with zero rows) before the first
    * commit, where the schemaless default would fail to resolve columns. */
  def snapshot(schema: StructType): DataFrame = snapshotWith(Some(schema), None)

  /** Time travel: the table as of `version` commits (the state `version()`
    * reported then). Every snapshot is a prefix of the manifest log, so
    * old versions stay readable until `vacuum` of removed files (which
    * only touches UNREFERENCED debris — rewritten files stay on disk,
    * referenced by the older manifests that named them). */
  def snapshotAt(version: Long): DataFrame = snapshotWith(None, Some(version))
  def snapshotAt(version: Long, schema: StructType): DataFrame =
    snapshotWith(Some(schema), Some(version))

  /** Fold the manifest log (optionally a prefix) into the live file set:
    * plain lines add a file, `-`-prefixed lines remove one (the merge /
    * delete rewrite marker). Pre-merge manifests are all plain lines, so
    * the append-only format reads unchanged. */
  private def liveFiles(upTo: Option[Long]): Seq[String] = {
    val stable = stableManifests()
    val ms = upTo.fold(stable)(v => stable.take(v.toInt))
    val live = scala.collection.mutable.LinkedHashSet[String]()
    ms.foreach(m => readLines(m).foreach { l =>
      if (l.startsWith("-")) live -= l.substring(1) else live += l
    })
    live.toSeq
  }

  /** Fold of ALL published manifests in slot order — OCC validation only.
    * The stable prefix is the wrong lens for conflict detection: a writer
    * validating mid-commit holds its own still-unpublished claim, which
    * truncates the prefix below its slot, so a conflicting rewrite that
    * published at a HIGHER slot between snapshot-read and validation would
    * be invisible and two merges removing the same file would both land
    * (lost update). Reads (version/snapshot/changes) keep the stable
    * prefix for position stability; validation must see everything. */
  private def liveFilesAll(): Set[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    listManifests().foreach(m => readLines(m).foreach { l =>
      if (l.startsWith("-")) live -= l.substring(1) else live += l
    })
    live.toSet
  }

  private def snapshotWith(schema: Option[StructType], upTo: Option[Long]): DataFrame = {
    val files = liveFiles(upTo).map(rel => new Path(dataDir, rel).toString)
    (files, schema) match {
      case (Nil, Some(s)) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (Nil, None) => spark.emptyDataFrame
      case (paths, Some(s)) => spark.read.schema(s).parquet(paths: _*)
      case (paths, None) =>
        // Additive schema evolution: commits may widen the schema over
        // time; a snapshot unions the per-file schemas (old files read
        // the new columns as NULL). Column RENAMES/drops need a rewrite
        // (merge) — same as every parquet-based table format.
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** Log-native compaction: rewrite the current live file set as one
    * coalesced commit (removes + adds in a single manifest) — the
    * small-files cure for high-frequency commit streams. Readers see the
    * old or the new layout atomically; time travel before the compaction
    * still resolves (removed files stay on disk, referenced by older
    * manifests). OCC: aborts if a concurrent rewrite removed any of the
    * files being compacted. Returns (files before, files after). */
  def compact(targetFiles: Int = 1): (Long, Long) = {
    import org.apache.spark.sql.{functions => F}
    val readVersion = version()
    val live = liveFiles(Some(readVersion))
    if (live.isEmpty) return (0L, 0L)
    val snap = spark.read.option("mergeSchema", "true")
      .parquet(live.map(rel => new Path(dataDir, rel).toString): _*)
      .repartition(targetFiles)
    val batchId = java.util.UUID.randomUUID().toString
    val batchDir = new Path(dataDir, batchId)
    snap.write.parquet(batchDir.toString)
    val added = fs.listStatus(batchDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s"$batchId/${s.getPath.getName}").toSeq
    val lines = live.sorted.map("-" + _) ++ added
    val tmp = new Path(manifestDir, s"_tmp_$batchId")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    var slot = nextSlot()
    while (!claimSlot(slot, batchId)) slot += 1
    val liveNow = liveFilesAll()
    if (!live.toSet.subsetOf(liveNow)) {
      fs.delete(tmp, false)
      fs.delete(batchDir, true)
      throw new java.util.ConcurrentModificationException(
        s"compact computed against version $readVersion conflicts with a published rewrite")
    }
    publishOrAbort(tmp, slot, batchId)
    (live.size.toLong, added.size.toLong)
  }

  /** MERGE (upsert by `key`): target rows whose key appears in `source`
    * are replaced by the source row; source rows with no match are
    * inserted. Copy-on-write at FILE granularity — only files that
    * contain a matched key are rewritten (located by one semi-join over
    * `input_file_name`), every other file is untouched, so a merge that
    * hits 0.1% of a 100 TB table rewrites ~0.1% of its files. The commit
    * publishes remove markers for the rewritten files plus the new files
    * as ONE manifest — readers see the old or the new table, never both
    * copies of an updated row.
    *
    * Optimistic concurrency: pass `expectedVersion` (from `version()` /
    * a previous commit) to pin the snapshot the merge was computed
    * against; if a commit published since then removed any file this
    * merge rewrites, the claim is abandoned (invisible to readers,
    * vacuumable) and ConcurrentModificationException is thrown — re-read
    * and retry. Plain appends never conflict. `source` must carry the
    * table schema. Returns the claimed slot. */
  def merge(source: DataFrame, key: String, expectedVersion: Option[Long] = None): Long =
    rewriteCommit(source, key, insert = Some(source), expectedVersion)

  /** DELETE by key (the GDPR shape): target rows whose `key` appears in
    * `keys` are removed, with the same file-granular copy-on-write and
    * concurrency contract as `merge`. */
  def deleteByKey(keys: DataFrame, key: String, expectedVersion: Option[Long] = None): Long =
    rewriteCommit(keys, key, insert = None, expectedVersion)

  private def rewriteCommit(
      matchSide: DataFrame,
      key: String,
      insert: Option[DataFrame],
      expectedVersion: Option[Long]): Long = {
    import org.apache.spark.sql.{functions => F}
    val readVersion = expectedVersion.getOrElse(version())
    val live = liveFiles(Some(readVersion))
    def relOf(uri: String): String = uri.split("/").takeRight(2).mkString("/")
    // Files containing at least one matched key: the collect is bounded by
    // the FILE count, never the row count.
    val touched: Set[String] =
      if (live.isEmpty) Set.empty
      else {
        val liveAbs = live.map(rel => new Path(dataDir, rel).toString)
        spark.read.parquet(liveAbs: _*)
          .withColumn("__file", F.input_file_name())
          .join(matchSide.select(F.col(key)).distinct(), Seq(key), "left_semi")
          .select("__file").distinct()
          .collect().map(r => relOf(r.getString(0))).toSet
      }
    val survivors = if (touched.isEmpty) None else Some {
      val touchedAbs = touched.toSeq.map(rel => new Path(dataDir, rel).toString)
      spark.read.parquet(touchedAbs: _*)
        .join(matchSide.select(F.col(key)).distinct(), Seq(key), "left_anti")
    }
    val newData = (survivors, insert) match {
      case (Some(keep), Some(src)) => Some(keep.unionByName(src.select(keep.columns.map(F.col): _*)))
      case (Some(keep), None) => Some(keep)
      case (None, Some(src)) => Some(src)
      case (None, None) => None // delete matched nothing: no-op commit
    }
    val batchId = java.util.UUID.randomUUID().toString
    val added: Seq[String] = newData.fold(Seq.empty[String]) { df =>
      val batchDir = new Path(dataDir, batchId)
      df.write.parquet(batchDir.toString)
      fs.listStatus(batchDir)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => s"$batchId/${s.getPath.getName}").toSeq
    }
    if (touched.isEmpty && added.isEmpty) return readVersion // pure no-op
    val lines = touched.toSeq.sorted.map("-" + _) ++ added
    val tmp = new Path(manifestDir, s"_tmp_$batchId")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    var slot = nextSlot()
    while (!claimSlot(slot, batchId)) slot += 1
    // OCC validation against ALL published manifests (liveFilesAll, NOT
    // the stable prefix — our own pending claim truncates the prefix
    // below our slot and would hide a conflicting rewrite published at a
    // higher slot): every file we remove must still be live, else a
    // concurrent rewrite won — abandon (claim without manifest =
    // invisible, vacuumable debris). A conflicting writer that publishes
    // between this fold and our rename is the one residual window; its
    // own validation ran against the pre-us log, so two merges racing
    // inside that millisecond window on the SAME files can both land —
    // serialize heavy merge traffic per table, or swap claimSlot for a
    // conditional-PUT commit service on stores that offer one.
    val liveNow = liveFilesAll()
    if (!touched.subsetOf(liveNow)) {
      fs.delete(tmp, false)
      newData.foreach(_ => fs.delete(new Path(dataDir, batchId), true))
      throw new java.util.ConcurrentModificationException(
        s"merge computed against version $readVersion conflicts with a " +
          s"commit published before slot $slot; re-read and retry")
    }
    publishOrAbort(tmp, slot, batchId)
    slot
  }

  /** An unchecked false rename here would make commit()/merge() report a
    * slot that never became visible (the claim is held, the manifest
    * never published). Throwing keeps the contract: a returned slot IS a
    * published commit; a throw leaves a crashed-commit shape vacuum
    * cleans up. */
  private def publishOrAbort(tmp: Path, slot: Long, token: String): Unit = {
    // A writer stalled past vacuum's maxAgeMs can have its claim aged out
    // and the stable prefix resumed past its slot; publishing anyway would
    // retroactively insert a manifest BELOW the prefix and shift what
    // stamped versions mean. Worse, a vacuumed top slot is RE-CLAIMABLE
    // (nextSlot sees it free), so bare existence of the claim file proves
    // nothing — the claim must still carry THIS writer's token. A missing
    // or foreign token aborts (the new owner keeps its slot; our debris is
    // vacuumable). The check-then-rename window is one fs round-trip;
    // maxAgeMs must still exceed any plausible commit duration, which the
    // 1 h default does.
    val claim = claimPath(slot)
    val owned =
      try {
        val in = fs.open(claim)
        try new String(in.readAllBytes(), "UTF-8") == token finally in.close()
      } catch { case _: java.io.IOException => false }
    if (!owned) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"claim ${claim.getName} is missing or re-owned at publish time (commit " +
          "outlived vacuum maxAgeMs) — aborting to preserve the stable-prefix contract")
    }
    StoreIO.renameOrAbort(fs, tmp, slotPath(slot), "manifest publish")
  }

  private def readLines(m: Path): Seq[String] = {
    val in = fs.open(m)
    try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
    finally in.close()
  }

  /** The table version: the length of the STABLE manifest prefix (see
    * `stableManifests`). Monotone and position-stable — `snapshotAt(v)`
    * means the same file set forever, even when racing writers publish
    * slots out of order. */
  def version(): Long = stableManifests().size.toLong

  /** Change data feed between two versions: the row-level delta as
    * (`_change_type` ∈ insert|delete, row...). Computed from the FILE
    * diff of the two snapshots — only files that entered or left the
    * live set are read, so the cost scales with the change, not the
    * table. Copy-on-write noise cancels by bag-semantics exceptAll:
    * a row a merge carried over into a rewritten file appears in both
    * the removed and added file sets and is reported as neither; an
    * updated key surfaces as delete(old) + insert(new). */
  def changes(fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val before = liveFiles(Some(fromVersion)).toSet
    val after = liveFiles(Some(toVersion)).toSet
    def readSet(rels: Set[String]): Option[DataFrame] =
      if (rels.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(rels.toSeq.map(r => new Path(dataDir, r).toString): _*))
    val removed = readSet(before -- after)
    val added = readSet(after -- before)
    (removed, added) match {
      case (None, None) => spark.emptyDataFrame
      case (None, Some(a)) => a.withColumn("_change_type", F.lit("insert"))
      case (Some(r), None) => r.withColumn("_change_type", F.lit("delete"))
      case (Some(r0), Some(a0)) =>
        // A change window spanning a schema-widening commit reads the two
        // file sets with different schemas; exceptAll is POSITIONAL, so
        // both sides must be aligned to the union schema in one fixed
        // column order (old files read the new columns as NULL — the same
        // additive-evolution contract as `snapshot`).
        val union = (a0.columns ++ r0.columns.filterNot(a0.columns.toSet)).toSeq
        def align(df: DataFrame, other: DataFrame): DataFrame = {
          val have = df.columns.toSet
          union.filterNot(have).foldLeft(df) { (d, c) =>
            d.withColumn(c, F.lit(null).cast(other.schema(c).dataType))
          }.select(union.map(F.col): _*)
        }
        val a = align(a0, r0)
        val r = align(r0, a0)
        a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
          .unionByName(r.exceptAll(a).withColumn("_change_type", F.lit("delete")))
    }
  }

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
