package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{functions => F}

import graft.store.ManifestTable

/** Multi-writer manifest table: atomic slot-claim commits, snapshot reads
  * that never see uncommitted data, and vacuum of failed-commit debris. */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def newTable() = {
    val t = new ManifestTable(spark, Files.createTempDirectory("graft-manifest").toString)
    t.init()
    t
  }

  it("commits appends atomically and reads them back as a snapshot") {
    val t = newTable()
    t.snapshot.isEmpty shouldBe true
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) shouldBe 0L
    t.commit(Seq((3L, "c")).toDF("id", "v")) shouldBe 1L
    t.version() shouldBe 2L
    t.snapshot.orderBy("id").collect().map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
  }

  it("schema-stable snapshot is readable before the first commit") {
    val t = newTable()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    t.snapshot(schema).select("id").count() shouldBe 0L // resolvable with zero commits
    t.commit(Seq((7L, "x")).toDF("id", "v"))
    t.snapshot(schema).select("id").collect().map(_.getLong(0)) shouldBe Array(7L)
  }

  it("racing writers serialize onto distinct slots and lose no commit") {
    val t = newTable()
    val writers = 4
    val commitsEach = 3
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(writers)
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try (0 until commitsEach).foreach { c =>
            t.commit(Seq((w * 100L + c, s"w$w-c$c")).toDF("id", "v"))
          } finally done.countDown()
        }
      })
    }
    start.countDown()
    done.await(120, TimeUnit.SECONDS) shouldBe true
    pool.shutdown()
    t.version() shouldBe (writers * commitsEach).toLong // every commit claimed a distinct slot
    val rows = t.snapshot.collect().map(_.getString(1)).toSet
    rows.size shouldBe writers * commitsEach // no commit lost or duplicated
  }

  it("out-of-order publishes never shift what a stamped version means") {
    // Writer A claims a slot and stalls; writer B claims the next slot and
    // publishes first. A version stamped now must mean the same file set
    // forever — the stable prefix stops at A's pending claim, so B's
    // commit is invisible until the gap resolves (publish or vacuum).
    val dir = Files.createTempDirectory("graft-manifest-ooo").toString
    val t = new ManifestTable(spark, dir)
    t.init()
    t.commit(Seq((1L, "a")).toDF("id", "v")) // slot 0
    t.commit(Seq((2L, "b")).toDF("id", "v")) // slot 1
    t.version() shouldBe 2L
    // writer A: claim slot 2, never publish (crashed between claim and rename)
    val stalled = new java.io.File(s"$dir/manifests/000000000002.claim")
    stalled.createNewFile() shouldBe true
    // writer B: lands on slot 3 and publishes
    t.commit(Seq((3L, "c")).toDF("id", "v")) shouldBe 3L
    // B's publish is NOT yet visible: version stops at the pending claim
    t.version() shouldBe 2L
    t.snapshot.orderBy("id").collect().map(_.getLong(0)) shouldBe Array(1L, 2L)
    val v2Files = t.snapshotAt(2).orderBy("id").collect().map(_.getLong(0))
    // A dies for good; vacuum ages out the dead claim and the log resumes
    Thread.sleep(10)
    t.vacuum(maxAgeMs = 1L) should be >= 1L
    t.version() shouldBe 3L // slots 0, 1, 3 — the prefix advanced past the dead slot
    t.snapshot.orderBy("id").collect().map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
    // the old stamped version still means exactly what it meant before
    t.snapshotAt(2).orderBy("id").collect().map(_.getLong(0)) shouldBe v2Files
  }

  it("change feed across a schema-widening commit aligns both sides to the union schema") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1: narrow schema
    // widening commit adds a column, then a compact rewrites v1 files so
    // the change window's removed/added sets have DIFFERENT schemas
    t.commit(Seq((3L, "c", 30L)).toDF("id", "v", "extra")) // v2
    val v2 = t.version()
    t.compact(targetFiles = 1) // v3: removes narrow+wide files, adds merged
    val delta = t.changes(v2, t.version())
    // copy-on-write noise cancels even across the schema boundary:
    // compact net-changes nothing, so the feed is empty
    delta.count() shouldBe 0L
    // and a real post-widening insert surfaces with the union schema
    t.commit(Seq((4L, "d", 40L)).toDF("id", "v", "extra"))
    val ins = t.changes(v2 + 1, t.version())
    ins.columns should contain allOf ("id", "v", "extra", "_change_type")
    ins.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))) shouldBe
      Array((4L, "insert"))
  }

  it("merge upserts by key with file-granular copy-on-write") {
    val t = newTable()
    // two commits -> two separate file sets; the merge touches only one
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.commit(Seq((10L, "x"), (11L, "y")).toDF("id", "v"))
    val v0 = t.version()
    t.merge(Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), "id")
    t.version() shouldBe v0 + 1 // one atomic commit
    t.snapshot.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "a"), (2L, "B2"), (3L, "c"), (10L, "x"), (11L, "y"))
    // file granularity: the second commit's file had no matched key, so it
    // must still be served from its ORIGINAL batch directory
    val files = t.snapshot.select(org.apache.spark.sql.functions.input_file_name()).distinct()
      .collect().map(_.getString(0))
    val preMergeFiles = t.snapshotAt(v0).select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    files.count(preMergeFiles.contains) should be >= 1
  }

  it("time travel reads every prior version exactly") {
    val t = newTable()
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.commit(Seq((2L, "b")).toDF("id", "v"))
    t.merge(Seq((1L, "A!")).toDF("id", "v"), "id")
    t.snapshotAt(1).collect().map(r => (r.getLong(0), r.getString(1))) shouldBe Array((1L, "a"))
    t.snapshotAt(2).orderBy("id").collect().map(_.getString(1)) shouldBe Array("a", "b")
    t.snapshotAt(3).orderBy("id").collect().map(_.getString(1)) shouldBe Array("A!", "b")
    t.snapshot.orderBy("id").collect().map(_.getString(1)) shouldBe Array("A!", "b")
  }

  it("change data feed reports row-level deltas with copy-on-write noise cancelled") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    t.commit(Seq((3L, "c")).toDF("id", "v")) // v2
    t.merge(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), "id") // v3
    // append-only delta
    t.changes(1, 2).collect().map(r => (r.getLong(0), r.getString(2))) shouldBe
      Array((3L, "insert"))
    // merge delta: row 1 was carried over into the rewritten file and must
    // NOT appear; row 2 is delete(old)+insert(new); row 4 is an insert
    val d = t.changes(2, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    d shouldBe Array((2L, "B2", "insert"), (2L, "b", "delete"), (4L, "d", "insert"))
    t.changes(3, 3).count() shouldBe 0L
    // full-history delta equals the final state for insert-only net effect
    val net = t.changes(0, 3).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    net.count(_._3 == "delete") shouldBe 0
    net.map(x => (x._1, x._2)).sorted shouldBe Array((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"))
  }

  it("deleteByKey removes exactly the matched rows; merge into empty table is a plain insert") {
    val t = newTable()
    t.merge(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "id") // empty target: insert
    t.deleteByKey(Seq(Tuple1(2L)).toDF("id"), "id")
    t.snapshot.orderBy("id").collect().map(_.getLong(0)) shouldBe Array(1L, 3L)
    // deleting a key that matches nothing is a published no-op
    val v = t.version()
    t.deleteByKey(Seq(Tuple1(99L)).toDF("id"), "id")
    t.version() shouldBe v
    t.snapshot.count() shouldBe 2L
  }

  it("a stale merge conflicting with a published rewrite aborts and stays invisible") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v0 = t.version()
    t.merge(Seq((1L, "A1")).toDF("id", "v"), "id", expectedVersion = Some(v0))
    // second merge computed against the SAME v0 rewrites the same file
    a[java.util.ConcurrentModificationException] should be thrownBy
      t.merge(Seq((1L, "A2")).toDF("id", "v"), "id", expectedVersion = Some(v0))
    t.snapshot.orderBy("id").collect().map(_.getString(1)) shouldBe Array("A1", "b")
    // the abandoned attempt left only vacuumable debris, no table change
    t.vacuum(maxAgeMs = -1000L)
    t.snapshot.orderBy("id").collect().map(_.getString(1)) shouldBe Array("A1", "b")
    // a NON-conflicting merge against the stale version still lands: only
    // overlap on rewritten files conflicts, appends/disjoint keys don't
    t.merge(Seq((5L, "e")).toDF("id", "v"), "id", expectedVersion = Some(v0))
    t.snapshot.count() shouldBe 3L
  }

  it("OCC sees a conflicting rewrite published above a stalled foreign claim") {
    // The stable prefix is truncated at the first pending claim — so a
    // conflicting rewrite that published at a HIGHER slot is invisible to
    // a prefix-based validation. Validation must fold ALL published
    // manifests or two merges removing the same file both land.
    val dir = Files.createTempDirectory("graft-manifest-occ").toString
    val t = new ManifestTable(spark, dir)
    t.init()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // slot 0
    val v0 = t.version()
    // a stalled foreign writer holds claim slot 1 (claimed, never published)
    new java.io.File(s"$dir/manifests/${f"${1L}%012d"}.claim").createNewFile() shouldBe true
    // merge #1 against v0 claims slot 2 and publishes there — ABOVE the
    // pending claim, outside the stable prefix (version has not moved)
    t.merge(Seq((1L, "A1")).toDF("id", "v"), "id", expectedVersion = Some(v0))
    t.version() shouldBe v0
    // merge #2 against the same v0 rewrites the same file; a stable-prefix
    // validation would NOT see merge #1 and let both land (lost update)
    a[java.util.ConcurrentModificationException] should be thrownBy
      t.merge(Seq((1L, "A2")).toDF("id", "v"), "id", expectedVersion = Some(v0))
    // age out the dead claim: the prefix resumes and merge #1 is the winner
    t.vacuum(maxAgeMs = -1000L)
    t.snapshot.orderBy("id").collect().map(_.getString(1)) shouldBe Array("A1", "b")
  }

  it("materialized view serves from cache until the source version moves") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp"))
    val mv = new graft.store.MaterializedView(spark,
      Files.createTempDirectory("graft-mv").toString, t,
      df => df.groupBy("grp").agg(F.count(F.lit(1)).as("n")))
    val (r1, hit1) = mv.readWithStatus()
    hit1 shouldBe false // first read computes
    r1.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe Map("a" -> 2L, "b" -> 1L)
    mv.readWithStatus()._2 shouldBe true // cached: O(1) version check, no recompute
    t.commit(Seq((4L, "b")).toDF("id", "grp"))
    val (r2, hit2) = mv.readWithStatus()
    hit2 shouldBe false // version moved: recomputed
    r2.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe Map("a" -> 2L, "b" -> 2L)
  }

  it("incremental view maintenance queries only the delta for insert-only changes") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "grp"))
    val mv = new graft.store.MaterializedView(spark,
      Files.createTempDirectory("graft-mv-inc").toString, t,
      df => df.groupBy("grp").agg(F.count(F.lit(1)).as("n")))
    def mergeCounts(old: org.apache.spark.sql.DataFrame, delta: org.apache.spark.sql.DataFrame) =
      old.unionByName(delta).groupBy("grp").agg(F.sum("n").as("n"))
    mv.refreshIncremental(mergeCounts) shouldBe "full" // nothing cached yet
    mv.refreshIncremental(mergeCounts) shouldBe "fresh"
    t.commit(Seq((3L, "a"), (4L, "c")).toDF("id", "grp"))
    mv.refreshIncremental(mergeCounts) shouldBe "incremental" // insert-only delta
    mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    // an upstream MERGE (update) is not insert-only: full recompute
    t.merge(Seq((1L, "z")).toDF("id", "grp"), "id")
    mv.refreshIncremental(mergeCounts) shouldBe "full"
    mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "z" -> 1L)
  }

  it("delete-aware IVM subtracts delete deltas: MERGE/DELETE upstream stays incremental") {
    val t = newTable()
    t.commit(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp"))
    val mv = new graft.store.MaterializedView(spark,
      Files.createTempDirectory("graft-mv-del").toString, t,
      df => df.groupBy("grp").agg(F.count(F.lit(1)).as("n")))
    def mergeCounts(old: org.apache.spark.sql.DataFrame, delta: org.apache.spark.sql.DataFrame) =
      old.unionByName(delta).groupBy("grp").agg(F.sum("n").as("n"))
    def unmergeCounts(acc: org.apache.spark.sql.DataFrame, del: org.apache.spark.sql.DataFrame) =
      acc.unionByName(del.withColumn("n", -F.col("n")))
        .groupBy("grp").agg(F.sum("n").as("n")).filter(F.col("n") > 0)
    mv.refreshIncremental(mergeCounts, unmergeCounts) shouldBe "full" // first build
    // an upstream MERGE (update: delete(old)+insert(new) in the CDF) must
    // now refresh incrementally with exact values — no full recompute
    t.merge(Seq((1L, "z")).toDF("id", "grp"), "id")
    mv.refreshIncremental(mergeCounts, unmergeCounts) shouldBe "incremental"
    mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 1L, "b" -> 1L, "z" -> 1L)
    // pure DELETE: group b's count reaches zero and the group disappears
    t.deleteByKey(Seq(Tuple1(3L)).toDF("id"), "id")
    mv.refreshIncremental(mergeCounts, unmergeCounts) shouldBe "incremental"
    mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 1L, "z" -> 1L)
    // the incremental result must equal a from-scratch recompute exactly
    val scratch = t.snapshot.groupBy("grp").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe scratch
    // and the single-argument overload still falls back to full on deletes
    t.merge(Seq((2L, "w")).toDF("id", "grp"), "id")
    mv.refreshIncremental(mergeCounts) shouldBe "full"
  }

  it("additive schema evolution: later commits may widen the schema; old rows read NULL") {
    val t = newTable()
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.commit(Seq((2L, "b", 3.5)).toDF("id", "v", "score"))
    val snap = t.snapshot.orderBy("id").collect()
    snap.map(_.getLong(0)) shouldBe Array(1L, 2L)
    snap(0).isNullAt(2) shouldBe true // pre-evolution row
    snap(1).getDouble(2) shouldBe 3.5
  }

  it("log-native compaction coalesces live files atomically and keeps time travel intact") {
    val t = newTable()
    (1 to 5).foreach(i => t.commit(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val v5 = t.version()
    val (before, after) = t.compact(targetFiles = 1)
    before should be >= 5L
    after shouldBe 1L
    t.snapshot.orderBy("id").collect().map(_.getLong(0)) shouldBe (1L to 5L).toArray
    t.snapshot.select(F.input_file_name()).distinct().count() shouldBe 1L
    t.snapshotAt(v5).count() shouldBe 5L // pre-compaction version still readable
    // vacuum must NOT delete pre-compaction files (older manifests name them)
    t.vacuum(maxAgeMs = -1000L)
    t.snapshotAt(v5).count() shouldBe 5L
  }

  it("streaming-maintained view: every post-first refresh is incremental and the aggregate tracks the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = newTable()
    val mv = new graft.store.MaterializedView(spark,
      Files.createTempDirectory("graft-smv").toString, t,
      df => df.groupBy("grp").agg(F.count(F.lit(1)).as("n")))
    def mergeCounts(old: org.apache.spark.sql.DataFrame, delta: org.apache.spark.sql.DataFrame) =
      old.unionByName(delta).groupBy("grp").agg(F.sum("n").as("n"))
    val ckpt = Files.createTempDirectory("graft-smv-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingMaterializedView.attach(
      input.toDS().toDF("id", "grp"), ckpt, t, mv, mergeCounts, triggerMillis = 100)
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((3L, "a"), (4L, "c")); q.processAllAvailable()
      input.addData((5L, "a")); q.processAllAvailable()
    } finally q.stop()
    val (result, cached) = mv.readWithStatus()
    cached shouldBe true // the stream left the view already refreshed
    result.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
    t.version() shouldBe 3L // one atomic commit per micro-batch
  }

  it("SCD2: changed keys close + reopen, unchanged keys stay untouched, both time axes read") {
    val t = newTable()
    def upd(rows: (String, String, Long)*) = rows.toSeq.toDF("key", "color", "ts")
    graft.store.Scd2.applyUpdates(t, upd(("k1", "red", 100L), ("k2", "blue", 100L)),
      "key", Seq("color"), "ts")
    graft.store.Scd2.current(t).count() shouldBe 2L
    // k1 changes, k2 is identical (skipped), k3 is new
    graft.store.Scd2.applyUpdates(t,
      upd(("k1", "green", 200L), ("k2", "blue", 200L), ("k3", "black", 200L)),
      "key", Seq("color"), "ts")
    val cur = graft.store.Scd2.current(t).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("color"), r.getAs[Long]("valid_from"))).sorted
    cur shouldBe Array(("k1", "green", 200L), ("k2", "blue", 100L), ("k3", "black", 200L))
    // business-time travel: the world at ts=150 vs ts=250
    graft.store.Scd2.asOf(t, 150L).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("color"))).sorted shouldBe
      Array(("k1", "red"), ("k2", "blue"))
    graft.store.Scd2.asOf(t, 250L).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("color"))).sorted shouldBe
      Array(("k1", "green"), ("k2", "blue"), ("k3", "black"))
    // the closed row carries its interval
    t.snapshot.filter(F.col("k") === "k1" && F.col("valid_to").isNotNull)
      .collect().map(r => (r.getAs[String]("color"), r.getAs[Long]("valid_to"))) shouldBe
      Array(("red", 200L))
    // replaying the identical batch is a no-op
    val v = t.version()
    graft.store.Scd2.applyUpdates(t,
      upd(("k1", "green", 200L), ("k2", "blue", 200L), ("k3", "black", 200L)),
      "key", Seq("color"), "ts")
    t.version() shouldBe v
    graft.store.Scd2.current(t).count() shouldBe 3L
  }

  it("streaming SCD2: the dimension tracks the update stream with both time axes queryable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = newTable()
    val ckpt = Files.createTempDirectory("graft-sscd-ckpt").toString
    val input = MemoryStream[(String, String, Long)]
    val q = graft.streaming.StreamingScd2.attach(
      input.toDS().toDF("key", "color", "ts"), ckpt, t, "key", Seq("color"), "ts",
      triggerMillis = 100)
    try {
      input.addData(("k1", "red", 100L), ("k2", "blue", 100L)); q.processAllAvailable()
      input.addData(("k1", "green", 200L)); q.processAllAvailable()
      input.addData(("k1", "green", 300L)); q.processAllAvailable() // unchanged: no-op
    } finally q.stop()
    graft.store.Scd2.current(t).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("color"))).sorted shouldBe
      Array(("k1", "green"), ("k2", "blue"))
    graft.store.Scd2.asOf(t, 150L).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("color"))).sorted shouldBe
      Array(("k1", "red"), ("k2", "blue"))
    t.version() shouldBe 2L // two effective commits; the no-op batch published nothing
  }

  it("a crashed commit (data written, manifest never published) is invisible; vacuum removes it") {
    val root = Files.createTempDirectory("graft-manifest-crash").toString
    val t = new ManifestTable(spark, root)
    t.init()
    t.commit(Seq((1L, "kept")).toDF("id", "v"))
    // simulate the crash: a data directory appears with no manifest entry
    Seq((99L, "orphan")).toDF("id", "v").write.parquet(s"$root/data/deadbeef-crashed")
    t.snapshot.collect().map(_.getString(1)) shouldBe Array("kept") // orphan invisible
    // default 1h age gate protects what could be an in-flight commit...
    t.vacuum() shouldBe 0L
    t.snapshot.collect().map(_.getString(1)) shouldBe Array("kept")
    // ...a negative threshold treats everything as stale (test-only)
    t.vacuum(maxAgeMs = -1000L) shouldBe 1L
    t.snapshot.collect().map(_.getString(1)) shouldBe Array("kept")
    t.vacuum(maxAgeMs = -1000L) shouldBe 0L // idempotent
  }
}
