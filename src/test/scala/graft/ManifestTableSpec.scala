package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

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
