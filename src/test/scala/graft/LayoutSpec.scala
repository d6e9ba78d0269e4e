package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.operators.Layout

/** Z-order layout: bit-placement exactness and the file-skipping claim
  * that justifies the operator at scale — a 2-D box predicate over a
  * z-ordered file set touches a small corner of the files, while the
  * same box over a 1-D time-sorted layout must read every file that
  * matches on time alone (the user dimension spans every file). */
class LayoutSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  describe("interleave16") {
    it("places bit i of a at 2i and bit i of b at 2i+1") {
      import spark.implicits._
      val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
        .toDF("a", "b")
        .select(Layout.interleave16(F.col("a"), F.col("b")).as("z"))
      // a=0b11,b=0b01 -> bits 0,1,2 set = 7; a alone fills even bits,
      // b alone fills odd bits of the 32-bit result.
      df.collect().map(_.getLong(0)).toSeq shouldBe
        Seq(7L, 0L, 0x55555555L, 0xAAAAAAAAL)
    }

    it("matches the SQL mirror text bit for bit") {
      import spark.implicits._
      val df = Seq((12345L, 54321L), (1L, 65534L)).toDF("na", "nb")
      val viaCol = df.select(Layout.interleave16(F.col("na"), F.col("nb")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val viaSql = df.selectExpr(Layout.interleave16Sql("na", "nb") + " AS z")
        .collect().map(_.getLong(0)).toSeq
      viaCol shouldBe viaSql
    }
  }

  describe("interleaveN") {
    it("k=2 at 16 bits reproduces interleave16 exactly") {
      import spark.implicits._
      val df = Seq((12345L, 54321L), (65535L, 0L), (0L, 65535L)).toDF("a", "b")
      val via2 = df.select(Layout.interleave16(F.col("a"), F.col("b")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val viaN = df.select(Layout.interleaveN(Seq(F.col("a"), F.col("b")), 16).as("z"))
        .collect().map(_.getLong(0)).toSeq
      viaN shouldBe via2
    }

    it("k=3 places bit i of column j at 3i+j and matches the SQL mirror") {
      import spark.implicits._
      val df = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (7L, 3L, 1L))
        .toDF("n0", "n1", "n2")
      val viaCol = df.select(
        Layout.interleaveN(Seq(F.col("n0"), F.col("n1"), F.col("n2")), 16).as("z"))
        .collect().map(_.getLong(0)).toSeq
      // single set bit of column j lands at position j
      viaCol.take(3) shouldBe Seq(1L, 2L, 4L)
      val viaSql = df.selectExpr(
        Layout.interleaveNSql(Seq("n0", "n1", "n2"), 16) + " AS z")
        .collect().map(_.getLong(0)).toSeq
      viaCol shouldBe viaSql
    }

    it("k=4 stays within the positive long range at its 15-bit width") {
      import spark.implicits._
      Layout.bitsPerDim(4) shouldBe 15
      val top = (1L << 15) - 1
      val df = Seq((top, top, top, top)).toDF("a", "b", "c", "d")
      val z = df.select(Layout.interleaveN(
        Seq(F.col("a"), F.col("b"), F.col("c"), F.col("d")), 15).as("z"))
        .collect()(0).getLong(0)
      z shouldBe (1L << 60) - 1 // all 60 low bits set, sign untouched
    }
  }

  describe("normalize16") {
    it("maps min to 0 and max to 65535 with exact integer arithmetic") {
      import spark.implicits._
      val df = Seq(100L, 150L, 200L).toDF("x")
        .crossJoin(F.broadcast(Seq((100L, 200L)).toDF("lo", "hi")))
        .select(Layout.normalize16(F.col("x"), F.col("lo"), F.col("hi")).as("n"))
      df.collect().map(_.getLong(0)).toSeq shouldBe Seq(0L, 32443L, 64887L)
    }
  }

  describe("zOrderLayout file skipping") {
    it("prunes a 2-D box multiplicatively where a 1-D sort cannot") {
      val tmp = Files.createTempDirectory("graft-layout").toFile
      tmp.deleteOnExit()
      val ev = graft.sources.EventsFixture.read(spark, s"$sfDir/events.parquet")
        .withColumn("__us", F.unix_micros(F.col("ts")))
      val numFiles = 64

      val tsDir = s"${tmp.getAbsolutePath}/ts_sorted"
      ev.repartitionByRange(numFiles, F.col("__us"))
        .sortWithinPartitions(F.col("__us"))
        .write.mode("overwrite").parquet(tsDir)
      val zDir = s"${tmp.getAbsolutePath}/zorder"
      Layout.zOrderLayout(ev, F.col("user_id"), F.col("__us"), numFiles)
        .write.mode("overwrite").parquet(zDir)

      // Layout must not change the data itself.
      val zBack = spark.read.parquet(zDir)
      zBack.count() shouldBe ev.count()
      zBack.select("event_id").exceptAll(ev.select("event_id")).count() shouldBe 0L

      // Box: middle quarter of the user range x middle quarter of time.
      val b = ev.agg(F.min("user_id"), F.max("user_id"), F.min("__us"), F.max("__us"))
        .collect()(0)
      val (ulo, uhi, tlo, thi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      // Quarter-aligned box (second quarter of each dim): an unaligned box
      // straddling the curve's top-level split would still prune, but the
      // aligned case is the representative one for stats-driven layouts.
      def quarter(lo: Long, hi: Long): (Long, Long) = {
        val w = hi - lo + 1
        (lo + w / 4, lo + w / 2 - 1)
      }
      val box = Seq(quarter(ulo, uhi), quarter(tlo, thi))
      val cols = Seq(F.col("user_id"), F.col("__us"))

      val tsTouched = Layout.filesTouched(
        Layout.fileRanges(spark.read.parquet(tsDir), cols), box)
      val zTouched = Layout.filesTouched(
        Layout.fileRanges(spark.read.parquet(zDir), cols), box)

      // Time-sorted: every file in the time quarter matches (user spans
      // all of them) — about numFiles/4. Z-order: only the grid corner
      // under the box — multiplicative pruning.
      tsTouched should be >= (numFiles / 4).toLong
      zTouched should be < tsTouched
      zTouched should be <= 12L // >= 81% of files skipped
    }

    it("3-D z-order prunes a 3-D box where the 2-D layout spans the third dim") {
      val tmp = Files.createTempDirectory("graft-layout3").toFile
      tmp.deleteOnExit()
      val ev = graft.sources.EventsFixture.read(spark, s"$sfDir/events.parquet")
        .withColumn("__us", F.unix_micros(F.col("ts")))
        .withColumn("__v", F.floor(F.col("value") * 1000).cast("long"))
      val numFiles = 64
      val dims = Seq(F.col("user_id"), F.col("__us"), F.col("__v"))

      val zDir = s"${tmp.getAbsolutePath}/zorder3"
      Layout.zOrderLayoutN(ev, dims, numFiles)
        .write.mode("overwrite").parquet(zDir)
      val zBack = spark.read.parquet(zDir)
      zBack.count() shouldBe ev.count()

      val b = ev.agg(F.min("user_id"), F.max("user_id"),
        F.min("__us"), F.max("__us"), F.min("__v"), F.max("__v")).collect()(0)
      def half(lo: Long, hi: Long): (Long, Long) = {
        val w = hi - lo + 1
        (lo + w / 4, lo + (3 * w) / 4 - 1) // middle half of each dim
      }
      val box = Seq(half(b.getLong(0), b.getLong(1)),
        half(b.getLong(2), b.getLong(3)), half(b.getLong(4), b.getLong(5)))

      val zTouched = Layout.filesTouched(
        Layout.fileRanges(zBack, dims), box)
      // A middle-half box on every dim covers 1/8 of the 3-D volume; the
      // curve keeps file ranges narrow on ALL THREE dims, so the touched
      // set must stay well under the full file count (a 2-D layout cannot
      // prune on the third dim at all).
      zTouched should be < numFiles.toLong
      zTouched should be <= (numFiles * 3 / 4).toLong

      // prunedRead must be ROW-IDENTICAL to the full filter while opening
      // only the surviving corner
      val full = zBack.filter(
        dims.zip(box).map { case (c, (lo, hi)) => c >= lo && c <= hi }
          .reduce(_ && _))
      val pruned = Layout.prunedRead(spark, zDir, dims, box)
      pruned.count() shouldBe full.count()
      pruned.select("event_id").exceptAll(full.select("event_id")).count() shouldBe 0L
    }
  }
}
