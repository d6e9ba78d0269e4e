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
  }
}
