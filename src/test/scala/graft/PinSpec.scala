package graft

class PinSpec extends SparkSpec {
  import Pin._
  import org.apache.spark.sql.functions._

  private def df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("k"))

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  describe("Pin") {
    it("pin() is value-identical across all three modes") {
      val expect = rows(df.groupBy("k").count())
      val modes = Seq("local", "persist", "reliable")
      modes.foreach { m =>
        spark.conf.set("spark.graft.pin.mode", m)
        try {
          if (m == "reliable")
            spark.sparkContext.setCheckpointDir(
              java.nio.file.Files.createTempDirectory("pin_spec_ckpt").toString)
          val pinned = df.pin()
          rows(pinned.groupBy("k").count()) shouldBe expect
          // a pinned frame is a materialized leaf: consuming it twice
          // must not fail and must agree with itself
          pinned.count() shouldBe 100L
          Pin.free(pinned.toDF())
        } finally spark.conf.unset("spark.graft.pin.mode")
      }
    }

    it("default mode truncates lineage like localCheckpoint") {
      val pinned = df.pin()
      // the logical plan of an eager local checkpoint is a scan leaf
      pinned.queryExecution.logical.children shouldBe empty
      Pin.free(pinned.toDF())
    }
  }
}
