package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Skyline
import graft.streaming.StreamingSkyline

/** Streaming skyline partials: streamed == batch across a restart. */
class StreamingSkylineSpec extends SparkSpec {
  import spark.implicits._

  private def dims = Seq(("x", false), ("y", true)) // cheapest AND largest

  it("streamed local skylines re-merge to the exact batch skyline across a restart") {
    import java.nio.file.{Files => JFiles, Paths}
    val r = new scala.util.Random(29)
    val all = (1 to 200).map(i => (i.toLong, r.nextInt(50).toDouble, r.nextInt(50).toDouble))
    val inDir = JFiles.createTempDirectory("graft-sky-in").toString
    val ckpt = JFiles.createTempDirectory("graft-sky-ckpt").toString
    val pDir = JFiles.createTempDirectory("graft-sky-parts").toString
    def write(name: String, part: Seq[(Long, Double, Double)]): Unit =
      JFiles.writeString(Paths.get(inDir, name),
        part.map { case (id, x, y) => s"$id,$x,$y" }.mkString("\n"))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).cast("long").as("id"),
        F.split(F.col("value"), ",").getItem(1).cast("double").as("x"),
        F.split(F.col("value"), ",").getItem(2).cast("double").as("y"))
    write("f1.txt", all.take(120))
    val q1 = StreamingSkyline.attach(src(), ckpt, pDir, dims, 100)
    try q1.processAllAvailable() finally q1.stop()
    // mid-stream read is a valid (prefix) skyline
    val mid = StreamingSkyline.skylineNow(spark, pDir, dims)
      .select("id").as[Long].collect().toSet
    val batchMid = Skyline.skyline(all.take(120).toDF("id", "x", "y"), dims)
      .select("id").as[Long].collect().toSet
    mid shouldBe batchMid
    // restart from the same checkpoint, stream the rest
    write("f2.txt", all.drop(120))
    val q2 = StreamingSkyline.attach(src(), ckpt, pDir, dims, 100)
    try q2.processAllAvailable() finally q2.stop()
    val streamed = StreamingSkyline.skylineNow(spark, pDir, dims)
      .select("id").as[Long].collect().toSet
    val batch = Skyline.skyline(all.toDF("id", "x", "y"), dims)
      .select("id").as[Long].collect().toSet
    streamed shouldBe batch
    streamed should not be empty
  }

  it("duplicate optima across different batches all survive the merge") {
    import java.nio.file.{Files => JFiles, Paths}
    val inDir = JFiles.createTempDirectory("graft-sky2-in").toString
    val ckpt = JFiles.createTempDirectory("graft-sky2-ckpt").toString
    val pDir = JFiles.createTempDirectory("graft-sky2-parts").toString
    def write(name: String, rows: Seq[String]): Unit =
      JFiles.writeString(Paths.get(inDir, name), rows.mkString("\n"))
    val src = () => spark.readStream.text(inDir)
      .select(F.split(F.col("value"), ",").getItem(0).cast("long").as("id"),
        F.split(F.col("value"), ",").getItem(1).cast("double").as("x"),
        F.split(F.col("value"), ",").getItem(2).cast("double").as("y"))
    write("f1.txt", Seq("1,1.0,9.0", "2,5.0,3.0"))
    val q1 = StreamingSkyline.attach(src(), ckpt, pDir, dims, 100)
    try q1.processAllAvailable() finally q1.stop()
    write("f2.txt", Seq("3,1.0,9.0", "4,2.0,2.0")) // 3 ties 1 exactly; 4 dominated
    val q2 = StreamingSkyline.attach(src(), ckpt, pDir, dims, 100)
    try q2.processAllAvailable() finally q2.stop()
    val out = StreamingSkyline.skylineNow(spark, pDir, dims)
      .select("id").as[Long].collect().toSet
    out shouldBe Set(1L, 3L) // exact ties never dominate — both copies live
  }

  it("before any batch lands the board is empty, not a throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sky-empty").toString
    StreamingSkyline.skylineNow(spark, dir, dims).collect() shouldBe empty
  }

  it("the pre-first-batch empty board carries the TYPED dim columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sky-empty2").toString
    val board = StreamingSkyline.skylineNow(spark, dir, dims,
      dimTypes = Seq("x" -> "double", "y" -> "int"))
    // selecting the dim columns on the empty board must not throw
    board.select("x", "y").collect() shouldBe empty
    board.schema("x").dataType.typeName shouldBe "double"
    board.schema("y").dataType.typeName shouldBe "integer"
    // and without a hint the dims default to double, still selectable
    StreamingSkyline.skylineNow(spark, dir, dims)
      .select("x", "y").collect() shouldBe empty
  }

  it("a genuine analysis error (misspelled dim) SURFACES, not an empty board") {
    // partials exist but lack the requested column: UNRESOLVED_COLUMN is
    // not a "no batch yet" condition and must propagate to the caller
    val dir = java.nio.file.Files.createTempDirectory("graft-sky-err").toString
    Seq((1L, 2.0)).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/batch_id=0")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      StreamingSkyline.skylineNow(spark, dir,
        Seq("x" -> true, "nope" -> true)).collect()
  }
}
