package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Multimodal

/** The image codec path is REAL: payloads are genuine PNG bytes produced by
  * `javax.imageio`, and decode parses them back through the same codec.
  * These specs pin the round-trip: container format, decoded dimensions,
  * and losslessness (decoded pixels == the deterministic generator, via the
  * position-weighted checksum computed directly off the generator). */
class MultimodalSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(0L, 1L, 7L, 123L, 456L).toDF("doc_id")
  }

  /** The checksum the decoder must reproduce, computed straight from the
    * pixel generator — never through image bytes. */
  private def expectedChecksum(id: Long): Long = {
    val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += Multimodal.imgGray(id, x, y).toLong * (y.toLong * w + x + 1)
    sum
  }

  it("pngPayloads emits genuine PNG containers (magic bytes, parseable by ImageIO)") {
    val rows = Multimodal.pngPayloads(fixture, "doc_id").collect()
    rows should have size 5
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      bytes.take(8).map(_ & 0xff) shouldBe Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
    }
  }

  it("decodeImage recovers the exact dimensions and pixel checksums through the real codec") {
    val decoded = Multimodal.decodeImage(Multimodal.pngPayloads(fixture, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val r = decoded(id)
      r.getInt(1) shouldBe Multimodal.imgWidth(id)
      r.getInt(2) shouldBe Multimodal.imgHeight(id)
      r.getLong(3) shouldBe expectedChecksum(id)
    }
  }

  it("a corrupted payload fails decode loudly (the codec is load-bearing, not a fake)") {
    import spark.implicits._
    val bad = Seq((1L, Array.fill[Byte](16)(0x42))).toDF("media_id", "payload")
    val ex = intercept[Exception] {
      Multimodal.decodeImage(bad).collect()
    }
    ex should not be null
  }

  it("sampleFrames explodes every stride-th frame index from the metadata") {
    val media = Multimodal.asMedia(
      fixture.withColumn("text", F.lit("hello world")), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, stride = 5)
      .groupBy("media_id").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 123: n_frames = 123 % 30 + 1 = 4 -> sampled idx {0}; doc 456: 7 frames -> {0, 5}
    frames shouldBe Map(0L -> 1L, 1L -> 1L, 7L -> 2L, 123L -> 1L, 456L -> 2L)
  }
}
