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

  it("wavPayloads emits genuine WAV containers (RIFF/WAVE magic, parseable by AudioSystem)") {
    val rows = Multimodal.wavPayloads(fixture, "doc_id").collect()
    rows should have size 5
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      new String(bytes.take(4), "US-ASCII") shouldBe "RIFF"
      new String(bytes.slice(8, 12), "US-ASCII") shouldBe "WAVE"
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      ais.getFormat.getSampleRate shouldBe 8000f
      ais.getFormat.getChannels shouldBe 1
    }
  }

  it("decodeAudio recovers exact sample counts, checksums, and peaks through the real codec") {
    val decoded = Multimodal.decodeAudio(Multimodal.wavPayloads(fixture, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val n = Multimodal.audioNSamples(id)
      var sum = 0L
      var peak = 0
      for (i <- 0 until n) {
        val s = Multimodal.audioSample(id, i)
        sum += s.toLong * (i + 1)
        peak = math.max(peak, math.abs(s))
      }
      val r = decoded(id)
      r.getInt(1) shouldBe 8000
      r.getInt(2) shouldBe n
      r.getLong(3) shouldBe sum
      r.getInt(4) shouldBe peak
    }
  }

  it("a corrupted audio payload fails decode loudly") {
    import spark.implicits._
    val bad = Seq((1L, Array.fill[Byte](16)(0x42))).toDF("media_id", "payload")
    val ex = intercept[Exception] {
      Multimodal.decodeAudio(bad).collect()
    }
    ex should not be null
  }

  it("gifPayloads emits genuine multi-frame GIF containers (magic + frame count)") {
    val rows = Multimodal.gifPayloads(fixture, "doc_id").collect()
    rows should have size 5
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("payload")
      new String(bytes.take(6), "US-ASCII") should startWith("GIF8")
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis)
      reader.getNumImages(true) shouldBe Multimodal.vidNFrames(id)
    }
  }

  it("decodeFrames recovers exact per-frame checksums through the real container") {
    val decoded = Multimodal.decodeFrames(
      Multimodal.gifPayloads(fixture, "doc_id"), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val (w, h, nf) = (Multimodal.vidWidth(id), Multimodal.vidHeight(id), Multimodal.vidNFrames(id))
      for (f <- 0 until nf by 2) {
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += Multimodal.vidGray(id, f, x, y).toLong * (y.toLong * w + x + 1)
        val r = decoded((id, f))
        r.getInt(1) shouldBe nf
        r.getLong(3) shouldBe sum
      }
      // sampled rows only: ceil(nf / 2)
      decoded.keys.count(_._1 == id) shouldBe (nf + 1) / 2
    }
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
