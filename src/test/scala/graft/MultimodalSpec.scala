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

  it("resizePngPayloads NN-halves through the real codec, integer-exact vs the analytic grid") {
    // encode -> decode -> NN resize -> re-encode -> decode: the full image
    // shaping pipeline; destination pixel (x, y) must equal the GENERATOR
    // at source (x*w/w2, y*h/h2) — pure selection, no interpolation
    val resized = Multimodal.decodeImage(
      Multimodal.resizePngPayloads(
        Multimodal.pngPayloads(fixture, "doc_id"), numer = 1, denom = 2))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      val (w2, h2) = (w / 2, h / 2)
      var sum = 0L
      for (y <- 0 until h2; x <- 0 until w2)
        sum += Multimodal.imgGray(id, x * w / w2, y * h / h2).toLong * (y.toLong * w2 + x + 1)
      val r = resized(id)
      r.getInt(1) shouldBe w2
      r.getInt(2) shouldBe h2
      r.getLong(3) shouldBe sum
    }
  }

  it("upscale then downscale with the same ratio is identity on the raster (NN exactness)") {
    // 2x up then 1/2 down: src = (x*w2/w, y*h2/h) on the way up maps every
    // even destination pixel back to itself on the way down — checksum
    // equals the original decode's
    val twice = Multimodal.decodeImage(
      Multimodal.resizePngPayloads(
        Multimodal.resizePngPayloads(
          Multimodal.pngPayloads(fixture, "doc_id"), numer = 2, denom = 1),
        numer = 1, denom = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L))
      twice(id) shouldBe expectedChecksum(id)
  }

  it("cropPngPayloads takes the exact integer window through the real codec") {
    val cropped = Multimodal.decodeImage(
      Multimodal.cropPngPayloads(
        Multimodal.pngPayloads(fixture, "doc_id"),
        xNum = 1, xDen = 4, yNum = 1, yDen = 4, wNum = 1, wDen = 2, hNum = 1, hDen = 2))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      val (x0, y0, cw, ch) = (w / 4, h / 4, w / 2, h / 2)
      var sum = 0L
      for (y <- 0 until ch; x <- 0 until cw)
        sum += Multimodal.imgGray(id, x0 + x, y0 + y).toLong * (y.toLong * cw + x + 1)
      val r = cropped(id)
      r.getInt(1) shouldBe cw
      r.getInt(2) shouldBe ch
      r.getLong(3) shouldBe sum
    }
  }

  it("LOSSY JPEG ingestion round-trips within a pixel-error tolerance (not hash-exact, by design)") {
    // the lossy path a real pipeline meets: same raster generator, real
    // JPEG encode at q=0.9, real decode — gate the MEAN absolute gray
    // error per image, not the hash (JPEG output is jvm/codec-version
    // dependent; the tolerance is the contract)
    val payloads = Multimodal.jpegPayloads(fixture, "doc_id", q = 0.9f)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val bytes = payloads(id)
      // JPEG/JFIF magic
      (bytes(0) & 0xff) shouldBe 0xff
      (bytes(1) & 0xff) shouldBe 0xd8
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      var err = 0L
      for (y <- 0 until h; x <- 0 until w)
        err += math.abs((img.getRGB(x, y) & 0xff) - Multimodal.imgGray(id, x, y)).toLong
      val mae = err.toDouble / (w * h)
      // the ramp raster is high-frequency (worst case for DCT); q=0.9
      // keeps it well under half the gray range
      mae should be < 64.0
    }
  }

  it("decimateWavPayloads halves the rate keeping every 2nd sample, integer-exact") {
    val out = Multimodal.decodeAudio(
      Multimodal.decimateWavPayloads(
        Multimodal.wavPayloads(fixture, "doc_id"), stride = 2))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 456L)) {
      val n = Multimodal.audioNSamples(id)
      val n2 = (n + 1) / 2
      var sum = 0L
      var peak = 0
      for (j <- 0 until n2) {
        val s = Multimodal.audioSample(id, j * 2)
        sum += s.toLong * (j + 1)
        peak = math.max(peak, math.abs(s))
      }
      val r = out(id)
      r.getInt(1) shouldBe 4000
      r.getInt(2) shouldBe n2
      r.getLong(3) shouldBe sum
      r.getInt(4) shouldBe peak
    }
  }

  it("stride-1 decimation is the identity on the PCM stream") {
    val once = Multimodal.decodeAudio(
      Multimodal.wavPayloads(fixture, "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val through = Multimodal.decodeAudio(
      Multimodal.decimateWavPayloads(
        Multimodal.wavPayloads(fixture, "doc_id"), stride = 1))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    through shouldBe once
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

  it("dHash through the real codec equals the analytic gradient bits, and twins collide") {
    import spark.implicits._
    // the raster generator's full period is lcm(16, 12, 256) = 768:
    // ids i and i + 768 render IDENTICAL images
    val ids = Seq(0L, 5L, 123L, 0L + 768L, 5L + 768L).toDF("doc_id")
    val fp = Multimodal.dHash(Multimodal.pngPayloads(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    fp(0L) shouldBe fp(768L)
    fp(5L) shouldBe fp(773L)
    // analytic mirror of the bit definition
    def expected(id: Long): (Long, Long) = {
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      var lo = 0L; var hi = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = y * h / 8
        if (Multimodal.imgGray(id, (x + 1) * w / 9, sy) > Multimodal.imgGray(id, x * w / 9, sy)) {
          val b = y * 8 + x
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      (lo, hi)
    }
    fp.foreach { case (id, got) => got shouldBe expected(id) }
  }

  it("dHashPairs banding loses no pair vs brute-force hamming (pigeonhole completeness)") {
    import spark.implicits._
    val ids = (0L until 60L).toDF("doc_id")
    val media = Multimodal.pngPayloads(ids, "doc_id")
    val banded = Multimodal.dHashPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fp = Multimodal.dHash(media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = (for {
      a <- fp.keys; b <- fp.keys if a < b
      d = java.lang.Long.bitCount(fp(a)._1 ^ fp(b)._1) +
        java.lang.Long.bitCount(fp(a)._2 ^ fp(b)._2)
      if d <= 3
    } yield (a, b, d)).toSet
    banded shouldBe brute
    brute.exists(_._3 == 0) shouldBe true // the fixture really has visual dups
  }

  it("audioPrint through the real codec equals the analytic shape bits and is gain-invariant") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 31L, 123L, 456L).toDF("doc_id")
    val fp = Multimodal.audioPrint(Multimodal.wavPayloads(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // analytic mirror of the bit definition
    def expected(id: Long): (Long, Long) = {
      val n = Multimodal.audioNSamples(id)
      var lo = 0L; var hi = 0L
      for (b <- 0 until 64) {
        if (Multimodal.audioSample(id, (b + 1) * n / 65) > Multimodal.audioSample(id, b * n / 65)) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      (lo, hi)
    }
    fp.foreach { case (id, got) => got shouldBe expected(id) }
    // shape bits survive a strictly-increasing amplitude map: halve every
    // sample toward zero (exact for even magnitudes, order-preserving in
    // general up to ties — the fixture ids here produce no ties at the
    // compared grid points, asserted below)
    def halved(id: Long): (Long, Long) = {
      val n = Multimodal.audioNSamples(id)
      var lo = 0L; var hi = 0L
      for (b <- 0 until 64) {
        val (i0, i1) = (b * n / 65, (b + 1) * n / 65)
        val (s0, s1) = (Multimodal.audioSample(id, i0) / 2, Multimodal.audioSample(id, i1) / 2)
        if (i0 != i1) (s0 == s1) shouldBe false // no ties introduced
        if (s1 > s0) { if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32) }
      }
      (lo, hi)
    }
    fp.foreach { case (id, got) => got shouldBe halved(id) }
  }

  it("audioPrintPairs banding loses no pair vs brute-force hamming") {
    import spark.implicits._
    val ids = (0L until 80L).toDF("doc_id")
    val media = Multimodal.wavPayloads(ids, "doc_id")
    val banded = Multimodal.audioPrintPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fp = Multimodal.audioPrint(media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = (for {
      a <- fp.keys; b <- fp.keys if a < b
      d = java.lang.Long.bitCount(fp(a)._1 ^ fp(b)._1) +
        java.lang.Long.bitCount(fp(a)._2 ^ fp(b)._2)
      if d <= 3
    } yield (a, b, d)).toSet
    banded shouldBe brute
  }

  it("video dedup: trimmed re-posts (prefix sub-clips) cluster with their source via frame containment") {
    import spark.implicits._
    // ids 0..8 = three groups of 3 sharing one frame sequence at different
    // lengths (gifPooledPayloads ck = (id/3)*8 + f): every shorter video is
    // an exact prefix sub-clip of its group's longer ones.
    val vids = Multimodal.gifPooledPayloads((0L until 9L).toDF("doc_id"), "doc_id")
    val prints = Multimodal.framePrints(vids)
    // frame counts come through the real GIF container
    prints.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      (0L until 9L).map(id => id -> (id % 4 + 2)).toMap
    // a strict prefix sub-clip has containment 1.0 toward its source
    val cont = Multimodal.videoContainment(prints, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    cont((0L, 1L)) shouldBe 1.0 // video 0 (2 frames) inside video 1 (3 frames)
    cont((4L, 3L)) shouldBe 1.0 // video 4 (2 frames) inside video 3 (5 frames)
    val clusters = Multimodal.videoDedupClusters(vids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.size shouldBe 9
    // each group collapses to one cluster labeled by its min id
    (0L until 9L).foreach(id => clusters(id) shouldBe (id / 3) * 3)
  }
}
