package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

import graft.Pin._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The image path
  * runs a REAL codec end to end: [[pngPayloads]] renders deterministic
  * pixels and encodes genuine PNG bytes (`javax.imageio`), and
  * [[decodeImage]] decodes those bytes back to a raster and extracts
  * features — both via `mapPartitions`, the batch shape any codec needs.
  * Because PNG is lossless and the pixels are a pure function of
  * (media_id, x, y), the decoded checksum is analytically computable by an
  * engine that never touches PNG — which is what keeps the decode
  * hash-gated against the SQL oracle.
  *
  * Scale notes: payload bytes dominate row size, so (a) keep binary columns
  * OUT of shuffles — derive features first, project the payload away before
  * any join/groupBy; (b) `repartition` by a size-aware key before decode so
  * a partition's batch fits executor memory; (c) decode via `mapPartitions`
  * to amortize per-batch codec setup.
  */
object Multimodal {

  /** Deterministic image geometry/pixels for media id `id`: small
    * per-id-sized grayscale ramps. Mirrored analytically by the oracle. */
  def imgWidth(id: Long): Int = (id % 16 + 8).toInt
  def imgHeight(id: Long): Int = (id % 12 + 8).toInt
  def imgGray(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Render each id's deterministic raster and encode it as REAL PNG bytes
    * (`javax.imageio`). One encoder context per partition; output is
    * (media_id, payload binary). */
  def pngPayloads(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(F.col(idCol).cast(LongType).as("media_id")).mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val (w, h) = (imgWidth(id), imgHeight(id))
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = imgGray(id, x, y)
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL image decode + feature extraction: `javax.imageio` parses each
    * payload's PNG bytes back to a raster; features are the decoded
    * dimensions and a position-weighted pixel checksum
    * Σ gray(x,y) · (y·w + x + 1). Runs via `mapPartitions` — one codec
    * context per partition. */
  def decodeImage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pix_checksum", LongType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += (img.getRGB(x, y) & 0xff).toLong * (y.toLong * w + x + 1)
            x += 1
          }
          y += 1
        }
        Row(id, w, h, sum)
      }
    }(enc)
  }

  /** REAL nearest-neighbour downscale, payload→payload: decode each PNG,
    * resample to (w·numer/denom, h·numer/denom) (integer floor, min 1)
    * taking source pixel (x·w/w₂, y·h/h₂) for destination (x, y), and
    * RE-ENCODE the result as genuine PNG bytes — the image-shaping step of
    * a real pipeline (thumbnails, model-input sizing) in the same
    * mapPartitions batch shape as the codecs. Nearest-neighbour is pure
    * integer selection (no interpolation arithmetic), so resized pixels
    * are still an exact function of (id, x, y) and the downstream decode
    * stays hash-gated against an analytic oracle ([[decodeImage]] of this
    * output == the resized-grid checksum, spec'd in MultimodalSpec). */
  def resizePngPayloads(media: DataFrame, numer: Int, denom: Int): DataFrame = {
    require(numer > 0 && denom > 0, "scale must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val w2 = math.max(1, w * numer / denom)
        val h2 = math.max(1, h * numer / denom)
        val out = new java.awt.image.BufferedImage(w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out.setRGB(x, y, img.getRGB(x * w / w2, y * h / h2))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL crop, payload→payload: decode each PNG, take the axis-aligned
    * window anchored at the fractional offset (`xNum/xDen`, `yNum/yDen`)
    * of the source dims with size `wNum/wDen × hNum/hDen` (integer floor,
    * min 1, clamped to the image), re-encode as PNG. Like
    * [[resizePngPayloads]] this is pure integer pixel selection —
    * cropped pixel (x, y) IS source pixel (x0 + x, y0 + y) — so the
    * downstream decode stays hash-gated against an analytic oracle. */
  def cropPngPayloads(
      media: DataFrame,
      xNum: Int, xDen: Int,
      yNum: Int, yDen: Int,
      wNum: Int, wDen: Int,
      hNum: Int, hDen: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val x0 = math.min(w - 1, w * xNum / xDen)
        val y0 = math.min(h - 1, h * yNum / yDen)
        val cw = math.max(1, math.min(w - x0, w * wNum / wDen))
        val ch = math.max(1, math.min(h - y0, h * hNum / hDen))
        val out = img.getSubimage(x0, y0, cw, ch)
        val copy = new java.awt.image.BufferedImage(cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = copy.createGraphics()
        try g.drawImage(out, 0, 0, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(copy, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** Perceptual difference-hash (dHash) of each image payload: REAL PNG
    * decode, nearest-neighbour sample onto a 9×8 grid (the
    * [[resizePngPayloads]] selection rule — src pixel (x·w/9, y·h/8)),
    * then one bit per adjacent-column comparison `gray(x+1,y) >
    * gray(x,y)` — 64 bits of gradient structure that survive uniform
    * brightness shifts and resizing. Emitted as two 32-bit words
    * (`dh_lo` rows 0–3, `dh_hi` rows 4–7), the same overflow-free split
    * as [[Dedup.simhash64]], so the SAME banding/popcount machinery runs
    * dedup over IMAGES: dedup across modalities, one fingerprint
    * contract. Map-only via mapPartitions (one codec context per
    * partition; payloads never shuffle). */
  def dHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dh_lo", LongType),
      StructField("dh_hi", LongType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
        val (w, h) = (img.getWidth, img.getHeight)
        var lo = 0L; var hi = 0L
        var y = 0
        while (y < 8) {
          val sy = y * h / 8
          var x = 0
          while (x < 8) {
            val g0 = img.getRGB(x * w / 9, sy) & 0xff
            val g1 = img.getRGB((x + 1) * w / 9, sy) & 0xff
            if (g1 > g0) {
              val b = y * 8 + x
              if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
            }
            x += 1
          }
          y += 1
        }
        Row(id, lo, hi)
      }
    }(enc)
  }

  /** Image near-duplicate pairs: [[dHash]] fingerprints through the
    * text-dedup banding core ([[Dedup.hammingPairs64]] — pigeonhole
    * bands, popcount verify). Returns (a, b, hamming) with hamming ≤
    * `maxHamming`. The image payloads themselves never enter a shuffle:
    * only the 16-byte fingerprints do. */
  def dHashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(dHash(media), "media_id", "dh_lo", "dh_hi", maxHamming)

  /** Perceptual audio fingerprint — the waveform twin of [[dHash]]: REAL
    * WAV decode, nearest-neighbour resample of the PCM sequence onto a
    * 65-point grid (src sample `b·n/65`, the [[decimateWavPayloads]]
    * selection rule), then one bit per adjacent-point comparison
    * `s(b+1) > s(b)`. The 64 bits capture the waveform's local SHAPE, so
    * the print is invariant under any strictly-increasing amplitude map
    * (gain, DC offset) — the audio analog of dHash's brightness
    * invariance. Same two-word split (`ap_lo` bits 0–31, `ap_hi` 32–63),
    * so [[Dedup.hammingPairs64]] runs near-dup detection over AUDIO with
    * the identical pigeonhole banding + popcount machinery as text
    * simhash and image dHash: one fingerprint contract, three
    * modalities. Map-only; payloads never shuffle. */
  def audioPrint(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ap_lo", LongType),
      StructField("ap_hi", LongType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        def s(i: Int): Int = // 16-bit LE signed
          ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
        var lo = 0L; var hi = 0L
        var b = 0
        while (b < 64) {
          if (s((b + 1) * n / 65) > s(b * n / 65)) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          b += 1
        }
        Row(id, lo, hi)
      }
    }(enc)
  }

  /** Audio near-duplicate pairs: [[audioPrint]] fingerprints through the
    * shared banding core — (a, b, hamming) with hamming ≤ `maxHamming`. */
  def audioPrintPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(audioPrint(media), "media_id", "ap_lo", "ap_hi", maxHamming)

  /** LOSSY codec ingestion: encode each deterministic raster as REAL JPEG
    * bytes (`javax.imageio`, quality `q`). Unlike the PNG path the decoded
    * pixels are NOT bit-exact — which is precisely what a real pipeline
    * meets — so this path is TOLERANCE-gated in MultimodalSpec (bounded
    * mean absolute pixel error through a decode round-trip) instead of
    * hash-gated against an analytic oracle. */
  def jpegPayloads(df: DataFrame, idCol: String, q: Float = 0.9f): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(F.col(idCol).cast(LongType).as("media_id")).mapPartitions { it =>
      // one writer context per partition — codec setup amortized over the
      // batch, the same shape as the PNG/WAV paths
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(q)
      val out = it.map { row =>
        val id = row.getLong(0)
        val (w, h) = (imgWidth(id), imgHeight(id))
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = imgGray(id, x, y)
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
        ios.close()
        Row(id, bos.toByteArray)
      }
      out
    }(enc)
  }

  /** Deterministic audio for media id `id`: `nSamples(id)` 16-bit signed
    * PCM samples, sample i = (id·31 + i·7) mod 2¹⁶ − 2¹⁵. Pure integer
    * function of (id, i) — analytically mirrored by the oracle. */
  def audioNSamples(id: Long): Int = (id % 32 + 16).toInt
  def audioSample(id: Long, i: Int): Int =
    ((id * 31 + i.toLong * 7) % 65536 - 32768).toInt
  val audioSampleRate = 8000f

  /** Render each id's deterministic waveform and encode it as a REAL WAV
    * file (`javax.sound.sampled`, PCM_SIGNED 16-bit LE mono) — the audio
    * twin of [[pngPayloads]]. WAV/PCM is lossless, so the decoded samples
    * equal the generator exactly. */
  def wavPayloads(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(F.col(idCol).cast(LongType).as("media_id")).mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        audioSampleRate, 16, 1, 2, audioSampleRate, false)
      it.map { row =>
        val id = row.getLong(0)
        val n = audioNSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = audioSample(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL audio downsample, payload→payload: decode each WAV, keep every
    * `stride`-th sample (pure integer SELECTION — no filtering/averaging
    * arithmetic), re-encode as a genuine WAV at sampleRate/stride — the
    * audio twin of [[resizePngPayloads]] (model-input rate matching).
    * Decimated sample j IS source sample j·stride, so the downstream
    * decode stays hash-gated against an analytic oracle. (A production
    * resampler would low-pass first; plain decimation is the
    * deterministic, oracle-exact variant of the same plumbing.) */
  def decimateWavPayloads(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unexpected decoded format for media $id: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val n2 = (n + stride - 1) / stride
        val pcm2 = new Array[Byte](n2 * 2)
        var j = 0
        while (j < n2) {
          pcm2(2 * j) = pcm(2 * j * stride)
          pcm2(2 * j + 1) = pcm(2 * j * stride + 1)
          j += 1
        }
        val rate2 = fmt.getSampleRate / stride
        val fmt2 = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          rate2, 16, 1, 2, rate2, false)
        val ais2 = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm2), fmt2, n2.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais2, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** REAL audio decode + feature extraction: `javax.sound.sampled` parses
    * each payload's WAV header and PCM frames; features are the decoded
    * format (sample rate), sample count, a position-weighted sample
    * checksum Σ sample_i · (i+1), and the peak amplitude. The audio twin
    * of [[decodeImage]] — one codec context per partition. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("pcm_checksum", LongType),
      StructField("peak", IntegerType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unexpected decoded format for media $id: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        var sum = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))
          sum += s.toLong * (i + 1)
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        Row(id, fmt.getSampleRate.toInt, n, sum, peak)
      }
    }(enc)
  }

  /** Deterministic video geometry/pixels for media id `id`: a few small
    * grayscale frames, pixel = f(id, frame, x, y). Mirrored analytically by
    * the oracle. */
  def vidWidth(id: Long): Int = (id % 8 + 4).toInt
  def vidHeight(id: Long): Int = (id % 6 + 4).toInt
  def vidNFrames(id: Long): Int = (id % 4 + 2).toInt
  def vidGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f.toLong * 17 + x * 7 + y * 13) % 256).toInt

  /** Render each id's deterministic frame sequence and encode it as a REAL
    * multi-frame container: an animated GIF written frame-by-frame through
    * `javax.imageio`'s sequence API. Frames use an explicit 256-gray
    * indexed palette, so the palette-based GIF encoding is LOSSLESS — the
    * decoded gray values equal the generator exactly. */
  def gifPayloads(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(F.col(idCol).cast(LongType).as("media_id")).mapPartitions { it =>
      // one writer context per partition (codec setup amortized, the
      // mapPartitions batch shape any real codec needs)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      // interlacing OFF: the JDK GIF writer defaults to interlaced frames,
      // which scramble row order on decode for frames shorter than the
      // 8-row interlace passes (observed: rows [0,3,1,zeros] on a 4×4)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val gray = (0 until 256).map(_.toByte).toArray
      val palette = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
      val out = it.map { row =>
        val id = row.getLong(0)
        val (w, h, nf) = (vidWidth(id), vidHeight(id), vidNFrames(id))
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster.setSample(x, y, 0, vidGray(id, f, x, y))
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        Row(id, bos.toByteArray)
      }
      out // writer.dispose() intentionally skipped: iterator is lazy and the writer is per-partition
    }(enc)
  }

  /** REAL multi-frame decode + per-frame feature extraction — the decoded
    * counterpart of [[sampleFrames]]: `javax.imageio`'s GIF reader parses
    * the container, counts its frames, and DECODES every `stride`-th frame
    * to a raster; features are the frame count and each sampled frame's
    * position-weighted pixel checksum. */
  def decodeFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("frame_checksum", LongType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis, false)
        val nf = reader.getNumImages(true)
        val rows = (0 until nf by stride).map { f =>
          val img = reader.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) & 0xff).toLong * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          Row(id, nf, f, sum)
        }
        iis.close()
        rows
      }
    }(enc)
  }

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  /** Wrap a text frame as a fake media frame: payload = UTF-8 bytes of the
    * text (an opaque blob as far as the pipeline is concerned) plus typed
    * metadata derived deterministically from the id. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      F.col(idCol).as("media_id"),
      F.col(textCol).cast(BinaryType).as("payload"),
      F.struct(
        F.lit("image/fake").as("media_type"),
        F.octet_length(F.col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        (F.col(idCol) % 640 + 32).cast(IntegerType).as("width"),
        (F.col(idCol) % 480 + 32).cast(IntegerType).as("height"),
        (F.col(idCol) % 30 + 1).cast(IntegerType).as("n_frames")
      ).as("meta"))

  /** Frame-sampling plumbing for video-like payloads: one output row per
    * sampled frame index (every `stride`-th frame). The payload is carried
    * once per input row and the explode is on the cheap index column. */
  def sampleFrames(media: DataFrame, stride: Int = 5): DataFrame =
    media.select(
        F.col("media_id"),
        F.col("meta.n_frames").as("n_frames"),
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))).as("frame_idx"))

  // ---- video-level dedup: frame-fingerprint containment ----

  /** Pooled-frame video fixture: groups of `groupSize` consecutive ids
    * share ONE frame sequence (content key `ck = (id/groupSize)·8 + f`),
    * but each id keeps its own length `vidNFrames(id)` — so within a
    * group every shorter video is an exact PREFIX SUB-CLIP of the longer
    * ones, the canonical video-dedup case (re-encodes, trims, reposts of
    * the same clip). Frames are fixed 8×8 grayscale with ck-dependent
    * GRADIENT structure — pixel = `(ck·131 + x·(17 + (ck%7)·11) +
    * y·(29 + (ck%5)·13)) mod 256` — because dHash is invariant under the
    * uniform brightness shift a ck-only OFFSET would produce (distinct
    * frames would fingerprint identically); varying the x/y step sizes
    * with ck makes distinct pool frames genuinely distinct to the hash.
    * Encoded as a REAL animated GIF exactly like [[gifPayloads]] —
    * lossless palette, interlacing off. */
  def gifPooledPayloads(df: DataFrame, idCol: String, groupSize: Int = 3): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(F.col(idCol).cast(LongType).as("media_id")).mapPartitions { it =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val gray = (0 until 256).map(_.toByte).toArray
      val palette = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
      it.map { row =>
        val id = row.getLong(0)
        val nf = vidNFrames(id)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val ck = (id / groupSize) * 8 + f
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              img.getRaster.setSample(x, y, 0,
                ((ck * 131 + x * (17 + (ck % 7) * 11) + y * (29 + (ck % 5) * 13)) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  /** Per-frame dHash through the REAL container: the GIF reader decodes
    * every `stride`-th frame and the [[dHash]] 8×8 gradient grid runs on
    * the decoded raster — (media_id, frame_idx, n_sampled, dh_lo, dh_hi).
    * Map-only; payloads never shuffle, only 16 B/frame fingerprints do. */
  def framePrints(media: DataFrame, stride: Int = 1): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_sampled", IntegerType),
      StructField("dh_lo", LongType),
      StructField("dh_hi", LongType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { row =>
        val id = row.getLong(0)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
        reader.setInput(iis, false)
        val nf = reader.getNumImages(true)
        val sampled = (0 until nf by stride).toArray
        val rows = sampled.map { f =>
          val img = reader.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var lo = 0L; var hi = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 8) {
              val g0 = img.getRGB(x * w / 9, sy) & 0xff
              val g1 = img.getRGB((x + 1) * w / 9, sy) & 0xff
              if (g1 > g0) {
                val b = y * 8 + x
                if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
              }
              x += 1
            }
            y += 1
          }
          Row(id, f, sampled.length, lo, hi)
        }
        iis.close()
        rows
      }
    }(enc)
  }

  /** Directed video containment from frame-fingerprint matches: for each
    * ordered video pair (va, vb), the fraction of va's sampled frames with
    * a near-duplicate frame (hamming ≤ `maxHamming`) anywhere in vb. A
    * trimmed re-post scores 1.0 toward its source — the sub-clip
    * signature. Frame matching reuses the text/image banding core
    * ([[Dedup.hammingPairs64]]) on a packed (media_id·64 + frame_idx) key,
    * so candidate generation is band-bucketed, never all-frame-pairs. */
  def videoContainment(prints0: DataFrame, maxHamming: Int = 3): DataFrame = {
    // PINNED: prints feeds the banding pipeline AND the per-video frame
    // counts; unpinned, the second consumer re-ran the WHOLE upstream
    // codec pass (GIF encode + per-frame decode — the most expensive
    // per-task work in the query). 16 B/frame fingerprints, corpus-safe.
    val prints = prints0.pin()
    val fids = prints.select(
      (F.col("media_id") * 64 + F.col("frame_idx")).as("fid"),
      F.col("dh_lo"), F.col("dh_hi"))
    // PINNED: pairs feeds both directed expansions below; unpinned, the
    // banding self-join + popcount verify ran twice. Bounded by the
    // verified match count.
    val pairs = Dedup.hammingPairs64(fids, "fid", "dh_lo", "dh_hi", maxHamming).pin()
    // expand a<b frame pairs into both directed (va, fa, vb) match rows
    val d1 = pairs.select((F.col("a") / 64).cast(LongType).as("va"),
      (F.col("a") % 64).cast(IntegerType).as("fa"), (F.col("b") / 64).cast(LongType).as("vb"))
    val d2 = pairs.select((F.col("b") / 64).cast(LongType).as("va"),
      (F.col("b") % 64).cast(IntegerType).as("fa"), (F.col("a") / 64).cast(LongType).as("vb"))
    val matches = d1.union(d2).filter(F.col("va") =!= F.col("vb"))
    val nFrames = prints.groupBy(F.col("media_id").as("va"))
      .agg(F.max("n_sampled").as("na"))
    matches.groupBy("va", "vb")
      .agg(F.countDistinct("fa").as("n_matched"))
      .join(nFrames, "va")
      .select(F.col("va"), F.col("vb"), F.col("n_matched"),
        (F.col("n_matched").cast("double") / F.col("na").cast("double")).as("containment"))
  }

  /** Video-level duplicate clusters: frames → per-frame dHash → banded
    * frame matches → directed containment ≥ `minContainment` → undirected
    * edges → one connected-components pass over all videos. Composes the
    * image-dedup machinery at the VIDEO granularity, the way
    * q_crossmodal_dedup composes it across modalities. */
  def videoDedupClusters(
      media: DataFrame,
      stride: Int = 1,
      maxHamming: Int = 3,
      minContainment: Double = 0.8,
      nodes: Option[DataFrame] = None): DataFrame = {
    val edges = videoContainment(framePrints(media, stride), maxHamming)
      .filter(F.col("containment") >= minContainment)
      .select(F.least(F.col("va"), F.col("vb")).as("a"),
        F.greatest(F.col("va"), F.col("vb")).as("b"))
      .distinct()
    // The node list is just media_id — but `media` is typically an opaque
    // codec mapPartitions (payload synth/encode) that column pruning
    // cannot see through, so deriving ids from it re-ran the WHOLE encode
    // pass. Callers that know the id universe pass it via `nodes`
    // (one long per video); the default keeps the old derivation.
    val nodeDf = nodes.getOrElse(media.select(F.col("media_id").as("node")))
    Dedup.connectedComponents(edges, nodeDf)
      .select(F.col("node").as("media_id"), F.col("label").as("cluster"))
  }
}
