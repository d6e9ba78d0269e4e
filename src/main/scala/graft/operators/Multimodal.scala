package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

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
}
