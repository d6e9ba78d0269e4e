package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * mechanics — schema, batch shape, partition sizing — are real; the actual
  * codec step is STUBBED with a deterministic fake (image/audio libraries
  * are not available in this environment). Swap `fakeDecode` for a real
  * decoder (e.g. a JNI codec or an Arrow-batched python worker) without
  * touching the surrounding plan.
  *
  * Scale notes: payload bytes dominate row size, so (a) keep binary columns
  * OUT of shuffles — derive features first, project the payload away before
  * any join/groupBy; (b) `repartition` by a size-aware key before decode so
  * a partition's batch fits executor memory; (c) decode via `mapPartitions`
  * to amortize per-batch codec setup.
  */
object Multimodal {

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

  /** STUB decode/feature-extract step. Real implementation would hand each
    * partition's payloads to a codec in batches; the fake computes a
    * deterministic byte checksum and a "resized" dimension so downstream
    * plumbing (schema, partitioning, batch shape) is exercised for real.
    * Runs via `mapPartitions` — one codec context per partition, the shape
    * a real decoder needs. */
  def decodeFeatures(media: DataFrame, targetW: Int = 224, targetH: Int = 224): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("byte_checksum", LongType),
      StructField("out_width", IntegerType),
      StructField("out_height", IntegerType)
    ))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      // per-partition "codec" setup happens here in a real decoder
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff).toLong * ((i % 31) + 1); i += 1 }
        Row(id, bytes.length.toLong, sum, targetW, targetH)
      }
    }(enc)
  }

  /** Frame-sampling plumbing for video-like payloads: one output row per
    * sampled frame index (every `stride`-th frame). The payload is carried
    * once per input row and the explode is on the cheap index column. */
  def sampleFrames(media: DataFrame, stride: Int = 5): DataFrame =
    media.select(
        F.col("media_id"),
        F.col("meta.n_frames").as("n_frames"),
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))).as("frame_idx"))
}
