package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.TimestampType

import graft.sources.EventsFixture

/** Pins the legacy TIMESTAMP(NANOS) fixture path of [[EventsFixture]]:
  *
  *   - a real parquet file annotated timestamp(NANOS) (written with the
  *     raw parquet-hadoop API — Spark itself cannot produce one) loads
  *     through `EventsFixture.read` and surfaces micros-truncated,
  *     session-zoned TIMESTAMP values;
  *   - the session-global `spark.sql.legacy.parquet.nanosAsLong` conf is
  *     RESTORED to its prior value after the read (round-8 verdict: the
  *     reader used to flip it permanently, silently changing how every
  *     later INT64-nanos parquet read in the session behaved);
  *   - actions on the returned frame still execute correctly AFTER the
  *     conf is restored (the reader resolves the schema eagerly while the
  *     flag is up).
  */
class NanosFixtureSpec extends SparkSpec {

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Writes a 3-row parquet file whose `ts` is INT64 timestamp(NANOS). */
  private def writeNanosFile(): String = {
    val dir = Files.createTempDirectory("nanos-fixture").toFile
    dir.deleteOnExit()
    val path = new org.apache.hadoop.fs.Path(dir.getAbsolutePath, "part-0.parquet")
    val schema: MessageType = Types
      .buildMessage()
      .addField(Types.primitive(PrimitiveTypeName.INT64, org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .named("event_id"))
      .addField(Types.primitive(PrimitiveTypeName.INT64, org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
        .named("ts"))
      .named("events")
    val conf = new Configuration()
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(path, conf))
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    // 2021-07-04T12:00:00.123456789Z etc: nanos beyond micro precision on
    // purpose, to prove the div-1000 truncation.
    val baseNanos = 1625400000000000000L
    try Seq(0L, 1L, 2L).foreach { i =>
      writer.write(
        f.newGroup().append("event_id", i).append("ts", baseNanos + i * 1000000789L))
    } finally writer.close()
    dir.getAbsolutePath
  }

  it("reads a TIMESTAMP(NANOS) file, truncates to micros, and restores the session conf") {
    val prior = spark.conf.getOption(NanosConf)
    val dir = writeNanosFile()

    val df = EventsFixture.read(spark, dir)
    df.schema("ts").dataType shouldBe TimestampType

    withClue("nanosAsLong must be restored to its pre-read value: ") {
      spark.conf.getOption(NanosConf) shouldBe prior
    }

    // Execute AFTER the conf is back — the frame must still be readable.
    val got = df.orderBy("event_id")
      .selectExpr("event_id", "unix_micros(ts) as us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Array(
      (0L, 1625400000000000L),
      (1L, 1625400001000000L), // +1000000789 ns -> +1000000 us (truncated)
      (2L, 1625400002000001L)) // +2000001578 ns -> +2000001 us
  }

  it("restores the conf even when it was explicitly set beforehand") {
    val dir = writeNanosFile()
    spark.conf.set(NanosConf, "false")
    try {
      EventsFixture.read(spark, dir).count() shouldBe 3L
      spark.conf.get(NanosConf) shouldBe "false"
    } finally spark.conf.unset(NanosConf)
  }
}
