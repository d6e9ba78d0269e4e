package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive reader for the `events` fixture (the audit-event fact
  * table stand-in).
  *
  * Different fixture generations have carried `ts` differently: some as
  * parquet TIMESTAMP(NANOS) — which vanilla Spark rejects at schema
  * inference ([ILLEGAL_PARQUET_TYPE]/PARQUET_TYPE_ILLEGAL) — and some as
  * plain timestamp[us]. Mirroring the reference's idempotent boot-time
  * schema-evolution step (paas-auditor `db/store.go:55-71`, which ALTERs
  * a live table to the shape it needs rather than assuming it), the
  * engine inspects what the file actually carries and adapts:
  *
  *   - nanos files are read with `nanosAsLong` and truncated to micros
  *     (`ts div 1000`) — exactly what DuckDB surfaces for the same file;
  *   - micros files (TimestampType or the NTZ type Spark infers for
  *     non-UTC-adjusted parquet timestamps) are used directly.
  *
  * Output is always session-zoned TIMESTAMP at micro precision, so every
  * downstream operator sees ONE type regardless of fixture generation.
  * The session time zone is pinned UTC throughout the engine, so the NTZ
  * → TIMESTAMP cast preserves wall-clock values bit-for-bit.
  */
object EventsFixture {

  def read(s: SparkSession, path: String): DataFrame = {
    val df =
      try s.read.parquet(path)
      catch {
        case e: Throwable if mentionsIllegalNanos(e) =>
          // Legacy TIMESTAMP(NANOS) generation: surface nanos as long,
          // truncate to micros below.
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType =>
        // nanosAsLong was already on (earlier caller in this session) or
        // we just enabled it: long nanos → micros timestamp.
        df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        df.withColumn("ts", F.col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events fixture at $path carries ts: $other — expected timestamp, " +
            "timestamp_ntz, or long (nanosAsLong); regenerate fixtures or teach " +
            "EventsFixture the new encoding")
    }
  }

  /** True when the failure chain is the parquet-nanos rejection. */
  private def mentionsIllegalNanos(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 10) {
      val m = t.getMessage
      if (m != null && (m.contains("PARQUET_TYPE_ILLEGAL") ||
            m.contains("ILLEGAL_PARQUET_TYPE") || m.contains("NANOS")))
        return true
      t = t.getCause
      depth += 1
    }
    false
  }
}
