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

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def read(s: SparkSession, path: String): DataFrame = {
    val df =
      try s.read.parquet(path)
      catch {
        case e: Throwable if mentionsIllegalNanos(e) =>
          // Legacy TIMESTAMP(NANOS) generation: surface nanos as long just
          // for this one read, truncating to micros below. The conf is
          // session-global, so restore its prior value afterwards — the
          // schema (and therefore the plan) is resolved eagerly here, and
          // parquet footer reads at execution time accept the long
          // physical type without the flag.
          val prior = s.conf.getOption(NanosConf)
          s.conf.set(NanosConf, "true")
          try {
            val read = s.read.parquet(path)
            read.schema // force eager schema resolution under the flag
            read
          } finally prior match {
            case Some(v) => s.conf.set(NanosConf, v)
            case None    => s.conf.unset(NanosConf)
          }
      }
    df.schema("ts").dataType match {
      case LongType =>
        // The file carries nanos (read under the temporary flag above, or
        // by a session that had it on already): long nanos → micros.
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

  /** True only when the failure chain is the specific parquet-nanos
    * rejection: one of the two illegal-parquet-type error classes AND a
    * NANOS type named in the message. A bare "NANOS" elsewhere in an
    * unrelated failure must NOT trigger the legacy-read fallback.
    */
  private def mentionsIllegalNanos(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 10) {
      val m = t.getMessage
      if (m != null &&
          (m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("ILLEGAL_PARQUET_TYPE")) &&
          m.contains("NANOS"))
        return true
      t = t.getCause
      depth += 1
    }
    false
  }
}
