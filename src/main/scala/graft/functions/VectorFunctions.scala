package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

/** Engine-facing surface for the native vector expressions (implementation
  * in `org.apache.spark.sql.graftnative` for private[sql] access). */
object VectorFunctions {
  /** Codegen'd `array<float>` dot product (double accumulation). */
  def fvDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftnative.FloatVectorDot.dot(a, b)

  /** Register `fv_dot` on a live session for SQL use. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftnative.FloatVectorDot.register(spark)

  /** Install the HOF-dot → native-kernel optimizer rule on a LIVE session
    * (sessions built from a builder get it via `GraftExtensions`). */
  def installDotRewrite(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(
        org.apache.spark.sql.graftnative.NativeDotRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ org.apache.spark.sql.graftnative.NativeDotRule
}
