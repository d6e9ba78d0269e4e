package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{ThetaHashAggregator, ThetaSketchAggregator}
import graft.operators.SetSketches

/** Streaming corpus-slice overlap monitoring: a stream of (slice, value)
  * rows → one theta-sketch partial per (batch, slice) persisted as
  * `batch_id`-partitioned (slice, hash) rows → stream-wide per-slice
  * sketches and pairwise overlap estimates on read (the
  * StreamingQuantiles storage contract applied to set sketches).
  *
  * Retained hashes ARE the mergeable summary: a batch partial is ≤ k
  * longs per slice regardless of batch size, a replayed batch overwrites
  * its own partition (idempotent under at-least-once foreachBatch), and
  * the read-side rebuild folds hashes back through the k-min rule — a
  * multi-way sketch union, run DISTRIBUTED by [[ThetaHashAggregator]]
  * (partials are data; nothing is collected to the driver). Because the
  * sketch is a pure function of the input value set, streamed == batch
  * exactly — not just within error — which is what the spec pins. */
object StreamingSetSketches {

  def attach(
      values: DataFrame,
      checkpointDir: String,
      summariesDir: String,
      k: Int,
      sliceCol: String = "slice",
      valueCol: String = "value",
      triggerMillis: Long = 1000L): StreamingQuery = {
    val sk = F.udaf(new ThetaSketchAggregator(k), Encoders.STRING)
    values.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.filter(F.col(sliceCol).isNotNull && F.col(valueCol).isNotNull)
          .groupBy(F.col(sliceCol).cast("string").as("set_key"))
          .agg(sk(F.col(valueCol).cast("string")).as("sk"))
          .select(F.col("set_key"), F.explode(F.col("sk.retained")).as("h"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$summariesDir/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** Stream-wide per-slice sketches as a (set_key, sk) frame — the same
    * shape [[SetSketches.pairOverlap]] consumes. Empty stream (no batch
    * committed, or everything null-filtered) → empty frame. */
  def sketches(spark: SparkSession, summariesDir: String, k: Int): DataFrame = {
    val partials =
      try spark.read.option("basePath", summariesDir).parquet(summariesDir)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          import spark.implicits._
          return Seq.empty[(String, graft.functions.ThetaSketch)].toDF("set_key", "sk")
      }
    val ag = F.udaf(new ThetaHashAggregator(k), Encoders.scalaLong)
    partials
      .select(F.col("set_key").cast("string").as("set_key"), F.col("h").cast("long").as("h"))
      .groupBy("set_key")
      .agg(ag(F.col("h")).as("sk"))
  }

  /** Stream-wide pairwise overlap estimates (see SetSketches). */
  def overlap(spark: SparkSession, summariesDir: String, k: Int): DataFrame =
    SetSketches.pairOverlap(sketches(spark, summariesDir, k), k)

  /** Sliding-window distinct counts over the stream so far: attach with
    * the DAY as the slice, and each output day k-min-folds its window's
    * per-day sketches ([[SetSketches.slidingFromDaySketches]]) — the
    * sliding COUNT(DISTINCT) monitor over an append stream, exact while
    * windows stay under k. A day split across micro-batches (or
    * replayed) folds back losslessly: retained hashes union by k-min. */
  def slidingDistinctNow(spark: SparkSession, summariesDir: String,
                         k: Int, window: Int): DataFrame =
    SetSketches.slidingFromDaySketches(
      sketches(spark, summariesDir, k)
        .select(F.col("set_key").cast("date").as("set_key"), F.col("sk")),
      window, k)
}
