package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LangIdNB

/** Streaming twin of the char-trigram NB language-ID trainer
  * ([[LangIdNB]]): labelled documents arrive as a stream, and the
  * trained model is re-derivable at any time — EXACTLY the batch model,
  * because [[LangIdNB]]'s parameters are a pure function of two integer
  * count frames ((lang, gram) occurrence counts and per-lang doc
  * counts), counts merge associatively across micro-batches, and the
  * snap ([[LangIdNB.trainFromCounts]] / [[LangIdNB.priorsFromCounts]])
  * is shared code. The write side IS
  * [[StreamingDrift.attachCategorical]]'s batch_id-partitioned,
  * replay-idempotent partial layout; both count families share one
  * store, namespaced POSITIONALLY by slice prefix ("g:" + lang for gram
  * rows, the single slice "d:" for doc rows) so any label value —
  * colons included — round-trips unambiguously. */
object StreamingLangId {

  private val gramPrefix = "g:"
  private val docSlice = "d:"

  /** Persist per-batch (lang, gram) occurrence counts and per-lang doc
    * counts from a labelled document stream. Null text/label rows drop
    * on the write side, mirroring the batch trainer's pre-filter;
    * documents under 3 chars contribute no gram rows but still count
    * toward the priors — the batch semantics. */
  def attach(
      docs: DataFrame,
      checkpointDir: String,
      countsDir: String,
      textCol: String,
      labelCol: String,
      triggerMillis: Long = 1000L): StreamingQuery = {
    val d = docs.filter(F.col(textCol).isNotNull && F.col(labelCol).isNotNull)
    val gramRows = d.select(
      F.concat(F.lit(gramPrefix), F.col(labelCol).cast("string")).as("slice"),
      F.explode(LangIdNB.gramsCol(F.col(textCol))).as("cat"))
    val docRows = d.select(
      F.lit(docSlice).as("slice"), F.col(labelCol).cast("string").as("cat"))
    StreamingDrift.attachCategorical(gramRows.unionByName(docRows),
      checkpointDir, countsDir, triggerMillis = triggerMillis)
  }

  /** The merged (lang, gram, n) counts so far — [[LangIdNB.gramCounts]]
    * of everything streamed. */
  def gramCountsNow(spark: SparkSession, countsDir: String): DataFrame =
    StreamingDrift.categoricalCounts(spark, countsDir)
      .filter(F.col("slice").startsWith(gramPrefix))
      .select(F.substring(F.col("slice"), gramPrefix.length + 1, Int.MaxValue).as("lang"),
        F.col("cat").as("gram"), F.col("n"))

  /** The trained micro-nat model over everything streamed so far —
    * row-for-row the batch [[LangIdNB.train]] of the same documents. */
  def modelNow(spark: SparkSession, countsDir: String): DataFrame =
    LangIdNB.trainFromCounts(gramCountsNow(spark, countsDir))

  /** The micro-nat class priors over everything streamed so far —
    * row-for-row the batch [[LangIdNB.priors]]. */
  def priorsNow(spark: SparkSession, countsDir: String): DataFrame =
    LangIdNB.priorsFromCounts(
      StreamingDrift.categoricalCounts(spark, countsDir)
        .filter(F.col("slice") === docSlice)
        .select(F.col("cat").as("lang"), F.col("n").as("ndocs")))

  /** Score a (batch) document frame against the streamed-so-far model —
    * [[LangIdNB.score]] with both model frames read from the store. */
  def scoreNow(spark: SparkSession, countsDir: String, docs: DataFrame,
               textCol: String, idCol: String): DataFrame =
    LangIdNB.score(docs, textCol, idCol,
      modelNow(spark, countsDir), priorsNow(spark, countsDir))
}
