package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Pca

/** Streaming covariance / PCA over an embedding stream: the covariance
  * moments (n, Σx_i, Σx_i·x_j) are PLAIN SUMS — the ideal streaming
  * state — so each micro-batch persists its own one-row moments partial
  * under `batch_id=` (replay-idempotent overwrite) and the board merges
  * by element-wise addition at read time. No re-scan of streamed
  * vectors, ever; the accumulated state is batches × (d + d(d+1)/2)
  * doubles.
  *
  * The read-side merge is a driver fold over those sketch-sized rows
  * (the documented d²-bounded collect class, like the PCA matrix
  * itself), re-entered through [[Pca.covarianceFromMoments]] /
  * [[Pca.topComponentsFromCov]]. Merged sums differ from a single-pass
  * scan only in summation order — ~1e-16 relative, far below the cov
  * frame's 6-decimal snap (the batch operator's own argument). */
object StreamingPca {

  def attach(
      vecs: DataFrame,
      checkpointDir: String,
      momentsDir: String,
      vecCol: String,
      dim: Int,
      triggerMillis: Long = 1000L): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pca.moments(batch, vecCol, dim)
          .write.mode(SaveMode.Overwrite).parquet(s"$momentsDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Merged moments over everything streamed so far: one row
    * (n, sums, prods), or n = 0 before the first batch. */
  def momentsNow(spark: SparkSession, momentsDir: String, dim: Int): DataFrame = {
    import spark.implicits._
    val nProds = dim * (dim + 1) / 2
    val parts: Array[Row] =
      try spark.read.parquet(momentsDir)
        .select("n", "sums", "prods").collect()
      catch { case _: org.apache.spark.sql.AnalysisException => Array.empty }
    val sums = new Array[Double](dim)
    val prods = new Array[Double](nProds)
    var n = 0L
    parts.foreach { r =>
      n += r.getLong(0)
      val s = r.getSeq[Double](1); val p = r.getSeq[Double](2)
      var i = 0
      while (i < dim) { sums(i) += s(i); i += 1 }
      i = 0
      while (i < nProds) { prods(i) += p(i); i += 1 }
    }
    Seq((n, sums.toSeq, prods.toSeq)).toDF("n", "sums", "prods")
  }

  /** The covariance board over everything streamed so far — the
    * [[Pca.covarianceMatrix]] output shape (empty until n ≥ 2). */
  def covarianceNow(spark: SparkSession, momentsDir: String, dim: Int): DataFrame =
    Pca.covarianceFromMoments(momentsNow(spark, momentsDir, dim), dim)

  /** Top-k components over everything streamed so far — the
    * [[Pca.topComponents]] result from the merged moments. */
  def topComponentsNow(spark: SparkSession, momentsDir: String, dim: Int,
                       k: Int, iters: Int = 30): (Double, Seq[(Double, Array[Double])]) =
    Pca.topComponentsFromCov(covarianceNow(spark, momentsDir, dim), dim, k, iters)
}
