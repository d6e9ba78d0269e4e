package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}

/** Persisted IVF+PQ ANN index — train-rarely / encode-always.
  *
  * A 100 TB corpus APPENDS; retraining the coarse quantizer and codebooks
  * inside every search (what [[Similarity.ivfPqTopK]] does, fine for a
  * one-shot batch job) re-scans the whole corpus per run. This store splits
  * the lifecycle the way the reference's collector splits
  * persist-state/process-delta (`pkg/collectors/cf_audit_event_collector.go:92-104`):
  *
  *  - [[build]] — ONCE (or rarely): Lloyd-train the IVF centroids + PQ
  *    codebooks, snap them to fixed precision ([[Similarity.snapCentroids]]),
  *    persist the model, encode the corpus and persist `(cid, cell,
  *    pq_code)`;
  *  - [[append]] — per new batch: encode ONLY the batch against the FROZEN
  *    model (a deterministic map-only pass) and append its codes;
  *  - [[search]] — per query run: read the codes table and run the
  *    cell-partitioned ADC search ([[Similarity.ivfPqSearchFromIndex]]) —
  *    no training, no corpus re-encode.
  *
  * Because encoding is per-row deterministic against the frozen model,
  * `build(b1); append(b2)` holds exactly the same codes as
  * `build(b1 ∪ b2)` would with the same model — incremental appends lose
  * nothing (spec'd in AnnIndexStoreSpec).
  *
  * Layout under `dir`:
  *  - `model.txt` — snapped doubles, text format (Double.toString
  *    round-trips exactly, so the reloaded model is bit-identical and the
  *    literals can still be mirrored into an oracle);
  *  - `codes/` — parquet `(cid long, cell int, pq_code array<int>)`,
  *    ~m bytes per vector: the RAM-resident candidate index. Appends are
  *    plain parquet appends (same pattern as
  *    [[IncrementalDedup.BucketStore]]); reads pin an explicit schema.
  *
  * At cluster scale `dir` is any Hadoop-FS path (all I/O goes through the
  * path's FileSystem); partitioning/bucketing the codes table by `cell`
  * would make the search's cell join exchange-free on the index side.
  */
final class AnnIndexStore(spark: SparkSession, dir: String) {
  import AnnIndexStore.Model

  private val modelFile = s"$dir/model.txt"
  private val codesPath = s"$dir/codes"

  private def fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(modelFile))

  /** Train on `embeddings`, persist the snapped model, encode and persist
    * the full corpus' codes (overwriting any prior index). The initial
    * corpus writes as batch −1. */
  def build(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      m: Int,
      kCodes: Int,
      iters: Int = 3,
      dim: Int = 64): Unit = {
    val (cents, books) = Similarity.trainIvfPqModel(
      embeddings, idCol, vecCol, nCentroids, m, kCodes, iters, dim)
    writeModel(Model(cents, books))
    val root = new org.apache.hadoop.fs.Path(codesPath)
    if (fs.exists(root)) fs.delete(root, true)
    writeBatchDir(embeddings, idCol, vecCol, cents, books, -1L)
  }

  /** Encode a NEW batch against the frozen persisted model and append its
    * codes — the model is never retrained here. Each call gets a fresh
    * batch directory (next free non-negative id). */
  def append(batch: DataFrame, idCol: String, vecCol: String): Unit =
    appendBatchIdempotent(batch, idCol, vecCol, nextBatchId())

  /** Replay-IDEMPOTENT append for streaming ingest: the batch's codes land
    * in their own `batch_id=<n>` partition directory with overwrite
    * semantics, so a re-run micro-batch (foreachBatch is at-least-once)
    * REWRITES identical rows instead of appending duplicates — the
    * [[graft.streaming.StreamingDedup]] survivor-sink pattern applied to
    * the index. Encoding is deterministic against the frozen model, so the
    * rewrite is byte-stable. */
  def appendBatchIdempotent(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      batchId: Long): Unit = {
    val Model(cents, books) = model
    writeBatchDir(batch, idCol, vecCol, cents, books, batchId)
  }

  private def writeBatchDir(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      batchId: Long): Unit =
    Similarity.ivfPqEncodeForIndex(batch, idCol, vecCol, cents, books)
      .write.mode(SaveMode.Overwrite).parquet(s"$codesPath/batch_id=$batchId")

  private def nextBatchId(): Long = {
    val root = new org.apache.hadoop.fs.Path(codesPath)
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") => n.stripPrefix("batch_id=").toLong }
      .foldLeft(-1L)(math.max) + 1L
  }

  /** The persisted `(cid, cell, pq_code)` index across all batches.
    * Explicit schema — never footer-sampled (the
    * [[IncrementalDedup.BucketStore]] lesson); `batch_id` comes from the
    * partition directories. */
  def codes: DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "cid BIGINT, cell INT, pq_code ARRAY<INT>, batch_id BIGINT")
    spark.read.schema(schema).option("basePath", codesPath).parquet(codesPath)
      .select("cid", "cell", "pq_code")
  }

  /** Serve a self-ANN search from the persisted index: probe cells and the
    * exact rerank use `embeddings`' raw vectors; candidates come from the
    * codes TABLE, not a re-encode. */
  def search(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nprobe: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    val Model(cents, books) = model
    Similarity.ivfPqSearchFromIndex(
      embeddings, idCol, vecCol, codes, cents, books, nprobe, shortlist, k)
  }

  /** Reload the persisted model. Bit-identical to what [[build]] trained:
    * the snapped doubles survive the toString/parse round-trip exactly. */
  def model: Model = {
    val in = fs.open(new org.apache.hadoop.fs.Path(modelFile))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val header = lines.head.split(" ")
    require(header(0) == AnnIndexStore.FormatTag,
      s"not a ${AnnIndexStore.FormatTag} model file: ${lines.head}")
    val (kC, m, kCodes) = (header(1).toInt, header(2).toInt, header(3).toInt)
    def row(l: String): Array[Double] = l.split(" ").map(_.toDouble)
    val cents = lines.slice(1, 1 + kC).map(row).toArray
    val flat = lines.slice(1 + kC, 1 + kC + m * kCodes).map(row).toArray
    val books = flat.grouped(kCodes).map(_.toArray).toArray
    Model(cents, books)
  }

  private def writeModel(mod: Model): Unit = {
    val sb = new StringBuilder
    sb.append(s"${AnnIndexStore.FormatTag} ${mod.centroids.length} " +
      s"${mod.codebooks.length} ${mod.codebooks.head.length}\n")
    mod.centroids.foreach(c => sb.append(c.mkString(" ")).append('\n'))
    mod.codebooks.foreach(_.foreach(cw => sb.append(cw.mkString(" ")).append('\n')))
    val out = fs.create(new org.apache.hadoop.fs.Path(modelFile), true)
    try out.write(sb.toString.getBytes("UTF-8"))
    finally out.close()
  }
}

object AnnIndexStore {
  private[operators] val FormatTag = "graft-ivfpq-v1"

  /** The driver-held model: kC coarse centroids + m per-subspace codebooks
    * of kCodes codewords — a few KB of snapped doubles, the ONLY state that
    * is not a distributed table. */
  final case class Model(
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]])
}
