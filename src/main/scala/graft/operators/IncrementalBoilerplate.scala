package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time boilerplate removal — [[DataShaping.removeBoilerplate]] for a
  * corpus that arrives in batches: chunk document frequencies ACCUMULATE in
  * a persisted store, and each batch is cleaned against (accumulated +
  * in-batch) counts at emit time. A chunk nobody had seen twice in batch 1
  * passes through batch 1; once later batches push its df over `minDocs`,
  * it is removed from THOSE batches — emit-time decisions are final (the
  * already-shipped past is not rewritten), the standard contract for a
  * continuously-cleaning ingest pipeline.
  *
  * Scale shape matches the batch operator: the store holds one (h, cnt)
  * row per distinct chunk hash per batch (combinable sums on hash keys),
  * the batch joins it by hash, and reassembly is one bounded collect_list
  * per batch document. The store grows with distinct corpus content, not
  * with batches replayed.
  *
  * Replay-STABLE: each batch's counts land under an overwrite-by-batch-id
  * path and reads exclude the batch's own rows, so re-running a batch
  * (at-least-once foreachBatch) sees the same prior counts and re-emits
  * the SAME cleaned documents. */
object IncrementalBoilerplate {

  /** Parquet-backed per-batch chunk-df table: `chunk_df/batch=<id>/` holding
    * (h string, cnt long). Accumulated df of a hash = Σ cnt over batches. */
  final class ChunkDfStore(spark: SparkSession, dir: String) {
    private def base = s"$dir/chunk_df"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    private def batchDirs: Array[(Long, String)] = {
      val p = new org.apache.hadoop.fs.Path(base)
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=")) Some(n.stripPrefix("batch=").toLong -> st.getPath.toString)
        else None
      }
    }

    /** Accumulated (h, df) over every batch except `excludeBatch`. */
    def counts(excludeBatch: Long): DataFrame = {
      val dirs = batchDirs.filter(_._1 != excludeBatch).map(_._2)
      val schema = org.apache.spark.sql.types.StructType.fromDDL("h STRING, cnt BIGINT")
      if (dirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .groupBy("h").agg(F.sum("cnt").as("df"))
      else
        spark.read.schema(schema).parquet(dirs.toIndexedSeq: _*)
          .groupBy("h").agg(F.sum("cnt").as("df"))
    }

    /** Overwrite-by-batch-id: replays land in the same directory, so a
      * re-run replaces its own counts instead of double-counting. */
    def put(batchId: Long, counts: DataFrame): Unit =
      counts.select("h", "cnt")
        .write.mode(SaveMode.Overwrite).parquet(s"$base/batch=$batchId")
  }

  /** Clean one batch against the accumulated store: chunks whose
    * (accumulated + in-batch distinct-doc) frequency reaches `minDocs` are
    * dropped; each document re-emitted in order with removal stats
    * ([[DataShaping.removeBoilerplate]]'s output shape). The batch's own
    * per-hash counts are persisted under its batch id. */
  def cleanBatch(
      batch: DataFrame,
      store: ChunkDfStore,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      minDocs: Long,
      batchId: Long): DataFrame = {
    val chunks = DataShaping.chunkDocs(batch, idCol, textCol, chunkTokens, overlap = 0)
      .select(F.col(idCol), F.col("chunk_idx"), F.col("chunk_text"),
        F.md5(F.col("chunk_text")).as("h"))
      .pin() // several consumers; the frame is the batch's own chunks
    val batchCounts = chunks.groupBy("h")
      .agg(F.count_distinct(F.col(idCol)).as("cnt"))
    val prior = store.counts(excludeBatch = batchId)
    val totals = batchCounts
      .join(prior, Seq("h"), "left")
      .select(F.col("h"),
        (F.col("cnt") + F.coalesce(F.col("df"), F.lit(0L))).as("total"))
    val flagged = chunks.join(totals, "h")
      .withColumn("boiler", F.col("total") >= minDocs)
    val cleaned = flagged.groupBy(idCol).agg(
      F.count(F.lit(1)).as("n_chunks"),
      F.sum(F.when(F.col("boiler"), 1L).otherwise(0L)).as("n_removed"),
      F.array_join(
        F.transform(
          F.array_sort(F.collect_list(
            F.when(!F.col("boiler"),
              F.struct(F.col("chunk_idx"), F.col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("clean_text"))
      // materialize BEFORE the store write: the plan reads prior counts
      // from the directory tree we are about to mutate
      .pin()
    store.put(batchId, batchCounts)
    cleaned
  }
}
