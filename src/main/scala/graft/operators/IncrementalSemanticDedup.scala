package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time SEMANTIC (embedding-space) near-duplicate suppression — the
  * embedding twin of [[IncrementalDedup]]: instead of re-running the
  * all-corpus cluster-blocked pair job per batch
  * ([[Similarity.semanticDedup]]), persist each kept vector's
  * `(id, cell, v)` membership against a FROZEN trained centroid model and
  * check every NEW batch only against accumulated SAME-CELL members.
  *
  * Per batch:
  *  1. assign each batch vector to its nearest frozen cell (in-row argmax
  *     over the literal model — map-only);
  *  2. drop vectors whose rounded cosine to any STORED same-cell member
  *     reaches `minCos` (a cell join whose right side grows with the
  *     corpus' kept vectors, not with batches replayed);
  *  3. drop in-batch near-dups (same-cell pairs a < b, keep the smallest
  *     id — exactly [[IncrementalDedup]]'s in-batch rule);
  *  4. append the SURVIVORS' memberships.
  *
  * The model is frozen for the store's lifetime (train-rarely, the
  * [[AnnIndexStore]] lifecycle): cell assignment is deterministic, so a
  * batch's blocking never shifts under replay. Like every streaming dedup,
  * the incremental form keeps the FIRST-seen representative of each
  * duplicate group; with ids assigned in arrival order this is the batch
  * job's min-id representative, and incremental(b1, b2) yields exactly
  * batch(b1 ∪ b2)'s kept set (spec'd) — unless a LATER batch's vector
  * transitively bridges two groups an earlier batch already split (the
  * inherent cross-batch CC limit, shared with [[IncrementalDedup]]).
  */
object IncrementalSemanticDedup {

  /** Parquet-backed membership table: (id long, cell int, v array<float>,
    * batch_id long). `batch_id` tags which ingest batch wrote each row —
    * the handle the replay-stable [[dedupBatchIdempotent]] needs. Reads
    * pin an EXPLICIT schema (the [[IncrementalDedup.BucketStore]] lesson:
    * never footer-sampled). */
  final class CellStore(spark: SparkSession, dir: String) {
    private val path = s"$dir/cell_members"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def init(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, cell INT, v ARRAY<FLOAT>, batch_id BIGINT")
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .write.parquet(path)
      }
    def members: DataFrame = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, cell INT, v ARRAY<FLOAT>, batch_id BIGINT")
      spark.read.schema(schema).parquet(path)
        .withColumn("batch_id", F.coalesce(F.col("batch_id"), F.lit(-1L)))
    }
    def append(b: DataFrame): Unit =
      b.select("id", "cell", "v", "batch_id").write.mode(SaveMode.Append).parquet(path)
  }

  /** Returns the batch rows that survive semantic dedup against the store
    * AND within the batch, and appends their memberships. A replayed batch
    * collides with its own stored members and yields ZERO survivors —
    * right when the downstream sink dedups at the row level itself. For a
    * blind append sink use [[dedupBatchIdempotent]]. */
  def dedupBatch(
      batch: DataFrame,
      store: CellStore,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      minCos: Double): DataFrame =
    dedupCore(batch, store, idCol, vecCol, centroids, minCos,
      excludeBatch = None, appendBatchId = -1L)

  /** Replay-STABLE semantic dedup for checkpointed streaming ingest:
    * collision checks exclude rows this very `batchId` wrote, so a re-run
    * micro-batch (foreachBatch is at-least-once) deterministically
    * re-yields the SAME survivor set — pair with an overwrite-by-batch-id
    * survivor sink ([[graft.streaming.StreamingSemanticDedup]]) for
    * end-to-end exactly-once survivors. Re-appended member rows are
    * harmless duplicates (collision checks reduce to distinct ids). */
  def dedupBatchIdempotent(
      batch: DataFrame,
      store: CellStore,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      minCos: Double,
      batchId: Long): DataFrame =
    dedupCore(batch, store, idCol, vecCol, centroids, minCos,
      excludeBatch = Some(batchId), appendBatchId = batchId)

  private def dedupCore(
      batch: DataFrame,
      store: CellStore,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      minCos: Double,
      excludeBatch: Option[Long],
      appendBatchId: Long): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val bs = batch.select(
        F.col(idCol).cast("long").as("id"), F.col(vecCol).as("v"),
        F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"),
        Similarity.nearestCell(F.col(vecCol), centroids).as("cell"))
    // colliding with a stored same-cell member -> near-dup of something
    // already kept (minus this batch's own rows when replay-stability is
    // asked). Member norms are recomputed map-side on read: a few flops
    // per row beats widening the persisted store.
    val corpusAll = excludeBatch.fold(store.members)(b =>
      store.members.filter(F.col("batch_id") =!= b))
    val corpus = corpusAll.select(F.col("cell"), F.col("v").as("mv"),
      F.sqrt(ndot(F.col("v"), F.col("v"))).as("mn"))
    val dupVsStore = bs.join(corpus, "cell")
      .filter(F.round(ndot(F.col("v"), F.col("mv")) / (F.col("nrm") * F.col("mn")), 4) >= minCos)
      .select(F.col("id")).distinct()
    // in-batch near-dups: same-cell pairs, keep the smallest id
    val a = bs.select(F.col("cell"), F.col("id").as("a"), F.col("v").as("av"), F.col("nrm").as("an"))
    val b = bs.select(F.col("cell"), F.col("id").as("b"), F.col("v").as("bv"), F.col("nrm").as("bn"))
    val dupInBatch = a.join(b, "cell").filter(F.col("a") < F.col("b"))
      .filter(F.round(ndot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4) >= minCos)
      .select(F.col("b").as("id")).distinct()
    val dropped = dupVsStore.union(dupInBatch).distinct()
    val kept = batch.join(
      dropped.withColumn(idCol, F.col("id")).select(idCol), Seq(idCol), "left_anti")
    // materialize BEFORE appending AND sever lineage — the kept-plan reads
    // the member table we are about to mutate (the [[IncrementalDedup]]
    // recache lesson: cache() is not enough, the path write re-evaluates)
    val keptRows = kept.pin()
    store.append(keptRows.select(
      F.col(idCol).cast("long").as("id"),
      Similarity.nearestCell(F.col(vecCol), centroids).as("cell"),
      F.col(vecCol).as("v"),
      F.lit(appendBatchId).as("batch_id")))
    keptRows
  }
}
