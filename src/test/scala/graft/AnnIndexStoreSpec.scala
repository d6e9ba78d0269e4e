package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{AnnIndexStore, Similarity}

/** Train-rarely/encode-always lifecycle of the persisted IVF+PQ index
  * (AnnIndexStore): the model freezes at build time, appends encode only
  * the new batch, and the incremental index is EXACTLY the index a full
  * rebuild (same model) would hold — so serving from it equals the inline
  * train+serve search. */
class AnnIndexStoreSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val batch1 = emb.filter(F.col("vec_id") % 2 === 0)
  private lazy val batch2 = emb.filter(F.col("vec_id") % 2 =!= 0)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("ann_index_spec_").toString

  it("persisted model reloads bit-identically (snapped doubles round-trip)") {
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    val (cents, books) = Similarity.trainIvfPqModel(
      batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    val mod = store.model
    mod.centroids.map(_.toSeq).toSeq shouldBe cents.map(_.toSeq).toSeq
    mod.codebooks.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      books.map(_.map(_.toSeq).toSeq).toSeq
  }

  it("build(b1) + append(b2) holds exactly the codes of a full encode against the frozen model") {
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    val modelBefore = store.model
    store.append(batch2, "vec_id", "embedding")
    // append must NOT have retrained
    store.model.centroids.map(_.toSeq).toSeq shouldBe
      modelBefore.centroids.map(_.toSeq).toSeq
    val incremental = store.codes
      .select(F.col("cid"), F.col("cell"), F.col("pq_code").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val full = Similarity.ivfPqEncodeForIndex(
      emb, "vec_id", "embedding", modelBefore.centroids, modelBefore.codebooks)
      .select(F.col("cid"), F.col("cell"), F.col("pq_code").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    incremental shouldBe full
    incremental.size shouldBe emb.count()
  }

  it("search from the incrementally-built index equals the inline train+serve search") {
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    store.append(batch2, "vec_id", "embedding")
    val mod = store.model
    val served = store.search(emb, "vec_id", "embedding", nprobe = 2, shortlist = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val inline = Similarity.ivfPqTopKWithModel(
      emb, "vec_id", "embedding", mod.centroids, mod.codebooks,
      nprobe = 2, shortlist = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    served shouldBe inline
    served should not be empty
  }
}
