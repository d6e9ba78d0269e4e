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

  it("appendBatchIdempotent replayed with the same batch id leaves the codes unchanged") {
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    def snapshot() = store.codes
      .select(F.col("cid"), F.col("cell"), F.col("pq_code").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    store.appendBatchIdempotent(batch2, "vec_id", "embedding", batchId = 7L)
    val once = snapshot()
    // foreachBatch is at-least-once: the replay must REWRITE, not duplicate
    store.appendBatchIdempotent(batch2, "vec_id", "embedding", batchId = 7L)
    snapshot() shouldBe once
    once.map(_._1).distinct.size shouldBe emb.count()
  }

  it("a streamed index (MemoryStream micro-batches) equals the batch-built index and serves identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    val mod = store.model
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = graft.streaming.StreamingAnnIndex.attach(
      stream, java.nio.file.Files.createTempDirectory("ann_ckpt_").toString,
      store, "vec_id", "embedding", triggerMillis = 50L)
    try {
      val rows = batch2.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val (half1, half2) = rows.splitAt(rows.length / 2)
      input.addData(half1.toSeq)
      q.processAllAvailable()
      input.addData(half2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = store.codes
      .select(F.col("cid"), F.col("cell"), F.col("pq_code").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val full = Similarity.ivfPqEncodeForIndex(
      emb, "vec_id", "embedding", mod.centroids, mod.codebooks)
      .select(F.col("cid"), F.col("cell"), F.col("pq_code").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    streamed shouldBe full
    val served = store.search(emb, "vec_id", "embedding", nprobe = 2, shortlist = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val inline = Similarity.ivfPqTopKWithModel(
      emb, "vec_id", "embedding", mod.centroids, mod.codebooks,
      nprobe = 2, shortlist = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    served shouldBe inline
  }

  it("RACING appenders claim distinct batch ids — neither batch's codes are lost") {
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    // split batch2 between two concurrent appenders; the old listStatus
    // max+1 id let both compute the same id and the second overwrite
    // silently replace the first's partition
    val b2a = batch2.filter(F.col("vec_id") % 4 === 1)
    val b2b = batch2.filter(F.col("vec_id") % 4 === 3)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val fa = Future { barrier.await(); store.append(b2a, "vec_id", "embedding") }
    val fb = Future { barrier.await(); store.append(b2b, "vec_id", "embedding") }
    Await.result(fa.zip(fb), 120.seconds)
    val got = store.codes.select("cid").collect().map(_.getLong(0)).toSet
    val want = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    got shouldBe want
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

  it("index rows carry the binary-tier sign words, identical to a direct binarize") {
    import graft.operators.Quantization
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    store.append(batch2, "vec_id", "embedding") // appends carry them too
    val stored = store.codesAll.select("cid", "b_lo", "b_hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Quantization.binarize(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    stored shouldBe direct
  }

  it("tiered serve from the persisted index equals the inline three-tier cascade") {
    import graft.operators.Quantization
    val store = new AnnIndexStore(spark, tmpDir())
    store.build(batch1, "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    store.append(batch2, "vec_id", "embedding")
    val queries = emb.filter(F.col("vec_id") < 6)
    val served = store.searchTiered(emb, queries, "vec_id", "embedding",
        hammingShortlist = 16, adcShortlist = 6, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val inline = Quantization.tieredTopK(emb, queries, "vec_id", "embedding",
        store.model.codebooks, hammingShortlist = 16, adcShortlist = 6, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    served shouldBe inline
    served should not be empty
  }
}
