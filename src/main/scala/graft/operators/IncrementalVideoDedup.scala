package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import graft.Pin._

/** Ingest-time VIDEO dedup — the frame-containment member of the
  * incremental family ([[IncrementalDedup]] set-Jaccard,
  * [[IncrementalCopyDetect]] substring-overlap,
  * [[IncrementalSemanticDedup]] embedding-cosine): instead of re-running
  * the all-corpus [[Multimodal.videoDedupClusters]] job per batch, persist
  * each kept video's per-frame dHash prints and check every NEW batch's
  * frames only against the accumulated prints.
  *
  * Per batch:
  *  1. decode frames and fingerprint them through the real container
  *     ([[Multimodal.framePrints]] — payloads never shuffle, 16 B/frame
  *     prints do);
  *  2. drop videos whose directed containment against any STORED video
  *     (fraction of the batch video's frames with a hamming ≤ `maxHamming`
  *     match among the stored video's frames) reaches `minContainment` —
  *     the trimmed-re-post test, via the pigeonhole banded join (batch
  *     bands × stored bands, popcount verify on candidates only);
  *  3. drop in-batch duplicates ([[Multimodal.videoContainment]] pairs at
  *     ≥ `minContainment`, keep the smallest id — the family's rule);
  *  4. append the SURVIVORS' frame prints.
  *
  * Replay stability ([[dedupBatchIdempotent]]): collision checks exclude
  * rows the same `batchId` wrote, so a re-run micro-batch re-yields the
  * identical survivor set; re-appended print rows are harmless duplicates
  * (matches count DISTINCT batch frames, and a video's own prints are
  * excluded by id). */
object IncrementalVideoDedup {

  /** Parquet-backed frame-print table: (video, f, nf, dh_lo, dh_hi,
    * batch_id). `nf` is the video's sampled-frame count at ingest (the
    * containment denominator when the stored side is the query), reads pin
    * an explicit schema (the [[IncrementalDedup.BucketStore]] lesson). */
  final class FramePrintStore(spark: SparkSession, dir: String) {
    private val path = s"$dir/frame_prints"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    private val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "video BIGINT, f BIGINT, nf BIGINT, dh_lo BIGINT, dh_hi BIGINT, batch_id BIGINT")
    def init(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .write.parquet(path)
    def prints: DataFrame = spark.read.schema(schema).parquet(path)
    def append(b: DataFrame): Unit =
      b.select("video", "f", "nf", "dh_lo", "dh_hi", "batch_id")
        .write.mode(SaveMode.Append).parquet(path)

    /** Shed prints that accumulated past `maxDf` distinct videos — the
      * BOILERPLATE-FRAME lifecycle slot (studio intros, channel outros,
      * black frames): such a frame matches everything, so its posting list
      * is what turns the banded join quadratic, and it carries no copy
      * evidence. Containment denominators (`nf`) stay frozen at each
      * video's ingest, so later checks get slightly conservative — a
      * video can only look LESS covered, erring toward keeping. Mirrors
      * [[IncrementalCopyDetect.PostingStore.compactHotHashes]];
      * rewrite-then-swap so readers never see a half-compacted table. */
    def compactHotPrints(maxDf: Long): Unit = {
      val kept = prints.withColumn("__df",
          F.size(F.collect_set("video").over(
            org.apache.spark.sql.expressions.Window.partitionBy("dh_lo", "dh_hi"))))
        .filter(F.col("__df") <= maxDf).drop("__df")
        .pin()
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.frame_prints_tmp")
      kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val live = new org.apache.hadoop.fs.Path(path)
      fs.delete(live, true)
      fs.rename(tmp, live)
    }
  }

  /** Survivors of video dedup against the store and within the batch;
    * appends their prints. A replayed batch collides with its own stored
    * prints at containment 1.0 and yields ZERO survivors — use
    * [[dedupBatchIdempotent]] behind a checkpointed stream. */
  def dedupBatch(
      media: DataFrame,
      store: FramePrintStore,
      stride: Int = 1,
      maxHamming: Int = 3,
      minContainment: Double = 0.8,
      maxPrintDf: Long = 64L): DataFrame =
    dedupCore(media, store, stride, maxHamming, minContainment,
      excludeBatch = None, appendBatchId = -1L, maxPrintDf = maxPrintDf)

  /** Replay-STABLE form for checkpointed streaming ingest: collision
    * checks exclude rows this very `batchId` wrote. */
  def dedupBatchIdempotent(
      media: DataFrame,
      store: FramePrintStore,
      batchId: Long,
      stride: Int = 1,
      maxHamming: Int = 3,
      minContainment: Double = 0.8,
      maxPrintDf: Long = 64L): DataFrame =
    dedupCore(media, store, stride, maxHamming, minContainment,
      excludeBatch = Some(batchId), appendBatchId = batchId, maxPrintDf = maxPrintDf)

  private def dedupCore(
      media: DataFrame,
      store: FramePrintStore,
      stride: Int,
      maxHamming: Int,
      minContainment: Double,
      excludeBatch: Option[Long],
      appendBatchId: Long,
      maxPrintDf: Long): DataFrame = {
    val prints = Multimodal.framePrints(media, stride)
      .select(F.col("media_id").as("video"), F.col("frame_idx").cast("long").as("f"),
        F.col("n_sampled").cast("long").as("nf"), F.col("dh_lo"), F.col("dh_hi"))
      .pin()
    val storedAll = excludeBatch.fold(store.prints)(id =>
      store.prints.filter(F.col("batch_id") =!= id))
    // boilerplate-frame cap at CHECK time (the winnow df-cap rule for
    // frames): a print in more than maxPrintDf stored videos is a studio
    // intro / black frame, not copy evidence, and its posting list is
    // what would turn the banded join quadratic. Excluding it only makes
    // videos look LESS covered — errs toward keeping.
    val hot = storedAll.groupBy("dh_lo", "dh_hi")
      .agg(F.countDistinct("video").as("__df"))
      .filter(F.col("__df") > maxPrintDf)
      .select("dh_lo", "dh_hi")
    val stored0 = storedAll.join(hot, Seq("dh_lo", "dh_hi"), "left_anti")
    // 2. cross containment: batch bands x stored bands (hamming <= k =>
    // agreement on one of k+1 bands), popcount verify, then the directed
    // containment test with the BATCH video as the query side. A video's
    // own stored prints (same id — replays, re-ingests) never suppress it.
    val cands = banded(prints, maxHamming)
      .join(banded(stored0.select(F.col("video").as("sv"), F.col("f").as("sf"),
          F.col("nf").as("snf"), F.col("dh_lo").as("slo"), F.col("dh_hi").as("shi")),
        maxHamming, lo = "slo", hi = "shi"), Seq("bi", "bval"))
      .filter(F.col("video") =!= F.col("sv"))
      .filter(F.bit_count(F.col("dh_lo").bitwiseXOR(F.col("slo"))) +
        F.bit_count(F.col("dh_hi").bitwiseXOR(F.col("shi"))) <= maxHamming)
      .select("video", "f", "nf", "sv").distinct()
    val containedInStore = cands.groupBy("video", "sv")
      .agg(F.countDistinct("f").as("matched"), F.max("nf").as("na"))
      .filter(F.col("matched").cast("double") / F.col("na").cast("double")
        >= minContainment)
      .select("video").distinct()
    // 3. in-batch duplicates: containment pairs at threshold, keep min id
    val inBatchDropped = Multimodal.videoContainment(
        prints.select(F.col("video").as("media_id"), F.col("f").cast("int").as("frame_idx"),
          F.col("nf").cast("int").as("n_sampled"), F.col("dh_lo"), F.col("dh_hi")),
        maxHamming)
      .filter(F.col("containment") >= minContainment)
      .select(F.greatest(F.col("va"), F.col("vb")).as("video")).distinct()
    val dropped = containedInStore.union(inBatchDropped).distinct()
    val kept = media.join(dropped.withColumnRenamed("video", "media_id"),
      Seq("media_id"), "left_anti")
    // 4. append survivors' prints under this batch's id
    store.append(prints.join(kept.select(F.col("media_id").as("video")), Seq("video"))
      .withColumn("batch_id", F.lit(appendBatchId)))
    kept
  }

  /** (bi, bval) banded explode of a print frame — the
    * pigeonhole-candidate key shared with the text/image banding core,
    * here over arbitrary lo/hi column names so the stored side can be
    * pre-renamed for the cross join. */
  private def banded(prints: DataFrame, maxHamming: Int,
                     lo: String = "dh_lo", hi: String = "dh_hi"): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    require(64 % nBands == 0 && 32 % bandBits == 0,
      s"need 64 divisible by maxHamming+1 with non-straddling bands, got $nBands bands")
    val perWord = math.max(32 / bandBits, 1)
    val bandExprs = (0 until nBands).map { b =>
      val word = if (b < perWord) F.col(lo) else F.col(hi)
      F.struct(F.lit(b).as("bi"),
        F.shiftright(word, (b % perWord) * bandBits)
          .bitwiseAND(if (bandBits >= 32) -1L else (1L << bandBits) - 1).as("bval"))
    }
    prints.withColumn("__e", F.explode(F.array(bandExprs: _*)))
      .withColumn("bi", F.col("__e.bi")).withColumn("bval", F.col("__e.bval"))
      .drop("__e")
  }
}
