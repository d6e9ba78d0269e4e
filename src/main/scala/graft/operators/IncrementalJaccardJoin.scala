package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import graft.Pin._

/** Incremental EXACT Jaccard similarity join — [[FuzzyJoin.jaccardPrefixJoin]]
  * against an ACCUMULATING corpus: each batch probes the persisted prefix
  * postings of everything seen before, emits its threshold-passing pairs
  * (cross-batch AND within-batch), and appends its own postings. Nothing
  * ever re-blocks the history.
  *
  * Why this stays EXACT without re-ranking the vocabulary: the prefix
  * theorem needs only that both documents' prefixes were taken under ONE
  * common total order of tokens — ANY fixed total order is correct
  * (rarity-first merely keeps the candidate buckets small). So the token
  * order is FROZEN at first sight: a token's id never changes once
  * assigned, and unseen tokens of a new batch extend the order BELOW the
  * frozen range (ids descend), i.e. they sort as "rarest" — the right
  * heuristic for never-seen tokens and a pure extension, so every
  * previously persisted sorted array and prefix stays valid verbatim.
  *
  * Replay contract (the [[IncrementalFuzzyJoin]] recipe): all three
  * stores are partitioned by `batch_id`, a batch's appends OVERWRITE its
  * own partitions, and the probe/assignment side excludes the batch's own
  * partitions — an at-least-once re-run sees identical prior state,
  * re-assigns identical ids (the two-phase ranker is deterministic), and
  * re-emits identical pairs. */
object IncrementalJaccardJoin {

  /** Persisted state: vocabulary (tok, tid), per-doc sorted id arrays
    * (id, stoks, sz), and prefix postings (key, id, sz, pos) — each
    * partitioned by batch_id. */
  final class Store(spark: SparkSession, dir: String) {
    private[operators] val vocabPath = s"$dir/jacc_vocab"
    private[operators] val docsPath = s"$dir/jacc_docs"
    private[operators] val prefixPath = s"$dir/jacc_prefix"
    private def fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    private def readOr(path: String, schema: StructType): DataFrame =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.option("basePath", path).parquet(path)
        .select(schema.fieldNames.map(F.col).toSeq: _*)

    def vocab: DataFrame = readOr(vocabPath, StructType(Seq(
      StructField("tok", StringType), StructField("tid", LongType),
      StructField("batch_id", LongType))))

    def docs: DataFrame = readOr(docsPath, StructType(Seq(
      StructField("id", LongType), StructField("stoks", ArrayType(LongType)),
      StructField("sz", LongType), StructField("batch_id", LongType))))

    def prefixes: DataFrame = readOr(prefixPath, StructType(Seq(
      StructField("key", LongType), StructField("id", LongType),
      StructField("sz", LongType), StructField("pos", LongType),
      StructField("batch_id", LongType))))

    private[operators] def append(df: DataFrame, path: String, cols: Seq[String],
                                  batchId: Long): Unit =
      df.select(cols.map(F.col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/batch_id=$batchId")
  }

  /** Match `batch` against the accumulated corpus and itself at
    * `tauNum/tauDen`, then append its vocabulary extension, doc arrays,
    * and prefix postings. Output pairs are id-normalized (id_a < id_b);
    * the union of per-batch outputs over any batch split equals
    * [[FuzzyJoin.jaccardPrefixJoin]] over the full corpus (same theorem,
    * different — still total — token order). */
  def matchBatch(batch: DataFrame, store: Store, idCol: String, textCol: String,
                 tauNum: Int, tauDen: Int, batchId: Long): DataFrame = {
    val docs = batch.select(F.col(idCol).as("id"),
      F.array_distinct(F.split(F.col(textCol), " ")).as("toks"))
    val toks = docs.select(F.explode(F.col("toks")).as("tok"))
      .groupBy("tok").agg(F.count(F.lit(1)).as("cnt"))
    val priorVocab = store.vocab.filter(F.col("batch_id") =!= batchId)
      .select("tok", "tid")
    // frozen-order extension: unseen tokens get ids BELOW everything
    // assigned so far (they sort as rarest); the 1-row min is bounded
    val known = toks.join(priorVocab, "tok").select("tok", "tid")
    val unseen = toks.join(priorVocab, Seq("tok"), "left_anti")
    val floor = priorVocab.agg(F.min("tid")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    // rank unseen tokens most-frequent-first so tid = floor - rank puts
    // the RAREST at the most negative id — i.e. order-smallest, keeping
    // ascending-tid order rarity-first within the extension
    // pinned: consumed by the doc-array build AND its own store append
    val fresh = AuditQueries
      .assignIngestSeqDistributed(
        unseen.withColumn("negcnt", -F.col("cnt")), 0L, Seq("negcnt", "tok"))
      .select(F.col("tok"), (F.lit(floor) - F.col("id")).as("tid"))
      .pin()
    val vocabAll = known.unionByName(fresh)
    // per-doc sorted id arrays; the prefix/candidate arithmetic is the
    // SHARED [[FuzzyJoin.prefixPostings]]/[[FuzzyJoin.prefixCandidates]]
    // — one definition of the theorem's formulas for both join forms.
    // localCheckpoint: the batch plan is consumed by three store appends
    // AND the returned pairs frame — without pinning, each consumer
    // re-runs the ranker + doc aggregation from scratch (~4x the work
    // per streaming trigger).
    val sorted = docs.select(F.col("id"), F.explode(F.col("toks")).as("tok"))
      .join(vocabAll, "tok")
      .groupBy("id")
      .agg(F.array_sort(F.collect_list(F.col("tid"))).as("stoks"))
      .select(F.col("id"), F.col("stoks"),
        F.size(F.col("stoks")).cast("long").as("sz"))
      .pin()
    val keyed = FuzzyJoin.prefixPostings(sorted, tauNum, tauDen)
      .pin()
    // candidates: batch keys vs (prior postings ∪ the batch itself)
    val priorKeys = store.prefixes.filter(F.col("batch_id") =!= batchId)
      .select("key", "id", "sz", "pos")
    val crossC = FuzzyJoin
      .prefixCandidates(keyed, priorKeys, tauNum, tauDen, ordered = false)
      .select(F.least(F.col("id_a"), F.col("id_b")).as("id_a"),
        F.greatest(F.col("id_a"), F.col("id_b")).as("id_b"))
    val withinC = FuzzyJoin
      .prefixCandidates(keyed, keyed, tauNum, tauDen, ordered = true)
    val cands = crossC.unionByName(withinC).distinct()
    // verify with the long-array merge kernel; arrays come from the batch
    // (left) and batch ∪ prior (right)
    val priorDocs = store.docs.filter(F.col("batch_id") =!= batchId)
      .select("id", "stoks", "sz")
    val allDocs = sorted.unionByName(priorDocs)
    val verified = cands
      .join(allDocs.select(F.col("id").as("id_a"), F.col("stoks").as("t_a"),
        F.col("sz").as("sz_a")), "id_a")
      .join(allDocs.select(F.col("id").as("id_b"), F.col("stoks").as("t_b"),
        F.col("sz").as("sz_b")), "id_b")
    val inter = org.apache.spark.sql.graftnative.SetFunctions
      .sortedIntersectCountLong(F.col("t_a"), F.col("t_b"))
    val union = F.col("sz_a") + F.col("sz_b") - inter
    val pairs = verified
      .withColumn("inter", inter)
      .withColumn("un", union)
      .filter(F.col("inter") * tauDen >= F.col("un") * tauNum)
      .select(F.col("id_a"), F.col("id_b"),
        F.round(F.col("inter").cast("double") / F.col("un").cast("double"), 4).as("jac"))
    store.append(fresh, store.vocabPath, Seq("tok", "tid"), batchId)
    store.append(sorted, store.docsPath, Seq("id", "stoks", "sz"), batchId)
    store.append(keyed, store.prefixPath, Seq("key", "id", "sz", "pos"), batchId)
    pairs
  }
}
