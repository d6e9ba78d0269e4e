package graft.operators
// (placed in graft.operators for private[operators] access — dev tool only)

import org.apache.spark.sql.{functions => F, SparkSession}

/** Throwaway experiment harness (r17): timing micro-hypotheses. */
object ExpJac {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val toks = docs.select(F.col("doc_id").as("id"),
      F.array_distinct(F.split(F.col("text"), " ")).as("toks"))
    (1 to 2).foreach { i =>
      time(s"#$i tokCounts")(toks.select(F.explode(F.col("toks")).as("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).as("cnt")).count())
      val tokCounts = toks.select(F.explode(F.col("toks")).as("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).as("cnt"))
      time(s"#$i vocabRank")(graft.operators.AuditQueries
        .assignIngestSeqDistributed(tokCounts, 0L, Seq("cnt", "tok")).count())
      val vocab = graft.operators.AuditQueries
        .assignIngestSeqDistributed(tokCounts, 0L, Seq("cnt", "tok"))
        .select(F.col("tok"), F.col("id").as("tid"))
      val sorted = toks.select(F.col("id"), F.explode(F.col("toks")).as("tok"))
        .join(vocab, "tok")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.col("tid"))).as("stoks"))
        .select(F.col("id"), F.col("stoks"), F.size(F.col("stoks")).as("sz"))
      time(s"#$i sortedArrays")(sorted.count())
      val sortedP = sorted.localCheckpoint(true)
      val keyed = graft.operators.FuzzyJoin.prefixPostings(sortedP, 19, 20)
      time(s"#$i postings")(keyed.count())
      val keyedP = keyed.localCheckpoint(true)
      time(s"#$i candidates")(graft.operators.FuzzyJoin
        .prefixCandidates(keyedP, keyedP, 19, 20, ordered = true).count())
      val kr = keyedP.repartition(32, F.col("key"), F.col("id"))
      time(s"#$i candidatesSpread")(graft.operators.FuzzyJoin
        .prefixCandidates(kr, kr, 19, 20, ordered = true).count())
    }
    spark.stop()
  }
}
