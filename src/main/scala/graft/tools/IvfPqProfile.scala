package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity

/** Scratch profiler for the IVF+PQ serve-path shapes (pre- vs post-shuffle
  * ADC tables) — run with SPARK_GRAFT_SF_DIR pointing at a testdata dir. */
object IvfPqProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    println("nvec=" + e.count())
    var t0 = System.nanoTime()
    val (cents, books) = Similarity.trainIvfPqModel(e, "vec_id", "embedding",
      nCentroids = 8, m = 16, kCodes = 16)
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val neu = Similarity.ivfPqTopKWithModel(e, "vec_id", "embedding", cents, books,
      nprobe = 5, shortlist = 24, k = 3)
    println("new rows=" + neu.count())
    println(f"search(post-shuffle adc): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (args.contains("explain")) neu.explain("formatted")

    // staged timings of the serve internals
    import graft.functions.VectorFunctions.{fvDot => ndot}
    def timed[T](label: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t) / 1e9}%.1f s")
      r
    }
    val base = e.select(F.col("vec_id").as("id"), F.col("embedding").as("v"),
      F.sqrt(ndot(F.col("embedding"), F.col("embedding"))).as("nrm"))
    val coded = Similarity.ivfPqEncodeForIndex(e, "vec_id", "embedding", cents, books)
    timed("coded.count")(println("  coded=" + coded.count()))
    val probes = base
      .select(F.col("id").as("qid"),
        F.explode(Similarity.probeCells(F.col("v"), cents, 5)).as("cell"),
        F.col("v").as("qv"))
      .repartition(F.col("cell"))
      .withColumn("__adc", Similarity.adcTables(F.col("qv"), books))
      .select(F.col("qid"), F.col("cell"), F.col("__adc"))
    timed("probes.count")(println("  probes=" + probes.count()))
    val adcScored = probes.join(coded, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"), Similarity.adcScore(16, 16).as("pq_dot"))
    timed("adcScored.count")(println("  adcScored=" + adcScored.count()))
    val wShort = Window.partitionBy(F.col("qid")).orderBy(F.col("pq_dot").desc, F.col("cid").asc)
    val short = adcScored
      .withColumn("srn", F.row_number().over(wShort))
      .filter(F.col("srn") <= 24)
      .select(F.col("qid"), F.col("cid"))
    spark.stop()
  }
}
