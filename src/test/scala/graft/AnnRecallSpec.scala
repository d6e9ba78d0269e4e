package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Similarity

/** Quality evidence for the approximate similarity paths: recall@3 of the
  * LSH and IVF indexes against exhaustive brute force on the sf0.001
  * embeddings fixture. Guards against a silently-broken index (bucketing
  * that scatters true neighbours loses recall immediately). */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }

  private lazy val exact: Map[Long, Set[Long]] =
    topkSets(Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
      .select("qid", "cid"))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.get(q).map(found => (found intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  it("multi-probe LSH lifts recall well above single-probe and random") {
    val single = recallOf(topkSets(
      Similarity.lshTopK(emb, "vec_id", "embedding", nbits = 8, k = 3).select("qid", "cid")))
    val multi = recallOf(topkSets(
      Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding", nbits = 8, k = 3).select("qid", "cid")))
    info(f"LSH sign-bucket recall@3: single-probe = $single%.3f, multi-probe = $multi%.3f")
    single should be > 1.0 / 256 * 3 // several times better than random buckets
    multi should be > single * 2 // the multi-probe lift is the point
  }

  it("IVF recall@3 beats random cell assignment by a wide margin") {
    val r = recallOf(topkSets(
      Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 8, k = 3).select("qid", "cid")))
    info(f"IVF(8 cells, nprobe=1) recall@3 = $r%.3f")
    r should be > 0.2 // random 8-cell assignment gives ~0.125
  }
}
