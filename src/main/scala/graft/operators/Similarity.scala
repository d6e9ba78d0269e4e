package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force cosine top-k — the exact baseline; cost |Q|×|C|×dim, fine
  *    whenever the query set is small or both sides fit a partitioned join;
  *  - sign-bucket LSH (axis-aligned random-hyperplane sketch) — the scale
  *    path: vectors are hashed to 2^nbits buckets by the sign pattern of
  *    their leading dimensions, and search only compares within a bucket.
  *    At 100 TB this turns an O(N²) all-pairs search into Σ bucket²; bucket
  *    skew is handled by raising `nbits` (finer buckets) or salting the
  *    probe side.
  *
  * All arithmetic is done in DOUBLE with strictly sequential (index-order)
  * accumulation via `aggregate`/`zip_with` — no UDFs, codegen-friendly, and
  * bit-reproducible across engines that sum in index order.
  */
object Similarity {

  /** Dot product of two `array<float>` columns, accumulated in double in
    * index order. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm of an `array<float>` column (double accumulation). */
  def norm(a: Column): Column =
    F.sqrt(F.aggregate(
      F.transform(a, x => x.cast("double") * x.cast("double")),
      F.lit(0.0),
      (acc, x) => acc + x))

  /** Cosine similarity rounded to `scale` decimals (rounding makes the
    * value stable across engines that may differ in the last ulp of a
    * 64-term double sum). Computed with the native codegen'd
    * [[graft.functions.FloatVectorDot]] — bit-identical to the HOF
    * formulation (`dot`/`norm` above), just faster. */
  def cosine(a: Column, b: Column, scale: Int = 4): Column = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    F.round(ndot(a, b) / (F.sqrt(ndot(a, a)) * F.sqrt(ndot(b, b))), scale)
  }

  /** HOF (built-ins only) cosine — portable reference formulation. */
  def cosineHof(a: Column, b: Column, scale: Int = 4): Column =
    F.round(dot(a, b) / (norm(a) * norm(b)), scale)

  /** Exact brute-force top-k: for each query vector, the k most-similar
    * other vectors by (cosine desc, candidate id asc). Query side is
    * broadcast when small. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(F.col(idCol).as("qid"), F.col(vecCol).as("qv"))
    val c = embeddings.select(F.col(idCol).as("cid"), F.col(vecCol).as("cv"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("cid") =!= F.col("qid"))
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy(F.col("qid")).orderBy(F.col("cos_sim").desc, F.col("cid").asc)
    scored
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select(F.col("qid"), F.col("cid"), F.col("cos_sim"), F.col("rn"))
  }

  /** Sign-pattern LSH bucket key: '1'/'0' per leading dimension's sign.
    * An axis-aligned simplification of signed-random-projection hashing;
    * deterministic and engine-portable. */
  def signBucket(vec: Column, nbits: Int): Column =
    F.concat((1 to nbits).map(i =>
      F.when(F.element_at(vec, i) >= 0f, F.lit("1")).otherwise(F.lit("0"))): _*)

  /** Approximate self-ANN: top-k neighbours per vector among same-bucket
    * vectors only. One shuffle on the bucket key; per-bucket pair cost. */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      k: Int): DataFrame = {
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      signBucket(F.col(vecCol), nbits).as("bucket"))
    val a = withB.select(F.col("bucket"), F.col("id").as("qid"), F.col("v").as("qv"))
    val b = withB.select(F.col("bucket"), F.col("id").as("cid"), F.col("v").as("cv"))
    val scored = a.join(b, "bucket")
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy(F.col("qid")).orderBy(F.col("cos_sim").desc, F.col("cid").asc)
    scored
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select(F.col("qid"), F.col("cid"), F.col("cos_sim"), F.col("rn"))
  }

  /** Multi-probe variant of [[lshTopK]]: each query also probes the
    * `nbits` buckets at Hamming distance 1 from its own (one sign flipped),
    * the standard fix for sign-LSH's recall cliff — measured on the
    * fixtures it lifts recall@3 several-fold for a (nbits+1)× probe cost,
    * still Σ bucket² style, never |N|². */
  def lshTopKMultiProbe(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      k: Int): DataFrame = {
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      signBucket(F.col(vecCol), nbits).as("bucket"))
    // probe keys: own bucket + each 1-bit flip
    val flips = F.array(
      (F.col("bucket") +:
        (1 to nbits).map { i =>
          val flipped = F.when(F.substring(F.col("bucket"), i, 1) === "1", F.lit("0")).otherwise(F.lit("1"))
          F.concat(
            F.substring(F.col("bucket"), 1, i - 1),
            flipped,
            F.substring(F.col("bucket"), i + 1, nbits - i))
        }): _*)
    val probes = withB
      .select(F.col("id").as("qid"), F.col("v").as("qv"), F.explode(flips).as("bucket"))
    val cands = withB.select(F.col("bucket"), F.col("id").as("cid"), F.col("v").as("cv"))
    val scored = probes.join(cands, "bucket")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"), F.col("qv"), F.col("cv"))
      .distinct() // a candidate can appear via several probes
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy(F.col("qid")).orderBy(F.col("cos_sim").desc, F.col("cid").asc)
    scored
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select(F.col("qid"), F.col("cid"), F.col("cos_sim"), F.col("rn"))
  }

  /** IVF (inverted-file) approximate nearest neighbours: a coarse
    * quantizer assigns every vector to its nearest centroid's cell, and
    * search compares only within a cell (nprobe=1). Centroids here are
    * deterministically seeded (the first `nCentroids` vectors) rather than
    * k-means-trained — the partitioning/probing mechanics are identical
    * and the operator stays engine-reproducible; swap the centroid frame
    * for trained ones in production. Cost: |N|·K assignment (K broadcast)
    * + Σ cell² search, never |N|². */
  def ivfTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      k: Int): DataFrame = {
    val base = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    val centroids = base.filter(F.col("id") < nCentroids)
      .select(F.col("id").as("centroid"), F.col("v").as("cvec"))
    val byAffinity = Window.partitionBy(F.col("id"))
      .orderBy(cosine(F.col("v"), F.col("cvec")).desc, F.col("centroid").asc)
    val cells = base.crossJoin(F.broadcast(centroids))
      .withColumn("crn", F.row_number().over(byAffinity))
      .filter(F.col("crn") === 1)
      .select(F.col("id"), F.col("v"), F.col("centroid").as("cell"))
    val q = cells.select(F.col("cell"), F.col("id").as("qid"), F.col("v").as("qv"))
    val c = cells.select(F.col("cell"), F.col("id").as("cid"), F.col("v").as("cv"))
    val w = Window.partitionBy(F.col("qid")).orderBy(F.col("cos_sim").desc, F.col("cid").asc)
    q.join(c, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select(F.col("qid"), F.col("cid"), F.col("cos_sim"), F.col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b) within LSH buckets. */
  def nearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      minCosine: Double): DataFrame = {
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      signBucket(F.col(vecCol), nbits).as("bucket"))
    val a = withB.select(F.col("bucket"), F.col("id").as("a"), F.col("v").as("av"))
    val b = withB.select(F.col("bucket"), F.col("id").as("b"), F.col("v").as("bv"))
    a.join(b, "bucket")
      .filter(F.col("a") < F.col("b"))
      .withColumn("cos_sim", cosine(F.col("av"), F.col("bv")))
      .filter(F.col("cos_sim") >= minCosine)
      .select(F.col("a"), F.col("b"), F.col("cos_sim"))
  }
}
