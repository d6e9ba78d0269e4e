package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.Pin._

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

  /** Frees the block-storage of a pinned frame — see [[graft.Pin.free]]. */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    graft.Pin.free(df)

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

  /** Assignment half of the coreset pair: every vector labeled with its
    * nearest selected center (min rounded-cosine distance, ties to the
    * lowest selection index) — the pruned-dataset partition a curation
    * run materializes after [[kCenterSelect]]. Pure in-row argmin over
    * the literal center list (the [[nearestCell]] shape), map-only. */
  def assignToCenters(embeddings: DataFrame, idCol: String, vecCol: String,
                      centers: Seq[(Long, Array[Double])]): DataFrame = {
    require(centers.nonEmpty, "assignToCenters needs at least one center")
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val vnorm = F.sqrt(ndot(F.col(vecCol), F.col(vecCol)))
    val entries = centers.map { case (idx, c) =>
      val cn = math.sqrt(c.map(x => x * x).reduceLeft(_ + _))
      F.struct(
        (F.lit(1.0) - F.round(dotLit(F.col(vecCol), c) / (vnorm * F.lit(cn)), 4)).as("d"),
        F.lit(idx).as("center_idx"))
    }
    embeddings.select(F.col(idCol).as("vec_id"),
        F.array_min(F.array(entries: _*)).as("__m"))
      .select(F.col("vec_id"), F.col("__m.center_idx").as("center_idx"),
        F.col("__m.d").as("dist"))
  }

  /** Greedy k-CENTER coreset selection — the data-PRUNING family member
    * (pick the k mutually-most-distant exemplars, the classic 2-approx
    * greedy): seed = the minimum id; each round adds the vector farthest
    * (max min-cosine-distance, ties to the smallest id) from the selected
    * set and reports the coverage `radius` at selection time (the
    * monotone-decreasing curve a curation run reads to pick k).
    *
    * Scale shape: k rounds, each a MAP-ONLY distance update against ONE
    * new broadcast-literal center plus a 1-ROW TakeOrdered — the bounded
    * driver collect pattern (one ~300 B row per round, like the BPE merge
    * row). Distances fold into a running `mind` column re-checkpointed
    * per round, so round i never rescans centers 1..i-1: total cost is
    * k map passes over the corpus, the textbook farthest-first shape.
    * Distance = 1 − round(cos, 4): the rounding makes the trajectory
    * (selection order AND radii) engine-exact, the snapped-model
    * pattern applied to a selection loop. */
  def kCenterSelect(embeddings: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val spark = embeddings.sparkSession
    val base = embeddings.select(F.col(idCol).cast("long").as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    def distTo(c: Array[Double]): Column = {
      val cn = math.sqrt(c.map(x => x * x).reduceLeft(_ + _))
      F.lit(1.0) - F.round(dotLit(F.col("v"), c) / (F.col("nrm") * F.lit(cn)), 4)
    }
    // guard the loop's bounded collects WITHOUT a dedicated count() scan
    // (round-8 verdict: the full count only answered emptiness + k-clamp,
    // both derivable from the collects the loop already does): the seed
    // collect detects an empty corpus, and each round anti-filters the
    // already-selected ids so the 1-row argmax collect comes back EMPTY
    // exactly when the corpus is exhausted — centers are never repeated
    // and the loop stops at min(k, N) selections.
    val seedRows = base.orderBy(F.col("id")).limit(1).select("id", "v").collect()
    if (seedRows.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("sel_idx", "vec_id", "radius")
    }
    val seed = seedRows(0)
    var selected = List((1L, seed.getLong(0), 0.0))
    var selectedIds = Set(seed.getLong(0))
    var centerVec = seed.getSeq[Float](1).map(_.toDouble).toArray
    // each round re-checkpoints the (id, v, nrm, mind) frame (truncating
    // lineage so round i never replays rounds 1..i-1) and then FREES the
    // previous round's checkpoint blocks — peak storage is one corpus
    // copy (plus a transient second during the handoff), not k copies
    var cur = base.withColumn("mind", distTo(centerVec)).pin()
    var done = false
    var i = 2
    while (i <= k && !done) {
      val nextRows = cur
        .filter(!F.col("id").isin(selectedIds.toSeq.map(Long.box): _*))
        .orderBy(F.col("mind").desc, F.col("id").asc).limit(1)
        .select("id", "v", "mind").collect()
      if (nextRows.isEmpty) done = true // k > N: corpus exhausted
      else {
        val next = nextRows(0)
        selected ::= ((i.toLong, next.getLong(0), next.getDouble(2)))
        selectedIds += next.getLong(0)
        centerVec = next.getSeq[Float](1).map(_.toDouble).toArray
        val prev = cur
        cur = cur.withColumn("mind", F.least(F.col("mind"), distTo(centerVec)))
          .pin()
        freeLocalCheckpoint(prev)
        i += 1
      }
    }
    freeLocalCheckpoint(cur)
    import spark.implicits._
    selected.reverse.map { case (i, id, r) =>
      (i, id, math.round(r * 10000.0) / 10000.0) }
      .toDF("sel_idx", "vec_id", "radius")
  }

  /** Maximal-marginal-relevance reranking — the diversification stage a
    * retrieval pipeline runs AFTER candidate generation: from each query's
    * `nCand`-candidate shortlist, greedily select `k` results maximizing
    *
    *   mmr(d) = λ·sim(q,d) − (1−λ)·max_{s ∈ selected} sim(d,s)
    *
    * so the result set is both relevant and mutually dissimilar (the
    * anti-redundancy knob for retrieval-augmented data curation).
    *
    * The greedy loop runs k driver-side ITERATIONS over DataFrame ops —
    * the data never leaves the cluster. Per iteration: anti-join the
    * shortlist against the selected set, attach max-sim-to-selected from
    * the candidate-pair frame, rank by the mmr score. Cost is bounded by
    * queries × nCand² (the pairwise-sim frame), the standard rerank
    * budget — candidate GENERATION (ANN/LSH upstream) is what scales with
    * corpus size, not this stage.
    *
    * Determinism: ranking arithmetic is EXACT — the 4-decimal-rounded
    * cosines are scaled to integers (×10⁴) and λ is applied as integer
    * weights (`wRel = round(10λ)`, `wDiv = 10 − wRel`), so the greedy
    * comparison `wRel·sᵢ − wDiv·mselᵢ` is a BIGINT with an id tiebreak —
    * no float-literal drift can flip a near-tie across engines (λ·s with
    * λ = 0.7 would: `1.0 − 0.7` and a literal `0.3` are different
    * doubles, and exact real-arithmetic ties between rounded sims are
    * common). */
  def mmrRerank(
      embeddings: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nCand: Int,
      k: Int,
      lambda: Double = 0.7): DataFrame = {
    val wRel = math.round(lambda * 10).toInt
    require(math.abs(lambda * 10 - wRel) < 1e-9,
      s"lambda must be a multiple of 0.1 (integer-exact ranking weights); got $lambda" +
        s" — it would silently run as ${wRel / 10.0}")
    val wDiv = 10 - wRel
    def toInt4(c: Column): Column = F.round(c * 10000).cast("long")
    val q = queries.select(F.col(idCol).as("qid"), F.col(vecCol).as("qv"))
    val c = embeddings.select(F.col(idCol).as("cid"), F.col(vecCol).as("cv"))
    val w = Window.partitionBy("qid").orderBy(F.col("s").desc, F.col("cid").asc)
    val cand = c.crossJoin(F.broadcast(q))
      .filter(F.col("cid") =!= F.col("qid"))
      .withColumn("s", cosine(F.col("qv"), F.col("cv")))
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= nCand)
      .select(F.col("qid"), F.col("cid"), F.col("s"), toInt4(F.col("s")).as("si"),
        F.col("cv"))
      .cache()
    // pairwise candidate sims within each query's shortlist: nCand² rows/query
    val pair = cand.select(F.col("qid"), F.col("cid").as("a"), F.col("cv").as("av"))
      .join(cand.select(F.col("qid"), F.col("cid").as("b"), F.col("cv").as("bv")), "qid")
      .filter(F.col("a") =!= F.col("b"))
      .select(F.col("qid"), F.col("a"), F.col("b"),
        toInt4(cosine(F.col("av"), F.col("bv"))).as("si_ab"))
      .cache()
    val pickW = Window.partitionBy("qid").orderBy(F.col("__score").desc, F.col("cid").asc)
    def pick(scored: DataFrame, rank: Int): DataFrame = scored
      .withColumn("__prn", F.row_number().over(pickW))
      .filter(F.col("__prn") === 1)
      .select(F.col("qid"), F.lit(rank).as("rank"), F.col("cid"),
        F.col("s").as("relevance"))
    // selected is localCheckpoint'd each step: step i's plan reads the
    // MATERIALIZED picks 1..i−1 instead of replaying them — per-step cost
    // stays flat in k rather than the O(k²) growth of an uncheckpointed
    // union chain (evidence row in OperatorBench)
    var selected = pick(cand.withColumn("__score", F.col("si")), 1).pin()
    for (step <- 2 to k) {
      val maxSel = pair
        .join(selected.select(F.col("qid"), F.col("cid").as("b")), Seq("qid", "b"))
        .groupBy(F.col("qid"), F.col("a").as("cid"))
        .agg(F.max("si_ab").as("__msel"))
      val remaining = cand
        .join(selected.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
        .join(maxSel, Seq("qid", "cid"))
        .withColumn("__score",
          F.lit(wRel) * F.col("si") - F.lit(wDiv) * F.col("__msel"))
      selected = selected.union(pick(remaining, step)).pin()
    }
    // the final frame is materialized, so the session-lifetime caches can
    // go now instead of leaking executor storage across invocations
    val out = selected.select(F.col("qid"), F.col("rank"), F.col("cid"), F.col("relevance"))
    cand.unpersist()
    pair.unpersist()
    out
  }

  /** Exact top-k per query by (`scoreCol` DESC, cid ASC) over a
    * (qid, cid, scoreCol) candidate frame — row-identical to
    * `row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC)
    * <= k` (membership, scores AND rank values; pinned in TopKSpec) but
    * built on the native bounded-priority-queue collect, which is
    * MAP-SIDE COMBINABLE: every partition forwards at most k candidates
    * per query to the shuffle, so the exchange carries O(k · partitions)
    * rows per query where the window form shuffles and fully sorts every
    * candidate row. At a 100 TB candidate stage (IVF probe joins emit
    * |Q| · corpus/kC · nprobe rows) that is the difference between a
    * shortlist that scales with k and one that scales with the candidate
    * count. Struct trick: the heap orders by (score, −cid), so score ties
    * break toward the SMALLEST cid, matching the window's `cid ASC`. */
  private[graft] def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.functions.TopK.collectTopK(
        F.struct(F.col(scoreCol), (-F.col("cid")).as("nid")), k).as("__tk"))
      .select(F.col("qid"), F.posexplode(F.col("__tk")).as(Seq("__pos", "__e")))
      .select(F.col("qid"), (-F.col("__e.nid")).as("cid"),
        F.col(s"__e.$scoreCol").as(scoreCol), (F.col("__pos") + 1).as("rn"))

  /** Matryoshka prefix truncation: keep only the first `d` dimensions of
    * the vector column. MRL-trained embeddings front-load information, so
    * downstream search/dedup on the prefix runs at d/dim the scan+compute
    * cost — the standard coarse-search (or cheap-prefilter) tier, with the
    * full vector kept for rerank. Pure in-row `slice`, map-only. */
  def truncateDims(df: DataFrame, vecCol: String, d: Int): DataFrame =
    df.withColumn(vecCol, F.slice(F.col(vecCol), 1, d))

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
    topKPerQuery(scored, "cos_sim", k)
  }

  /** Sign-pattern LSH bucket key: '1'/'0' per leading dimension's sign.
    * An axis-aligned simplification of signed-random-projection hashing;
    * deterministic and engine-portable. Kept as the cheap/demo variant —
    * production paths use [[hyperplaneBucket]] (true random projections). */
  def signBucket(vec: Column, nbits: Int): Column =
    F.concat((1 to nbits).map(i =>
      F.when(F.element_at(vec, i) >= 0f, F.lit("1")).otherwise(F.lit("0"))): _*)

  /** Seeded gaussian random-hyperplane matrices: `nTables` tables ×
    * `nbits` planes × `dim` weights. `java.util.Random.nextGaussian` is
    * spec-defined (same sequence on every JVM), so the planes are stable
    * constants; the DuckDB oracle receives the SAME doubles via
    * [[hyperplaneBucketSql]] (Double.toString round-trips exactly). */
  def gaussianPlanes(nTables: Int, nbits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nTables, nbits, dim)(rnd.nextGaussian())
  }

  /** Signed-random-projection bucket key: bit j = sign(<plane_j, vec>).
    * Each dot is accumulated in double in index order (zip_with +
    * aggregate), so the value — and therefore the sign — is bit-identical
    * to any engine that sums the same literals sequentially.
    *
    * Guarded against a vector/plane dimension mismatch: zip_with's null
    * padding would otherwise poison every dot to null, send EVERY vector
    * to the identical all-'0' bucket, and silently turn the bucketed
    * search into a full N² cross join — so a mismatched row raises
    * instead. */
  def hyperplaneBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val dim = planes.head.length
    val bits = F.concat(planes.map { p =>
      val dot = F.aggregate(
        F.zip_with(vec, F.typedlit(p.toSeq), (x, y) => x.cast("double") * y),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))
    }.toSeq: _*)
    F.when(F.size(vec) === dim, bits)
      .otherwise(F.raise_error(F.concat(
        F.lit(s"hyperplaneBucket: expected $dim-dim vector, got "),
        F.size(vec).cast("string"), F.lit(" dims"))))
  }

  /** Johnson–Lindenstrauss random projection: replace `vecCol` with its
    * image under the seeded gaussian plane matrix (one [[gaussianPlanes]]
    * table) — dim → planes.length in one map-only pass. JL says pairwise
    * geometry survives within (1 ± ε) at k = O(log N / ε²) target dims,
    * so downstream cosine search runs at k/dim of the scan+FLOP cost; at
    * 100 TB this is the cheapest dimensionality lever (no training at
    * all, unlike PQ/IVF — the projection IS the literals). Unlike
    * [[truncateDims]] (matryoshka prefixes, which need the embedding
    * model trained for it), this works on ANY embedding column.
    *
    * Each coordinate is the plane dot accumulated in index order
    * (zip_with + aggregate, the [[hyperplaneBucket]] discipline), then
    * narrowed to float so the projected column keeps the embedding
    * schema's `array<float>` type (every downstream vector operator —
    * fv_dot, IVF, PQ — consumes it unchanged). double→float is one IEEE
    * round-to-nearest, identical on any engine. */
  def randomProject(df: DataFrame, vecCol: String, planes: Array[Array[Double]]): DataFrame = {
    val dim = planes.head.length
    val coords = planes.map { p =>
      F.aggregate(
        F.zip_with(F.col(vecCol), F.typedlit(p.toSeq), (x, y) => x.cast("double") * y),
        F.lit(0.0), (acc, x) => acc + x)
    }
    val proj = F.when(F.size(F.col(vecCol)) === dim,
        F.array(coords.toIndexedSeq: _*).cast("array<float>"))
      .otherwise(F.raise_error(F.concat(
        F.lit(s"randomProject: expected $dim-dim vector, got "),
        F.size(F.col(vecCol)).cast("string"), F.lit(" dims"))))
    df.withColumn(vecCol, proj)
  }

  /** The DuckDB list expression projecting `vecExpr` through the SAME
    * plane literals: per plane a left-associated `w * CAST(vec[i] AS
    * DOUBLE)` chain in index order, narrowed to REAL[] like the Spark
    * side — [[randomProject]]'s mirror. */
  def randomProjectSqlList(planes: Array[Array[Double]], vecExpr: String): String =
    "CAST(" + planes.map { p =>
      p.zipWithIndex.map { case (w, d) =>
        s"($w) * CAST($vecExpr[${d + 1}] AS DOUBLE)"
      }.mkString(" + ")
    }.mkString("[", ", ", "]") + " AS REAL[])"

  /** The DuckDB expression computing the identical bucket key: per plane a
    * left-associated sum of `w * CAST(vec[i] AS DOUBLE)` terms in index
    * order (bit-identical to the Spark accumulation), sign-thresholded. */
  def hyperplaneBucketSql(planes: Array[Array[Double]], vecExpr: String): String =
    planes.map { p =>
      val terms = p.zipWithIndex.map { case (w, d) =>
        s"($w) * CAST($vecExpr[${d + 1}] AS DOUBLE)"
      }.mkString(" + ")
      s"(CASE WHEN $terms >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Approximate self-ANN: top-k neighbours per vector among same-bucket
    * vectors only (one seeded random-hyperplane table). One shuffle on the
    * bucket key; per-bucket pair cost. Single-table recall is intrinsically
    * low on isotropic data — use [[multiTableLshTopK]] as the real ANN
    * path; this is the one-table building block. */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      k: Int,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = gaussianPlanes(1, nbits, dim, seed)(0)
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      hyperplaneBucket(F.col(vecCol), planes).as("bucket"))
    val a = withB.select(F.col("bucket"), F.col("id").as("qid"), F.col("v").as("qv"))
    val b = withB.select(F.col("bucket"), F.col("id").as("cid"), F.col("v").as("cv"))
    val scored = a.join(b, "bucket")
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    topKPerQuery(scored, "cos_sim", k)
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
      k: Int,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = gaussianPlanes(1, nbits, dim, seed)(0)
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      hyperplaneBucket(F.col(vecCol), planes).as("bucket"))
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
    topKPerQuery(scored, "cos_sim", k)
  }

  /** Multi-table random-hyperplane LSH — the production ANN path. `L`
    * independent seeded hyperplane tables of `nbits` bits each; a pair is
    * a candidate if it collides in ANY table; candidates are deduped, then
    * exactly scored and top-k ranked.
    *
    * Recall math (why multi-table, not more probes): for a neighbour at
    * angle θ, one b-bit table collides with probability (1−θ/π)^b, so L
    * tables give 1−(1−(1−θ/π)^b)^L — tunable to any recall target even on
    * isotropic data, while cost stays Σ_table Σ_bucket² (never |N|²). With
    * b=6, L=16 and θ≈65° (a typical nearest neighbour in the synthetic
    * fixture) that is ≈0.7 expected recall at roughly L·N/2^b candidate
    * comparisons per query — on clustered real embeddings the buckets
    * align with clusters and the candidate fraction drops further. */
  def multiTableLshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      nTables: Int,
      k: Int,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val tables = gaussianPlanes(nTables, nbits, dim, seed)
    // norms precomputed ONCE per vector (sqrt of the same double the
    // per-pair form would compute — bit-identical cosine), so scoring a
    // pair is one dot, not three
    val base = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    // one row per (vector, table) with that table's bucket key, prefixed by
    // the table index so buckets never collide across tables. Only the id
    // rides through the candidate join/dedup — vectors (the wide payload)
    // are re-attached AFTER the distinct, keeping the shuffled bytes at
    // ~16 B/pair instead of 2×dim×4 B.
    // materialized ONCE: both sides of the bucket self-join derive from
    // this frame, and each would otherwise re-run the L·nbits hyperplane
    // dots per vector (the expensive part of candidate generation —
    // differently-projected exchanges don't reuse). L rows/vector of
    // (id, short string): pinning is ~32 B/vector/table.
    val keyed = base.select(
      F.col("id"),
      F.explode(F.array(tables.zipWithIndex.map { case (p, t) =>
        F.concat(F.lit(s"$t:"), hyperplaneBucket(F.col("v"), p))
      }.toSeq: _*)).as("bucket"))
      .pin()
    val pairs = keyed.select(F.col("bucket"), F.col("id").as("qid"))
      .join(keyed.select(F.col("bucket"), F.col("id").as("cid")), "bucket")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"))
      .distinct() // a pair can collide in several tables
    // score in the projection right after the vector re-attach, so the
    // top-k window sort shuffles only (qid, cid, cos_sim) — not the
    // dim-wide vectors
    val scored = pairs
      .join(base.select(F.col("id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn")), "qid")
      .join(base.select(F.col("id").as("cid"), F.col("v").as("cv"), F.col("nrm").as("cn")), "cid")
      .select(F.col("qid"), F.col("cid"),
        F.round(ndot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).as("cos_sim"))
    topKPerQuery(scored, "cos_sim", k)
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
    val scored = q.join(c, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    topKPerQuery(scored, "cos_sim", k)
  }

  /** Deterministic Lloyd (k-means) training of IVF coarse centroids.
    * Init = the `kC` lowest-id vectors; each iteration assigns every
    * vector to its max-cosine centroid (broadcast join, |N|·kC work) and
    * recomputes centroids as the per-cell per-dimension mean via kC·dim
    * sum aggregates (map-side combinable — one shuffle of kC·dim doubles).
    * Only the kC×dim centroid model is ever collected to the driver
    * (model parameters, not data). Empty cells keep their old centroid. */
  def trainIvfCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      kC: Int,
      iters: Int = 3,
      dim: Int = 64): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // materialized once: every Lloyd iteration re-scans this frame, and
    // without the checkpoint each of the `iters` jobs would re-read the
    // source (same rows either way — the training input is iteration-
    // invariant)
    val base = embeddings
      .select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
      .pin()
    var cents: Array[Array[Double]] = base.orderBy("id").limit(kC).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      // assignment is an in-row argmax over the current centroids as
      // LITERALS (unrolled codegen'd dots) — one map-only pass + one
      // map-side-combinable aggregate per iteration, no crossJoin/window
      val assigned = base.select(
        nearestCell(F.col("v"), cents).as("cell"), F.col("v"))
      val dimSums = (0 until dim).map(d =>
        F.sum(F.element_at(F.col("v"), d + 1).cast("double")).as(s"s$d"))
      val stats = assigned.groupBy(F.col("cell"))
        .agg(F.count(F.lit(1)).as("n"), dimSums: _*)
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1),
          (0 until dim).map(d => r.getDouble(2 + d)).toArray))
        .toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        stats.get(c) match {
          case Some((n, sums)) if n > 0 => sums.map(_ / n)
          case _                        => old
        }
      }
    }
    cents
  }

  /** Index-order dot of a float-vector column against a LITERAL double
    * model vector — the native codegen'd kernel (one tight loop; the
    * dim-unrolled column-algebra form at dim=64 × kC cells overflows
    * janino and silently drops the stage to interpreted mode). Value is
    * bit-identical to the `zip_with`/`aggregate` form. */
  def dotLit(vec: Column, w: Array[Double]): Column = {
    import graft.functions.VectorFunctions.fdDot
    fdDot(vec, F.typedlit(w.toSeq))
  }

  /** Per-row cell-affinity array: rounded cosine of the vector to each
    * LITERAL centroid, index = cell id. The row's own norm is computed
    * once and shared; each centroid's norm folds to a Scala constant
    * (left-associated like the engine sums, so the same double). */
  private def cellSims(vec: Column, cents: Array[Array[Double]], scale: Int = 4): Column = {
    import graft.functions.VectorFunctions.fvDot
    val vnorm = F.sqrt(fvDot(vec, vec))
    F.array(cents.map { c =>
      val cnorm = math.sqrt(c.map(x => x * x).reduceLeft(_ + _))
      F.round(dotLit(vec, c) / (vnorm * F.lit(cnorm)), scale)
    }.toSeq: _*)
  }

  /** Nearest cell id (max rounded cosine, ties to the LOWEST cell — the
    * first position of the max, identical to `row_number() OVER (ORDER BY
    * sim DESC, cell ASC) = 1`). Pure in-row argmax: no centroid crossJoin,
    * no window sort. */
  private[graft] def nearestCell(vec: Column, cents: Array[Array[Double]]): Column = {
    val sims = cellSims(vec, cents)
    (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
  }

  /** The max rounded cosine of a vector to ANY literal centroid — how well
    * the trained quantizer explains the vector. Low values flag
    * embedding-space outliers (noise, wrong-modality rows). In-row. */
  def maxCellSim(vec: Column, cents: Array[Array[Double]]): Column =
    F.array_max(cellSims(vec, cents))

  /** The `nprobe` nearest cell ids as an in-row array, ordered by (sim
    * DESC, cell ASC). Sort key is (1.0 − sim, cell): rounded sims differ by
    * ≥ 1e-4 (≫ ulp at 1.0), so `1.0 − sim` preserves distinctness and
    * order while avoiding −0.0; struct array_sort is field-lexicographic. */
  private[graft] def probeCells(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column = {
    val sims = cellSims(vec, cents)
    val ranked = F.array_sort(F.array(cents.indices.map(c =>
      F.struct(
        (F.lit(1.0) - F.element_at(sims, c + 1)).as("d"),
        F.lit(c).as("cell"))): _*))
    F.transform(F.slice(ranked, 1, nprobe), e => e.getField("cell"))
  }

  /** Snap each centroid component to `decimals` decimal places. Snapping is
    * what makes a TRAINED model oracle-safe: the k-means float means are
    * engine-private, but once rounded to a fixed decimal precision the
    * values survive a Double.toString round-trip exactly, so the identical
    * doubles can be embedded as literals in both engines (the
    * [[gaussianPlanes]]→[[hyperplaneBucketSql]] pattern, applied to a
    * trained model instead of a seeded one). */
  def snapCentroids(cents: Array[Array[Double]], decimals: Int = 6): Array[Array[Double]] = {
    val p = math.pow(10, decimals)
    cents.map(_.map(x => math.round(x * p) / p))
  }

  /** IVF search against an EXPLICIT centroid model (the deploy-time half of
    * train→snap→serve): vectors are indexed in their single nearest cell;
    * each QUERY probes its `nprobe` nearest cells and exact-scores only
    * those cells' members. Cost: |N|·kC assignment (centroids broadcast) +
    * nprobe/kC of the corpus compared per query — the knob trading recall
    * for compute. */
  def ivfProbeTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      nprobe: Int,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    // norms precomputed once per vector (bit-identical to the per-pair
    // sqrt — same double, computed once instead of per candidate pair);
    // cell assignment and probe ranking are in-row argmax/sort over the
    // literal centroid model — no centroid crossJoin, no window shuffle
    val base = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    val cells = base.select(F.col("id").as("cid"), F.col("v").as("cv"),
      F.col("nrm").as("cn"), nearestCell(F.col("v"), centroids).as("cell"))
    val probes = base.select(F.col("id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn"),
      F.explode(probeCells(F.col("v"), centroids, nprobe)).as("cell"))
    // score in a projection BEFORE the top-k shuffle, so only the slim
    // (qid, cid, cos_sim) rows — not the dim-wide vectors — go through the
    // per-query sort. The cell join is a pinned SHUFFLE MERGE, the same
    // physics as the IVF+PQ serve path: a broadcast build side here is the
    // CORPUS (every vector with its raw cv) — an O(N) build that OOMs at
    // scale, and even at small SF every candidate match copies the ~300 B
    // vector row out of the hashed relation (the measured 70× cliff on the
    // ADC side). kC coarse cells make the key low-cardinality; AQE's
    // skew-split carves the hot cell partitions into median-sized tasks.
    val scored = probes.hint("shuffle_merge").join(cells, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"),
        F.round(ndot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).as("cos_sim"))
    topKPerQuery(scored, "cos_sim", k)
  }

  /** IVF-probed k-nearest by SQUARED EUCLIDEAN distance — the
    * sub-quadratic neighbor frame [[graft.operators.Pca.intrinsicDimensionFromKnn]]
    * scores at scale: same cosine cell routing as [[ivfProbeTopK]]
    * (in-row argmax assignment, nprobe in-row probe ranking, pinned
    * shuffle-merge cell join — no broadcast of the corpus, no
    * nested-loop), but the pair score is the d2 the TwoNN estimator
    * needs. Cells partition the corpus, so a candidate meets a query at
    * most once — no dedup. d2 is the STATIC left-associated element_at
    * chain (HOF folds run interpreted outside codegen — the measured 6×
    * on the brute kernel), identical term order to the exact baseline.
    * Cost: |N|·kC in-row assignment + ~nprobe/kC of the corpus per
    * query, vs the baseline's N² — the 100 TB path.
    *
    * Output: (qid, d2, rn ∈ 1..k), smallest d2 first, ties by candidate
    * id, k per query via the bounded-heap top-k (no window sort). */
  def ivfProbeKnnD2(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      nprobe: Int,
      k: Int = 2): DataFrame = {
    val dim = centroids.head.length
    // routing (cell argmax / probe ranking) reads the raw FLOAT vector —
    // the codegen'd float-dot kernel; the d2 chain runs on the double cast
    val base = embeddings
      .select(F.col(idCol).as("id"), F.col(vecCol).as("fv"),
        F.col(vecCol).cast("array<double>").as("v"))
      .filter(F.size(F.col("v")) === dim)
    val cells = base.select(F.col("id").as("cid"), F.col("v").as("cv"),
      nearestCell(F.col("fv"), centroids).as("cell"))
    val probes = base.select(F.col("id").as("qid"), F.col("v").as("qv"),
      F.explode(probeCells(F.col("fv"), centroids, nprobe)).as("cell"))
    val d2 = (1 to dim).map { i =>
      val d = F.element_at(F.col("qv"), i) - F.element_at(F.col("cv"), i)
      d * d
    }.reduce(_ + _) // left-assoc i = 1..dim, the exact baseline's order
    val scored = probes.hint("shuffle_merge").join(cells, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"), d2.as("d2"))
    scored.groupBy("qid")
      .agg(graft.functions.TopK.collectTopK(
        F.struct((-F.col("d2")).as("nd"), (-F.col("cid")).as("nid")), k).as("__tk"))
      .select(F.col("qid"), F.posexplode(F.col("__tk")).as(Seq("__pos", "__e")))
      .select(F.col("qid"), (-F.col("__e.nd")).as("d2"), (F.col("__pos") + 1).as("rn"))
  }

  /** IVF with TRAINED (Lloyd) centroids, snapped to fixed precision, and
    * multi-cell probing — train + [[snapCentroids]] + [[ivfProbeTopK]]. */
  def ivfTrainedTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nprobe: Int,
      k: Int,
      iters: Int = 3,
      dim: Int = 64): DataFrame = {
    val cents = snapCentroids(
      trainIvfCentroids(embeddings, idCol, vecCol, nCentroids, iters, dim))
    ivfProbeTopK(embeddings, idCol, vecCol, cents, nprobe, k)
  }

  /** Product-quantization codebooks: the vector space is split into `m`
    * contiguous subspaces of dim/m dimensions; each subspace gets its own
    * `k`-centroid codebook (deterministic Lloyd, like the IVF coarse
    * quantizer). A vector then compresses to `m` small code indices —
    * 8 bytes for m=8 — which is what makes billion-vector candidate
    * scoring RAM-resident at 100 TB scale. Model size m·k·(dim/m) doubles
    * (driver-held, broadcast into expressions). */
  def trainPqCodebooks(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64): Array[Array[Array[Double]]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sub = dim / m
    val base = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    // init: per-subspace slices of the k lowest-id vectors
    val seed = base.orderBy("id").limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, k)((s, c) => seed(c).slice(s * sub, (s + 1) * sub))
    // ALL m subspaces train in one distributed pass per iteration (2 jobs),
    // not m separate Lloyd runs (2·m jobs) — at 100 TB the training input
    // is scanned iters times total, independent of m. Assignment metric is
    // squared L2 via the native fd_distsq kernel, the SAME metric pqEncode
    // quantizes with; ties go to the lowest codeword like pqEncode's
    // array_position-of-min. (256 per-row literal argmins in one generator
    // overflow janino's 64 KB method limit, so assignment goes through a
    // broadcast join + window instead.)
    // materialized once: the per-subspace slices are iteration-invariant,
    // so the `iters` assignment scans read the checkpointed (id, s, sv)
    // rows instead of re-reading and re-slicing the source every pass
    val exploded = base.select(F.col("id"),
      F.explode(F.array((0 until m).map(s =>
        F.struct(F.lit(s).as("s"), F.slice(F.col("v"), s * sub + 1, sub).as("sv"))): _*)).as("e"))
      .select(F.col("id"), F.col("e.s").as("s"), F.col("e.sv").as("sv"))
      .pin()
    for (_ <- 0 until iters) {
      val cdf = F.broadcast(books.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (cw, c) => (s, c, cw.toSeq) }
      }.toSeq.toDF("s", "cell", "cvec"))
      val dist = graft.functions.VectorFunctions.fdDistSq(F.col("sv"), F.col("cvec"))
      // argmin via min_by over (dist, cell) — bit-identical to the window
      // row_number() ORDER BY dist ASC, cell ASC it replaces (struct
      // ordering is field-lexicographic, so equal dists tie to the lowest
      // codeword), but map-side combinable: no m·k-per-vector row sort per
      // iteration. first(sv) is exact — sv is functionally determined by
      // (s, id).
      val assigned = exploded.join(cdf, "s")
        .select(F.col("s"), F.col("id"), F.col("sv"), F.col("cell"), dist.as("d"))
        .groupBy("s", "id")
        .agg(
          F.min_by(F.col("cell"), F.struct(F.col("d"), F.col("cell"))).as("cell"),
          F.first("sv").as("sv"))
        .select(F.col("s"), F.col("cell"), F.col("sv"))
      val dimSums = (0 until sub).map(d =>
        F.sum(F.element_at(F.col("sv"), d + 1).cast("double")).as(s"d$d"))
      val stats = assigned.groupBy("s", "cell")
        .agg(F.count(F.lit(1)).as("n"), dimSums: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2),
          (0 until sub).map(d => r.getDouble(3 + d)).toArray))
        .toMap
      books = Array.tabulate(m, k)((s, c) => stats.get((s, c)) match {
        case Some((n, sums)) if n > 0 => sums.map(_ / n)
        case _                        => books(s)(c)
      })
    }
    books
  }

  /** Per-subspace nearest-codeword index (squared-L2 argmin), emitted as
    * `pq_code` array<int>. Pure column algebra over the broadcast
    * codebooks — a map-only encode stage. */
  def pqEncode(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorFunctions.fdDistSq
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // native index-order squared distances (the same doubles as the
    // zip_with/aggregate form, one codegen'd loop per codeword)
    val codeCols = (0 until m).map { s =>
      val sl = F.slice(F.col(vecCol), s * sub + 1, sub)
      val dists = F.array(codebooks(s).map(cw =>
        fdDistSq(sl, F.typedlit(cw.toSeq))).toSeq: _*)
      (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    }
    embeddings.withColumn("pq_code", F.array(codeCols: _*))
  }

  /** Per-query ADC lookup tables as ONE flat `array<double>` of m·k dots,
    * indexed s·k + c: table[s][c] = <query_s, codeword_sc>. Computed once
    * per query row; each candidate then costs m array lookups. */
  def adcTables(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import graft.functions.VectorFunctions.fdDot
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // native index-order literal dots (one codegen'd loop per entry)
    F.array((0 until m).flatMap { s =>
      val sl = F.slice(vec, s * sub + 1, sub)
      codebooks(s).map(cw => fdDot(sl, F.typedlit(cw.toSeq)))
    }: _*)
  }

  /** ADC approximate-dot score of a candidate's `pq_code` against a query's
    * `__adc` tables: Σ_s table[s][code_s], left-associated (index order). */
  private[graft] def adcScore(m: Int, kC: Int): Column =
    (0 until m).map(s =>
      F.element_at(F.col("__adc"),
        F.lit(s * kC + 1) + F.element_at(F.col("pq_code"), s + 1))).reduce(_ + _)

  /** Asymmetric-distance (ADC) approximate top-k: queries keep their RAW
    * vector; candidates are scored from their compressed codes via
    * per-query lookup tables — table[s][c] = <query_s, codeword_sc> is
    * computed ONCE per query row (m·k small dots), then each candidate
    * costs m array lookups instead of a dim-wide dot. The classic
    * memory/compute trade: ~dim/m× less score work and 4·dim/m× less
    * candidate storage, for approximation error bounded by quantization
    * distortion (recall-gated in AnnRecallSpec). */
  def pqTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val m = codebooks.length
    val kC = codebooks.head.length
    val coded = pqEncode(embeddings, idCol, vecCol, codebooks)
      .select(F.col(idCol).as("cid"), F.col("pq_code"))
    val q = queries.select(F.col(idCol).as("qid"),
      adcTables(F.col(vecCol), codebooks).as("__adc"))
    val scored = coded.crossJoin(F.broadcast(q))
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("pq_dot", adcScore(m, kC))
    topKPerQuery(scored, "pq_dot", k)
  }

  /** The production billion-vector ANN recipe, composed end-to-end:
    * IVF coarse cells → PQ/ADC compressed scoring within the probed cells →
    * exact rerank of a small shortlist. Self-ANN form (every vector is a
    * query).
    *
    *  1. coarse quantize: Lloyd-trained, precision-snapped centroids; every
    *     vector indexed in its nearest cell (8-byte PQ code, not the raw
    *     vector, is what the index stores);
    *  2. probe: each query scans its `nprobe` nearest cells, scoring
    *     candidates from their codes via per-query ADC tables — m array
    *     lookups per candidate instead of a dim-wide dot;
    *  3. rerank: only the ADC top-`shortlist` ids are joined back to raw
    *     vectors and exactly cosine-scored for the final top-k.
    *
    * Cost at scale: |N|·kC assignment + (nprobe/kC)·|N| ADC lookups per
    * query (compressed-domain, RAM-resident) + `shortlist` exact dots per
    * query — the only dim-wide work, a fixed fraction (shortlist/|N|) of
    * brute force. Recall-gated in AnnRecallSpec. */
  def ivfPqTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nprobe: Int,
      m: Int,
      kCodes: Int,
      shortlist: Int,
      k: Int,
      iters: Int = 3,
      dim: Int = 64): DataFrame = {
    val (cents, books) =
      trainIvfPqModel(embeddings, idCol, vecCol, nCentroids, m, kCodes, iters, dim)
    ivfPqTopKWithModel(embeddings, idCol, vecCol, cents, books, nprobe, shortlist, k)
  }

  /** Train the full IVF+PQ model (coarse centroids + per-subspace
    * codebooks), both precision-snapped so the model is literal-embeddable
    * in any engine ([[snapCentroids]]). */
  def trainIvfPqModel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      m: Int,
      kCodes: Int,
      iters: Int = 3,
      dim: Int = 64): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = snapCentroids(
      trainIvfCentroids(embeddings, idCol, vecCol, nCentroids, iters, dim))
    val books = trainPqCodebooks(embeddings, idCol, vecCol, m, kCodes, iters, dim)
      .map(snapCentroids(_))
    (cents, books)
  }

  /** [[ivfPqTopK]] against an explicit (centroids, codebooks) model —
    * the deploy-time half, also what the oracle mirrors literal-for-literal.
    *
    * Join physics are CELL-PARTITIONED, never corpus-broadcast: the only
    * driver-held state is the kC·dim + m·kC·(dim/m) model itself, which
    * rides into expressions as literals. Index codes, per-query ADC tables
    * and raw rerank vectors all grow with the corpus, so each attaches by a
    * shuffle join on its natural key (cell / qid / cid). At small SF the
    * planner may still elect a runtime broadcast from ACTUAL observed sizes
    * — that is AQE doing its job; the static plan forces no O(N) build side
    * (asserted in PlanSpec with broadcasts disabled). */
  def ivfPqTopKWithModel(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int,
      shortlist: Int,
      k: Int): DataFrame =
    ivfPqSearchFromIndex(embeddings, idCol, vecCol,
      ivfPqEncodeForIndex(embeddings, idCol, vecCol, centroids, codebooks),
      centroids, codebooks, nprobe, shortlist, k)

  /** The index half of IVF+PQ: each vector once, in its nearest cell
    * (in-row argmax over the literal centroids), as an m-byte code —
    * `(cid, cell, pq_code)`. This is exactly what a PERSISTED index stores
    * ([[graft.operators.AnnIndexStore]]): encoding is a deterministic
    * map-only pass against the frozen model, so appending a new batch's
    * codes equals re-encoding the whole corpus (train-rarely /
    * encode-always). */
  def ivfPqEncodeForIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val assigned =
      if (centroids.length <= inRowKcMax)
        embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
          nearestCell(F.col("v"), centroids).as("cell"))
      else // production-sized kC: join-form assignment (see inRowKcMax)
        probeCellsJoin(
          embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v")),
          centroids, nprobe = 1)
    pqEncode(assigned, "id", "v", codebooks)
      .select(F.col("id").as("cid"), F.col("cell"), F.col("pq_code"))
  }

  /** In-row literal assignment stays codegen-friendly only while the
    * centroid array is small: cellSims emits kC rounded-cosine
    * sub-expressions into ONE generated method, and past roughly this
    * many cells janino's 64 KB method limit silently drops the stage to
    * interpreted mode (measured: the sized-kC serve ran 4× slower than
    * the kC=8 one on 9× fewer candidates). Beyond the threshold,
    * assignment switches to the broadcast-join form below — same rounded
    * doubles, same tie-break, value-identical. */
  private[graft] val inRowKcMax = 16

  /** (cell, cvec, cnorm) broadcast frame of the literal model — the
    * join-form twin of cellSims. cnorm folds driver-side with the same
    * left-associated sum the literal path uses. */
  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.toSeq.map { case (c, i) =>
      (i, c.toSeq, math.sqrt(c.map(x => x * x).reduceLeft(_ + _)))
    }.toDF("cell", "cvec", "cnorm")
  }

  /** Top-`nprobe` cells per vector via broadcast join + bounded heap —
    * value-identical to in-row [[probeCells]]/[[nearestCell]] (same fd_dot
    * kernel, same rounded cosine, ties to the lowest cell; equality spec'd
    * in OperatorsSpec) but with per-row work independent of kC inside one
    * codegen'd join stage. This is the production-kC (≈ √N cells)
    * assignment path. Input must carry (id, v); output one row per
    * (id, probed cell) with v re-attached. */
  private[graft] def probeCellsJoin(
      base: DataFrame,
      cents: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot, fdDot}
    val cf = F.broadcast(centroidFrame(base.sparkSession, cents))
    val sims = base.select(F.col("id"), F.col("v")).crossJoin(cf)
      .select(F.col("id"), F.col("v"), F.col("cell"),
        F.round(fdDot(F.col("v"), F.col("cvec")) /
          (F.sqrt(fvDot(F.col("v"), F.col("v"))) * F.col("cnorm")), 4).as("sim"))
    sims.groupBy("id")
      .agg(graft.functions.TopK.collectTopK(
          F.struct(F.col("sim"), (-F.col("cell")).cast("long").as("nc")), nprobe).as("tk"),
        F.first(F.col("v")).as("v")) // v is functionally determined by id
      .select(F.col("id"), F.col("v"), F.explode(F.col("tk")).as("e"))
      .select(F.col("id"), F.col("v"), (-F.col("e.nc")).cast("int").as("cell"))
  }

  /** The serve half of IVF+PQ: search an EXISTING `(cid, cell, pq_code)`
    * index frame (inline-encoded or read back from a persisted store).
    * `embeddings` supplies the query vectors and the raw vectors for the
    * exact rerank. */
  def ivfPqSearchFromIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      coded: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int,
      shortlist: Int,
      k: Int,
      codedBuckets: Option[Int] = None): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val m = codebooks.length
    val kC = codebooks.head.length
    val base = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    // probe rows carry only the RAW query vector (dim·4 B) through the
    // cell exchange; the m·kC-double ADC table (~16× wider at m=kC=16,
    // dim=64) is computed AFTER the shuffle from the literal codebooks —
    // once per probe row, in the projection above the explicit
    // repartition(cell). The repartition's hash partitioning is exactly
    // the cell join's requirement, so no second exchange appears; the
    // table never crosses an exchange at all (asserted in PlanSpec on the
    // physical plan's ShuffleExchangeExec outputs).
    // when `coded` is a CELL-BUCKETED catalog table (AnnIndexStore), its
    // scan already reports HashPartitioning(cell, B): repartitioning the
    // probe side to the SAME (B, cell) makes the two sides co-partitioned,
    // so EnsureRequirements adds no exchange at all on the index side —
    // and, critically, none ABOVE this projection either (a mismatched
    // count would re-exchange the probe side post-ADC, putting the wide
    // __adc row back on the wire)
    val probed =
      if (centroids.length <= inRowKcMax)
        base.select(F.col("id").as("qid"),
          F.explode(probeCells(F.col("v"), centroids, nprobe)).as("cell"),
          F.col("v").as("qv"))
      else // production-sized kC: join-form probing (see inRowKcMax)
        probeCellsJoin(base.select(F.col("id"), F.col("v")), centroids, nprobe)
          .select(F.col("id").as("qid"), F.col("cell"), F.col("v").as("qv"))
    // PARALLELISM GUARD on the cell exchange: the candidate join's output
    // partitioning is the cell key, so when the model's cell count sits
    // below the session's shuffle width the ADC scoring and the bounded-
    // heap shortlist run on ≤ kC tasks no matter how many slots exist
    // (the kC=8 serve row measured ~2.5 s of its 3.3 s wall inside an
    // 8-way heap stage on a 32-slot host). Salting restores full width
    // without moving more candidate rows: each query keeps ONE
    // deterministic salt (hash(qid) mod R) so no probe row is duplicated,
    // and the compact (cid, cell, pq_code) index side — m bytes + id per
    // row, the cheap side by construction — is replicated R ways so every
    // (cell, salt) bucket still holds its whole cell. Candidate pairs,
    // scores, and heap contents are identical; only the partition count
    // changes. R = ceil(2·width / kC) (the 2× over-partitions the
    // (cell, salt) key space so hash collisions still fill ~85% of the
    // width; capped at 64 so a misconfigured tiny-kC/huge-width serve
    // can't explode the index side) is 1 whenever kC ≥ 2·width — at the
    // production kC ≈ √N sizing the plan is byte-identical to the
    // unsalted one — and the bucketed-catalog path (codedBuckets) pins
    // R = 1: its whole point is reusing the store's HashPartitioning(cell),
    // which a (cell, salt) requirement would re-exchange away.
    //
    // The salted exchange pins an EXPLICIT partition count: measured at
    // sf0.1, AQE's coalesce sized this exchange from its tiny pre-join
    // inputs (10k probe rows, 2k codes) and merged it to TWO partitions —
    // blind to the 250× join fan-out behind it — which is also where the
    // serve row's long-standing 2.2–4.8 s cross-round swings came from
    // (the coalesce decision flips with block-size estimates). A
    // user-specified numPartitions is exempt from AQE coalescing, so the
    // candidate stage's width is deterministic.
    val width = embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val rep =
      if (codedBuckets.isDefined) 1
      else math.min(64,
        math.max(1, math.ceil(2.0 * width / math.max(1, centroids.length)).toInt))
    // candidate generation: probe and index sides shuffle on CELL — the
    // coarse cell is the unit of index locality, and at a production
    // kC ≈ √N it is a well-spread key (AQE's skew split covers hot cells).
    // ADC-scoring happens map-side in the join's output projection, so the
    // shortlist sort shuffles only the slim (qid, cid, pq_dot) rows — the
    // table arrays and codes never enter a per-candidate exchange.
    //
    // SHUFFLE_MERGE is pinned, not left to the planner: if AQE elects a
    // runtime broadcast with the table-carrying probe side as build side,
    // every candidate match COPIES the m·kC-double ADC row out of the
    // hashed relation — measured 247 s vs 3.5 s for the shuffle join on
    // the sf0.1 fixture (2.5 M candidates), a 70× cliff. The merge join
    // keeps the wide row on a sorted stream (no per-match copy) and is
    // the only shape that survives corpus growth anyway.
    val joined =
      if (rep <= 1) {
        val probes = codedBuckets.fold(probed.repartition(width, F.col("cell")))(b =>
            probed.repartition(b, F.col("cell")))
          .withColumn("__adc", adcTables(F.col("qv"), codebooks))
          .select(F.col("qid"), F.col("cell"), F.col("__adc"))
        probes.hint("shuffle_merge").join(coded, "cell")
      } else {
        val probes = probed
          .withColumn("__salt", F.pmod(F.hash(F.col("qid")), F.lit(rep)))
          .repartition(width, F.col("cell"), F.col("__salt"))
          .withColumn("__adc", adcTables(F.col("qv"), codebooks))
          .select(F.col("qid"), F.col("cell"), F.col("__salt"), F.col("__adc"))
        val codedR = coded.withColumn("__salt",
          F.explode(F.typedlit((0 until rep).toVector)))
        probes.hint("shuffle_merge").join(codedR, Seq("cell", "__salt"))
      }
    val adcScored = joined
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"), adcScore(m, kC).as("pq_dot"))
    // bounded-heap shortlist: the ADC stage emits |Q|·(corpus/kC)·nprobe
    // candidate rows — the widest frame of the whole search — and the
    // map-side-combined top-k means only ≤ shortlist rows per (query,
    // partition) reach the exchange, vs the old window form shuffling and
    // sorting every candidate. Measured at sf0.1/local[8]: the qid
    // exchange's row count drops ~15× while wall time trades ±0.5 s
    // either way per query (the object-mode heap pays more per ROW than
    // the codegen'd sort, the exchange carries far less) — a wash
    // locally, and the shape that survives when the exchange is a real
    // network shuffle instead of memcpy
    val short = topKPerQuery(adcScored, "pq_dot", shortlist)
      .select(F.col("qid"), F.col("cid"))
    // exact rerank: only the ADC top-`shortlist` ids get the dim-wide
    // cosine (precomputed norms); the raw-vector side scales with the
    // corpus too, so it joins by shuffle on cid, not broadcast
    val reranked = short
      .join(base.select(F.col("id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn")), "qid")
      .join(base.select(F.col("id").as("cid"), F.col("v").as("cv"), F.col("nrm").as("cn")), "cid")
      .select(F.col("qid"), F.col("cid"),
        F.round(ndot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).as("cos_sim"))
    topKPerQuery(reranked, "cos_sim", k)
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * `k` candidates that are semantically CLOSEST without being near-dups
    * — same coarse cell as the anchor (the trained quantizer's notion of
    * "about the same topic"), cosine ≤ `maxCos` (near-dup ceiling; above
    * it the pair is a positive/duplicate, not a negative), ranked hardest
    * (highest cosine) first. The standard in-batch-negatives upgrade:
    * cell-blocked candidates make the negatives HARD, the ceiling keeps
    * them TRUE negatives.
    *
    * Scale shape is the IVF search's: in-row cell assignment over literal
    * centroids, pinned shuffle-merge cell self-join (Σ cell², never N²,
    * no corpus broadcast), slim (qid, cid, cos) rows into the bounded-heap
    * top-k. */
  def hardNegatives(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      maxCos: Double,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val base = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    val cells = base.withColumn("cell", nearestCell(F.col("v"), centroids))
    val q = cells.select(F.col("cell"), F.col("id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn"))
    val c = cells.select(F.col("cell"), F.col("id").as("cid"), F.col("v").as("cv"), F.col("nrm").as("cn"))
    val scored = q.hint("shuffle_merge").join(c, "cell")
      .filter(F.col("qid") =!= F.col("cid"))
      .select(F.col("qid"), F.col("cid"),
        F.round(ndot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).as("cos_sim"))
      .filter(F.col("cos_sim") <= maxCos)
    topKPerQuery(scored, "cos_sim", k)
  }

  /** Default coarse-cluster count for a corpus of `n` vectors: ≈ √n
    * (clamped), the choice that keeps the cluster-blocked pair stage
    * near-linear — with balanced cells of size n/kC, candidate pairs are
    * Σ cell² ≈ n²/kC = n·√n at kC = √n, vs n² unblocked. The fixture-scale
    * queries pin kC = 8 for oracle continuity; a production caller sizes
    * from a corpus count (one catalog-statistics read, [[SparkEntry]]'s S6
    * path, not a scan). */
  def defaultKC(n: Long, minKC: Int = 2, maxKC: Int = 1 << 16): Int =
    math.min(maxKC, math.max(minKC, math.ceil(math.sqrt(n.toDouble)).toInt)).toInt

  /** The candidate-pair stage of SemDeDup-style semantic dedup: k-means
    * cells (the FROZEN literal `centroids`) are the blocking key, so pair
    * cost is Σ cell² — never |N|². Returns (a, b) with a < b for every
    * same-cell pair with rounded cosine ≥ `minCos`. Norms are computed
    * once per vector, not per pair. Cluster blocking trades recall for
    * that bound: cross-cell near-dup pairs are invisible (the miss rate is
    * measured and floor-gated in SemanticDedupRecallSpec). */
  def semanticDedupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      minCos: Double): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val cells = embeddings.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
      F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"),
      nearestCell(F.col(vecCol), centroids).as("cell"))
    val a = cells.select(F.col("cell"), F.col("id").as("a"), F.col("v").as("av"), F.col("nrm").as("an"))
    val b = cells.select(F.col("cell"), F.col("id").as("b"), F.col("v").as("bv"), F.col("nrm").as("bn"))
    a.join(b, "cell").filter(F.col("a") < F.col("b"))
      .withColumn("cos_sim",
        F.round(ndot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4))
      .filter(F.col("cos_sim") >= minCos)
      .select("a", "b")
  }

  /** SemDeDup-style semantic dedup against a FROZEN trained model:
    * cluster-blocked high-cosine pairs ([[semanticDedupPairs]]), then
    * TRANSITIVE duplicate groups via the convergence-guarded connected
    * components, keeping each group's min-id representative. Output: every
    * vector with `(idCol, rep_id, kept)`. Training is the caller's concern
    * (train once, serve everywhere — the [[AnnIndexStore]] lifecycle);
    * this function is a pure query over the literal model. */
  def semanticDedup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      minCos: Double): DataFrame = {
    val pairs = semanticDedupPairs(embeddings, idCol, vecCol, centroids, minCos)
    Dedup.connectedComponents(pairs, embeddings.select(F.col(idCol).as("node")))
      .select(F.col("node").as(idCol), F.col("label").as("rep_id"),
        (F.col("node") === F.col("label")).as("kept"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b) within seeded
    * random-hyperplane LSH buckets. */
  def nearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nbits: Int,
      minCosine: Double,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = gaussianPlanes(1, nbits, dim, seed)(0)
    val withB = embeddings.select(
      F.col(idCol).as("id"), F.col(vecCol).as("v"),
      hyperplaneBucket(F.col(vecCol), planes).as("bucket"))
    val a = withB.select(F.col("bucket"), F.col("id").as("a"), F.col("v").as("av"))
    val b = withB.select(F.col("bucket"), F.col("id").as("b"), F.col("v").as("bv"))
    a.join(b, "bucket")
      .filter(F.col("a") < F.col("b"))
      .withColumn("cos_sim", cosine(F.col("av"), F.col("bv")))
      .filter(F.col("cos_sim") >= minCosine)
      .select(F.col("a"), F.col("b"), F.col("cos_sim"))
  }
}
