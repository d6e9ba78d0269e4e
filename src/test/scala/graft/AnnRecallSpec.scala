package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Similarity

/** Quality evidence for the approximate similarity paths: recall@3 against
  * exhaustive brute force on the sf0.01 embeddings fixture (500 × 64-dim,
  * near-isotropic — the HARD case for ANN: a typical nearest neighbour sits
  * at ~65°, so single-table sign-LSH collision probability is only
  * (1−θ/π)^b ≈ 0.03 at b=8; no bucketing scheme fixes that with one table).
  *
  * The production paths therefore buy recall structurally:
  *  - multi-table LSH: L independent seeded hyperplane tables; candidate if
  *    colliding in ANY table → recall 1−(1−p^b)^L, tunable to any target;
  *  - trained IVF + nprobe: Lloyd-trained coarse cells, query probes its
  *    nprobe nearest cells.
  * Both are gated here at ≥0.5 recall@3, with the candidate fraction
  * (probe cost vs brute force) logged alongside. */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val nVec = emb.count().toDouble

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

  it("multi-table hyperplane LSH reaches recall@3 >= 0.5 on isotropic data") {
    val nbits = 6; val nTables = 16
    val multi = recallOf(topkSets(
      Similarity.multiTableLshTopK(emb, "vec_id", "embedding", nbits, nTables, k = 3)
        .select("qid", "cid")))
    // candidate fraction = deduped candidate pairs / brute-force pairs
    val tables = Similarity.gaussianPlanes(nTables, nbits, 64)
    val keyed = emb.select(F.col("vec_id").as("id"),
      F.explode(F.array(tables.zipWithIndex.map { case (p, t) =>
        F.concat(F.lit(s"$t:"), Similarity.hyperplaneBucket(F.col("embedding"), p))
      }.toSeq: _*)).as("bucket"))
    val cands = keyed.as("x").join(keyed.as("y"), "bucket")
      .filter(F.col("x.id") =!= F.col("y.id"))
      .select(F.col("x.id"), F.col("y.id")).distinct().count()
    val frac = cands / (nVec * (nVec - 1))
    info(f"multi-table LSH (b=$nbits, L=$nTables) recall@3 = $multi%.3f at ${frac * 100}%.1f%% of brute-force comparisons")
    multi should be >= 0.5
    frac should be < 0.5 // structurally cheaper than brute force, even on isotropic data
  }

  it("single-table LSH is the building block: multi-table lifts recall several-fold over it") {
    val single = recallOf(topkSets(
      Similarity.lshTopK(emb, "vec_id", "embedding", nbits = 6, k = 3).select("qid", "cid")))
    val multi = recallOf(topkSets(
      Similarity.multiTableLshTopK(emb, "vec_id", "embedding", nbits = 6, nTables = 16, k = 3)
        .select("qid", "cid")))
    info(f"LSH recall@3: single-table = $single%.3f, 16-table = $multi%.3f")
    multi should be > single * 2
  }

  it("PQ-compressed ADC scoring tracks the exact dot ranking (8 bytes/vector)") {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
    // exact-dot baseline (PQ approximates the dot, not the cosine)
    val q = emb.select(F.col("vec_id").as("qid"), F.col("embedding").as("qv"))
    val exactDot = emb.select(F.col("vec_id").as("cid"), F.col("embedding").as("cv"))
      .crossJoin(F.broadcast(q)).filter(F.col("qid") =!= F.col("cid"))
      .withColumn("d", ndot(F.col("qv"), F.col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("qid")).orderBy(F.col("d").desc, F.col("cid").asc)
    val exactTop = topkSets(exactDot
      .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
      .select("qid", "cid"))
    val pqTop = topkSets(
      Similarity.pqTopK(emb, emb, "vec_id", "embedding", cb, k = 3).select("qid", "cid"))
    val recall = {
      val per = exactTop.map { case (qid, truth) =>
        pqTop.get(qid).map(f => (f intersect truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    // approximation error of the ADC dot vs the exact dot
    val err = Similarity.pqTopK(emb, emb, "vec_id", "embedding", cb, k = 3)
      .join(exactDot.select(F.col("qid"), F.col("cid"), F.col("d")), Seq("qid", "cid"))
      .agg(F.avg(F.abs(F.col("pq_dot") - F.col("d"))).as("mae"),
        F.avg(F.abs(F.col("d"))).as("scale")).collect()(0)
    info(f"PQ(m=8,k=16) recall@3 vs exact dot = $recall%.3f; ADC MAE = ${err.getDouble(0)}%.3f vs |dot| scale ${err.getDouble(1)}%.3f")
    recall should be > 3.0 / 500 * 3 // far above random
    // the production shape: PQ is the cheap FIRST stage — retrieve a wider
    // candidate set from codes, then exact-rerank just those
    val pqTop50 = topkSets(
      Similarity.pqTopK(emb, emb, "vec_id", "embedding", cb, k = 50).select("qid", "cid"))
    val twoStage = {
      val per = exactTop.map { case (qid, truth) =>
        pqTop50.get(qid).map(c => (c intersect truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    info(f"PQ top-50 filter + exact rerank recall@3 = $twoStage%.3f at 10%% of exact scoring cost")
    twoStage should be >= 0.6
  }

  it("int8-quantized retrieval reproduces the exact-dot top-3 nearly everywhere at a 4x smaller scan") {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val q = emb.select(F.col("vec_id").as("qid"), F.col("embedding").as("qv"))
    val exactDot = emb.select(F.col("vec_id").as("cid"), F.col("embedding").as("cv"))
      .crossJoin(F.broadcast(q)).filter(F.col("qid") =!= F.col("cid"))
      .withColumn("d", ndot(F.col("qv"), F.col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("qid")).orderBy(F.col("d").desc, F.col("cid").asc)
    val exactTop = topkSets(exactDot
      .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
      .select("qid", "cid"))
    val i8 = topkSets(graft.operators.Quantization
      .int8TopK(emb, emb, "vec_id", "embedding", 3).select("qid", "cid"))
    val recall = {
      val per = exactTop.map { case (qid, truth) =>
        i8.get(qid).map(f => (f intersect truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    info(f"int8 top-3 recall vs exact dot = $recall%.3f (codes are dim bytes/vector vs 4*dim)")
    recall should be >= 0.9
  }

  it("composed IVF+PQ (cells -> ADC shortlist -> exact rerank) reaches recall@3 >= 0.7 at <= 5% exact comparisons") {
    val shortlist = 24
    val approx = topkSets(
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", nCentroids = 8, nprobe = 5,
        m = 16, kCodes = 16, shortlist = shortlist, k = 3).select("qid", "cid"))
    val r = recallOf(approx)
    // the only dim-wide scoring is the rerank: `shortlist` exact dots per
    // query vs the N-1 of brute force (ADC candidate scoring is m array
    // lookups per candidate — compressed-domain, not a dim-wide comparison)
    val exactFrac = shortlist / (nVec - 1)
    info(f"IVF+PQ (kC=8, nprobe=5, m=16, k=16, shortlist=$shortlist) recall@3 = $r%.3f " +
      f"at ${exactFrac * 100}%.1f%% exact comparisons")
    r should be >= 0.7
    exactFrac should be <= 0.05
  }

  it("production-sized kC (~ sqrt N, join-form assignment) keeps recall@3 >= 0.5 at ~quarter probe cost") {
    // defaultKC(500) = 23 > inRowKcMax, so this exercises the broadcast-join
    // assignment path end-to-end; nprobe=5 now probes ~5/23 of the corpus
    // instead of kC=8's 5/8 — the probe-cost/recall point the 100 TB
    // deployment actually runs.
    val kC = Similarity.defaultKC(nVec.toLong)
    kC should be > Similarity.inRowKcMax
    val approx = topkSets(
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", nCentroids = kC, nprobe = 5,
        m = 16, kCodes = 16, shortlist = 24, k = 3).select("qid", "cid"))
    val r = recallOf(approx)
    info(f"IVF+PQ (kC=$kC, nprobe=5, shortlist=24) recall@3 = $r%.3f probing ~${5.0 / kC * 100}%.0f%% of cells")
    r should be >= 0.5
  }

  it("trained IVF with nprobe=3 reaches recall@3 >= 0.5 and beats the untrained seed cells") {
    val untrained = recallOf(topkSets(
      Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 8, k = 3).select("qid", "cid")))
    val trained = recallOf(topkSets(
      Similarity.ivfTrainedTopK(emb, "vec_id", "embedding", nCentroids = 8, nprobe = 3, k = 3)
        .select("qid", "cid")))
    info(f"IVF recall@3: untrained/nprobe=1 = $untrained%.3f, trained/nprobe=3 = $trained%.3f (probes 3/8 of corpus)")
    trained should be >= 0.5
    trained should be > untrained
  }

  it("matryoshka prefix tier: shortlist-then-full-rerank recovers what bare truncation loses") {
    // the fixture is NOT MRL-trained, so the 16-dim prefix carries only
    // 16/64 of the energy and ranks near chance on its own (~0.09 direct
    // recall@3, measured) — the WORST case for truncation. The serving
    // pattern is therefore prefix SHORTLIST + full-dim rerank: 16-dim
    // scan over the corpus, 64-dim compute only on the shortlist. Gates
    // document both numbers so the tradeoff is explicit.
    val e16 = Similarity.truncateDims(emb, "embedding", 16)
    val direct = recallOf(topkSets(
      Similarity.bruteForceTopK(e16, e16, "vec_id", "embedding", 3)
        .select("qid", "cid")))
    val shortlist = 64
    val short = Similarity.bruteForceTopK(e16, e16, "vec_id", "embedding", shortlist)
      .select("qid", "cid")
    // full-dim exact rerank of the prefix shortlist only
    val reranked = Similarity.topKPerQuery(
      short
        .join(emb.select(F.col("vec_id").as("qid"), F.col("embedding").as("qv")), "qid")
        .join(emb.select(F.col("vec_id").as("cid"), F.col("embedding").as("cv")), "cid")
        .withColumn("cos_sim", Similarity.cosine(F.col("qv"), F.col("cv"))),
      "cos_sim", 3)
    val tiered = recallOf(topkSets(reranked.select("qid", "cid")))
    info(f"matryoshka d=16/64: direct recall@3 = $direct%.3f; " +
      f"shortlist($shortlist)+full rerank recall@3 = $tiered%.3f " +
      f"(64-dim compute on ${shortlist * 100.0 / (nVec - 1)}%.0f%% of candidates)")
    tiered should be > direct * 2 // the rerank tier is what makes truncation usable
    tiered should be >= 0.3
  }

  it("JL random projection 64->16 matches the prefix tier's band and rescues recall with a rerank tier") {
    // on an ISOTROPIC fixture a random 16-dim projection and a 16-dim
    // coordinate prefix keep the same share of the geometry (truncation
    // is itself a projection, and no direction is special) — JL's edge
    // is that it needs NO cooperation from the embedding model (the
    // matryoshka prefix is only usable on MRL-trained embeddings), at
    // the same 4x scan/FLOP reduction. Measured: direct ~0.06 vs prefix
    // ~0.09 — same band, chance is ~0.006. The serving pattern is the
    // same as the prefix tier: projected shortlist + full-dim rerank.
    val planes = Similarity.gaussianPlanes(1, 16, 64, 7L)(0)
    val rp = Similarity.randomProject(emb, "embedding", planes)
    val direct = recallOf(topkSets(
      Similarity.bruteForceTopK(rp, rp, "vec_id", "embedding", 3)
        .select("qid", "cid")))
    val prefix = recallOf(topkSets {
      val e16 = Similarity.truncateDims(emb, "embedding", 16)
      Similarity.bruteForceTopK(e16, e16, "vec_id", "embedding", 3).select("qid", "cid")
    })
    val short = Similarity.bruteForceTopK(rp, rp, "vec_id", "embedding", 64)
      .select("qid", "cid")
    val reranked = Similarity.topKPerQuery(
      short
        .join(emb.select(F.col("vec_id").as("qid"), F.col("embedding").as("qv")), "qid")
        .join(emb.select(F.col("vec_id").as("cid"), F.col("embedding").as("cv")), "cid")
        .withColumn("cos_sim", Similarity.cosine(F.col("qv"), F.col("cv"))),
      "cos_sim", 3)
    val tiered = recallOf(topkSets(reranked.select("qid", "cid")))
    info(f"JL 64->16: direct recall@3 = $direct%.3f (prefix baseline $prefix%.3f); " +
      f"shortlist(64)+full rerank recall@3 = $tiered%.3f")
    direct should be > 0.02 // far above chance (~0.006), same band as the prefix
    direct should be > prefix / 3
    tiered should be >= 0.5
  }

  it("1-bit binary codes: Hamming shortlist + exact rerank holds its measured recall band, widening with the shortlist") {
    import graft.operators.Quantization
    // 64 sign bits = 8 B/vector (32x below float32): the cheapest tier.
    // Measured on this fixture: shortlist 24 (4.8% probed) ~0.556,
    // shortlist 64 (12.8%) ~0.785 — the 1-bit sketch loses angle
    // resolution, and the rerank tier buys it back with probe budget.
    val r24 = recallOf(topkSets(
      Quantization.binaryRerankTopK(emb, emb, "vec_id", "embedding", shortlist = 24, k = 3)
        .select("qid", "cid")))
    val r64 = recallOf(topkSets(
      Quantization.binaryRerankTopK(emb, emb, "vec_id", "embedding", shortlist = 64, k = 3)
        .select("qid", "cid")))
    info(f"binary rerank recall@3: shortlist24 = $r24%.3f (${24 / nVec * 100}%.1f%% probed), " +
      f"shortlist64 = $r64%.3f (${64 / nVec * 100}%.1f%% probed)")
    r24 should be >= 0.45
    r64 should be >= r24 // monotone in probe budget
    r64 should be >= 0.7
  }

  it("three-tier cascade holds the binary-rerank recall floor at HALF the exact-tier probe budget") {
    import graft.operators.Quantization
    // binary(64) -> ADC(12) -> exact(3): the ADC middle tier re-scores the
    // 64 Hamming survivors from m-byte PQ codes, so only 12 candidates per
    // query (2.4% probed) ever touch a float vector — half of
    // q_binary_rerank's 24 — while the better angle resolution of the PQ
    // codes keeps recall at or above the 24-probe binary floor.
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 16, k = 16)
      .map(Similarity.snapCentroids(_))
    val binary24 = recallOf(topkSets(
      Quantization.binaryRerankTopK(emb, emb, "vec_id", "embedding", shortlist = 24, k = 3)
        .select("qid", "cid")))
    val tiered12 = recallOf(topkSets(
      Quantization.tieredTopK(emb, emb, "vec_id", "embedding", books,
          hammingShortlist = 64, adcShortlist = 12, k = 3)
        .select("qid", "cid")))
    val tiered24 = recallOf(topkSets(
      Quantization.tieredTopK(emb, emb, "vec_id", "embedding", books,
          hammingShortlist = 64, adcShortlist = 24, k = 3)
        .select("qid", "cid")))
    info(f"tiered recall@3: binary24 = $binary24%.3f (4.8%% probed), " +
      f"tiered h64/adc12 = $tiered12%.3f (2.4%% probed), h64/adc24 = $tiered24%.3f")
    tiered12 should be >= binary24 // the floor, at half the probe budget
    tiered24 should be >= tiered12 // monotone in the ADC shortlist
  }
}
