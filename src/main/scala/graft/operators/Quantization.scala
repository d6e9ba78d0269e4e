package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Embedding quantization for storage/serving: symmetric per-vector int8
  * (the standard "scale = max|v|/127" scheme used to shrink embedding
  * tables 4× before ANN serving). All arithmetic is plain double column
  * algebra — map-only, no shuffle — and every emitted statistic is
  * engine-reproducible (the DuckDB oracle computes the identical codes).
  *
  * At 100 TB the point of int8 is that the CODES (dim bytes/vector)
  * replace the float vectors in every downstream scan; here the operator
  * emits per-vector quantization quality stats; the code array itself
  * stays a column (`__q`) callers can persist. */
object Quantization {

  private def dequant(q: Column, scale: Column): Column = q.cast("double") * scale

  /** Per-vector symmetric int8 quantization + reconstruction-quality stats:
    * (id, scale8, q_min, q_max, n_sat, recon_mae).
    *  - `scale8` = max|v| / 127 (0 for the all-zero vector);
    *  - codes are round(v/scale) clamped to [-127, 127] (`n_sat` counts
    *    components at the clamp boundary — ≥ 1 by construction for any
    *    non-zero vector, since the max-magnitude component maps to ±127);
    *  - `recon_mae` = mean |v − dequant(q)|, rounded to 6 decimals (the
    *    rounding absorbs last-ulp division noise across engines). */
  /** The (id, rounded scale, int8 codes) frame behind [[int8Symmetric]] —
    * what a production table persists: codes are computed against the
    * UNROUNDED scale (identical to int8Symmetric's), the emitted scale is
    * rounded to 6 decimals so both engines score from the same literal. */
  private def codesFrame(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = F.col(vecCol)
    val absMax = F.array_max(F.transform(v, x => F.abs(x.cast("double"))))
    val scale = F.when(absMax > 0.0, absMax / 127.0).otherwise(F.lit(1.0))
    df.withColumn("__scale", scale)
      .select(F.col(idCol).as("id"),
        F.round(F.col("__scale"), 6).as("s"),
        F.transform(v, x => F.greatest(F.lit(-127.0),
          F.least(F.lit(127.0), F.round(x.cast("double") / F.col("__scale"), 0)))
          .cast("long")).as("q"))
  }

  /** Top-k retrieval ENTIRELY in the quantized domain — the memory-bound
    * serving path int8 exists for: candidates are scored by the integer
    * dot of their codes (exact int64 arithmetic, engine-identical by
    * construction) rescaled by the two per-vector scales,
    * `i8_sim = idot·s_q·s_c ≈ ⟨q, c⟩`. No float vector is touched after
    * encode, so a 100 TB deployment scans dim bytes/vector instead of
    * 4·dim, and the bounded-heap shortlist keeps the exchange O(k) per
    * query. Ranking is deterministic: integer dot, 6-decimal snapped
    * scales, 4-decimal rounded product, cid tiebreak. */
  def int8TopK(embeddings: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = codesFrame(embeddings, idCol, vecCol)
      .select(F.col("id").as("cid"), F.col("s").as("cs"), F.col("q").as("cq"))
    val qs = codesFrame(queries, idCol, vecCol)
      .select(F.col("id").as("qid"), F.col("s").as("qsc"), F.col("q").as("qq"))
    val scored = corpus.crossJoin(F.broadcast(qs))
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("__idot", F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), (a, b) => a * b),
        F.lit(0L), (acc, x) => acc + x))
      .withColumn("i8_sim",
        F.round(F.col("__idot").cast("double") * F.col("qsc") * F.col("cs"), 4))
    Similarity.topKPerQuery(scored.select("qid", "cid", "i8_sim"), "i8_sim", k)
  }

  /** 1-BIT (sign) quantization: dim bits/vector — the cheapest serving
    * tier below int8 (32× smaller than float32, 8× below int8). Bit i is
    * set iff v[i] >= 0; the 64-dim fixture packs into TWO overflow-free
    * long words (`b_lo` dims 1-32, `b_hi` dims 33-64 — the
    * [[Dedup.simhash64]] two-word pattern, so the same banded-LSH
    * machinery applies to binary codes at scale). Map-only; the
    * aggregate-over-sequence bit pack stays inside whole-stage codegen. */
  def binarize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings.select(F.col(idCol).as("vec_id"),
      signWord(vecCol, 0).as("b_lo"), signWord(vecCol, 32).as("b_hi"))

  /** Sum of (1 << (i-1)) over the 32 dims at `off+1 .. off+32` whose
    * component is >= 0. SQL-expr form because shiftleft's shift amount
    * must be a column here. A vector shorter than `off + 32` dims
    * RAISES (fixture-dimension drift must fail loudly, per the
    * FixtureSchemaSpec philosophy — `element_at` past the end would
    * otherwise yield NULL, silently zero-padding the code). */
  private def signWord(vecCol: String, off: Int): Column =
    F.expr(s"CASE WHEN size($vecCol) < ${off + 32} THEN " +
      s"CAST(raise_error(concat('binarize: expected >= ${off + 32}-dim vectors, got dim ', " +
      s"CAST(size($vecCol) AS STRING))) AS BIGINT) ELSE " +
      s"aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      s"(CASE WHEN CAST(element_at($vecCol, i + $off) AS DOUBLE) >= 0.0 " +
      s"THEN CAST(shiftleft(CAST(1 AS BIGINT), i - 1) AS BIGINT) ELSE CAST(0 AS BIGINT) END)) END")

  /** Top-k retrieval in the BINARY domain: Hamming distance = popcount of
    * the XORed words — two `bit_count` ops per candidate instead of a
    * dim-wide float dot (the asymmetric-rerank-ready first tier; at
    * 100 TB the scan reads 16 B/vector and the [[Dedup]] 4-band
    * pigeonhole banding turns the candidate join sub-quadratic — here the
    * corpus side stays a full scan because the fixture queries rank ALL
    * candidates for the oracle). Ranking: hamming ASC, cid ASC, via the
    * bounded-heap [[Similarity.topKPerQuery]] on the negated distance. */
  def binaryTopK(embeddings: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame =
    binaryTopKFromCodes(
      binarize(embeddings, idCol, vecCol)
        .select(F.col("vec_id").as("cid"), F.col("b_lo"), F.col("b_hi")),
      queries, idCol, vecCol, k)

  /** [[binaryTopK]] with the CORPUS side fed from an already-encoded
    * `(cid, b_lo, b_hi)` frame — the serve path when the sign codes live
    * in a persisted index table ([[AnnIndexStore]]): the scan reads
    * 16 B/vector of stored words, no float vector and no re-encode. */
  def binaryTopKFromCodes(corpusCodes: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = corpusCodes
      .select(F.col("cid"), F.col("b_lo").as("clo"), F.col("b_hi").as("chi"))
    val qs = binarize(queries, idCol, vecCol)
      .select(F.col("vec_id").as("qid"), F.col("b_lo").as("qlo"), F.col("b_hi").as("qhi"))
    val scored = corpus.crossJoin(F.broadcast(qs))
      .filter(F.col("qid") =!= F.col("cid"))
      .withColumn("hamming",
        (F.bit_count(F.col("qlo").bitwiseXOR(F.col("clo"))) +
          F.bit_count(F.col("qhi").bitwiseXOR(F.col("chi")))).cast("long"))
      .withColumn("__negh", -F.col("hamming"))
    Similarity.topKPerQuery(scored.select("qid", "cid", "hamming", "__negh"), "__negh", k)
      .select(F.col("qid"), F.col("cid"), (-F.col("__negh")).as("hamming"), F.col("rn"))
  }

  /** The production TWO-STAGE binary serve: Hamming shortlist over the
    * 16 B/vector codes, then exact cosine ONLY on the `shortlist` ids per
    * query (the asymmetric-rerank recipe; same stage shape as
    * [[Similarity.ivfPqTopKWithModel]]'s ADC→exact tail). At 100 TB the
    * first stage scans packed words, and only |Q|·shortlist rows ever
    * touch the float vectors — which join by shuffle on id, never
    * broadcast (the corpus-sized side). */
  def binaryRerankTopK(embeddings: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String,
                       shortlist: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    val short = binaryTopK(embeddings, queries, idCol, vecCol, shortlist)
      .select(F.col("qid"), F.col("cid"))
    exactCosineRerank(short, embeddings, queries, idCol, vecCol, k)
  }

  /** The shared exact tail of every cascade: join a (qid, cid) shortlist
    * back to raw vectors and rank by 4-decimal rounded cosine. Query
    * vectors come from the QUERIES frame (like int8TopK / bruteForceTopK)
    * — a qid absent from the corpus must still rerank, not silently
    * vanish; only candidate vectors read the corpus side, by shuffle join
    * on cid (the corpus-sized side is never broadcast). */
  private[graft] def exactCosineRerank(
      short: DataFrame, embeddings: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fvDot => ndot}
    def withNorm(df: DataFrame) =
      df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"),
        F.sqrt(ndot(F.col(vecCol), F.col(vecCol))).as("nrm"))
    val reranked = short
      .join(withNorm(queries)
        .select(F.col("id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn")), "qid")
      .join(withNorm(embeddings)
        .select(F.col("id").as("cid"), F.col("v").as("cv"), F.col("nrm").as("cn")), "cid")
      .select(F.col("qid"), F.col("cid"),
        F.round(ndot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).as("cos_sim"))
    Similarity.topKPerQuery(reranked, "cos_sim", k)
  }

  /** The full THREE-TIER retrieval cascade — the production serve shape,
    * composed end-to-end in ONE query:
    *
    *   1. binary: Hamming shortlist over the 16 B/vector sign codes
    *      (`hammingShortlist` candidates/query — the only full corpus
    *      scan, at 1 bit/dim);
    *   2. PQ/ADC: the survivors re-scored from their m-byte PQ codes via
    *      per-query ADC lookup tables (m array reads per candidate, no
    *      float vector touched), cut to `adcShortlist`;
    *   3. exact: only `adcShortlist` ids per query ever reach the raw
    *      float vectors for the final cosine top-k.
    *
    * Tiers verified individually by q_binary_topk / q_ivf_pq / the rerank
    * oracles; this operator proves they COMPOSE — the recall gate in
    * AnnRecallSpec shows the ADC middle tier holds the binary-rerank
    * recall floor at half the exact-tier probe budget. At 100 TB the
    * cascade reads: corpus × 16 B, then |Q|·H codes (m bytes each), then
    * |Q|·A raw vectors — each tier joins on its natural key (cid / qid),
    * never broadcasting a corpus-sized side. */
  def tieredTopK(embeddings: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String,
                 codebooks: Array[Array[Array[Double]]],
                 hammingShortlist: Int, adcShortlist: Int, k: Int): DataFrame = {
    val m = codebooks.length
    val kC = codebooks.head.length
    val short1 = binaryTopK(embeddings, queries, idCol, vecCol, hammingShortlist)
      .select(F.col("qid"), F.col("cid"))
    // slim (qid, cid, pq_code) first — the wide m·kC ADC table attaches
    // per QUERY, not per candidate row, and is projected away in-stage
    val coded = Similarity.pqEncode(embeddings, idCol, vecCol, codebooks)
      .select(F.col(idCol).as("cid"), F.col("pq_code"))
    val qAdc = queries.select(F.col(idCol).as("qid"),
      Similarity.adcTables(F.col(vecCol), codebooks).as("__adc"))
    val adcScored = short1
      .join(coded, "cid")
      .join(qAdc, "qid")
      .select(F.col("qid"), F.col("cid"), Similarity.adcScore(m, kC).as("pq_dot"))
    val short2 = Similarity.topKPerQuery(adcScored, "pq_dot", adcShortlist)
      .select(F.col("qid"), F.col("cid"))
    exactCosineRerank(short2, embeddings, queries, idCol, vecCol, k)
  }

  /** Per-DIMENSION asymmetric int8 CALIBRATION — the classic trained
    * scalar quantizer (the FAISS QT_8bit semantics): codes c_d =
    * round((x_d − min_d)/scale_d) ∈ [0, 255] with scale_d = (max_d −
    * min_d)/255 fit per dimension over the corpus. Complements
    * [[int8Symmetric]]: the per-vector symmetric scheme wastes levels
    * when dimensions differ in spread (anisotropic embeddings — the
    * usual case); per-dim calibration spends all 256 levels inside each
    * dimension's actual range at the same 1 byte/dim.
    *
    * Returns the d-bounded (min, scale) model as a driver array (the
    * meanVector discipline: ONE d-row collect off a combinable per-dim
    * min/max aggregate — never data-sized), 9-snapped so the model
    * embeds as identical literals in any engine (the snapCentroids
    * train→snap→serve discipline). A constant dimension gets scale 1
    * (code 0 everywhere). */
  def sq8Calibrate(embeddings: DataFrame, vecCol: String): Array[(Double, Double)] = {
    val rows = embeddings
      .select(F.posexplode(F.col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(F.min(F.col("x").cast("double")).as("mn"),
        F.max(F.col("x").cast("double")).as("mx"))
      .orderBy("pos").collect()
    require(rows.nonEmpty, "sq8Calibrate needs a non-empty corpus")
    rows.map { r =>
      val mn = r.getDouble(1); val mx = r.getDouble(2)
      (rd9(mn), rd9(if (mx > mn) (mx - mn) / 255.0 else 1.0))
    }
  }

  private def rd9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-vector encode/reconstruction stats under a FROZEN [[sq8Calibrate]]
    * model — the [[int8Symmetric]] output shape for the per-dim scheme:
    * (id, q_min, q_max, n_lo, n_hi, recon_mae). n_lo/n_hi count codes
    * pinned at 0/255 — on the training corpus these are the genuine
    * range endpoints; on NEW data they are saturation, the drift signal
    * that says recalibrate. Codes are exact integers from literal
    * calibration arrays (map-only, engine-exact); the MAE is an in-row
    * fold rounded 6. */
  def sq8Stats(embeddings: DataFrame, idCol: String, vecCol: String,
               calib: Array[(Double, Double)]): DataFrame = {
    val enc = sq8Encoded(embeddings, vecCol, calib)
    val err = s"aggregate(transform(__q, (c, i) -> " +
      s"abs(cast(element_at($vecCol, i + 1) as double) - " +
      s"(element_at(__mins, i + 1) + cast(c as double) * element_at(__scales, i + 1)))), " +
      s"cast(0.0 as double), (a, x) -> a + x)"
    enc
      .withColumn("__err", F.expr(err))
      .select(F.col(idCol),
        F.array_min(F.col("__q")).as("q_min"),
        F.array_max(F.col("__q")).as("q_max"),
        F.size(F.filter(F.col("__q"), c => c === 0)).cast("long").as("n_lo"),
        F.size(F.filter(F.col("__q"), c => c === 255)).cast("long").as("n_hi"),
        F.round(F.col("__err") / F.size(F.col(vecCol)), 6).as("recon_mae"))
  }

  /** Asymmetric-distance top-k serve from the per-dim codes: the query
    * stays FLOAT, the corpus is 1 byte/dim, and the inner product
    * distributes over the dequantized form — dot(q, x̂) = Σ q_d·(min_d +
    * c_d·scale_d) — so scoring touches codes and the d-bounded literal
    * model only (never a reconstructed float corpus at rest). Queries
    * broadcast (the bruteForceTopK shape: this is the exact-over-codes
    * baseline the bucketed ANN tiers compare against). Output: (qid,
    * cid, ip_score round 4, rn ≤ k) ranked by inner product. */
  def sq8TopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, calib: Array[(Double, Double)], k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{fdDot => ndotD}
    val q = queries.select(F.col(idCol).as("qid"), F.col(vecCol).as("qv"))
    // dequantize ONCE per corpus row (an O(N·d) interpreted transform),
    // so the O(N·|q|·d) scoring loop runs the codegen'd fd_dot kernel —
    // the per-term algebra q_d·(min_d + c_d·scale_d) is unchanged, just
    // factored so the parenthesized reconstruction computes per row, not
    // per pair (bit-identical accumulation, the TwoNN HOF lesson)
    val c = sq8Encoded(embeddings, vecCol, calib)
      .withColumn("__xhat", F.expr("transform(__q, (c, i) -> " +
        "element_at(__mins, i + 1) + cast(c as double) * element_at(__scales, i + 1))"))
      .select(F.col(idCol).as("cid"), F.col("__xhat"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("cid") =!= F.col("qid"))
      .withColumn("ip_score", F.round(ndotD(F.col("qv"), F.col("__xhat")), 4) + F.lit(0.0))
    Similarity.topKPerQuery(scored.select("qid", "cid", "ip_score"), "ip_score", k)
  }

  /** (id, codes, literal model columns) under a frozen calibration. */
  private def sq8Encoded(embeddings: DataFrame, vecCol: String,
                         calib: Array[(Double, Double)]): DataFrame = {
    require(calib.nonEmpty, "empty calibration")
    val minsL = F.array(calib.map(c => F.lit(c._1)): _*)
    val scalesL = F.array(calib.map(c => F.lit(c._2)): _*)
    val codes = s"transform($vecCol, (x, i) -> cast(greatest(0.0, least(255.0, " +
      s"round((cast(x as double) - element_at(__mins, i + 1)) / element_at(__scales, i + 1), 0))) as int))"
    embeddings
      .withColumn("__mins", minsL)
      .withColumn("__scales", scalesL)
      .withColumn("__q", F.expr(codes))
  }

  def int8Symmetric(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = F.col(vecCol)
    val absMax = F.array_max(F.transform(v, x => F.abs(x.cast("double"))))
    val scale = F.when(absMax > 0.0, absMax / 127.0).otherwise(F.lit(1.0))
    val q = F.transform(v, x =>
      F.greatest(F.lit(-127.0), F.least(F.lit(127.0), F.round(x.cast("double") / F.col("__scale"), 0))).cast("int"))
    val errSum = F.aggregate(
      F.zip_with(v, F.col("__q"), (x, c) => F.abs(x.cast("double") - dequant(c, F.col("__scale")))),
      F.lit(0.0), (acc, x) => acc + x)
    embeddings
      .withColumn("__scale", scale)
      .withColumn("__q", q)
      .select(
        F.col(idCol),
        F.round(F.col("__scale"), 6).as("scale8"),
        F.array_min(F.col("__q")).as("q_min"),
        F.array_max(F.col("__q")).as("q_max"),
        F.size(F.filter(F.col("__q"), c => F.abs(c) === 127)).cast("long").as("n_sat"),
        F.round(errSum / F.size(v), 6).as("recon_mae"))
  }
}
