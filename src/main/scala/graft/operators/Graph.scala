package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.Pin._

/** Distributed graph analytics over relational edge lists.
  *
  * The near-dup machinery already runs one graph algorithm (connected
  * components, [[Dedup.connectedComponents]]); this adds weighted
  * PageRank — the importance/centrality signal a web-scale corpus
  * pipeline uses to weight crawl sources — as plain iterative DataFrame
  * joins, no driver-side graph object ever materialized.
  *
  * Scale shape: the edge list is repartitioned by `src` ONCE and pinned
  * (localCheckpoint), so each of the `iters` contribution joins
  * co-partitions against it and only the rank table (|V| rows, ≪ |E|)
  * moves through a shuffle per iteration. Aggregations are map-side
  * combinable sums keyed by `dst`. Cost: iters × (1 rank-side exchange +
  * 1 combinable aggregate) over an edge list that never re-shuffles.
  */
object Graph {

  /** The session's configured shuffle width. Keyed repartitions that feed
    * pinned iteration frames or exploding joins pin this EXPLICIT count:
    * a bare repartition(col) is subject to AQE coalescing, which sizes
    * from the exchange's input BYTES — blind to a downstream join fan-out
    * or to a frame being re-streamed once per iteration — and at bench
    * scale collapsed these frames to ONE partition (measured: the whole
    * per-iteration join of pageRank ran single-task). A user-specified
    * numPartitions is exempt from coalescing (the Similarity salted-serve
    * lesson, applied to every keyed pin). */
  private def shuffleWidth(df: DataFrame): Int = {
    // non-numeric configs exist in the wild (e.g. "auto" on some
    // platforms) — fall back to the parallelism default instead of
    // throwing NumberFormatException mid-query
    val raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    scala.util.Try(raw.trim.toInt).toOption.filter(_ > 0)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
  }


  /** Weighted PageRank over a directed edge list `(src, dst, w)`.
    *
    * rank₀(v) = 1/N; rankₖ(v) = (1-d)/N + d · Σ_{(u,v)∈E} rankₖ₋₁(u) ·
    * w(u,v)/wout(u). Every iteration's ranks are snapped to 9 decimals
    * and each contribution term to 12 (the snapCentroids discipline):
    * transition probabilities are single IEEE divisions (bit-identical on
    * any engine), so the only cross-engine drift is summation order —
    * ~1e-16, collapsed by the 9-decimal snap — which keeps the whole
    * trajectory engine-exact and the operator oracle-able by an unrolled
    * SQL mirror.
    *
    * Nodes with no in-edges settle at (1-d)/N; nodes with no out-edges
    * (dangling) leak their mass — symmetrize the edge list upstream if
    * the graph is undirected. Output: (node_id, pagerank) with the final
    * rank rounded to 6 decimals. */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 5): DataFrame = {
    val nodes = edges.select(F.col("src").as("id"))
      .union(edges.select(F.col("dst").as("id")))
      .distinct()
      .pin()
    val n = nodes.count() // one driver scalar, the only collect-shaped op
    val outW = edges.groupBy(F.col("src")).agg(F.sum(F.col("w")).as("wout"))
    // transition probability: one IEEE division on integer-valued doubles
    // — bit-identical across engines, no snap needed. SHUFFLE_HASH on the
    // |V|-row side (guide §3.1): the planner's default SMJ re-SORTED the
    // pinned |E|-row frame on every one of the `iters` joins — measured
    // 69.5 s of task time at sf0.1 — while a hash build of the small
    // side's partition streams the edges sort-free; the pre-partitioned
    // edge side needs no exchange either way, and values are unchanged
    // (the per-term 12-snap + per-rank 9-snap already absorb reduction-
    // order drift, the discipline the plan relies on between runs).
    val ep = edges.join(outW.hint("shuffle_hash"), "src")
      .select(F.col("src"), F.col("dst"), (F.col("w") / F.col("wout")).as("p"))
      .repartition(shuffleWidth(edges), F.col("src"))
      .pin()
    val base = F.lit(1.0 - damping) / F.lit(n.toDouble)
    var rank = nodes.select(F.col("id"), F.round(F.lit(1.0) / F.lit(n.toDouble), 9).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ep.join(rank.hint("shuffle_hash"), ep("src") === rank("id"))
        .groupBy(F.col("dst"))
        .agg(F.sum(F.round(F.col("r") * F.col("p"), 12)).as("m"))
      rank = nodes.join(contrib.hint("shuffle_hash"), nodes("id") === contrib("dst"), "left")
        .select(F.col("id"),
          F.round(base + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0)), 9).as("r"))
    }
    rank.select(F.col("id").as("node_id"), F.round(F.col("r"), 6).as("pagerank"))
  }

  /** PERSONALIZED PageRank: random walk with restart into a seed set —
    * "importance relative to THESE nodes", the recommendation /
    * similar-entity / trust-propagation shape (vs global PageRank's
    * corpus-wide centrality). Identical iteration to [[pageRank]] except
    * the teleport vector: uniform over `seeds` instead of uniform over
    * all nodes, so restart mass re-enters only at the seeds and rank
    * decays with distance from them. Same snapping discipline (9-decimal
    * ranks, 12-decimal contribution terms), so the trajectory is
    * engine-exact and an unrolled SQL mirror replays it; same scale
    * shape (edge list pinned once, only the |V|-row rank table moves per
    * iteration); same dangling-mass caveat. Nodes outside the seed set
    * start at 0 and are reported only through propagation. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           damping: Double = 0.85, iters: Int = 5): DataFrame = {
    val nodes = edges.select(F.col("src").as("id"))
      .union(edges.select(F.col("dst").as("id")))
      .distinct()
    val sd = seeds.select(F.col(seeds.columns(0)).as("id")).distinct().pin()
    val ns = sd.count()
    require(ns > 0, "seed set must be non-empty")
    val outW = edges.groupBy(F.col("src")).agg(F.sum(F.col("w")).as("wout"))
    // SHUFFLE_HASH on the |V|-row sides: see pageRank — same measured
    // SMJ re-sort pathology, same snap-absorbed value identity
    val ep = edges.join(outW.hint("shuffle_hash"), "src")
      .select(F.col("src"), F.col("dst"), (F.col("w") / F.col("wout")).as("p"))
      .repartition(shuffleWidth(edges), F.col("src"))
      .pin()
    val tele = nodes.join(sd.withColumn("__seed", F.lit(1)), Seq("id"), "left")
      .select(F.col("id"),
        F.when(F.col("__seed").isNotNull,
          F.round(F.lit(1.0) / F.lit(ns.toDouble), 9)).otherwise(F.lit(0.0)).as("tele"))
      .pin() // read every iteration
    var rank = tele.select(F.col("id"), F.col("tele").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ep.join(rank.hint("shuffle_hash"), ep("src") === rank("id"))
        .groupBy(F.col("dst"))
        .agg(F.sum(F.round(F.col("r") * F.col("p"), 12)).as("m"))
      rank = tele.join(contrib.hint("shuffle_hash"), tele("id") === contrib("dst"), "left")
        .select(tele("id"),
          F.round(F.lit(1.0 - damping) * F.col("tele")
            + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0)), 9).as("r"))
    }
    rank.select(F.col("id").as("node_id"), F.round(F.col("r"), 6).as("ppr"))
  }

  /** HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) over a directed edge list:
    * authority(v) ← Σ hub(u) over in-edges, hub(u) ← Σ authority(v) over
    * out-edges, alternating for `iters` rounds.
    *
    * Normalization is BY THE MAX element, not the usual L2 norm — the
    * deliberate cross-engine choice: max is summation-order-independent
    * (an L2/L1 normalizer aggregates the whole vector, so its last-ulp
    * value depends on reduction order and a divide-then-snap can flip a
    * boundary digit), while max-of-snapped-values is exact, divisions
    * are per-element IEEE ops, and scores stay in [0, 1] so the 9-decimal
    * per-round snap dominates the ~1e-16·degree summation drift — the
    * pageRank discipline, adapted to a spectral iteration. Rankings are
    * unaffected (HITS is scale-free). Edges are deduplicated; weights are
    * intentionally not supported here (unweighted co-citation is the
    * classic formulation; weighted sums would grow term magnitudes past
    * what the snap hierarchy absorbs).
    *
    * Output: (node_id, hub, authority), both max-normalized, round 6. */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(F.col(edges.columns(0)).as("src"), F.col(edges.columns(1)).as("dst"))
      .distinct()
    // the |E|-row list is pinned ONCE PER JOIN ORIENTATION (the pageRank
    // ep discipline): the authority step joins on src, the hub step on
    // dst — pre-partitioned, each round shuffles only the |V|-row score
    // frame, never the edges
    val eBySrc = e.repartition(shuffleWidth(e), F.col("src")).pin()
    val eByDst = eBySrc.repartition(shuffleWidth(e), F.col("dst")).pin()
    val nodes = eBySrc.select(F.col("src").as("id"))
      .union(eBySrc.select(F.col("dst").as("id")))
      .distinct()
      .pin()
    var hub = nodes.select(F.col("id"), F.lit(1.0).as("x"))
    var auth = nodes.select(F.col("id"), F.lit(0.0).as("x"))
    // SHUFFLE_HASH on the |V|-row score side (guide §3.1): the default
    // SMJ re-sorted the pinned |E|-row frame every half-round (see
    // pageRank); score sums are snapped per round, so values are
    // join-strategy-independent
    for (_ <- 1 to iters) {
      auth = normalizeMax(nodes,
        eBySrc.join(hub.hint("shuffle_hash"), eBySrc("src") === hub("id"))
          .groupBy(eBySrc("dst").as("id")).agg(F.sum(F.col("x")).as("raw")))
      hub = normalizeMax(nodes,
        eByDst.join(auth.hint("shuffle_hash"), eByDst("dst") === auth("id"))
          .groupBy(eByDst("src").as("id")).agg(F.sum(F.col("x")).as("raw")))
    }
    nodes
      .join(hub.select(F.col("id"), F.col("x").as("hub")).hint("shuffle_hash"),
        Seq("id"), "left")
      .join(auth.select(F.col("id"), F.col("x").as("authority")).hint("shuffle_hash"),
        Seq("id"), "left")
      .select(F.col("id").as("node_id"),
        F.round(F.coalesce(F.col("hub"), F.lit(0.0)), 6).as("hub"),
        F.round(F.coalesce(F.col("authority"), F.lit(0.0)), 6).as("authority"))
  }

  /** Left-join `raw` scores onto the node set (missing → 0), divide by
    * the broadcast 1-row max, snap to 9 decimals. The raw frame is
    * PINNED (localCheckpoint) because it feeds both the max aggregate and
    * the projection — without the pin each half-round would double the
    * lazy lineage (2^rounds plan blowup); with it the per-round cost is
    * one ≤|V|-row materialization, the [[personalizedPageRank]] tele
    * pattern. (Computing the max before the node fill would not help:
    * the grouped frame would still have two consumers.) */
  private def normalizeMax(nodes: DataFrame, raw: DataFrame): DataFrame = {
    val grouped = raw.pin()
    val mx = grouped.agg(F.coalesce(F.max(F.col("raw")), F.lit(0.0)).as("__mx"))
    nodes.join(grouped.hint("shuffle_hash"), Seq("id"), "left")
      .select(F.col("id"), F.coalesce(F.col("raw"), F.lit(0.0)).as("raw"))
      .crossJoin(F.broadcast(mx))
      .select(F.col("id"),
        F.when(F.col("__mx") === 0.0, F.lit(0.0))
          .otherwise(F.round(F.col("raw") / F.col("__mx"), 9)).as("x"))
  }

  /** LOCAL twin of the [[labelPropagation]] rounds (r17 optimization —
    * the same size-gated driver fast path as the Louvain sweeps): counts
    * and the (max count, min label) argmin are exact integers, so the
    * trajectory replays bit-for-bit; GraphSpec pins local ≡ distributed.
    * `und` rows are BOTH orientations (as the distributed frame holds). */
  private def localLpaRounds(und: Array[Array[Long]], iters: Int): Array[(Long, Long)] = {
    import scala.collection.mutable
    var labels = mutable.LongMap.empty[Long]
    und.foreach(e => labels(e(0)) = e(0))
    for (_ <- 1 to iters) {
      val cnt = mutable.HashMap.empty[(Long, Long), Long]
      und.foreach { e =>
        val k = (e(0), labels(e(1))) // src adopts from dst's label
        cnt(k) = cnt.getOrElse(k, 0L) + 1L
      }
      val next = mutable.LongMap.empty[Long]
      cnt.foreach { case ((node, lbl), c) =>
        next.get(node) match {
          case Some(cur) =>
            val curC = cnt((node, cur))
            if (c > curC || (c == curC && lbl < cur)) next(node) = lbl
          case None => next(node) = lbl
        }
      }
      labels = next
    }
    labels.toArray.sortBy(_._1)
  }

  /** Multi-source BFS hop distances over a DIRECTED edge list, bounded at
    * `maxHops` (symmetrize upstream for undirected reachability): the
    * "how far is every node from the seed set" question — crawl frontier
    * depth, contamination blast radius, account-takeover reach.
    *
    * Level-synchronous frontier expansion: round h joins the CURRENT
    * frontier (nodes first reached at h−1, a shrinking ≤|V|-row frame)
    * against the pinned edge list, anti-joins out already-settled nodes,
    * and the settled set grows by union — each node's distance is final
    * the round it first appears (BFS invariant), so no per-round min
    * re-aggregation over history. Cost: maxHops × (one frontier join +
    * one anti-join), the edge list shuffled never, re-read maxHops times.
    *
    * Output: (node_id, dist) for every node within `maxHops` of any
    * source (sources at 0). */
  def hopDistances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(F.col(edges.columns(0)).as("src"), F.col(edges.columns(1)).as("dst"))
      .distinct()
      .repartition(shuffleWidth(edges), F.col("src"))
      .pin()
    // size-gated local BFS (the Louvain-sweep idiom): levels are pure
    // set algebra over integer ids — a provably-small graph settles on
    // the driver with zero per-hop exchanges
    val srcT = sources.schema(sources.columns(0)).dataType
    val localOut: Option[DataFrame] =
      if (localSweepCap <= 0 || srcT != e.schema("src").dataType) None
      else collectIfSmall(e, Seq("src", "dst"), localSweepCap).flatMap { rows =>
        val srcSel = sources.select(F.col(sources.columns(0)).as("id")).distinct()
        collectIfSmall(srcSel, Seq("id"), localSweepCap).map { seeds =>
          import scala.collection.mutable
          val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
          rows.foreach { r =>
            adj.getOrElseUpdate(r(0), mutable.ArrayBuffer.empty[Long]) += r(1); ()
          }
          val dist = mutable.LongMap.empty[Long]
          seeds.foreach(s => dist(s(0)) = 0L)
          var frontier = seeds.map(_(0))
          for (h <- 1 to maxHops) {
            val next = mutable.LongMap.empty[Unit]
            frontier.foreach { n =>
              adj.get(n).foreach(_.foreach { d => if (!dist.contains(d)) next(d) = () })
            }
            frontier = next.keys.toArray
            frontier.foreach(n => dist(n) = h.toLong)
          }
          localGraphRows(e.sparkSession, dist.toArray.sortBy(_._1)
              .map { case (n, d) => Seq[Any](n, d) },
            Seq("node_id" -> srcT, "dist" -> org.apache.spark.sql.types.LongType))
        }
      }
    if (localOut.isDefined) return localOut.get
    var settled = sources.select(F.col(sources.columns(0)).as("id")).distinct()
      .select(F.col("id"), F.lit(0L).as("dist"))
      .pin()
    var frontier = settled
    for (h <- 1 to maxHops) {
      val next = e.join(frontier, e("src") === frontier("id"))
        .select(e("dst").as("id")).distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .select(F.col("id"), F.lit(h.toLong).as("dist"))
        .pin() // pin: read as next round's frontier AND unioned
      settled = settled.unionAll(next).pin()
      frontier = next
    }
    settled.select(F.col("id").as("node_id"), F.col("dist"))
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert, Kumara 2007, made deterministic): labels start as node ids;
    * each round every node adopts the most frequent label among its
    * neighbors, ties broken by SMALLEST label — no randomness, so the
    * trajectory is a pure function of the edge list and `iters`, and an
    * unrolled SQL mirror reproduces it exactly (the pageRank discipline;
    * asynchronous/randomized LPA would not be oracle-able).
    *
    * Scale shape: the symmetrized edge list is pinned ONCE; each round is
    * one |E|-row join against the |V|-row label table, a map-side-
    * combinable (node, label) count, and a struct-min argmin — no window,
    * no global sort. Fixed `iters` bounds cost (synchronous LPA can
    * oscillate on bipartite structures rather than converge; a production
    * run layers a stability check on top).
    *
    * Input: two-column edge frame, any orientation; self-loops dropped,
    * duplicates collapsed. Output: (node_id, label). */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    val a = F.col(edges.columns(0))
    val b = F.col(edges.columns(1))
    val half = edges.select(a.as("src"), b.as("dst")).filter(F.col("src") =!= F.col("dst"))
    val und = half
      .unionAll(half.select(F.col("dst").as("src"), F.col("src").as("dst")))
      .distinct()
      .repartition(shuffleWidth(edges), F.col("dst")) // each round's join keys on dst
      .pin()
    // size-gated local fast path (the Louvain-sweep idiom): the rounds
    // are integer counts + a deterministic argmin, so a provably-small
    // graph replays the identical trajectory on the driver with zero
    // exchanges; larger graphs (or non-integral ids) fall through
    val localOut: Option[DataFrame] =
      if (localSweepCap <= 0) None
      else collectIfSmall(und, Seq("src", "dst"), localSweepCap).map { rows =>
        val idT = und.schema("src").dataType
        val sess = und.sparkSession
        import sess.implicits._
        localLpaRounds(rows, iters).toSeq.toDF("id", "lbl")
          .select(F.col("id").cast(idT).as("node_id"), F.col("lbl").cast(idT).as("label"))
      }
    localOut.getOrElse {
      var labels = und.select(F.col("src").as("id")).distinct()
        .select(F.col("id"), F.col("id").as("lbl"))
      for (_ <- 1 to iters) {
        val nb = und.join(labels, und("dst") === labels("id"))
          .select(und("src").as("node"), F.col("lbl"))
        labels = nb.groupBy("node", "lbl")
          .agg(F.count(F.lit(1)).as("c"))
          .groupBy("node")
          // lexicographic struct-min = (max count, then min label): the
          // deterministic tie-break without a per-node sort window
          .agg(F.min(F.struct((-F.col("c")).as("nc"), F.col("lbl").as("l"))).as("m"))
          .select(F.col("node").as("id"), F.col("m.l").as("lbl"))
      }
      labels.select(F.col("id").as("node_id"), F.col("lbl").as("label"))
    }
  }

  /** Per-node triangle counts over an undirected edge list (any input
    * orientation; self-loops and duplicates removed here) — the clustering
    * signal community/spam analysis runs at corpus scale.
    *
    * The plan is the DEGREE-ORIENTED node-iterator: orient every edge
    * from its (degree, id)-smaller endpoint to the larger, enumerate
    * wedges as pairs of out-neighbors, and close them with a semi-join
    * back to the oriented edges. Orientation is the whole scale story:
    * out-degrees are bounded by O(√|E|) (arboricity), so the wedge
    * self-join — the only superlinear step — touches Σ outdeg² pairs
    * instead of the Σ deg² a naive neighbor join pays on hubs; each
    * triangle x≺y≺z is generated exactly once, at its smallest corner.
    * Output: (node, triangles) for every node in at least one triangle. */
  def triangleCount(edges: DataFrame): DataFrame = {
    // pinned: deg + the oriented view both consume it (the unpinned form
    // computed the distinct twice), and the pin feeds the size probe
    val und = undirect(edges).pin()
    val nodeT = und.schema("a").dataType
    localGraphOut(und, Seq("node" -> nodeT,
        "triangles" -> org.apache.spark.sql.types.LongType)) { rows =>
      localTriangles(localCanonical(rows)).toArray.map { case (n, t) => Seq[Any](n, t) }
    }.getOrElse(triangleCore(und, degrees(und)))
  }

  /** Canonical undirected edge set: (min, max) endpoints, self-loops
    * dropped, duplicates collapsed. */
  private def undirect(edges: DataFrame): DataFrame =
    edges.select(
        F.least(F.col(edges.columns(0)), F.col(edges.columns(1))).as("a"),
        F.greatest(F.col(edges.columns(0)), F.col(edges.columns(1))).as("b"))
      .filter(F.col("a") =!= F.col("b"))
      .distinct()

  /** (node, d) undirected degrees of a canonical edge set. */
  private def degrees(und: DataFrame): DataFrame =
    und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("d"))

  /** LOCAL twins of the triangle/truss kernels (r17 size-gated driver
    * fast path): all quantities are exact integer counts over the unique
    * canonical edge set, so any enumeration order yields the identical
    * result — GraphSpec pins local ≡ distributed on the fixtures. */
  private def localCanonical(rows: Array[Array[Long]]): Array[(Long, Long)] = {
    val s = scala.collection.mutable.HashSet.empty[(Long, Long)]
    rows.foreach { e =>
      val a = math.min(e(0), e(1)); val b = math.max(e(0), e(1))
      if (a != b) { s += ((a, b)); () }
    }
    s.toArray
  }

  private def localDegrees(und: Array[(Long, Long)]): scala.collection.mutable.LongMap[Long] = {
    val d = scala.collection.mutable.LongMap.empty[Long]
    und.foreach { case (a, b) =>
      d(a) = d.getOrElse(a, 0L) + 1L
      d(b) = d.getOrElse(b, 0L) + 1L
    }
    d
  }

  /** Size-gated local evaluation harness for the one-shot graph kernels:
    * probe the pinned canonical edge frame (`a`, `b`), hand the rows to
    * `f`, and build the output frame with the caller's target dtypes
    * (node columns keep the input's integral type — schema identity is
    * part of the oracle gate). None ⇒ distributed path. */
  private def localGraphOut(und: DataFrame,
                            cols: Seq[(String, org.apache.spark.sql.types.DataType)])(
      f: Array[Array[Long]] => Array[Seq[Any]]): Option[DataFrame] =
    if (localSweepCap <= 0) None
    else collectIfSmall(und, Seq("a", "b"), localSweepCap).map { rows =>
      localGraphRows(und.sparkSession, f(rows), cols)
    }

  /** Build a driver-computed result frame: Long/Double natural values,
    * cast to the caller's target dtypes. */
  private def localGraphRows(spark: org.apache.spark.sql.SparkSession,
                             data: Array[Seq[Any]],
                             cols: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame = {
    import org.apache.spark.sql.types._
    val natural = StructType(cols.map { case (n, dt) =>
      StructField(n, if (isIntegral(dt)) LongType else dt, nullable = false)
    })
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(data.map(s => org.apache.spark.sql.Row(s: _*)).toSeq.asJava, natural)
      .select(cols.map { case (n, dt) => F.col(n).cast(dt).as(n) }: _*)
  }

  /** Per-node triangle counts (degree-oriented, each triangle credited
    * at all three corners), driver-local. */
  private def localTriangles(und: Array[(Long, Long)]): scala.collection.mutable.LongMap[Long] = {
    import scala.collection.mutable
    val deg = localDegrees(und)
    def before(x: Long, y: Long): Boolean = {
      val dx = deg(x); val dy = deg(y)
      dx < dy || (dx == dy && x < y)
    }
    val out = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val oriented = mutable.HashSet.empty[(Long, Long)]
    und.foreach { case (a, b) =>
      val (u, v) = if (before(a, b)) (a, b) else (b, a)
      out.getOrElseUpdate(u, mutable.ArrayBuffer.empty[Long]) += v
      oriented += ((u, v))
      ()
    }
    val tri = mutable.LongMap.empty[Long]
    def credit(n: Long): Unit = { tri(n) = tri.getOrElse(n, 0L) + 1L; () }
    out.foreach { case (u, nbrs) =>
      val srt = nbrs.toArray.sortWith(before)
      var i = 0
      while (i < srt.length) {
        var j = i + 1
        while (j < srt.length) {
          if (oriented.contains((srt(i), srt(j)))) { credit(u); credit(srt(i)); credit(srt(j)) }
          j += 1
        }
        i += 1
      }
    }
    tri
  }

  /** Per-canonical-edge triangle support (|N(a) ∩ N(b)|), driver-local. */
  private def localEdgeSupport(und: Array[(Long, Long)]): Array[((Long, Long), Long)] = {
    import scala.collection.mutable
    val adj = mutable.LongMap.empty[mutable.HashSet[Long]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.HashSet.empty[Long]) += b
      adj.getOrElseUpdate(b, mutable.HashSet.empty[Long]) += a
      ()
    }
    und.map { case (a, b) =>
      val (small, large) = if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
      var c = 0L
      small.foreach { n => if (n != a && n != b && large.contains(n)) c += 1L }
      ((a, b), c)
    }
  }

  private def triangleCore(und: DataFrame, deg: DataFrame): DataFrame = {
    val tri = triangles(und, deg)
    tri.select(F.col("u").as("node"))
      .unionAll(tri.select(F.col("x").as("node")))
      .unionAll(tri.select(F.col("y").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("triangles"))
  }

  /** The degree-oriented triangle enumeration itself — one row (u, x, y)
    * per triangle, generated exactly once at its (degree, id)-smallest
    * corner. [[triangleCore]] folds it to node counts; [[kTruss]] folds
    * it to per-EDGE support. */
  private def triangles(und: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = und
      .join(deg.select(F.col("node").as("a"), F.col("d").as("da")), "a")
      .join(deg.select(F.col("node").as("b"), F.col("d").as("db")), "b")
    val aFirst = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    val oriented = withDeg.select(
        F.when(aFirst, F.col("a")).otherwise(F.col("b")).as("u"),
        F.when(aFirst, F.col("b")).otherwise(F.col("a")).as("v"),
        F.when(aFirst, F.col("db")).otherwise(F.col("da")).as("dv"))
      .pin() // reused by the wedge join AND the closing semi-join
    val w1 = oriented.select(F.col("u"), F.col("v").as("x"), F.col("dv").as("dx"))
    val w2 = oriented.select(F.col("u"), F.col("v").as("y"), F.col("dv").as("dy"))
    val wedges = w1.join(w2, "u")
      .filter(F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y")))
      .select("u", "x", "y")
    // a wedge (u; x ≺ y) closes iff the oriented edge x→y exists
    wedges.join(
      oriented.select(F.col("u").as("x"), F.col("v").as("y")),
      Seq("x", "y"), "left_semi")
  }

  /** Per-canonical-edge triangle SUPPORT: each enumerated triangle
    * credits its three edges (mapped back to (min, max) id order); edges
    * closing no triangle report 0. One |triangles|·3-row union into a
    * combinable count — never a per-edge neighbor-set intersection. */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val tri = triangles(und, degrees(und))
    def leg(p: Column, q: Column) =
      tri.select(F.least(p, q).as("a"), F.greatest(p, q).as("b"))
    val sup = leg(F.col("u"), F.col("x"))
      .unionAll(leg(F.col("u"), F.col("y")))
      .unionAll(leg(F.col("x"), F.col("y")))
      .groupBy("a", "b").agg(F.count(F.lit(1)).as("support"))
    und.join(sup, Seq("a", "b"), "left")
      .select(F.col("a"), F.col("b"),
        F.coalesce(F.col("support"), F.lit(0L)).as("support"))
  }

  /** k-TRUSS membership (Cohen, NSA TR 2008): the maximal subgraph whose
    * EVERY edge closes at least k−2 triangles WITHIN the subgraph — the
    * community-core filter one notch stronger than [[kCore]] (a star
    * fakes degree; nothing fakes mutual triangles). Iterative peel:
    * per-edge support from the degree-oriented triangle core
    * ([[edgeSupport]]), drop edges under k−2, recompute on the pruned
    * graph, to the fixpoint — the same single-action round shape as
    * [[kCore]] (one localCheckpoint + one count per round; the graph
    * only shrinks, so round cost falls monotonically). All counts are
    * exact integers: the surviving edge set and its supports are
    * engine-exact, oracle-able by unrolled peel rounds (extra unrolled
    * rounds past the fixpoint are no-ops). Output: (src, dst, support)
    * for the surviving canonical edges, support measured IN the truss. */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3 (k-2 >= 1 triangle per edge)")
    val und0 = undirect(edges).pin()
    // the distributed path's output type is the least/greatest-coerced
    // COMMON type of both edge columns (what undirect produced) — the
    // local twin must match it, not the raw first column's type
    // (triangleCount/clusteringCoefficient already use und's type)
    val nodeT = und0.schema("a").dataType
    val localOut = localGraphOut(und0, Seq("src" -> nodeT, "dst" -> nodeT,
        "support" -> org.apache.spark.sql.types.LongType)) { rows =>
      var cur = localCanonical(rows)
      var m = cur.length.toLong
      var rounds = 0
      var changed = m > 0
      while (changed && rounds < maxRounds) {
        val kept = localEdgeSupport(cur).filter(_._2 >= k - 2).map(_._1)
        val m2 = kept.length.toLong
        changed = m2 != m
        m = m2
        cur = kept
        rounds += 1
      }
      require(!changed, s"k-truss peel did not reach its fixpoint within $maxRounds rounds")
      localEdgeSupport(cur).map { case ((a, b), s) => Seq[Any](a, b, s) }
    }
    if (localOut.isDefined) return localOut.get
    var und = und0
    var m = und.count()
    var rounds = 0
    var changed = m > 0
    while (changed && rounds < maxRounds) {
      val kept = edgeSupport(und)
        .filter(F.col("support") >= k - 2)
        .select("a", "b")
        .pin() // next round's base AND this round's count
      val m2 = kept.count()
      changed = m2 != m
      m = m2
      und = kept
      rounds += 1
    }
    require(!changed, s"k-truss peel did not reach its fixpoint within $maxRounds rounds")
    edgeSupport(und)
      .select(F.col("a").as("src"), F.col("b").as("dst"), F.col("support"))
  }

  /** Per-node LOCAL clustering coefficient — lcc(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)), the "what fraction of my neighbor pairs know
    * each other" transitivity signal (spam-farm and community cohesion
    * detection). Triangles come from the same degree-oriented core as
    * [[triangleCount]] (the arboricity-bounded wedge join is still the
    * only superlinear step); degrees from one combinable count. Both
    * inputs are exact integers, so the coefficient is a single IEEE
    * division — engine-exact, oracle-able. Nodes of degree < 2 have no
    * neighbor pairs and report 0. Output: (node_id, degree, triangles,
    * lcc) for every non-isolated node. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = undirect(edges).pin() // feeds degrees AND the triangle core
    localGraphOut(und, Seq("node_id" -> und.schema("a").dataType,
        "degree" -> org.apache.spark.sql.types.LongType,
        "triangles" -> org.apache.spark.sql.types.LongType,
        "lcc" -> org.apache.spark.sql.types.DoubleType)) { rows =>
      val cu = localCanonical(rows)
      val deg = localDegrees(cu)
      val tri = localTriangles(cu)
      deg.toArray.map { case (n, d) =>
        val t = tri.getOrElse(n, 0L)
        // the distributed expression operand-for-operand: 2.0·tri is a
        // double product, the denominator d·(d−1) promotes through
        // double the same way, HALF_UP snap to 6
        val lcc = if (d >= 2)
          roundLikeSql(2.0 * t / (d.toDouble * (d - 1L).toDouble), 6) else 0.0
        Seq[Any](n, d, t, lcc)
      }
    }.getOrElse {
      val deg = degrees(und)
      deg.join(triangleCore(und, deg), Seq("node"), "left")
        .select(F.col("node").as("node_id"),
          F.col("d").as("degree"),
          F.coalesce(F.col("triangles"), F.lit(0L)).as("triangles"),
          F.when(F.col("d") >= 2,
              F.round(F.lit(2.0) * F.coalesce(F.col("triangles"), F.lit(0L)) /
                (F.col("d").cast("double") * (F.col("d") - 1)), 6))
            .otherwise(F.lit(0.0)).as("lcc"))
    }
  }

  /** Newman MODULARITY of a node partition (Newman & Girvan, "Finding
    * and evaluating community structure in networks", PRE 2004) — the
    * score that says whether a community assignment (e.g.
    * [[labelPropagation]]'s) actually beats chance: Q = Σ_c (e_c/m −
    * (d_c/2m)²), fraction of edges inside community c minus the
    * fraction expected under the degree-preserving null model.
    *
    * Everything is exact integer counts (edges inside, degree sums, m)
    * flowing through one degree count, two label joins, and a per-label
    * aggregate; the Q algebra is fixed-shape IEEE over them. Output:
    * one row per community — (label, n_nodes, e_in, d_tot, q_c) — with
    * the total `modularity` on every row (the psi layout). Nodes
    * missing from `labels` form no community and contribute only
    * through m. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirect(edges).pin() // feeds m, degrees, AND the e_in join
    val lab = labels.select(F.col(labels.columns(0)).as("node"),
      F.col(labels.columns(1)).as("label"))
    val mAgg = und.agg(F.count(F.lit(1)).as("m"))
    val dC = degrees(und).join(lab, "node")
      .groupBy("label").agg(F.sum("d").as("d_tot"), F.count(F.lit(1)).as("n_nodes"))
    val eC = und
      .join(lab.select(F.col("node").as("a"), F.col("label").as("la")), "a")
      .join(lab.select(F.col("node").as("b"), F.col("label").as("lb")), "b")
      .filter(F.col("la") === F.col("lb"))
      .groupBy(F.col("la").as("label")).agg(F.count(F.lit(1)).as("e_in"))
    val per = dC.join(eC, Seq("label"), "left")
      .select(F.col("label"), F.col("n_nodes"),
        F.coalesce(F.col("e_in"), F.lit(0L)).as("e_in"), F.col("d_tot"))
      .crossJoin(F.broadcast(mAgg))
      .withColumn("__q",
        F.col("e_in").cast("double") / F.col("m")
          - (F.col("d_tot").cast("double") / (F.lit(2) * F.col("m")))
          * (F.col("d_tot").cast("double") / (F.lit(2) * F.col("m"))))
    val tot = per.agg(F.sum("__q").as("__qtot"))
    per.crossJoin(F.broadcast(tot))
      .select(F.col("label"), F.col("n_nodes"), F.col("e_in"), F.col("d_tot"),
        // + 0.0: −0.0 normalization (prints differently, compares equal)
        (F.round(F.col("__q"), 6) + F.lit(0.0)).as("q_c"),
        (F.round(F.col("__qtot"), 6) + F.lit(0.0)).as("modularity"))
  }

  /** ONE-LEVEL LOUVAIN refinement (the local-move phase of Blondel,
    * Guillaume, Lambiotte & Lefebvre, "Fast unfolding of communities in
    * large networks", J. Stat. Mech. 2008) — greedy modularity ascent
    * over an initial partition (a [[labelPropagation]] result, or the
    * classic singleton seed): each sweep, every node evaluates moving to
    * each NEIGHBORING community under the exact ΔQ algebra of
    * [[modularity]]'s score,
    *
    *   ΔQ(v: a→b) = (k_vb − k_va)/m − k_v·(Σ_b − Σ_a + k_v)/(2m²),
    *
    * and takes the best strictly-positive move. Two departures from the
    * sequential textbook sweep make it distributed AND deterministic:
    *
    *   1. moves are SYNCHRONOUS — every node scores against the same
    *      pinned partition, so a sweep is two |E|-row aggregates plus
    *      |V|-row joins, not a node-at-a-time driver loop. Synchronous
    *      moves can oscillate (two adjacent singletons swapping labels
    *      forever — the known parallel-Louvain pathology), so a
    *      singleton may only move INTO another singleton's community
    *      when the target label is smaller (the deterministic variant of
    *      the swap guard in Lu, Halappanavar & Kalyanaraman, "Parallel
    *      heuristics for scalable community detection", ParCo 2015);
    *   2. a sweep is ACCEPTED only if the re-scored Q strictly improves
    *      (one 1-row driver scalar per sweep, the pageRank-n pattern) —
    *      which makes Q(final) ≥ Q(init) a structural guarantee, not a
    *      hope, and caps the damage of any residual oscillation at
    *      "no further improvement".
    *
    * Every ΔQ input is an exact integer (edge counts, degree sums, m),
    * so each candidate score is one fixed-shape IEEE expression — bit-
    * identical across engines — snapped to 9 decimals before the
    * (max ΔQ, min label) argmax; Q totals sum 12-snapped per-community
    * terms and snap to 9 (the pageRank discipline), so accept/reject
    * decisions replay exactly and the whole trajectory is oracle-able by
    * an unrolled SQL mirror. `init` must label every node of the graph
    * (extra labels for non-edge nodes are ignored; the partition is over
    * non-isolated nodes, like [[modularity]]).
    *
    * Output: (node_id, label, q_init, q_final), the Q columns (round 6)
    * repeated on every row — the psi layout. */
  def louvainRefine(edges: DataFrame, init: DataFrame, sweeps: Int = 2): DataFrame = {
    val und = undirect(edges).pin() // feeds m, degrees, AND every sweep
    val m = und.count() // 1-row driver scalar (the pageRank-n pattern)
    require(m > 0, "louvainRefine needs at least one edge")
    val (lab, qInit, q) = weightedSweeps(
      und.select(F.col("a"), F.col("b"), F.lit(1L).as("w")),
      m.toDouble, init, sweeps, parityGate = false, pinStatic = true)
    lab.select(F.col("node").as("node_id"), F.col("label"),
      // + 0.0: −0.0 normalization (a just-below-zero Q rounds to −0.0)
      (F.round(F.lit(qInit), 6) + F.lit(0.0)).as("q_init"),
      (F.round(F.lit(q), 6) + F.lit(0.0)).as("q_final"))
  }

  /** Size gate for the LOCAL sweep fast path (r17 optimization round,
    * guide §1/§2: the measured cost of the Louvain family at the bench
    * scale is almost entirely AQE shuffle-stage latency — q_louvain_deep
    * executed 292 jobs for 4.4 s of summed-task work spread over 37 s of
    * wall — and at ANY corpus scale the deep recursion's contracted
    * levels shrink geometrically toward graphs of a few hundred rows, so
    * the tail levels pay the same per-exchange latency for near-zero
    * data). A level whose edge multigraph PROVABLY fits under this cap
    * (a `limit(cap+1)` probe — the loudly-guarded-collect idiom) runs
    * the IDENTICAL sweep algebra single-threaded on the driver: every
    * ΔQ/Q operand is the same integer, every float expression the same
    * fixed-shape IEEE tree with the same HALF_UP snap (GraphSpec pins
    * local ≡ distributed on every fixture), so the trajectory — and the
    * oracle hash — is unchanged. 200k edges ≈ 5 MB of driver memory;
    * larger levels take the distributed path untouched. 0 disables (the
    * spec hook that keeps the distributed path covered). */
  @volatile private[graft] var localSweepCapOverride: Option[Int] = None // spec hook
  private[graft] def localSweepCap: Int = localSweepCapOverride.getOrElse(
    sys.env.get("SPARK_GRAFT_LOCAL_SWEEP_MAX").map(_.toInt).getOrElse(200000))

  /** Catalyst's `round(x, s)` for doubles, replicated exactly: Spark
    * routes the double through `BigDecimal(Double.toString(x))` and
    * HALF_UP setScale — so the local sweep's snaps are the SAME doubles
    * the distributed expression produces (RoundSpec in GraphSpec pins
    * the equivalence on boundary values). */
  private[graft] def roundLikeSql(x: Double, s: Int): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  /** Guarded probe: the named integral columns of `df` as longs IF the
    * frame holds ≤ cap rows and no nulls — else None (distributed path).
    * One collectLimit job; on the callers' already-pinned frames this
    * reads checkpointed partitions, no recompute. */
  private def collectIfSmall(df: DataFrame, cols: Seq[String], cap: Int): Option[Array[Array[Long]]] = {
    val sch = df.schema
    if (!cols.forall(c => sch.fieldNames.contains(c) && isIntegral(sch(c).dataType))) return None
    val rows = df.select(cols.map(c => F.col(c).cast("long")): _*).limit(cap + 1).collect()
    if (rows.length > cap || rows.exists(r => cols.indices.exists(r.isNullAt))) None
    else Some(rows.map(r => Array.tabulate(cols.size)(r.getLong)))
  }

  /** The DRIVER-LOCAL twin of [[weightedSweeps]] — the same algebra,
    * operand for operand: weighted degrees with self-loops twice, the
    * fused (sig, nc) per-community frame, kvc from both cross-edge
    * orientations, ΔQ = (k_to − k_va)/m − k_v·(Σ_b − Σ_a + k_v)/(2m²)
    * snapped to 9, the singleton swap guard, the parity gate, the
    * (max ΔQ, min label) argmax, Q from 12-snapped per-community terms
    * summed in label order and snapped to 9, accept-iff-strictly-better.
    * Inputs are exact integers so every candidate score is the same
    * fixed-shape IEEE expression as the distributed plan; the only
    * order-dependent float op is the Q total, whose reduction-order
    * drift (~1e-16) both paths absorb by the same 9-snap — the
    * discipline the distributed plan already relies on between its own
    * runs. */
  private def localSweeps(
      edges: Array[Array[Long]],          // (a, b, w) canonical a ≤ b rows
      mD: Double,
      seed: Array[Array[Long]],           // (node, label)
      sweeps: Int,
      parityGate: Boolean,
      qInit0: Option[Double]): (Array[(Long, Long)], Double, Double) = {
    import scala.collection.mutable
    // weighted degree k_v: self-loops twice, cross once per end
    val kv = mutable.LongMap.empty[Long]
    edges.foreach { e =>
      if (e(0) == e(1)) kv(e(0)) = kv.getOrElse(e(0), 0L) + e(2) * 2
      else {
        kv(e(0)) = kv.getOrElse(e(0), 0L) + e(2)
        kv(e(1)) = kv.getOrElse(e(1), 0L) + e(2)
      }
    }
    // partition over graph nodes only (seed semi-joined to the degree frame)
    var lab = mutable.LongMap.empty[Long]
    seed.foreach { s => if (kv.contains(s(0))) lab(s(0)) = s(1) }
    def sigOf(l: mutable.LongMap[Long]): mutable.LongMap[(Long, Long)] = {
      val m = mutable.LongMap.empty[(Long, Long)]
      l.foreach { case (n, c) =>
        val cur = m.getOrElse(c, (0L, 0L))
        m(c) = (cur._1 + kv(n), cur._2 + 1L)
      }
      m
    }
    val twoM = 2 * mD
    val twoM2 = 2 * mD * mD
    def qOf(sig: mutable.LongMap[(Long, Long)], l: mutable.LongMap[Long]): Double = {
      if (sig.isEmpty) return 0.0
      val ein = mutable.LongMap.empty[Long]
      edges.foreach { e =>
        (l.get(e(0)), l.get(e(1))) match {
          case (Some(la), Some(lb)) if la == lb => ein(la) = ein.getOrElse(la, 0L) + e(2)
          case _ => ()
        }
      }
      var tot = 0.0
      sig.keys.toArray.sorted.foreach { c =>
        val s = sig(c)._1.toDouble
        tot += roundLikeSql(ein.getOrElse(c, 0L).toDouble / mD - (s / twoM) * (s / twoM), 12)
      }
      roundLikeSql(tot, 9)
    }
    var sig = sigOf(lab)
    var q = qInit0.getOrElse(qOf(sig, lab))
    val qInit = q
    for (s <- 1 to sweeps) {
      // k_vc over both orientations of the cross edges (neighbor must be labeled)
      val kvc = mutable.HashMap.empty[(Long, Long), Long]
      edges.foreach { e =>
        if (e(0) != e(1)) {
          lab.get(e(1)).foreach { c => val k = (e(0), c); kvc(k) = kvc.getOrElse(k, 0L) + e(2) }
          lab.get(e(0)).foreach { c => val k = (e(1), c); kvc(k) = kvc.getOrElse(k, 0L) + e(2) }
        }
      }
      // best strictly-positive move per node: (max ΔQ, then min target label)
      val best = mutable.LongMap.empty[(Double, Long)]
      kvc.foreach { case ((node, cand), kTo) =>
        lab.get(node).foreach { label =>
          if (cand != label && (!parityGate || label % 2 == (s % 2).toLong)) {
            val (sigA, nA) = sig(label)
            val (sigB, nB) = sig(cand)
            val kVa = kvc.getOrElse((node, label), 0L)
            val dq = roundLikeSql(
              (kTo - kVa).toDouble / mD - kv(node).toDouble * (sigB - sigA + kv(node)).toDouble / twoM2, 9)
            if (dq > 0 && !(nA == 1 && nB == 1 && cand > label)) {
              val better = best.get(node) match {
                case Some((bd, bc)) => dq > bd || (dq == bd && cand < bc)
                case None           => true
              }
              if (better) best(node) = (dq, cand)
            }
          }
        }
      }
      val prop = lab.clone()
      best.foreach { case (n, (_, c)) => prop(n) = c }
      val propSig = sigOf(prop)
      val qp = qOf(propSig, prop)
      if (qp > q) { lab = prop; sig = propSig; q = qp }
    }
    (lab.toArray.sortBy(_._1), qInit, q)
  }

  /** Build the (node, label) frame a local sweep produced, cast to the
    * dtypes the distributed path would have returned (the seed's column
    * types — schema identity is part of the oracle gate). */
  private def localLabFrame(spark: org.apache.spark.sql.SparkSession,
                            lab: Array[(Long, Long)],
                            nodeT: org.apache.spark.sql.types.DataType,
                            labelT: org.apache.spark.sql.types.DataType): DataFrame = {
    import spark.implicits._
    lab.toSeq.toDF("node", "label")
      .select(F.col("node").cast(nodeT), F.col("label").cast(labelT))
  }

  /** The shared weighted local-move core both Louvain levels (and every
    * [[louvainDeep]] level) run: `ew` is the canonical (a ≤ b) WEIGHTED
    * undirected edge set — original edges with w = 1 at level 1 (sum(w)
    * ≡ count, so the weighted algebra IS the unweighted one,
    * bit-identically), a contracted multigraph with self-loops above —
    * and `mD` stays the ORIGINAL graph's edge count at every level
    * (contraction preserves Σw). One fused per-state `sig` frame serves
    * BOTH the sweep's move scoring and the Q re-score (the round-13
    * verdict's fuse directive — previously computed twice per state);
    * `pinStatic` pins the per-level static frames (degrees, directed
    * view, seed) where they are data-sized (level 1) and skips the
    * checkpoint jobs where they are communities-sized (contracted
    * levels); proposals stay pinned at every level — the unpinned
    * variant was measured slower (cross-sweep lineage replanning).
    * `parityGate` enables the contracted-level anti-chaining filter (see
    * [[louvainLevel2]]'s scaladoc). When the level's edge multigraph
    * fits [[localSweepCap]] the sweeps run driver-local instead
    * ([[localSweeps]] — same algebra, zero exchanges); `tryLocal` lets
    * [[louvainDeep]] suppress the probe where its own local tail already
    * decided the level is big. Returns (final (node, label) frame,
    * Q(seed), Q(final)). */
  private def weightedSweeps(
      ew0: DataFrame,
      mD: Double,
      seed: DataFrame,
      sweeps: Int,
      parityGate: Boolean,
      pinStatic: Boolean,
      qInit0: Option[Double] = None,
      tryLocal: Boolean = true): (DataFrame, Double, Double) = {
    val ew = ew0 // caller-pinned (und / ce localCheckpoint) — never re-pin here
    val localResult: Option[(DataFrame, Double, Double)] =
      if (!tryLocal || localSweepCap <= 0) None
      else collectIfSmall(ew, Seq("a", "b", "w"), localSweepCap).flatMap { edgesArr =>
        val nodeT = seed.schema(seed.columns(0)).dataType
        val labelT = seed.schema(seed.columns(1)).dataType
        val seedSel = seed.select(F.col(seed.columns(0)).as("node"),
          F.col(seed.columns(1)).as("label"))
        // seed rows ≤ nodes in every caller; the 2·cap guard only trips on
        // a pathological oversized init, which falls back distributed
        collectIfSmall(seedSel, Seq("node", "label"), 2 * localSweepCap)
          // a MALFORMED seed with repeated node rows diverges between the
          // engines (the local LongMap dedupes, the distributed semi-join
          // double-counts kv/community sizes) — such inputs always take
          // the distributed path so the twin never changes a trajectory
          .filter(seedArr => seedArr.iterator.map(_(0)).toSet.size == seedArr.length)
          .map { seedArr =>
            val (labArr, qi, qf) =
              localSweeps(edgesArr, mD, seedArr, sweeps, parityGate, qInit0)
            (localLabFrame(ew.sparkSession, labArr, nodeT, labelT), qi, qf)
          }
      }
    if (localResult.isDefined) localResult.get
    else weightedSweepsDistributed(ew, mD, seed, sweeps, parityGate, pinStatic, qInit0)
  }

  /** The distributed body of [[weightedSweeps]] (unchanged algebra). */
  private def weightedSweepsDistributed(
      ew: DataFrame,
      mD: Double,
      seed: DataFrame,
      sweeps: Int,
      parityGate: Boolean,
      pinStatic: Boolean,
      qInit0: Option[Double]): (DataFrame, Double, Double) = {
    // pinStatic marks the DATA-SIZED level (level 1): static per-level
    // frames (degrees, directed view, seed) get a localCheckpoint there;
    // on contracted levels they are communities-sized and the checkpoint
    // job costs more than recomputing them from the pinned ce (measured —
    // see RUNBOOK). PROPOSALS stay pinned at EVERY level: an unpinned
    // proposal chains lineage across sweeps and the per-action replanning
    // measured SLOWER than the checkpoint round trip it saved.
    def pin(df: DataFrame): DataFrame = if (pinStatic) df.pin() else df
    // weighted degree k_C = Σ_{v∈C} k_v: self-loops twice, cross once per end
    val dg = ew.select(F.col("a").as("node"),
        F.when(F.col("a") === F.col("b"), F.col("w") * 2).otherwise(F.col("w")).as("wd"))
      .unionAll(ew.filter(F.col("a") =!= F.col("b"))
        .select(F.col("b").as("node"), F.col("w").as("wd")))
      .groupBy("node").agg(F.sum("wd").as("kv"))
    val dgP = pin(dg)
    val cross = ew.filter(F.col("a") =!= F.col("b"))
    val sym = cross.select(F.col("a").as("src"), F.col("b").as("dst"), F.col("w"))
      .unionAll(cross.select(F.col("b").as("src"), F.col("a").as("dst"), F.col("w")))
      .repartition(shuffleWidth(ew), F.col("dst")) // every sweep's neighbor-label join keys on dst
    val symP = pin(sym)
    // per-state community degree sums + sizes — ONE frame for both the
    // sweep's candidate scoring and the Q re-score
    def sigOf(lab: DataFrame): DataFrame =
      lab.join(dgP, "node")
        .groupBy("label").agg(F.sum("kv").as("sig"), F.count(F.lit(1)).as("nc"))
        .cache()
    // Q of a partition from its fused sig frame: e_in(label) = Σ w over
    // edges with both ends in the label (self-loops qualify). 12-snapped
    // per-community terms, 9-snapped total — rounding INSIDE the frame
    // (F.round = the Catalyst Round the oracle's round() is calibrated
    // against), never driver-side BigDecimal.
    def qFromSig(sig: DataFrame, lab: DataFrame): Double = {
      val ein = ew
        .join(lab.select(F.col("node").as("a"), F.col("label").as("la")), "a")
        .join(lab.select(F.col("node").as("b"), F.col("label").as("lb")), "b")
        .filter(F.col("la") === F.col("lb"))
        .groupBy(F.col("la").as("label")).agg(F.sum("w").as("e_in"))
      val row = sig.join(ein, Seq("label"), "left")
        .select(F.round(
          F.coalesce(F.col("e_in"), F.lit(0L)).cast("double") / F.lit(mD)
            - (F.col("sig").cast("double") / F.lit(2 * mD))
            * (F.col("sig").cast("double") / F.lit(2 * mD)), 12).as("t"))
        .agg(F.round(F.sum("t"), 9)).collect()(0)
      if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    }
    var lab = pin(seed
      .select(F.col(seed.columns(0)).as("node"), F.col(seed.columns(1)).as("label"))
      .join(dgP.select("node"), Seq("node"), "left_semi")) // partition over graph nodes only
    var sig = sigOf(lab)
    // a contracted level's identity-seed Q EQUALS the previous level's
    // final Q operand-for-operand (sig_C = k_C, e_in(C) = selfloop(C)) —
    // callers pass it in and skip one full Q-score round trip
    var q = qInit0.getOrElse(qFromSig(sig, lab))
    val qInit = q
    for (s <- 1 to sweeps) {
      // k_vc: weight from each node into each neighboring community —
      // ONE combinable |E|-row aggregate per sweep, the sweep's only
      // data-sized exchange
      val kvc = symP.join(lab.select(F.col("node").as("dst"), F.col("label").as("cand")), "dst")
        .groupBy(F.col("src").as("node"), F.col("cand"))
        .agg(F.sum("w").as("k_to"))
      val kva = kvc.join(lab, Seq("node")).filter(F.col("cand") === F.col("label"))
        .select(F.col("node"), F.col("k_to").as("k_va"))
      val base = lab.join(dgP, "node")
        .join(sig.select(F.col("label"), F.col("sig").as("sig_a"), F.col("nc").as("n_a")), "label")
        .join(kva, Seq("node"), "left")
        .select(F.col("node"), F.col("label"), F.col("kv"), F.col("sig_a"), F.col("n_a"),
          F.coalesce(F.col("k_va"), F.lit(0L)).as("k_va"))
      val cand0 = kvc.join(base, "node").filter(F.col("cand") =!= F.col("label"))
        .join(sig.select(F.col("label").as("cand"), F.col("sig").as("sig_b"), F.col("nc").as("n_b")), "cand")
        .withColumn("dq", F.round(
          (F.col("k_to") - F.col("k_va")).cast("double") / F.lit(mD)
            - F.col("kv").cast("double")
            * (F.col("sig_b") - F.col("sig_a") + F.col("kv")).cast("double")
            / F.lit(2 * mD * mD), 9))
        // swap guard: a singleton may only move INTO another singleton's
        // community when the target label is smaller (Lu, Halappanavar &
        // Kalyanaraman, ParCo 2015, deterministic variant)
        .filter(F.col("dq") > 0 &&
          !(F.col("n_a") === 1 && F.col("n_b") === 1 && F.col("cand") > F.col("label")))
      // the PARITY GATE (contracted levels only): in sweep s only nodes
      // whose current label has parity s % 2 may move — breaks the
      // synchronous down-label chains dense contracted graphs produce
      // (see louvainLevel2's scaladoc)
      val cand = if (parityGate)
        cand0.filter(F.col("label") % 2 === F.lit((s % 2).toLong)) else cand0
      val best = cand.groupBy("node")
        // lexicographic struct-min = (max ΔQ, then min target label):
        // the labelPropagation tie-break, no per-node sort window
        .agg(F.min(F.struct((-F.col("dq")).as("nd"), F.col("cand").as("c"))).as("mv"))
        .select(F.col("node"), F.col("mv.c").as("new_label"))
      val prop0 = lab.join(best, Seq("node"), "left")
        .select(F.col("node"), F.coalesce(F.col("new_label"), F.col("label")).as("label"))
      // always pinned: scored by Q AND possibly next sweep's base — the
      // unpinned and cache() variants both measured SLOWER (cross-sweep
      // lineage replanning / recompute outweigh the checkpoint job)
      val prop = prop0.pin()
      val propSig = sigOf(prop)
      val qp = qFromSig(propSig, prop)
      if (qp > q) { lab = prop; sig = propSig; q = qp }
    }
    (lab, qInit, q)
  }

  /** Phase-2 contraction: community endpoints of every weighted edge,
    * canonical (least, greatest) orientation, weights summed — a = b
    * rows are the self-loops (intra-community weight). Level 1 → 2 runs
    * it with w = 1 (count); deeper levels contract the already-weighted
    * multigraph. ONE grouped aggregate over the level's edge set. */
  private def contract(ew: DataFrame, lab: DataFrame): DataFrame =
    ew
      .join(lab.select(F.col("node").as("a"), F.col("label").as("la")), "a")
      .join(lab.select(F.col("node").as("b"), F.col("label").as("lb")), "b")
      .select(F.least(F.col("la"), F.col("lb")).as("a"),
        F.greatest(F.col("la"), F.col("lb")).as("b"), F.col("w"))
      .groupBy("a", "b").agg(F.sum("w").as("w"))

  /** Identity seed over a contracted graph: each supernode its own
    * community. */
  private def identitySeed(ew: DataFrame): DataFrame =
    ew.select(F.col("a").as("node"))
      .unionAll(ew.select(F.col("b").as("node")))
      .distinct()
      .select(F.col("node"), F.col("node").as("label"))

  /** Two-level Louvain (Blondel, Guillaume, Lambiotte & Lefebvre, "Fast
    * unfolding of communities in large networks", J. Stat. Mech. 2008
    * §2, phase 2): run [[louvainRefine]]'s local-move phase, CONTRACT the
    * refined partition to a supernode multigraph — community → node,
    * inter-community edge counts → weights, intra-community edge counts →
    * self-loops (ONE grouped aggregate over |E|) — re-run the local-move
    * sweep WEIGHTED on the coarsened graph, and map labels back. This is
    * where modularity actually climbs on real graphs: level 1 stops at
    * the resolution floor of single-node moves; moving whole communities
    * is exactly what the contraction buys (a supernode move is a
    * community merge).
    *
    * The weighted ΔQ is the same algebra as level 1 — a supernode's
    * self-loop cancels out of ΔQ (it leaves community A and enters B with
    * the node), so
    *
    *   ΔQ(C: A→B) = (w_CB − w_CA)/m − k_C·(Σ_B − Σ_A + k_C)/(2m²),
    *
    * with w_C· sums of contracted edge weights (excluding C's self-loop)
    * and k_C the weighted degree counting the self-loop twice, so that
    * k_C = Σ_{v∈C} k_v and m is unchanged — exact integers all, making
    * every candidate score the same fixed-shape IEEE expression as level
    * 1, replayable by an unrolled SQL mirror. Q(identity partition of the
    * contracted graph) = Q(level-1 partition of the original graph)
    * OPERAND-FOR-OPERAND (sig_C = k_C, e_in(C) = selfloop(C)), so the
    * level-2 climb continues from exactly the level-1 score, and the
    * accept-iff-strictly-better sweep guard makes Q(l2) ≥ Q(l1) a
    * structural guarantee. Synchronous-move determinism (swap guard,
    * (max ΔQ, min label) argmax, 9/12-snap discipline) carries over
    * verbatim. The PARITY GATE on contracted sweeps: supernodes are few
    * and densely adjacent, so the synchronous all-move proposal chains
    * (every node shifts one step down-label in the same sweep) and the
    * chained proposal can score BELOW the start — accept-iff-better then
    * rejects every sweep and level 2 stalls exactly where it should
    * climb (the ring-of-cliques spec pins this). Alternating label
    * parity per sweep breaks chains deterministically (the coloring idea
    * of Lu, Halappanavar & Kalyanaraman, ParCo 2015, reduced to a
    * 2-coloring of labels): neighbors with opposite-parity labels can
    * never both move in one sweep. A pure filter — scale-free,
    * oracle-able, and the swap guard still covers same-parity singleton
    * pairs.
    *
    * At 100 TB scale the contracted graph is orders of magnitude smaller
    * than the input (|communities| ≤ |V|, usually ≪), so level 2's
    * per-sweep exchanges are tiny; the only |E|-sized work is the one
    * contraction aggregate.
    *
    * `sweeps1` = level-1 local-move sweeps (0 pins the init partition —
    * the under-merge harness used by the spec); `sweeps2` = sweeps on the
    * contracted graph. Output: (node_id, label, q_init, q_final) with
    * q_init = Q(level-1 partition) and q_final = Q after level 2 —
    * labels are level-1 community ids re-labeled by level 2's merge. */
  def louvainLevel2(edges: DataFrame, init: DataFrame,
                    sweeps1: Int = 2, sweeps2: Int = 2): DataFrame = {
    val und = undirect(edges).pin() // feeds m, level 1, AND the contraction
    val m = und.count() // unchanged by contraction: Σw + Σselfloops = |E|
    require(m > 0, "louvainLevel2 needs at least one edge")
    val ew1 = und.select(F.col("a"), F.col("b"), F.lit(1L).as("w"))
    val (lab1, _, q1) = weightedSweeps(ew1, m.toDouble, init, sweeps1,
      parityGate = false, pinStatic = true) // returned lab is core-pinned
    val ce = contract(ew1, lab1).pin() // feeds every level-2 sweep
    val (lab2, qInit, q) = weightedSweeps(ce, m.toDouble, identitySeed(ce), sweeps2,
      parityGate = true, pinStatic = false, qInit0 = Some(q1))
    // map back: node → level-1 community → level-2 label
    lab1.join(lab2.select(F.col("node").as("__c"), F.col("label").as("l2")),
        F.col("label") === F.col("__c"))
      .select(F.col("node").as("node_id"), F.col("l2").as("label"),
        (F.round(F.lit(qInit), 6) + F.lit(0.0)).as("q_init"),
        (F.round(F.lit(q), 6) + F.lit(0.0)).as("q_final"))
  }

  /** Driver-local remainder of the [[louvainDeep]] recursion over a
    * collected edge multigraph: per level — identity-seeded
    * [[localSweeps]] (parity-gated, continuing from the previous level's
    * Q), accept iff strictly better, then the SAME contraction
    * (community endpoints canonicalized (least, greatest), weights
    * summed) and dense relabel (ascending-id rank, 1-based) the
    * distributed loop runs; all contraction/relabel arithmetic is
    * integer-exact, so the only float ops remain localSweeps' pinned
    * expressions. Returns (composed input-supernode-id → final-label
    * map, final Q, final level count). */
  private def localDeepTail(
      edges0: Array[Array[Long]],
      mD: Double,
      q0: Double,
      levels0: Int,
      sweepsL: Int,
      maxLevels: Int): (Array[(Long, Long)], Double, Int) = {
    import scala.collection.mutable
    var edges = edges0
    var q = q0
    var levels = levels0
    var improved = true
    def nodesOf(es: Array[Array[Long]]): Array[Long] = {
      val s = mutable.LongMap.empty[Unit]
      es.foreach { e => s(e(0)) = (); s(e(1)) = () }
      s.keys.toArray
    }
    // composed map: input supernode id -> current-level id (identity start)
    val comp = mutable.LongMap.empty[Long]
    nodesOf(edges0).foreach(n => comp(n) = n)
    while (improved && levels < maxLevels) {
      val seed = nodesOf(edges).map(n => Array(n, n))
      val (labArr, _, qf) =
        localSweeps(edges, mD, seed, sweepsL, parityGate = true, qInit0 = Some(q))
      if (qf > q) {
        q = qf
        levels += 1
        val labMap = mutable.LongMap.empty[Long]
        labArr.foreach { case (n, l) => labMap(n) = l }
        // contract: (least, greatest) community endpoints, weights summed
        val ce = mutable.HashMap.empty[(Long, Long), Long]
        edges.foreach { e =>
          val la = labMap(e(0)); val lb = labMap(e(1))
          val k = (math.min(la, lb), math.max(la, lb))
          ce(k) = ce.getOrElse(k, 0L) + e(2)
        }
        // dense relabel: row_number over ascending old id, 1-based
        val olds = {
          val s = mutable.LongMap.empty[Unit]
          ce.keys.foreach { k => s(k._1) = (); s(k._2) = () }
          s.keys.toArray.sorted
        }
        val nid = mutable.LongMap.empty[Long]
        olds.zipWithIndex.foreach { case (o, i) => nid(o) = i + 1L }
        edges = ce.toArray.map { case ((a, b), w) =>
          val na = nid(a); val nb = nid(b)
          Array(math.min(na, nb), math.max(na, nb), w)
        }
        comp.keys.toArray.foreach(k => comp(k) = nid(labMap(comp(k))))
      } else improved = false
    }
    (comp.toArray.sortBy(_._1), q, levels)
  }

  /** MULTI-LEVEL Louvain to the modularity FIXPOINT (the full Blondel
    * 2008 recursion): contract-and-sweep repeatedly — each accepted
    * level re-runs [[weightedSweeps]] on an ever-smaller contracted
    * multigraph — until a level fails to strictly improve Q (or
    * `maxLevels` caps a pathological cascade). Levels ≥ 3 are the same
    * weighted sweep [[louvainLevel2]] runs, on the recursively
    * contracted graph, so Q(l∞) ≥ Q(l2) ≥ Q(l1) is structural: every
    * level starts from the identity partition of its contraction (whose
    * Q EQUALS the previous level's final Q operand-for-operand) and only
    * strictly-improving levels are kept.
    *
    * Scale shape: the |E|-sized work is level 1 plus ONE contraction
    * aggregate; every deeper level operates on the contracted graph,
    * which shrinks at least geometrically on real graphs (each accepted
    * level merges ≥ 2 communities) — the classic Louvain depth is
    * O(log |V|) with a tiny constant.
    *
    * Output: (node_id, label, q_init, q_final, n_levels) — q_init =
    * Q(level-1 partition), q_final = Q at the fixpoint, n_levels the
    * number of PARTITION levels kept (1 = level 1 alone, 2 = the
    * louvainLevel2 answer, 3+ = genuinely deeper merges). */
  def louvainDeep(edges: DataFrame, init: DataFrame,
                  sweeps1: Int = 2, sweepsL: Int = 2,
                  maxLevels: Int = 8): DataFrame = {
    val und = undirect(edges).pin()
    val m = und.count()
    require(m > 0, "louvainDeep needs at least one edge")
    val mD = m.toDouble
    val ew1 = und.select(F.col("a"), F.col("b"), F.lit(1L).as("w"))
    val (lab1, _, q1) = weightedSweeps(ew1, mD, init, sweeps1,
      parityGate = false, pinStatic = true) // returned lab is core-pinned
    // Contract AND dense-relabel: supernode ids become row_number over
    // the community labels (deterministic, engine-replayable). Without
    // the relabel, community labels can share parity (e.g. min-node ids
    // of equal-size cliques are spaced evenly), the parity gate then
    // admits EVERY supernode in one sweep and the synchronous down-label
    // chain re-appears — the ring-of-36 fixture stalls at level 2. Dense
    // ids alternate parity by construction, so the gate bisects every
    // level the way it was designed to.
    // Re-root a tiny already-checkpointed frame as a FRESH LogicalRDD:
    // localCheckpoint keeps the producing plan's size ESTIMATE, and
    // Catalyst's join-stats visitor MULTIPLIES child estimates — so a
    // level's checkpoint inherits the product over the previous level's
    // leaves, and across recursion levels the BigInt estimate compounds
    // DOUBLE-EXPONENTIALLY (measured: level-4 sweeps at ~120 s with
    // ~all wall inside BigInteger.multiply under
    // SizeInBytesOnlyStatsPlanVisitor — on a 3-edge graph). Rebuilding
    // from the checkpointed RDD resets the leaf estimate; the data and
    // every downstream result are unchanged.
    def reRoot(df: DataFrame): DataFrame =
      df.sparkSession.createDataFrame(df.rdd, df.schema)
    def contractDense(ewIn: DataFrame, lab: DataFrame): (DataFrame, DataFrame) = {
      val ce0 = contract(ewIn, lab)
      val dense = reRoot(ce0.select(F.col("a").as("old"))
        .unionAll(ce0.select(F.col("b").as("old")))
        .distinct()
        .withColumn("nid", F.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("old")).cast("long"))
        .pin()) // tiny: one row per community
      val ce = reRoot(ce0
        .join(dense.select(F.col("old").as("a"), F.col("nid").as("na")), "a")
        .join(dense.select(F.col("old").as("b"), F.col("nid").as("nb")), "b")
        .select(F.least(F.col("na"), F.col("nb")).as("a"),
          F.greatest(F.col("na"), F.col("nb")).as("b"), F.col("w"))
        .pin())
      (ce, dense)
    }
    var mapping = lab1 // node → current level's community id
    var (ew, d0) = contractDense(ew1, mapping)
    mapping = reRoot(mapping
      .join(d0.select(F.col("old").as("label"), F.col("nid")), "label")
      .select(F.col("node"), F.col("nid").as("label"))
      .pin())
    var q = q1
    var levels = 1
    var improved = true
    while (improved && levels < maxLevels) {
      // LOCAL TAIL (r17 optimization): contracted levels shrink at least
      // geometrically, so from the first level that provably fits the
      // cap, ALL remaining sweeps + contractions + dense relabels run
      // driver-local (same algebra — localSweeps plus integer-only
      // contraction/relabel), and the per-level |V|-row mapping joins
      // collapse into ONE broadcast join of the composed tiny map. At
      // bench scale this is the difference between 292 and ~20 shuffle
      // stages; at 100 TB the data-sized levels still run distributed
      // and only the tail changes engine.
      val localEdges =
        if (localSweepCap > 0) collectIfSmall(ew, Seq("a", "b", "w"), localSweepCap)
        else None
      localEdges match {
        case Some(edges0) =>
          val (comp, qf, lv) = localDeepTail(edges0, mD, q, levels, sweepsL, maxLevels)
          if (lv > levels) {
            val sess = ew.sparkSession
            import sess.implicits._
            val compDf = comp.toSeq.toDF("__old", "__new")
            mapping = mapping
              .join(F.broadcast(compDf), F.col("label") === F.col("__old"))
              .select(F.col("node"), F.col("__new").as("label"))
            q = qf
            levels = lv
          }
          improved = false // the tail consumed the recursion
        case None =>
          val (labL, _, qf) = weightedSweeps(ew, mD, identitySeed(ew), sweepsL,
            parityGate = true, pinStatic = false, qInit0 = Some(q), tryLocal = false)
          if (qf > q) {
            q = qf
            levels += 1
            val (ew2, dense) = contractDense(ew, labL)
            mapping = reRoot(mapping
              .join(labL.select(F.col("node").as("__c"), F.col("label").as("__l")),
                F.col("label") === F.col("__c"))
              .join(dense.select(F.col("old").as("__l2"), F.col("nid")),
                F.col("__l") === F.col("__l2"))
              .select(F.col("node"), F.col("nid").as("label"))
              .pin()) // feeds the next composition AND the output
            ew = ew2
          } else improved = false
      }
    }
    mapping.select(F.col("node").as("node_id"), F.col("label"),
      (F.round(F.lit(q1), 6) + F.lit(0.0)).as("q_init"),
      (F.round(F.lit(q), 6) + F.lit(0.0)).as("q_final"),
      F.lit(levels).cast("int").as("n_levels"))
  }

  /** The k-CORE — the maximal subgraph in which every node keeps degree
    * ≥ k — by iterative peeling (Seidman, "Network structure and minimum
    * degree", Social Networks 1983): drop all nodes of degree < k,
    * recompute degrees (peeling lowers neighbors' degrees — the cascade),
    * repeat to the fixpoint. The dense-interaction-core question: which
    * entities stay engaged after the long tail and everything only the
    * long tail supported is removed.
    *
    * Each round is one combinable degree count plus two semi-joins on the
    * (pinned, shrinking) edge set; the edge count per round is the
    * fixpoint detector — a 1-row driver scalar, the pageRank-n pattern.
    * The fixpoint is unique (the k-core is well-defined), so a mirror
    * that unrolls AT LEAST as many peels reproduces it exactly —
    * `maxRounds` only guards pathological cascades (a chain peels one
    * node per round; real graphs settle in a handful), and hitting it
    * THROWS rather than returning a silently-wrong partial peel (nodes
    * under k would otherwise survive, violating the contract below).
    *
    * Output: (node_id, core_degree) over the k-core, core_degree its
    * within-core degree (≥ k by definition). Empty when no k-core
    * exists. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, "k must be positive")
    var und = undirect(edges).pin()
    var m = und.count()
    var rounds = 0
    var changed = m > 0
    while (changed && rounds < maxRounds) {
      // SHUFFLE_HASH on the |V|-row keep side: the default SMJ sorted the
      // |E|-row frame twice per peel round (guide §3.1); a semi-join's
      // output is strategy-independent
      val keep = degrees(und).filter(F.col("d") >= k).select("node").hint("shuffle_hash")
      val pruned = und
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .pin() // next round's base AND this round's count
      val m2 = pruned.count()
      changed = m2 != m
      m = m2
      und = pruned
      rounds += 1
    }
    require(!changed, s"k-core peel did not reach its fixpoint within $maxRounds rounds")
    degrees(und).select(F.col("node").as("node_id"), F.col("d").as("core_degree"))
  }

  /** Degree assortativity — the Pearson correlation of endpoint degrees
    * over the directed-edge-list expansion of the undirected graph (each
    * edge counted in both orientations, the standard formulation): r > 0
    * means hubs attach to hubs (social/citation shape), r < 0 means hubs
    * attach to leaves (star/infrastructure shape). One degree count, one
    * |E|-row double join onto the degree frame, then ONE combinable
    * six-sum aggregate; all six sums are exact BIGINTs (order-independent
    * — the cross-engine determinism anchor; degrees ≫ 10⁶ on ≫ 10⁹ edges
    * would need a decimal widening), and the correlation is fixed-shape
    * IEEE algebra over them. A degree-regular graph has zero variance —
    * assortativity is NULL there, not a divide blowup. Output: one row
    * (m_edges, assortativity round 6). */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = undirect(edges).pin() // feeds sym AND degrees
    val deg = degrees(und)
    val sym = und.select(F.col("a").as("s"), F.col("b").as("t"))
      .unionAll(und.select(F.col("b").as("s"), F.col("a").as("t")))
    val j = sym
      .join(deg.select(F.col("node").as("s"), F.col("d").as("da")), "s")
      .join(deg.select(F.col("node").as("t"), F.col("d").as("db")), "t")
    val a = j.agg(
      F.count(F.lit(1)).as("m"),
      F.sum(F.col("da")).as("sx"), F.sum(F.col("db")).as("sy"),
      F.sum(F.col("da") * F.col("db")).as("sxy"),
      F.sum(F.col("da") * F.col("da")).as("sxx"),
      F.sum(F.col("db") * F.col("db")).as("syy"))
    a.select(F.col("m").as("m_edges"),
      Pearson.fromSums(F.col("m")).as("assortativity"))
  }
}
