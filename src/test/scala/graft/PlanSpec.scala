package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the scale properties we rely on must be visible
  * in the executed plan, not assumed — predicate pushdown to the parquet
  * scan, column pruning, broadcast joins for small dimensions, and
  * TakeOrderedAndProject for sort+limit shapes (SURVEY §4). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  it("q_events_page pushes the event_type filter into the parquet scan (R23/S2 analog)") {
    val p = plan("q_events_page")
    p should include("PushedFilters")
    p should include("IsNotNull(event_type)")
    p should include("EqualTo(event_type,click)")
  }

  it("q1 prunes the lineitem scan to the referenced columns only") {
    val p = plan("q1_pricing_summary")
    p should include("ReadSchema")
    p should not include "l_partkey" // unused column must not be read
    p should include("l_returnflag")
    // shipdate predicate reaches the scan for row-group skipping
    p should include("LessThanOrEqual(l_shipdate")
  }

  it("q5 broadcasts the small dimension side (region x nation, supplier)") {
    val p = plan("q5_local_supplier")
    p should include("BroadcastHashJoin")
  }

  it("unshipped compiles to TakeOrderedAndProject — no full sort (R15)") {
    val p = plan("q_unshipped_cursor")
    p should include("TakeOrderedAndProject")
    // the 1-row cursor is broadcast, not shuffled (R8 scalar-subquery analog)
    p should include("BroadcastNestedLoopJoin")
  }

  it("q_topk_customers compiles to TakeOrderedAndProject (sort+limit -> top-K)") {
    plan("q_topk_customers") should include("TakeOrderedAndProject")
  }

  it("q_ingest_seq avoids a global single-partition window") {
    val p = plan("q_ingest_seq")
    // range partitioner + per-partition window, not Window over one partition
    p should include("rangepartitioning")
    p should include("__pid")
  }

  it("q_pack_sequences avoids a global single-partition window (two-phase prefix sums)") {
    val p = plan("q_pack_sequences")
    // range partitioner + per-partition running sum + broadcast offsets,
    // not `sum() OVER (ORDER BY id)` over one partition
    p should include("rangepartitioning")
    p should include("__pid")
    // the corpus-wide running token sum must be a PARTITIONED window;
    // the only partition-less window allowed is the per-partition-offsets
    // frame (one row per partition, sums __tot)
    val tokenWindows = p.split("\n").filter(l =>
      l.contains("Window [sum(n_tokens"))
    tokenWindows should not be empty
    tokenWindows.foreach(_ should include("windowspecdefinition(__pid"))
  }

  it("q_budget_select runs its corpus-wide running sum as a partitioned window (two-phase prefix)") {
    val p = plan("q_budget_select")
    p should include("rangepartitioning")
    p should include("__pid")
    // same contract as q_pack_sequences: the only partition-less window
    // is the per-partition-offsets frame (≤ shuffle-partitions rows)
    val tokenWindows = p.split("\n").filter(l => l.contains("Window [sum(n_tokens"))
    tokenWindows should not be empty
    tokenWindows.foreach(_ should include("windowspecdefinition(__pid"))
  }

  it("q_ann_lsh dedups candidates as bare ids — vectors never ride the distinct shuffle") {
    val p = plan("q_ann_lsh")
    // the pair-dedup aggregate must key on (qid, cid) only; the 64-float
    // vectors are re-attached after, so the widest shuffle moves ~16 B/row
    val dedupAggs = p.split("\n").filter(l =>
      l.contains("HashAggregate(keys=[qid") && l.contains("cid"))
    dedupAggs should not be empty
    dedupAggs.foreach { l =>
      l should not include "qv"
      l should not include "cv"
    }
  }

  it("q_ivf_pq forces no corpus-scaling broadcast: cell/qid/cid-partitioned joins only") {
    // With size-based broadcasting disabled, any BroadcastExchange left in
    // the plan can only come from an explicit broadcast() hint — i.e. a
    // build side we FORCED regardless of corpus size. The IVF+PQ plan must
    // have none: codes join on cell, ADC tables on qid, rerank vectors on
    // cid, all shuffle-partitioned. (At runtime AQE may still elect a
    // broadcast from actual observed sizes — adaptive, scale-safe.)
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAdaptive = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_ivf_pq")
      p should not include "BroadcastExchange"
      p should not include "BroadcastHashJoin"
      p should not include "CartesianProduct"
      // the three shuffle keys of the scale-safe physics are all present
      p should include("hashpartitioning(cell")
      p should include("hashpartitioning(qid")
      p should include("hashpartitioning(cid")
      // the shortlist stage is the map-side-combined bounded-heap collect,
      // NOT a window: a partial aggregate bounds what each partition sends
      // to the qid exchange at k rows per query, where windowspecdefinition
      // would shuffle and sort every ADC candidate row
      p should include("partial_collect_top_k")
      p should not include "windowspecdefinition"
      // the m·kC-double ADC table must be computed AFTER the cell shuffle
      // (probe rows carry only the dim-float query vector through it):
      // no ShuffleExchange anywhere in the plan may output __adc
      val df = SparkEntry.queries("q_ivf_pq")(spark, dir)
      val tree = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val exchanges = tree.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      exchanges should not be empty
      exchanges.foreach(e => e.output.map(_.name) should not contain "__adc")
      // ... and the probe-side cell exchange is the one carrying qv
      exchanges.map(_.output.map(_.name)).count(_.contains("qv")) should be >= 1
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      savedAdaptive match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None    => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  it("semi/anti joins stay joins (no subquery materialization)") {
    plan("q_semi_join") should include("LeftSemi")
    plan("q_anti_join") should include("LeftAnti")
  }

  it("whole-stage codegen covers the dedup hash pipeline (no UDF breaks)") {
    val df: DataFrame = SparkEntry.queries("q_dedup_exact_docs")(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    p should include("*(") // WholeStageCodegen stage markers
    p should not include "BatchEvalPython"
    p should not include "SerializeFromObject" // no object-mode breaks in the hot path
  }

  it("ANN serve join reads the cell-bucketed codes table with NO index-side exchange") {
    import graft.operators.AnnIndexStore
    val store = new AnnIndexStore(
      spark, java.nio.file.Files.createTempDirectory("plan_ann_idx_").toString)
    store.build(spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", nCentroids = 4, m = 8, kCodes = 8)
    val df = store.search(spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", nprobe = 2, shortlist = 8, k = 3)
    // inspect the STATIC plan (before AQE materializes stages into opaque
    // leaves) — the invariant is about what the planner emits
    val tree = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // inside the serve join the codes scan reports the bucket hash
    // partitioning on cell — the physical layout IS the join key's
    // distribution (R22: layout follows the predicates), so
    // EnsureRequirements has nothing to add on the index side. (A
    // standalone `store.codes` scan deliberately drops the bucket split —
    // DisableUnnecessaryBucketedScan — so the property is asserted where
    // it matters, in the join plan.)
    val codeScans = tree.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.output.map(_.name).contains("pq_code") => s.outputPartitioning
    }
    codeScans should not be empty
    codeScans.head match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.numPartitions shouldBe AnnIndexStore.CodesBuckets
        h.expressions.map(_.toString).exists(_.contains("cell")) shouldBe true
      case other => fail(s"codes scan is not bucket-partitioned: $other")
    }
    val exchanges = tree.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges should not be empty
    // the index side never crosses an exchange: codes rows flow scan→join
    // (pq_code appears in no exchange output), and the wide per-probe ADC
    // table stays post-exchange as in the inline path
    exchanges.foreach(e => e.output.map(_.name) should not contain "pq_code")
    exchanges.foreach(e => e.output.map(_.name) should not contain "__adc")
  }

  it("q_binary_topk broadcasts ONLY the query side; the Hamming top-k is map-side combinable") {
    val p = plan("q_binary_topk")
    // bounded-heap collect_top_k -> partial ObjectHashAggregate before the
    // qid exchange (the shortlist scales with k, not candidates)
    p should include("ObjectHashAggregate")
    // at most one broadcast: the <=10 query rows; the corpus side must
    // stay partitioned (an O(N) corpus broadcast OOMs at scale) — an
    // upper bound so a planner that drops the exchange doesn't fail
    p.split("\n").count(_.contains("BroadcastExchange")) should be <= 1
    p should not include "CartesianProduct"
  }

  it("q_bloom_join probes the bloom directly on the fact scan — before any exchange") {
    val lines = plan("q_bloom_join").split("\n")
    val fi = lines.indexWhere(_.contains("might_contain"))
    fi should be >= 0
    // the filter's subtree (next lines, deeper) must reach the parquet
    // scan without crossing an Exchange: the semi-join reduction happens
    // pre-shuffle or it saves nothing
    val below = lines.drop(fi + 1).take(4)
    below.exists(_.contains("Scan parquet")) shouldBe true
    below.takeWhile(!_.contains("Scan parquet")).exists(_.contains("Exchange")) shouldBe false
  }

  it("q_zorder is one bounds-broadcast over a map-only projection — no shuffle of the data") {
    val p = plan("q_zorder")
    // the events data itself never crosses a shuffle: the only exchanges
    // belong to the 1-row bounds aggregate and its broadcast
    p.split("\n").count(_.contains("Exchange hashpartitioning")) shouldBe 0
    p should include("BroadcastNestedLoopJoin") // 1-row bounds crossJoin
  }

  it("q_jaccard_join candidates cross the shuffle as id pairs only — token arrays re-attach after") {
    val p = plan("q_jaccard_join")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the candidate-dedup aggregate groups bare (id_a, id_b) — a token
    // array in its grouping key would mean arrays rode the distinct
    val dedupAggs = p.split("\n").filter(l =>
      l.contains("HashAggregate") && l.contains("id_a") && l.contains("id_b"))
    dedupAggs should not be empty
    dedupAggs.foreach(l => l should not include "t_a")
  }

  it("q_group_topk runs as a bounded-heap aggregate — no window, partial before the shuffle") {
    val p = plan("q_group_topk")
    p should not include "Window"
    p should include("collect_top_k")
    // partial aggregation (the <= k rows per partition pre-shuffle claim)
    p.split("\n").count(l => l.contains("collect_top_k")) should be >= 2
  }

  it("q_interval_join runs as a bucketized equi-join — the keyless inequality join must NOT nested-loop") {
    val p = plan("q_interval_join")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  it("q_interval_overlap runs as a bucketized equi-join — two inequality sides, still no nested loop") {
    val p = plan("q_interval_overlap")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  it("q_rrf_fusion cuts both legs with TakeOrderedAndProject — rank windows cover a literal k, not the corpus") {
    val p = plan("q_rrf_fusion")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
  }

  it("q21 lowers EXISTS/NOT-EXISTS to semi/anti joins — no nested-loop anywhere") {
    val p = plan("q21_suppliers_waiting")
    p should include("LeftSemi")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  it("q8 broadcasts every dimension side of the 7-table join") {
    val p = plan("q8_market_share")
    p should include("BroadcastHashJoin")
    // the two fact inputs (lineitem, orders) must not be broadcast
    p.split("\n").filter(_.contains("BroadcastExchange")).foreach { l =>
      l should not include "l_extendedprice"
      l should not include "o_totalprice"
    }
  }

  it("q19's disjunctive predicate still prunes the part join to a broadcast") {
    val p = plan("q19_discounted_revenue")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  it("q_heavy_hitters combines map-side — partial sketch aggregation before the shuffle") {
    val p = plan("q_heavy_hitters")
    // typed Aggregator lowers to ObjectHashAggregate with a partial pass:
    // each partition ships one <= k-counter summary, never its rows
    p should include("ObjectHashAggregate")
    p.split("\n").count(_.contains("ObjectHashAggregate")) should be >= 2
    p should not include "Window"
  }

  it("q_novelty stays on the shingle hash key — no cartesian anywhere") {
    val p = plan("q_novelty")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  it("crossmodal edges are CONTRACTED stars + print pairs — no clique-squared member expansion") {
    import graft.operators.{Dedup, Multimodal}
    // rebuild the exact edge frames q_crossmodal_dedup feeds to CC
    val docs = SparkEntry.t(spark, dir, "documents")
    val edges = Dedup.hammingEdges64(
        Dedup.simhash64(docs, "doc_id", "text"), "doc", "sh_lo", "sh_hi")
      .union(Dedup.hammingEdges64(
        Multimodal.dHash(Multimodal.pngPayloads(docs, "doc_id")),
        "media_id", "dh_lo", "dh_hi"))
    val p = edges.queryExecution.executedPlan.toString
    // per modality, exactly TWO joins: the membership join on the print
    // words (sh_lo, sh_hi) and the banding join on (bi, bval). The
    // clique-squared shape (hammingPairs64's member-by-member expansion)
    // would add a mem-x-mem self-join plus two expansion joins per
    // modality — join count is the structural tell.
    val joins = p.split("\n").count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    withClue(s"edge plan grew extra joins (member expansion?):\n$p\n") {
      joins should be <= 4
    }
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // both structural stages are present: membership join keyed on the
    // print words, banding join keyed on the band value
    p should include("sh_lo")
    p should include("bval")
  }

  it("winnow pair join reads df-CAPPED postings: the cap filter sits upstream of the self-join") {
    import graft.operators.TextAnalysis
    val docs = SparkEntry.t(spark, dir, "documents")
    // the pre-checkpoint posting frame the self-join consumes: the
    // boilerplate cap (df <= greatest(2, ceil(frac*N))) must filter the
    // exploded hashes BEFORE any pairing
    val postings = TextAnalysis.winnowPostings(docs, "doc_id", "text", maxDfFrac = 0.05)
    val pp = postings.queryExecution.executedPlan.toString
    pp should include("greatest(2,")
    pp should include("CEIL")
    // the final pair query: self-join strictly on the hash key over the
    // checkpointed (already-capped) postings — no cartesian, no re-derive
    val p = plan("q_winnow_pairs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("Scan ExistingRDD") // the capped checkpoint is the join input
  }

  it("q_jaro_winkler: native expression inside the loop, top-20 as TakeOrderedAndProject") {
    val p = plan("q_jaro_winkler")
    p should include("jaro_winkler") // the codegen'd expression, not a UDF
    p should include("TakeOrderedAndProject") // orderBy+limit never global-sorts
    p should not include "CartesianProduct"
  }

  it("q_theta_overlap: the only full scans are map-side-combinable sketch aggregates") {
    // the pair algebra runs over an eager checkpoint of the aggregate, so
    // audit the sketch-building frame itself (the winnowPostings pattern):
    // typed-Aggregator partials (the HeavyHittersAggregator pattern) —
    // partial + final ObjectHashAggregate pairs straddle the shuffle
    import org.apache.spark.sql.{functions => F}
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sk = graft.operators.SetSketches.sketchSets(li, "l_returnflag", F.col("l_orderkey"), 1024)
    val sp = sk.queryExecution.executedPlan.toString
    sp.split("\n").count(_.contains("ObjectHashAggregate")) should be >= 2
    // and the downstream pair query plans no cartesian
    plan("q_theta_overlap") should not include "CartesianProduct"
  }

  it("q_skyline: the pivot prefilter broadcasts; nothing plans a cartesian") {
    val p = plan("q_skyline")
    p should include("TakeOrderedAndProject") // the pivot row via orderBy+limit(1)
    p should not include "CartesianProduct"
  }

  it("q_label_prop / q_hop_distance: rounds are hash equi-joins, no nested loop") {
    Seq("q_label_prop", "q_hop_distance").foreach { q =>
      val p = plan(q)
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }

  it("q_assoc_rules: apriori prune is a semi-join UPSTREAM of the pair self-join") {
    val p = plan("q_assoc_rules")
    p should not include "CartesianProduct"
    // the only nested loop is the broadcast of the 1-row N aggregate
    val bnlj = p.split("\n").filter(_.contains("BroadcastNestedLoopJoin"))
    bnlj should have length 1
    bnlj.head should include("BuildRight, Cross")
    // the pruning semi-join and the tid-keyed pair join both hash-join
    p should include("LeftSemi")
    val lines = p.split("\n")
    val semiAt = lines.indexWhere(_.contains("LeftSemi"))
    val pairAt = lines.indexWhere(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    semiAt should be >= 0
    // plan trees print top-down: the pair join consumes the semi-join's
    // output, so the semi-join appears BELOW it
    if (pairAt >= 0) semiAt should be > pairAt
  }

  it("q_cov_matrix: the moments pass is a mergeable typed aggregate (map-side partial)") {
    val p = plan("q_cov_matrix")
    p.split("\n").count(_.contains("ObjectHashAggregate")) should be >= 2
    p should include("covmomentsaggregator")
  }

  it("graph suite rounds (hits/kcore/lcc/assortativity) plan no cartesian products") {
    Seq("q_hits", "q_kcore", "q_clustering_coef", "q_assortativity").foreach { q =>
      withClue(s"$q: ") { plan(q) should not include "CartesianProduct" }
    }
  }

  it("q_xcorr: the lag grid broadcasts; the shifted-date join is an equi-join") {
    val p = plan("q_xcorr")
    p.split("\n").count(_.contains("BroadcastExchange")) should be >= 1
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin(condition" // no residual-only join
  }

  it("q_ks_test / q_mannwhitney run their value-axis cumulatives as partitioned windows (two-phase prefix)") {
    Seq("q_ks_test", "q_mannwhitney").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should include("rangepartitioning")
        p should include("__pid")
        // the cumulative c1/c2 sums over the data-sized value axis must
        // partition by __pid; the only partition-less window allowed is
        // the per-partition-offsets frame (sums __t1/__t2, tiny)
        val cdfWindows = p.split("\n").filter(l =>
          l.contains("Window [sum(c1") || l.contains("Window [sum(c2"))
        cdfWindows should not be empty
        cdfWindows.foreach(_ should include("windowspecdefinition(__pid"))
      }
    }
  }

  it("q_roc_auc / q_pr_auc ride the same two-phase prefix — no data-sized global window") {
    Seq("q_roc_auc", "q_pr_auc").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should include("rangepartitioning")
        p should include("__pid")
        val cdfWindows = p.split("\n").filter(l =>
          l.contains("Window [sum(c1") || l.contains("Window [sum(c2"))
        cdfWindows should not be empty
        cdfWindows.foreach(_ should include("windowspecdefinition(__pid"))
        p should not include "CartesianProduct"
      }
    }
  }

  it("q_kendall's pair kernel is ONE bounded broadcast nested loop plus 1-row scalar attaches") {
    val p = plan("q_kendall")
    p should not include "CartesianProduct"
    // ≤ 4 BNLs: the cells x cells pair kernel (vocabulary-bounded)
    // plus up to three 1-row scalar frames (n / tx / ty) attached by
    // broadcast — an UPPER bound, not an exact count (ADVICE r14: a
    // planner that fuses a scalar attach must not fail the pin; the
    // disallowed shape is a cartesian or a data-sized loop, asserted
    // separately)
    p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 4
  }

  it("q_vocab_overlap intersects by TERM equi-join; q_ipw_ate is one combinable aggregate") {
    val v = plan("q_vocab_overlap")
    v should not include "CartesianProduct"
    // the type-set intersection must key on the term, not loop pairs:
    // the only nested loop allowed is the sizes² pair-universe frame
    v.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 2
    v should (include("SortMergeJoin") or include("BroadcastHashJoin")
      or include("ShuffledHashJoin"))
    val i = plan("q_ipw_ate")
    i should not include "windowspecdefinition"
    i should not include "CartesianProduct"
    i should not include "Join"
  }

  it("q_youden's argmax is TakeOrderedAndProject; q_auc_by_group windows partition by the audit key") {
    val y = plan("q_youden")
    y should include("TakeOrderedAndProject")
    y should not include "CartesianProduct"
    val g = plan("q_auc_by_group")
    val wins = g.split("\n").filter(_.contains("windowspecdefinition"))
    wins should not be empty
    wins.foreach(_ should include("group#"))
  }

  it("q_brier / q_ece fold to combinable aggregates — no window, no cartesian") {
    Seq("q_brier", "q_ece").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should not include "windowspecdefinition"
        p should not include "CartesianProduct"
      }
    }
  }

  it("q_retrieval_eval shuffles on the query key; only the documented serve kernel broadcasts") {
    val p = plan("q_retrieval_eval")
    // one BroadcastExchange: the 10-query side of bruteForceTopK; the
    // relevance join and per-query aggregation hash on qid
    p should not include "CartesianProduct"
    p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 1
  }

  it("q_burstiness / q_seasonal windows partition by the series key") {
    Seq("q_burstiness", "q_seasonal").foreach { q =>
      val lines = plan(q).split("\n").filter(_.contains("windowspecdefinition"))
      withClue(s"$q: ") {
        lines should not be empty
        lines.foreach(_ should include("k#"))
      }
    }
  }

  it("q_trimmed_mean / q_sliding_distinct / q_seq_entropy plan no cartesian products") {
    Seq("q_trimmed_mean", "q_sliding_distinct", "q_seq_entropy").foreach { q =>
      withClue(s"$q: ") { plan(q) should not include "CartesianProduct" }
    }
  }

  it("q_cusum / q_survival windows are the intended shapes — keyed for cusum, duration-axis for KM") {
    // cusum: every window partitions by the series key
    val cu = plan("q_cusum").split("\n").filter(_.contains("windowspecdefinition"))
    cu should not be empty
    cu.foreach(_ should include("k#"))
    // KM: the window runs over the per-duration aggregate (no partition
    // key by design), and everything upstream is a combinable count
    plan("q_survival") should include("windowspecdefinition")
  }

  it("q_gini and q_spearman rank via range repartition, never a data-sized global window") {
    Seq("q_gini", "q_spearman").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should include("rangepartitioning") // the two-phase prefix spread
        // the only unpartitioned window work is the per-partition pass
        // AFTER the range exchange (__pid-partitioned), never a global sort
        p.split("\n").filter(_.contains("windowspecdefinition"))
          .foreach(_ should include("__pid"))
      }
    }
  }

  it("q_top_paths windows per-user; the global rank runs over the bounded path aggregate") {
    val p = plan("q_top_paths")
    val wins = p.split("\n").filter(_.contains("windowspecdefinition"))
    wins should not be empty
    // at most one window line has no user partition: the rank over path
    // counts (bounded by |types|^depth, a type-space constant) — an
    // upper bound per the ADVICE-r14 brittleness rule
    wins.count(l => !l.contains("u#")) should be <= 1
  }

  it("q_intrinsic_dim's quadratic kernel is ONE broadcast nested loop — queries broadcast, candidates spread") {
    val p = plan("q_intrinsic_dim")
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
    // upper bound (ADVICE-r14): queries broadcast once at most; the
    // corpus side must never be a build side
    p.split("\n").count(_.contains("BroadcastExchange")) should be <= 1
  }

  it("q_intrinsic_dim_ann's kernel is SUB-quadratic: no nested loop, no cartesian, cell join is shuffle-merge") {
    val p = plan("q_intrinsic_dim_ann")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    // the corpus is never a broadcast build side; cells meet probes in a
    // pinned shuffle-merge join on the low-cardinality cell key
    p should include("SortMergeJoin")
  }

  it("q_cuped is one combinable aggregate — no join, no window, one exchange pair") {
    val p = plan("q_cuped")
    p should not include "windowspecdefinition"
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  it("q_kruskal midranks ride the two-phase prefix — no data-sized global window") {
    val p = plan("q_kruskal")
    p should include("rangepartitioning")
    p should include("__pid")
    // the only partition-less windows allowed are the tiny per-partition
    // offsets frame (sums __tot) — never the value-axis cumulative
    val valueWindows = p.split("\n").filter(l =>
      l.contains("windowspecdefinition") && !l.contains("__pid") && !l.contains("__tot"))
    valueWindows shouldBe empty
  }

  it("q_anova is one combinable moment aggregate — no join, no window") {
    val p = plan("q_anova")
    p should not include "windowspecdefinition"
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  it("q_bootstrap_ci combines replicate sums map-side — the shuffle carries partials, never N x B rows") {
    val p = plan("q_bootstrap_ci")
    // partial + final hash aggregate around the rep exchange: the
    // explode's N x B stream is folded before it moves
    p.split("\n").count(l => l.contains("HashAggregate") &&
      l.contains("partial_sum")) should be >= 1
    p should not include "CartesianProduct"
    // at most one BNLJ: the 1-row (n, total) scalar broadcast onto the
    // 1-row percentile frame — never a data-sized side (upper bound,
    // the ADVICE-r14 brittleness rule)
    p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 1
    p should not include "windowspecdefinition"
  }

  it("q_theil_sen's pair join is key-partitioned over the days-sized time axis — never a cartesian") {
    val p = plan("q_theil_sen")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  it("the round-15 confusion/agreement additions join on the class vocabulary — never a cartesian") {
    Seq("q_mcc", "q_class_summary", "q_fleiss").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should not include "CartesianProduct"
        // no data-sized global window anywhere in these folds
        p should not include "windowspecdefinition"
      }
    }
    // the weighted-kappa expected-disagreement kernel is the bounded
    // vocabulary² margin loop plus 1-row scalar attaches — upper bound
    // per the ADVICE-r14 rule; the disallowed shape is a cartesian
    val wk = plan("q_weighted_kappa")
    wk should not include "CartesianProduct"
    wk.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 3
  }

  it("the round-15 one-scan evaluators stay single combinable aggregates — no join, no window") {
    Seq("q_mcnemar", "q_ccc", "q_evalue").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        p should not include "windowspecdefinition"
        p should not include "CartesianProduct"
        p should not include "SortMergeJoin"
      }
    }
  }

  it("q_langid_nb scores through a BROADCAST model join — never a cartesian, no data-sized build side") {
    val p = plan("q_langid_nb")
    p should not include "CartesianProduct"
    // the per-doc argmax window is doc-partitioned, never global
    val wins = p.split("\n").filter(_.contains("windowspecdefinition"))
    wins.foreach(l => l should include("doc_id"))
    // the vocabulary-sized model/prior frames broadcast; the corpus
    // never does (upper bound per the ADVICE-r14 brittleness rule)
    p should include("BroadcastHashJoin")
  }

  it("q_coxph_cont's scalar attaches broadcast 1-row/bounded frames — never a cartesian on data") {
    val p = plan("q_coxph_cont")
    p should not include "CartesianProduct"
    // the cumulative risk-set window is the days-sized event axis —
    // bounded; no data-sized global sort feeds it (the collect is
    // capped by the loud guard, not pinned here)
    p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) should be <= 3
  }

  it("q_unigram_tokens serves by DICTIONARY broadcast join — the corpus side never builds") {
    val p = plan("q_unigram_tokens")
    p should not include "CartesianProduct"
    p should not include "windowspecdefinition"
    p should include("BroadcastHashJoin")
  }

  it("q_langid_holdout keeps the q_langid_nb plan shape: broadcast model join, doc-partitioned argmax") {
    // the split adds two md5-nibble FILTERS, never a new shuffle or a
    // data-sized build side — train-side model and priors broadcast,
    // the holdout corpus streams through
    val p = plan("q_langid_holdout")
    p should not include "CartesianProduct"
    val wins = p.split("\n").filter(_.contains("windowspecdefinition"))
    wins.foreach(l => l should include("doc_id"))
    p should include("BroadcastHashJoin")
  }
}
