package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.{AsOfJoin, DataShaping, Dedup, Similarity, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  describe("Dedup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
      (4L, "completely different content about spark engines here")
    ).toDF("doc_id", "text")

    it("exact: groups identical texts under one content hash") {
      val out = Dedup.exact(docs, "doc_id", "text").collect()
      out.length shouldBe 3
      val dup = out.find(_.getLong(2) == 2L).get
      dup.getLong(1) shouldBe 1L // keep_id = min
    }

    it("minhash LSH: exact duplicates always collide; disjoint docs don't") {
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))
      pairs should not contain ((1L, 4L))
    }

    it("simhash: identical texts get identical fingerprints") {
      val out = Dedup.simhash(docs, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      out(1L) shouldBe out(2L)
      out(1L) should be >= 0L
      out(1L) should be < 65536L
    }

    it("jaccard: identical docs score 1.0; near-dups score high") {
      val j = Dedup.jaccardPairs(Dedup.wordShingles(docs, "doc_id", "text"), 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      j((1L, 2L)) shouldBe 1.0
      j((1L, 3L)) should (be > 0.3 and be < 1.0)
    }

    it("jaccard maxDf above the corpus max df changes nothing (suppression is a no-op)") {
      val sh = Dedup.wordShingles(docs, "doc_id", "text")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val dflt = Dedup.jaccardPairs(sh, 0.0).collect().map(key).toSet
      val high = Dedup.jaccardPairs(sh, 0.0, maxDf = 1000000L).collect().map(key).toSet
      high shouldBe dflt
    }

    it("jaccard maxDf drops stop-phrase shingles from both intersections and sizes") {
      // two docs identical except for one extra shingle-universe member;
      // a shingle shared by ALL docs is suppressed at maxDf below corpus size
      val j = Dedup.jaccardPairs(Dedup.wordShingles(docs, "doc_id", "text"), 0.0, maxDf = 1L)
        .collect()
      // with maxDf=1 every multi-doc shingle is suppressed -> no pairs at all
      j shouldBe empty
    }

    it("simhashPairs finds exact duplicates at hamming 0 and skips unrelated docs") {
      val p = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      p should contain key ((1L, 2L)) // identical texts -> identical fingerprints
      p((1L, 2L)) shouldBe 0
    }

    it("simhashPairs maxHamming=0 buckets on BOTH fingerprint words (exact-equality fast path)") {
      val p0 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      // identical texts are the only hamming-0 pair; result must agree with
      // the banded path's hamming-0 subset
      val p3 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .collect().filter(_.getInt(2) == 0).map(r => (r.getLong(0), r.getLong(1)) -> 0).toMap
      p0 shouldBe p3
      p0 should contain key ((1L, 2L))
    }

    it("hammingEdges64 is connectivity-equivalent to the full pair expansion at clique-free cost") {
      import spark.implicits._
      // one 200-member exact-dup group, one near-dup print (hamming 1 off
      // the group), three far singletons
      val fp = ((1L to 200L).map(i => (i, 5L, 9L)) ++
        Seq((300L, 4L, 9L), (400L, 0xF0F0F0F0L, 0L), (500L, 0L, 0xF0F0F0F0L),
          (600L, 0xABCDL, 0x1234L))).toDF("doc", "sh_lo", "sh_hi")
      val nodes = fp.select(F.col("doc").as("node"))

      val pairs = Dedup.hammingPairs64(fp, "doc", "sh_lo", "sh_hi")
      // full expansion: C(200,2) within-group + 200 cross to the near print
      pairs.count() shouldBe (200L * 199 / 2 + 200)
      val edges = Dedup.hammingEdges64(fp, "doc", "sh_lo", "sh_hi")
      // contracted: 199 star edges + ONE print-pair edge
      edges.count() shouldBe 200L

      val ccPairs = Dedup.connectedComponents(pairs.select("a", "b"), nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ccEdges = Dedup.connectedComponents(edges, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ccEdges shouldBe ccPairs
      ccEdges(300L) shouldBe 1L // near print joins the big group's component
      ccEdges(400L) shouldBe 400L
    }

    it("connectedComponents labels every node with its component's minimum id (transitive closure)") {
      import spark.implicits._
      // 1-2, 2-3 chain (transitive: 3 never pairs with 1 directly); 5-6; 9 singleton
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
      val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("node")
      val cc = Dedup.connectedComponents(pairs, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cc shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
    }

    it("connectedComponents never returns non-converged labels: a 500-hop chain either escalates or throws") {
      import spark.implicits._
      // a 501-node path graph: propagation + pointer-jump carries node 0's
      // label ~2^(r+1) hops in r rounds, so depth 500 needs ~8 rounds —
      // past maxIters = 5
      val pairs = (0L until 500L).map(i => (i, i + 1)).toDF("a", "b")
      val nodes = (0L to 500L).toDF("node")
      // escalate = false: loud failure, never wrong labels (driver fast
      // path disabled to exercise the DISTRIBUTED loop's guard)
      an[IllegalStateException] should be thrownBy
        Dedup.connectedComponents(pairs, nodes, maxIters = 5, escalate = false,
          driverEdgeBound = 0L).collect()
      // default: auto-escalation to star contraction gives the right answer
      val cc = Dedup.connectedComponents(pairs, nodes, maxIters = 5,
          driverEdgeBound = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cc.size shouldBe 501
      cc.values.toSet shouldBe Set(0L)
    }

    it("driver union-find fast path equals the distributed loop (and the loop equals star)") {
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      val n = 80
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("a", "b")
      val nodes = (0L until n.toLong).toDF("node")
      val fast = Dedup.connectedComponents(pairs, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = Dedup.connectedComponents(pairs, nodes, maxIters = 100,
          escalate = false, driverEdgeBound = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      fast shouldBe loop
    }

    it("connectedComponentsStar matches label propagation on a random graph (equivalence)") {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("a", "b")
      val nodes = (0L until n.toLong).toDF("node")
      val prop = Dedup.connectedComponents(pairs, nodes, maxIters = 100,
          escalate = false, driverEdgeBound = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(pairs, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      star shouldBe prop
    }

    it("connectedComponentsStar schedules ONE fixpoint action per round (job-count evidence)") {
      import spark.implicits._
      val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
      val nodes = (0L to 20L).toDF("node")
      // count driver ACTIONS (full plan executions) by name via a
      // QueryExecutionListener — the scheduling cost the 1-action fixpoint
      // reduced; raw Spark job counts are a bad proxy (take() escalates
      // through partitions, AQE splits stages into jobs)
      val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
          actions.add(funcName)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val cc =
        try {
          val m = Dedup.connectedComponentsStar(pairs, nodes)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          // listener events are delivered asynchronously — poll to stable
          var (prev, tries) = (-1, 0)
          while (actions.size != prev && tries < 50) {
            prev = actions.size; Thread.sleep(100); tries += 1
          }
          m
        } finally spark.listenerManager.unregister(listener)
      cc.values.toSet shouldBe Set(0L)
      // exact round count from a driver-side replay of the same
      // deterministic contraction (tiny graph, pure Scala)
      def roundFn(es: Set[(Long, Long)]): Set[(Long, Long)] = {
        val sym = es ++ es.map { case (l, h) => (h, l) }
        val mTab = sym.groupBy(_._1).map { case (n, xs) => n -> math.min(n, xs.map(_._2).min) }
        val ls = sym.collect { case (n, x) if x > n => (mTab(n), x) }
        val sMin = ls.groupBy(_._2).map { case (h, e) => h -> e.map(_._1).min }
        val ssOld = ls.collect { case (lo, hi) if lo != sMin(hi) => (sMin(hi), lo) }
        ssOld ++ sMin.map { case (h, m) => (m, h) }
      }
      var es = (0L until 20L).map(i => (i, i + 1)).toSet
      var rounds = 1
      while ({ val n = roundFn(es); val same = n == es; es = n; !same }) rounds += 1
      val byName = actions.toArray(Array.empty[String]).groupBy(identity).view.mapValues(_.length).toMap
      val tests = byName.getOrElse("isEmpty", 0)
      info(s"connectedComponentsStar: $rounds rounds, actions = $byName")
      // ONE fixpoint test per round + the initial emptiness check; the old
      // formulation ran 3 per round (2 counts + a distinct-union count)
      tests shouldBe rounds + 1
      byName.getOrElse("count", 0) shouldBe 0
    }
  }

  describe("Similarity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    it("kCenterSelect: farthest-first order, nonincreasing radii, distinct centers") {
      // axis clusters: greedy from vec 0 must hop to a DIFFERENT axis each
      // round before ever picking a same-axis near-dup
      val km = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.99f, 0.05f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
        (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))
      ).toDF("vec_id", "embedding")
      val out = Similarity.kCenterSelect(km, "vec_id", "embedding", k = 4)
        .orderBy("sel_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
      out.map(_._2).distinct.length shouldBe 4          // distinct centers
      out.head._2 shouldBe 0L                           // seed = min id
      out.map(_._2).toSet should not contain 1L         // near-dup of the seed never chosen
      val radii = out.drop(1).map(_._3)
      radii.zip(radii.tail).foreach { case (a, b) => b should be <= a } // coverage shrinks
      radii.foreach(_ shouldBe 1.0 +- 1e-9)             // axes are mutually orthogonal
    }

    it("kCenterSelect clamps k to the corpus size and handles empty input") {
      val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding")
      Similarity.kCenterSelect(tiny, "vec_id", "embedding", k = 10)
        .count() shouldBe 2L // never repeats centers past N
      val empty = tiny.filter(F.col("vec_id") < 0)
      Similarity.kCenterSelect(empty, "vec_id", "embedding", k = 3)
        .count() shouldBe 0L
    }

    it("cosine: identical direction = 1.0, orthogonal = 0.0, opposite = -1.0") {
      val out = vecs.as("a").crossJoin(vecs.as("b"))
        .select($"a.vec_id".as("x"), $"b.vec_id".as("y"),
          Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      out((0L, 0L)) shouldBe 1.0
      out((0L, 2L)) shouldBe 0.0
      out((0L, 3L)) shouldBe -1.0
    }

    it("hardNegatives: same cell, below the near-dup ceiling, hardest first") {
      // 6-dim toy with two obvious clusters along axes 0 and 2; centroids
      // literal so cell assignment is deterministic
      val dim6 = Seq(
        (0L, Array(1.0f, 0.05f, 0f, 0f, 0f, 0f)),  // cluster A anchor
        (1L, Array(0.99f, 0.1f, 0f, 0f, 0f, 0f)),  // near-dup of 0 (cos > 0.99)
        (2L, Array(0.8f, 0.6f, 0f, 0f, 0f, 0f)),   // same cell, hard negative
        (3L, Array(0.6f, 0.8f, 0f, 0f, 0f, 0f)),   // same cell, softer negative
        (4L, Array(0f, 0f, 1.0f, 0f, 0f, 0f))      // other cluster
      ).toDF("vec_id", "embedding")
      val cents = Array(
        Array(1.0, 0, 0, 0, 0, 0),
        Array(0.0, 0, 1.0, 0, 0, 0))
      val out = Similarity.hardNegatives(dim6, "vec_id", "embedding", cents,
        maxCos = 0.95, k = 2)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      // anchor 0: near-dup 1 is EXCLUDED by the ceiling; hardest true
      // negative is 2, then 3; vector 4 is in the other cell
      out((0L, 1)) shouldBe 2L
      out((0L, 2)) shouldBe 3L
      // anchor 4 has no same-cell companion: no rows at all
      out.keys.map(_._1) should not contain 4L
    }

    it("bruteForceTopK ranks by similarity with deterministic tiebreak") {
      val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding", 2)
        .orderBy("rn").collect()
      top.map(_.getLong(1)) shouldBe Array(1L, 2L) // nearest then orthogonal
    }

    it("hyperplane LSH groups near-parallel vectors and splits opposites") {
      val out = Similarity.lshTopK(vecs, "vec_id", "embedding", nbits = 3, k = 5, dim = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      out should contain((0L, 1L)) // ~6° apart: same side of every plane w.h.p.
      // an exact opposite flips the sign on EVERY hyperplane -> different bucket
      out should not contain ((0L, 3L))
    }

    it("a vector/plane dimension mismatch raises instead of silently single-bucketing") {
      val ex = intercept[Exception] {
        Similarity.lshTopK(vecs, "vec_id", "embedding", nbits = 3, k = 5, dim = 64).collect()
      }
      ex.getMessage should include("expected 64-dim vector")
    }

    it("signBucket keys same-orthant vectors identically and opposites differently") {
      val b = vecs.select($"vec_id", Similarity.signBucket($"embedding", 3).as("b"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      b(0L) shouldBe b(1L) // same orthant
      b(0L) should not be b(3L) // opposite orthant
    }

    it("probeCellsJoin matches in-row probeCells cell-for-cell past the codegen threshold") {
      // 24 centroids (> inRowKcMax) spread over 4 dims with deliberate
      // near-ties, so the rounded-cosine + lowest-cell tie-break is
      // actually exercised on both paths
      val rnd = new scala.util.Random(7)
      val cents = Array.tabulate(24) { i =>
        Array.tabulate(4)(d => math.rint((rnd.nextDouble() - 0.5) * 8) / 4.0 + (if (d == i % 4) 1.0 else 0.0))
      }
      val pts = (0L until 40L).map { i =>
        (i, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))
      }.toDF("id", "v")
      for (nprobe <- Seq(1, 3)) {
        val inRow = pts.select($"id", F.explode(Similarity.probeCells($"v", cents, nprobe)).as("cell"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        val joined = Similarity.probeCellsJoin(pts, cents, nprobe)
          .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
        joined shouldBe inRow
      }
    }

    it("multi-probe LSH finds at least the single-probe neighbours (superset recall)") {
      val single = Similarity.lshTopK(vecs, "vec_id", "embedding", nbits = 3, k = 5, dim = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val multi = Similarity.lshTopKMultiProbe(vecs, "vec_id", "embedding", nbits = 3, k = 5, dim = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      single.subsetOf(multi) shouldBe true // probes only ADD candidate buckets
    }
  }

  describe("TextAnalysis.gopherRules") {
    it("keeps only docs inside every bound and reports each signal") {
      val docs = Seq(
        (1L, "the quick brown fox and the lazy dog ran over the hill toward a distant farm while the sun was low and the wind kept on blowing softly over all of the quiet fields near the old barn and a small creek"), // passes all
        (2L, "too short"), // fails word count
        (3L, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll zz qq ww ee rr tt yy uu ii oo pp aa" * 2) // no stopwords
      ).toDF("doc_id", "text")
      val out = TextAnalysis.gopherRules(docs, "text", minWords = 20,
          minMeanWordLen = 2.0, maxMeanWordLen = 10.0)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
      out(1L) shouldBe 1
      out(2L) shouldBe 0
      out(3L) shouldBe 0
    }
  }

  describe("DataShaping.mixtureWeights") {
    it("normalizes raw weights, caps sampling at 1.0, and lets epochs exceed it") {
      // group a: 100 tokens, raw 1; group b: 10 tokens, raw 3 => budget 80
      // gives a 20 tokens (0.2 epochs) and b 60 tokens (6 epochs, rate 1.0)
      val rows = (Seq.fill(10)(("a", 10L)) ++ Seq.fill(2)(("b", 5L)))
        .zipWithIndex.map { case ((g, n), i) => (i.toLong, g, n) }
        .toDF("id", "grp", "toks")
      val out = DataShaping.mixtureWeights(rows, "grp", F.col("toks"),
          F.when(F.col("grp") === "a", 1.0).otherwise(3.0), budgetTokens = 80L)
        .collect().map(r => r.getAs[String]("grp") ->
          ((r.getAs[Long]("group_tokens"), r.getAs[Double]("weight"),
            r.getAs[Long]("target_tokens"), r.getAs[Double]("epochs"),
            r.getAs[Double]("sampling_rate")))).toMap
      out("a") shouldBe ((100L, 0.25, 20L, 0.2, 0.2))
      out("b") shouldBe ((10L, 0.75, 60L, 6.0, 1.0))
    }
  }

  describe("DataShaping.mwReweight") {
    it("upweights the harder domain each step, weights stay normalized") {
      // hard: 100-token docs; easy: 20-token docs; mid: 60
      val rows = (Seq.fill(5)(("hard", 100L)) ++ Seq.fill(5)(("easy", 20L)) ++
        Seq.fill(5)(("mid", 60L)))
        .zipWithIndex.map { case ((g, n), i) => (i.toLong, g, n) }
        .toDF("id", "grp", "toks")
      def weights(iters: Int) = DataShaping.mwReweight(rows, "grp", F.col("toks"), iters)
        .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("alpha6")).toMap
      val w0 = weights(0); val w2 = weights(2); val w4 = weights(4)
      // uniform start
      w0.values.toSet shouldBe Set(333333L)
      // monotone divergence: hard gains, easy loses, more steps = more
      w2("hard") should be > w0("hard")
      w4("hard") should be > w2("hard")
      w4("easy") should be < w2("easy")
      w2("easy") should be < w0("easy")
      // normalization holds to rounding (sum of a6 within 2 micro of 1e6)
      Seq(w2, w4).foreach(w => math.abs(w.values.sum - 1000000L) should be <= 2L)
    }
  }

  describe("DataShaping.curriculumOrder") {
    it("interleaves domains rank-major: every group's k-th easiest precedes any (k+1)-th") {
      val rows = Seq(
        (1L, "a", 30), (2L, "a", 10), (3L, "a", 20),
        (4L, "b", 5), (5L, "b", 50))
        .toDF("doc_id", "grp", "difficulty")
      val out = DataShaping.curriculumOrder(rows, "doc_id", "grp", F.col("difficulty"))
        .orderBy("pos").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // positions 1..2: both groups' rank-1 (a's easiest=2, b's easiest=4)
      out.map(_._1) shouldBe Array(2L, 4L, 3L, 5L, 1L)
      out.map(_._4) shouldBe Array(1L, 2L, 3L, 4L, 5L)
      // within each group, difficulty is nondecreasing along rank
      out.filter(_._2 == "a").sortBy(_._3).map(_._1) shouldBe Array(2L, 3L, 1L)
    }
  }

  describe("DataShaping.contaminationBloom") {
    it("matches the exact shingle-join row-for-row while pruning bloom-negative train shingles pre-shuffle") {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val train = docs.filter(F.col("source") =!= "src0")
      val bench = docs.filter(F.col("source") === "src0")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getAs[Long]("train_id"),
          r.getAs[Long]("bench_id"), r.getAs[Long]("shared"))).toSet
      val exact = rows(DataShaping.contamination(train, bench, "doc_id", "text"))
      val bloomed = rows(DataShaping.contaminationBloom(train, bench, "doc_id", "text"))
      bloomed shouldBe exact
      // the pre-pass must actually prune: bloom-positive train shingles are
      // a small sliver of the full train shingle set (false positives only)
      val allTrain = Dedup.wordShingles(train, "doc_id", "text", 3)
      val benchBloom = Dedup.wordShingles(bench, "doc_id", "text", 3)
        .select(graft.functions.BloomSupport
          .bloomAgg(F.col("shingle"), 1L << 20, 1L << 23).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val kept = allTrain.filter(graft.functions.BloomSupport
        .mightContain(F.lit(benchBloom), F.col("shingle"))).count()
      val total = allTrain.count()
      info(f"bloom pre-pass keeps $kept of $total train shingles (${100.0 * kept / total}%.1f%%)")
      kept.toDouble / total should be < 0.5
    }
  }

  describe("DataShaping.weightedSample") {
    it("prob 0 drops everything, prob 1 keeps everything, and keeps grow monotonically with prob") {
      val rows = (0L until 200L).map(i => (i, s"row$i")).toDF("id", "v")
      DataShaping.weightedSample(rows, "id", F.lit(0.0)).count() shouldBe 0
      DataShaping.weightedSample(rows, "id", F.lit(1.0)).count() shouldBe 200
      val at30 = DataShaping.weightedSample(rows, "id", F.lit(0.3))
        .collect().map(_.getLong(0)).toSet
      val at60 = DataShaping.weightedSample(rows, "id", F.lit(0.6))
        .collect().map(_.getLong(0)).toSet
      at30.subsetOf(at60) shouldBe true // same draw, higher bar: strict superset keeps
      at30.size should be < at60.size
      // the draw tracks the probability (binomial(200, .3): ~±3sigma bounds)
      at30.size should (be > 40 and be < 80)
    }
  }

  describe("DataShaping.removeBoilerplate") {
    it("drops chunks shared by >= minDocs docs and reassembles the rest in order") {
      // 2-token chunks: "aa bb" appears in docs 1, 2 and 3 (boilerplate);
      // everything else is unique to its doc
      val docs = Seq(
        (1L, "aa bb u1 v1 aa bb w1 x1"), // boiler at chunk 0 and 2
        (2L, "u2 v2 aa bb"),             // boiler at chunk 1
        (3L, "aa bb"),                   // ALL boilerplate
        (4L, "u4 v4 w4 x4")              // nothing shared
      ).toDF("doc_id", "text")
      val out = graft.operators.DataShaping
        .removeBoilerplate(docs, "doc_id", "text", chunkTokens = 2, minDocs = 2L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      out(1L) shouldBe ((4L, 2L, "u1 v1 w1 x1")) // order preserved across the gap
      out(2L) shouldBe ((2L, 1L, "u2 v2"))
      out(3L) shouldBe ((1L, 1L, ""))            // all-boiler doc keeps its row
      out(4L) shouldBe ((2L, 0L, "u4 v4 w4 x4"))
    }

    it("minDocs counts DISTINCT documents, not occurrences") {
      // "rr ss" repeats TWICE within doc 1 only — in-doc repetition must
      // not make it corpus boilerplate at minDocs = 2
      val docs = Seq(
        (1L, "rr ss rr ss"),
        (2L, "zz qq")
      ).toDF("doc_id", "text")
      val out = graft.operators.DataShaping
        .removeBoilerplate(docs, "doc_id", "text", chunkTokens = 2, minDocs = 2L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      out(1L) shouldBe 0L
      out(2L) shouldBe 0L
    }
  }

  describe("TextAnalysis") {
    val docs = Seq(
      (1L, "the cat and the hat"),
      (2L, "der hund und die katze"),
      (3L, "hat the cat and the") // permutation of 1
    ).toDF("doc_id", "text")

    it("winnow: shared substrings >= k+w-1 chars guarantee a shared selected hash; disjoint texts share none") {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different text here with the quick brown fox inside"), // shares a long substring with 1
        (3L, "zzzzqqqqwwwweeeerrrrttttyyyy"), // disjoint character space
        (4L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG  ") // case/trim variant of 1
      ).toDF("doc_id", "text")
      val sets = TextAnalysis.winnowSets(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
      (sets(1L) intersect sets(2L)) should not be empty // winnowing guarantee
      (sets(1L) intersect sets(3L)) shouldBe empty
      sets(4L) shouldBe sets(1L) // canonicalization: case and trim invisible
      // the compact form reports consistent counts and checksum
      val row = TextAnalysis.winnow(docs, "doc_id", "text")
        .filter($"doc_id" === 1L).collect()(0)
      row.getAs[Int]("n_selected") shouldBe sets(1L).size
      row.getAs[Long]("fp_checksum") shouldBe sets(1L).sum
    }

    it("winnowPairs: a copied doc pairs at containment 1.0; unrelated docs don't pair") {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog and keeps running far away"),
        (2L, "the quick brown fox jumps over the lazy dog and keeps running far away"), // exact copy
        (3L, "entirely unrelated content with nothing in common whatsoever here")
      ).toDF("doc_id", "text")
      val out = TextAnalysis.winnowPairs(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("overlap")).toMap
      out((1L, 2L)) shouldBe 1.0
      out.keySet should contain only ((1L, 2L))
    }

    it("lmImportance upweights target-domain docs and smooths unseen grams") {
      // target domain (t=true) talks about cats; background adds dog docs
      val corpus = Seq(
        (1L, "the cat sat on the mat", true),
        (2L, "the cat ate the fish", true),
        (3L, "the dog ran in the park", false),
        (4L, "the dog bit the ball", false),
        (5L, "the cat sat on the fish", false) // cat-like background doc
      ).toDF("doc_id", "text", "t")
      val out = TextAnalysis.lmImportance(corpus, "doc_id", "text", F.col("t"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_ratio")).toMap
      out(1L) should be > 0.0 // target docs look like the target model
      out(5L) should be > 0.0 // cat-like background doc upweighted too
      out(3L) should be < 0.0 // dog grams are UNSEEN by the target model:
      out(4L) should be < 0.0 // smoothed floor, strongly negative ratio
    }

    it("langId scores markers and predicts with declaration-order tiebreak") {
      val out = TextAnalysis.langId(docs, "text")
        .select("doc_id", "pred_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out(1L) shouldBe "en"
      out(2L) shouldBe "de"
    }

    it("quality computes token stats") {
      val q = TextAnalysis.quality(docs, "text").filter($"doc_id" === 1L).collect()(0)
      q.getAs[Int]("n_tokens") shouldBe 5
      q.getAs[Int]("n_distinct_tokens") shouldBe 4
      q.getAs[Double]("stopword_ratio") shouldBe 0.6 // the, and, the
    }

    it("classifier eval matches the hand confusion matrix; kappa corrects for chance") {
      import graft.operators.Evaluation
      // confusion: pred a: (a:4, b:1); pred b: (a:1, b:3); pred c: (b:1)
      // class c never TRUE, class a/b mixed; n = 10
      val rows = Seq.fill(4)(("a", "a")) ++ Seq(("a", "b")) ++
        Seq(("b", "a")) ++ Seq.fill(3)(("b", "b")) ++ Seq(("c", "b"))
      val df = rows.toDF("pred", "label")
      val pc = Evaluation.perClass(df, "pred", "label")
        .collect().map(r => r.getString(0) -> r).toMap
      pc("a").getAs[Long]("n_pred") shouldBe 5L
      pc("a").getAs[Long]("n_actual") shouldBe 5L
      pc("a").getAs[Double]("precision") shouldBe 0.8
      pc("a").getAs[Double]("recall") shouldBe 0.8
      pc("a").getAs[Double]("f1") shouldBe 0.8
      pc("b").getAs[Double]("precision") shouldBe 0.75
      pc("b").getAs[Double]("recall") shouldBe 0.6
      // class c: predicted once, never true -> precision 0, recall NULL
      pc("c").getAs[Long]("n_actual") shouldBe 0L
      pc("c").getAs[Double]("precision") shouldBe 0.0
      pc("c").isNullAt(pc("c").fieldIndex("recall")) shouldBe true
      pc("c").isNullAt(pc("c").fieldIndex("f1")) shouldBe true
      // kappa: po = 0.7; pe = (5*5 + 4*5 + 1*0)/100 = 0.45
      // kappa = (0.7 - 0.45)/0.55 = 0.4545
      val k = Evaluation.kappa(df, "pred", "label").collect().head
      k.getAs[Long]("n") shouldBe 10L
      k.getAs[Double]("accuracy") shouldBe 0.7
      k.getAs[Double]("expected_accuracy") shouldBe 0.45
      k.getAs[Double]("kappa") shouldBe 0.4545 +- 1e-9
      // single-class degenerate margins: agreement unmeasurable -> NULL
      val deg = Evaluation.kappa(Seq.fill(5)(("x", "x")).toDF("pred", "label"),
        "pred", "label").collect().head
      deg.getAs[Double]("accuracy") shouldBe 1.0
      deg.isNullAt(deg.fieldIndex("kappa")) shouldBe true
    }

    it("readability matches the hand-worked Flesch counts, per-word syllable floors included") {
      val rd = Seq(
        (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 syllables
        (2L, "7 90"),                      // zero-vowel tokens still cost 1 beat each
        (3L, "beautiful onomatopoeia")     // multi-syllable: beau-ti-ful=3 runs (eau,i,u), o-o-a-o-oeia=4 runs
      ).toDF("doc_id", "text")
      val out = TextAnalysis.readability(rd, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      out(1L).getAs[Long]("words") shouldBe 6L
      out(1L).getAs[Long]("sentences") shouldBe 2L
      out(1L).getAs[Long]("syllables") shouldBe 6L
      // 206.835 - 1.015*3 - 84.6*1 = 119.19 (the "very easy" band)
      out(1L).getAs[Double]("flesch") shouldBe 119.19 +- 1e-9
      out(2L).getAs[Long]("words") shouldBe 2L
      out(2L).getAs[Long]("syllables") shouldBe 2L // floored, not 0
      out(2L).getAs[Long]("sentences") shouldBe 1L // no terminator -> floor 1
      // the long-word doc reads harder: more syllables per word -> lower ease
      out(3L).getAs[Double]("flesch") should be < out(1L).getAs[Double]("flesch")
      out(3L).getAs[Double]("fk_grade") should be > out(1L).getAs[Double]("fk_grade")
    }

    it("repetition: looping text scores high dup/top fractions; varied text scores low") {
      val rep = Seq(
        (1L, "spam spam spam spam"),     // 3 identical 2-grams
        (2L, "all words here differ"),   // 3 distinct 2-grams
        (3L, "x")                        // shorter than n -> dropped
      ).toDF("doc_id", "text")
      val out = TextAnalysis.repetition(rep, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      out(1L) shouldBe ((3L, 1L, 0.6667, 1.0))
      out(2L) shouldBe ((3L, 3L, 0.0, 0.3333))
      out.contains(3L) shouldBe false
    }

    it("redactPii masks emails, IPs and long digit runs; counts come from the original text") {
      val pii = Seq(
        (1L, "write to alice.smith+news@mail.example.org or call 5551234567"),
        (2L, "server 192.168.1.254 and 10.0.0.7 no email here"),
        (3L, "clean text with a short number 123456") // 6 digits: below the 7+ floor
      ).toDF("doc_id", "text")
      val out = TextAnalysis.redactPii(pii, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
      out(1L) shouldBe ((1, 0, 1, "write to <EMAIL> or call <NUM>"))
      out(2L) shouldBe ((0, 2, 0, "server <IP> and <IP> no email here"))
      out(3L) shouldBe ((0, 0, 0, "clean text with a short number 123456"))
    }

    it("redactPii masks the email before its digits can be seen as a number") {
      val pii = Seq((1L, "user1234567@example.com")).toDF("doc_id", "text")
      val r = TextAnalysis.redactPii(pii, "doc_id", "text").collect()(0)
      r.getString(4) shouldBe "<EMAIL>" // not <EMAIL> with a stray <NUM>
      r.getInt(1) shouldBe 1
      r.getInt(3) shouldBe 1 // counted on the ORIGINAL text, by design
    }

    it("topNgramsPerGroup ranks bigrams per group with (count desc, gram asc) tiebreak") {
      val d = Seq(
        (1L, "a b a b a b", "s1"), // "a b" x3, "b a" x2
        (2L, "c d", "s1"),
        (3L, "z z z", "s2")
      ).toDF("doc_id", "text", "source")
      val out = TextAnalysis.topNgramsPerGroup(d, "source", "text", n = 2, k = 2)
        .collect().map(r => (r.getString(0), r.getLong(3)) -> ((r.getString(1), r.getLong(2)))).toMap
      out(("s1", 1L)) shouldBe (("a b", 3L))
      out(("s1", 2L)) shouldBe (("b a", 2L))
      out(("s2", 1L)) shouldBe (("z z", 2L))
    }

    it("fingerprints: md5 ignores order only via content; positional checksum is order-sensitive") {
      val fp = TextAnalysis.fingerprints(docs, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      fp(1L)._1 should not be fp(3L)._1
      fp(1L)._2 should not be fp(3L)._2 // same bag of words, different order
    }
  }

  describe("AsOfJoin") {
    it("attaches the most recent right row at-or-before each left row per key") {
      val left = Seq((10L, 1L, ts("2024-01-01T10:00:00Z")), (11L, 1L, ts("2024-01-01T12:00:00Z")),
        (12L, 2L, ts("2024-01-01T10:00:00Z"))).toDF("event_id", "user_id", "ts")
      val right = Seq((100L, 1L, ts("2024-01-01T09:00:00Z")), (101L, 1L, ts("2024-01-01T11:00:00Z")),
        (102L, 3L, ts("2024-01-01T09:00:00Z"))).toDF("event_id", "user_id", "ts")
      val out = AsOfJoin.join(left, right, "user_id", "ts", "ts", Seq("event_id"), "event_id", "event_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      out(10L) shouldBe Some(100L)
      out(11L) shouldBe Some(101L)
      out(12L) shouldBe None // no right rows for user 2
    }
    it("a right row at exactly the left timestamp counts (at-or-before)") {
      val left = Seq((1L, 1L, ts("2024-01-01T10:00:00Z"))).toDF("event_id", "user_id", "ts")
      val right = Seq((2L, 1L, ts("2024-01-01T10:00:00Z"))).toDF("event_id", "user_id", "ts")
      val out = AsOfJoin.join(left, right, "user_id", "ts", "ts", Seq("event_id"), "event_id", "event_id")
      out.collect()(0).getLong(3) shouldBe 2L
    }

    it("forward as-of attaches the FIRST right row at-or-after each left row") {
      val left = Seq(
        (10L, 1L, ts("2024-01-01T10:00:00Z")),
        (11L, 1L, ts("2024-01-01T12:00:00Z")),
        (12L, 2L, ts("2024-01-01T10:00:00Z"))).toDF("event_id", "user_id", "ts")
      val right = Seq(
        (100L, 1L, ts("2024-01-01T10:00:00Z")), // simultaneous: counts (at-or-after)
        (101L, 1L, ts("2024-01-01T11:00:00Z")),
        (102L, 3L, ts("2024-01-01T13:00:00Z"))).toDF("event_id", "user_id", "ts")
      val out = AsOfJoin.joinForward(left, right, "user_id", "ts", "ts",
        Seq("event_id"), "event_id", "event_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      out(10L) shouldBe Some(100L) // simultaneous right row
      out(11L) shouldBe None // nothing after noon for user 1
      out(12L) shouldBe None // user 2 has no right rows
    }
  }

  describe("SkewJoin") {
    it("saltedJoin produces exactly the plain-join rows") {
      val left = Seq.tabulate(200)(i => (if (i < 150) "hot" else s"k$i", i)).toDF("k", "v")
      val right = Seq(("hot", 1), ("k160", 2), ("k199", 3)).toDF("k", "w")
      val plain = left.join(right, "k").select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
      val salted = graft.operators.SkewJoin.saltedJoin(left, right, "k", buckets = 8)
        .select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
      salted shouldBe plain
    }
    it("skewedAgg matches the direct aggregation") {
      val df = Seq.tabulate(500)(i => (if (i % 3 == 0) 7L else i.toLong % 11, i.toDouble)).toDF("user_id", "value")
      val direct = df.groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val two = graft.operators.SkewJoin.skewedAgg(df, "user_id", 16,
        Seq(F.count(F.lit(1)).as("n"), F.sum("value").as("s")),
        Seq(F.sum("n").as("n"), F.sum("s").as("s")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      two shouldBe direct
    }
    it("hotKeys finds dominant keys") {
      val df = Seq.tabulate(100)(i => (if (i < 60) "hot" else s"k$i", i)).toDF("k", "v")
      val hot = graft.operators.SkewJoin.hotKeys(df, "k", 50).collect()
      hot.map(_.getString(0)) shouldBe Array("hot")
    }
    it("bloomReducedJoin is row-identical to the plain join and prunes the fact pre-shuffle") {
      val fact = Seq.tabulate(5000)(i => (i.toLong % 1000, i)).toDF("k", "v")
      val dim = Seq.tabulate(10)(i => (i.toLong * 97, s"d$i")).toDF("k", "name")
      val plain = fact.join(dim, "k").select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      val reduced = graft.operators.SkewJoin.bloomReducedJoin(fact, dim, "k", 1000L)
        .select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      reduced shouldBe plain
      // The pre-shuffle survivor set is the bloom-filtered fact: tiny vs
      // the full fact for a selective dim (bloom has no false negatives,
      // so survivors ⊇ true matches; with 8 bits/key FPs stay rare).
      val bloomBytes = dim.agg(graft.functions.BloomSupport.bloomAgg(F.col("k"), 1000L, 8000L).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val survivors = fact
        .filter(graft.functions.BloomSupport.mightContain(F.lit(bloomBytes), F.col("k")))
        .count()
      survivors should be >= plain.length.toLong / 5 // at least the matching keys' rows
      survivors should be < 1000L // << 5000 fact rows ever reach the shuffle
    }
  }

  describe("FuzzyJoin") {
    it("editDistance1Pairs equals the brute-force O(n^2) join (blocking is lossless)") {
      // substitution, insertion, deletion, exact dup, and a distance-2
      // decoy that shares a deletion key but must be verified away
      val rows = Seq(
        (1L, "alpha"), (2L, "alpja"), // substitution: d=1
        (3L, "beta"), (4L, "betas"),  // insertion: d=1
        (5L, "gamma"), (6L, "gama"),  // deletion: d=1
        (7L, "delta"), (8L, "delta"), // exact dup: d=0
        (9L, "ab"), (10L, "ac"), (11L, "bc") // ab~ac d=1; ab~bc d=2 (shares key 'b'? no — keys of ab: ab,b,a; bc: bc,c,b -> share 'b')
      ).toDF("id", "name")
      val got = graft.operators.FuzzyJoin.editDistance1Pairs(rows, "id", "name")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val strings = rows.collect().map(r => (r.getLong(0), r.getString(1)))
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        (ia, sa) <- strings; (ib, sb) <- strings
        if ia < ib && lev(sa, sb) <= 1
      } yield (ia, ib, lev(sa, sb).toLong)).sorted
      got shouldBe want
      want.map(p => (p._1, p._2)) should contain allOf ((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L))
      want.map(p => (p._1, p._2)) should not contain ((9L, 11L)) // d=2 decoy verified away
    }

    it("jaccardPrefixJoin equals brute force (the prefix filter is exact, not probabilistic)") {
      val docs = Seq(
        (1L, "aa bb cc dd ee"),
        (2L, "aa bb cc dd ff"), // jac vs 1 = 4/6
        (3L, "aa bb cc dd ee"), // exact dup of 1
        (4L, "aa bb xx yy zz"), // jac vs 1 = 2/8
        (5L, "qq rr ss tt uu")  // disjoint
      ).toDF("doc_id", "text")
      def brute(tauNum: Int, tauDen: Int) = {
        val toks = docs.collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
        (for {
          (ia, ta) <- toks; (ib, tb) <- toks
          if ia < ib
          i = (ta & tb).size; u = (ta | tb).size
          if i * tauDen >= u * tauNum
        } yield (ia, ib, math.rint(i.toDouble / u * 10000) / 10000)).sorted
      }
      for ((n, d) <- Seq((1, 2), (2, 3), (9, 10))) {
        val got = graft.operators.FuzzyJoin.jaccardPrefixJoin(docs, "doc_id", "text", n, d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
        got shouldBe brute(n, d)
      }
    }
  }

  describe("Quantiles.gridQuantiles") {
    import spark.implicits._

    it("estimates sit at most one bucket width above the exact quantile") {
      val rnd = new scala.util.Random(17)
      val rows = (0 until 2000).map(_ => ("g", rnd.nextDouble() * 1000.0)) ++
        (0 until 500).map(_ => ("h", 50.0 + rnd.nextGaussian() * 5.0))
      val df = rows.toDF("grp", "v")
      val buckets = 64
      val got = graft.operators.Quantiles
        .gridQuantiles(df, "v", "grp", buckets, Seq(0.5, 0.95))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      for (g <- Seq("g", "h"); q <- Seq(0.5, 0.95)) {
        val vs = rows.filter(_._1 == g).map(_._2).sorted
        val exact = vs(math.ceil(q * vs.size).toInt - 1)
        val width = (vs.last - vs.head) / buckets
        val est = got((g, q))
        withClue(s"$g q=$q est=$est exact=$exact width=$width: ") {
          est should be >= exact - 1e-4 // upper-edge rule: never below
          est should be <= exact + width + 1e-4
        }
      }
    }

    it("a constant group reports the constant at every q") {
      val df = Seq(("k", 7.5), ("k", 7.5), ("k", 7.5)).toDF("grp", "v")
      graft.operators.Quantiles.gridQuantiles(df, "v", "grp", 16, Seq(0.5, 0.95))
        .collect().map(_.getDouble(2)).toSeq shouldBe Seq(7.5, 7.5)
    }
  }

  describe("IntervalJoin.pointInInterval") {
    import spark.implicits._

    it("matches half-open containment exactly once, across bucket boundaries") {
      // interval [100, 300) spans buckets 1..3 at width 100 — points in
      // all three buckets must each match ONCE; lo inclusive, hi exclusive
      val intervals = Seq((1L, 100L, 300L), (2L, 250L, 260L))
        .toDF("window_id", "lo", "hi")
      val points = Seq(99L, 100L, 150L, 255L, 299L, 300L).toDF("p")
      val got = graft.operators.IntervalJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", bucketWidth = 100L)
        .select("window_id", "p")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      got shouldBe Seq(
        (1L, 100L), (1L, 150L), (1L, 255L), (1L, 299L), // 99 < lo, 300 = hi excluded
        (2L, 255L)).sorted
    }

    it("equals the brute-force inequality join on random data") {
      val rnd = new scala.util.Random(31)
      val intervals = (1L to 40L).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (i, lo, lo + 1 + rnd.nextInt(200).toLong)
      }.toDF("window_id", "lo", "hi")
      val points = (0 until 300).map(_ => rnd.nextInt(1300).toLong).toDF("p")
      val got = graft.operators.IntervalJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", bucketWidth = 64L)
        .select("window_id", "p")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val brute = points.as("p").join(intervals.as("i"),
          F.col("p") >= F.col("lo") && F.col("p") < F.col("hi"))
        .select("window_id", "p")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got shouldBe brute
    }
  }

  describe("IntervalJoin.intervalOverlap") {
    import spark.implicits._

    it("emits each overlapping pair exactly once, including bucket-spanning intervals") {
      // left [100, 450) spans buckets 1..4 at width 100; right [380, 520)
      // spans 3..5 — they share buckets 3 and 4, but must pair ONCE
      // (attributed to div(max(100, 380)) = bucket 3). Touching intervals
      // ([450, 500) starts at left's exclusive hi) must NOT pair.
      val left = Seq((1L, 100L, 450L), (2L, 460L, 470L)).toDF("lid", "lo1", "hi1")
      val right = Seq((10L, 380L, 520L), (11L, 450L, 460L), (12L, 0L, 100L))
        .toDF("rid", "lo2", "hi2")
      val got = graft.operators.IntervalJoin
        .intervalOverlap(left, "lo1", "hi1", right, "lo2", "hi2", bucketWidth = 100L)
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got shouldBe Seq((1L, 10L), (2L, 10L)).sorted
    }

    it("equals the brute-force overlap join on random data (exactly-once, no dedup pass)") {
      val rnd = new scala.util.Random(47)
      val left = (1L to 50L).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (i, lo, lo + 1 + rnd.nextInt(300).toLong) // spans up to ~5 buckets
      }.toDF("lid", "lo1", "hi1")
      val right = (1L to 60L).map { i =>
        val lo = rnd.nextInt(1200).toLong
        (i, lo, lo + 1 + rnd.nextInt(150).toLong)
      }.toDF("rid", "lo2", "hi2")
      val got = graft.operators.IntervalJoin
        .intervalOverlap(left, "lo1", "hi1", right, "lo2", "hi2", bucketWidth = 64L)
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val brute = left.join(right,
          F.col("lo1") < F.col("hi2") && F.col("lo2") < F.col("hi1"))
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got shouldBe brute // sorted Seq equality also proves NO duplicates
    }
  }

  describe("TableStats.skewProfile") {
    def profile(rows: Seq[String]) =
      graft.operators.TableStats.skewProfile(rows.toDF("k"), "k").collect().head

    it("uniform keys score gini exactly 0") {
      val out = profile((1 to 20).flatMap(i => Seq.fill(5)(s"k$i")))
      out.getAs[Long]("n_keys") shouldBe 20L
      out.getAs[Long]("n_rows") shouldBe 100L
      out.getAs[Double]("gini") shouldBe 0.0
      out.getAs[Double]("max_share") shouldBe 0.05
    }

    it("matches the hand-computed two-key case") {
      // counts [1, 3] ranked ascending: G = 2*(1*1 + 2*3)/(2*4) - 3/2 = 0.25
      val out = profile(Seq("a", "b", "b", "b"))
      out.getAs[Double]("gini") shouldBe 0.25
      out.getAs[Double]("max_share") shouldBe 0.75
    }

    it("one dominant key drives gini toward 1 across any partitioning") {
      val rows = (1 to 99).map(i => s"k$i") ++ Seq.fill(9901)("hot")
      val out = graft.operators.TableStats.skewProfile(
        rows.toDF("k").repartition(13), "k").collect().head
      out.getAs[Double]("gini") should be > 0.9
      out.getAs[Double]("max_share") shouldBe 0.9901
    }
  }

  describe("TextAnalysis.zipfFit") {
    it("reads slope ≈ −1 with near-perfect fit on a planted Zipf corpus") {
      // term r appears ⌊2000/r⌋ times → ln(freq) ≈ ln 2000 − ln(rank)
      val words = (1 to 120).flatMap(r => Seq.fill(2000 / r)(f"w$r%04d"))
      val doc = new scala.util.Random(71).shuffle(words).mkString(" ")
      val out = TextAnalysis.zipfFit(Seq(("d1", doc)).toDF("id", "text"), "text", topN = 100)
        .collect().head
      out.getLong(0) shouldBe 100L
      out.getDouble(1) shouldBe -1.0 +- 0.05 // the Zipf signature
      out.getDouble(2) should be < -0.999 // essentially a perfect log-log line
    }

    it("a flat vocabulary has no rank-frequency relation: slope ~0 or NULL") {
      // every term equally frequent → ly constant → r undefined, slope 0
      val doc = (1 to 50).flatMap(r => Seq.fill(10)(s"t$r")).mkString(" ")
      val out = TextAnalysis.zipfFit(Seq(("d1", doc)).toDF("id", "text"), "text", topN = 50)
        .collect().head
      out.getDouble(1) shouldBe 0.0 // ly constant: zero covariance
      out.isNullAt(2) shouldBe true // zero variance in y: r undefined
    }
  }

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  describe("DataShaping privacy gates") {
    import graft.operators.DataShaping

    it("lDiversify keeps only groups with >= l distinct sensitive values") {
      // group A: sensitive {1,1,1,2} (2 distinct); group B: {1,2,3} (3)
      val df = (Seq.fill(3)(("A", 1)) ++ Seq(("A", 2)) ++
        Seq(("B", 1), ("B", 2), ("B", 3))).toDF("q", "s")
      val l3 = DataShaping.lDiversify(df, Seq("q"), "s", 3L)
      l3.select("q").distinct().collect().map(_.getString(0)).toSet shouldBe Set("B")
      // l = 2 keeps both; idempotent
      val l2 = DataShaping.lDiversify(df, Seq("q"), "s", 2L)
      l2.count() shouldBe 7L
      DataShaping.lDiversify(l2, Seq("q"), "s", 2L).count() shouldBe l2.count()
      // a k-anonymous-but-homogeneous group is exactly what it drops
      val homog = Seq.fill(10)(("H", 7)).toDF("q", "s")
      DataShaping.lDiversify(homog, Seq("q"), "s", 2L).count() shouldBe 0L
    }

    it("tCloseness matches the hand total-variation distances, absent values included") {
      // global sensitive dist over 8 rows: v1 x4, v2 x2, v3 x2 -> (.5, .25, .25)
      // group X = {v1 x4}: present |1 - .5| = .5; absent mass .25 + .25 = .5
      //   -> TVD = (.5 + .5)/2 = 0.5
      // group Y = {v2 x2, v3 x2}: |.5-.25| x2 = .5; absent .5 -> TVD = .5
      val df = (Seq.fill(4)(("X", "v1")) ++
        Seq(("Y", "v2"), ("Y", "v2"), ("Y", "v3"), ("Y", "v3"))).toDF("q", "s")
      val out = DataShaping.tCloseness(df, Seq("q"), "s")
        .collect().map(r => r.getString(0) -> r).toMap
      out("X").getAs[Long]("n") shouldBe 4L
      out("X").getAs[Double]("tvd") shouldBe 0.5 +- 1e-9
      out("Y").getAs[Double]("tvd") shouldBe 0.5 +- 1e-9
      // a group mirroring the global distribution is perfectly close
      val uni = (Seq(("P", "a"), ("P", "b"), ("Q", "a"), ("Q", "b"))).toDF("q", "s")
      DataShaping.tCloseness(uni, Seq("q"), "s").collect()
        .foreach(_.getAs[Double]("tvd") shouldBe 0.0)
    }
  }
}
