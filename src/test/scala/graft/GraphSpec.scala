package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Graph

/** Weighted PageRank as iterative co-partitioned joins. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def symmetrize(e: Seq[(String, String, Double)]) =
    (e ++ e.map { case (a, b, w) => (b, a, w) }).toDF("src", "dst", "w")

  it("ranks a star's hub above its leaves, with equal-rank leaves") {
    val star = symmetrize((1 to 8).map(i => ("hub", s"leaf$i", 1.0)))
    val out = Graph.pageRank(star, damping = 0.85, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val leaves = (1 to 8).map(i => out(s"leaf$i"))
    leaves.distinct.size shouldBe 1
    out("hub") should be > leaves.head * 4
  }

  it("conserves rank mass on a symmetrized graph (no dangling nodes)") {
    val e = symmetrize(Seq(("a", "b", 2.0), ("b", "c", 1.0), ("c", "d", 3.0), ("d", "a", 1.0),
      ("a", "c", 1.0)))
    val total = Graph.pageRank(e, damping = 0.85, iters = 5)
      .agg(F.sum("pagerank")).head.getDouble(0)
    total shouldBe (1.0 +- 1e-4)
  }

  it("is deterministic across runs (snapped iterations)") {
    val e = symmetrize((1 to 40).map(i => (s"n${i % 7}", s"n${i % 11}", (i % 3 + 1).toDouble))
      .filter { case (a, b, _) => a != b })
    val r1 = Graph.pageRank(e, iters = 5).collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    val r2 = Graph.pageRank(e, iters = 5).collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    r1 shouldBe r2
  }

  it("leaves dangling-free directed chains with higher rank downstream") {
    // a -> b -> c -> a cycle plus an off-ramp a -> d -> a keeps all nodes
    // out-degreed; more in-weight means more rank
    val e = Seq(("a", "b", 3.0), ("b", "c", 1.0), ("c", "a", 1.0),
      ("a", "d", 1.0), ("d", "a", 1.0)).toDF("src", "dst", "w")
    val out = Graph.pageRank(e, damping = 0.85, iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("b") should be > out("d") // b receives 3/4 of a's mass, d only 1/4
  }

  private def triangles(e: Seq[(String, String)]): Map[String, Long] =
    Graph.triangleCount(e.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  it("counts K4's four triangles, three per node") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    triangles(k4) shouldBe Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L)
  }

  it("counts a diagonal-split square: two triangles sharing the diagonal") {
    // square a-b-c-d with diagonal a-c: triangles {a,b,c} and {a,c,d}
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
    triangles(e) shouldBe Map("a" -> 2L, "c" -> 2L, "b" -> 1L, "d" -> 1L)
  }

  it("ignores duplicate edges, reversed duplicates, and self-loops") {
    val e = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "a"), ("x", "y")) // one triangle; x-y closes nothing
    triangles(e) shouldBe Map("a" -> 1L, "b" -> 1L, "c" -> 1L)
  }

  it("a triangle-free bipartite graph reports no nodes") {
    val e = Seq(("u1", "v1"), ("u1", "v2"), ("u2", "v1"), ("u2", "v2"))
    triangles(e) shouldBe Map.empty
  }

  // ---- labelPropagation ---------------------------------------------

  private def lpa(e: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(e.toDF("a", "b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference synchronous LPA: neighbors only, most frequent label,
    * min-label tiebreak — the operator's contract, restated naively. */
  private def lpaRef(e: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = (e ++ e.map(_.swap)).filter(p => p._1 != p._2).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).view.mapValues(_.size).toMap
        n -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    labels
  }

  it("K4 collapses to the minimum id's community in two rounds") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    lpa(k4, 2).values.toSet shouldBe Set(1L)
  }

  it("matches the reference trajectory on a random graph, any iters") {
    val r = new scala.util.Random(11)
    val e = Seq.fill(60)((r.nextInt(20).toLong, r.nextInt(20).toLong))
      .filter(p => p._1 != p._2)
    (1 to 4).foreach { iters =>
      lpa(e, iters) shouldBe lpaRef(e, iters)
    }
  }

  it("two cliques joined by a bridge keep two communities") {
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val out = lpa(c1 ++ c2 :+ ((4L, 11L)), 3)
    out shouldBe lpaRef(c1 ++ c2 :+ ((4L, 11L)), 3)
    (1L to 4L).map(out).toSet.size shouldBe 1
    (11L to 14L).map(out).toSet.size shouldBe 1
    out(1L) should not be out(12L)
  }

  it("ignores orientation, duplicate edges, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
    lpa(messy, 2) shouldBe lpaRef(Seq((1L, 2L), (2L, 3L)), 2)
  }

  // ---- hopDistances -------------------------------------------------

  private def hops(e: Seq[(Long, Long)], src: Seq[Long], maxHops: Int): Map[Long, Long] =
    Graph.hopDistances(e.toDF("src", "dst"), src.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  it("settles every node at its true BFS depth on a directed chain") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    hops(chain, Seq(1L), maxHops = 3) shouldBe
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L) // 5, 6 beyond the bound
  }

  it("multi-source: each node takes the NEAREST seed, shortcuts win") {
    // 1→2→3→4 plus shortcut 9→4: node 4 is 1 hop from seed 9, not 3 from seed 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 4L))
    hops(e, Seq(1L, 9L), maxHops = 3) shouldBe
      Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L)
  }

  it("direction matters, cycles terminate, revisits keep the first depth") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    hops(cycle, Seq(1L), maxHops = 10) shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
    hops(cycle.map(_.swap), Seq(1L), maxHops = 10) shouldBe
      Map(1L -> 0L, 3L -> 1L, 2L -> 2L)
  }

  it("a seed outside the graph reports itself at 0 and reaches nothing") {
    hops(Seq((1L, 2L)), Seq(42L), maxHops = 2) shouldBe Map(42L -> 0L)
  }

  // ---- personalizedPageRank -----------------------------------------

  it("PPR with ALL nodes as seeds degenerates to global PageRank exactly") {
    val e = symmetrize(Seq(("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0), ("c", "d", 1.0)))
    val seeds = Seq("a", "b", "c", "d").toDF("id")
    val ppr = Graph.personalizedPageRank(e, seeds, damping = 0.85, iters = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pr = Graph.pageRank(e, damping = 0.85, iters = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ppr shouldBe pr // identical teleport vector => identical snapped trajectory
  }

  it("PPR mass decays with distance from the seed along a directed chain") {
    val chain = Seq(("n1", "n2", 1.0), ("n2", "n3", 1.0), ("n3", "n4", 1.0), ("n4", "n5", 1.0))
      .toDF("src", "dst", "w")
    val out = Graph.personalizedPageRank(chain, Seq("n1").toDF("id"), iters = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("n1") should be > out("n2")
    out("n2") should be > out("n3")
    out("n3") should be > out("n4")
  }

  it("nodes unreachable from the seeds hold zero rank") {
    val e = Seq(("s", "x", 1.0), ("y", "z", 1.0)).toDF("src", "dst", "w")
    val out = Graph.personalizedPageRank(e, Seq("s").toDF("id"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("y") shouldBe 0.0
    out("z") shouldBe 0.0
    out("s") should be > 0.0
    out("x") should be > 0.0
  }
}
