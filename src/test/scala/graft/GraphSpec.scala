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
}
