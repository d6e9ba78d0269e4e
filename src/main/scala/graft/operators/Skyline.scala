package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, functions => F}

/** Pareto skyline (dominance filter): the rows no other row beats on
  * every criterion at once — multi-objective selection (cheapest-and-
  * largest parts, highest-quality-and-least-duplicated documents) as one
  * operator instead of a hand-rolled quadratic NOT EXISTS.
  *
  * Row q dominates p iff q is at least as good on EVERY dim and strictly
  * better on at least one ("good" per-dim direction). Exact ties on all
  * dims never dominate, so duplicate optima all survive — matching the
  * NOT EXISTS mirror clause for clause.
  *
  * Plan — the standard distributed skyline (Börzsönyi/Kossmann/Stocker,
  * "The Skyline Operator", ICDE 2001, block-nested-loop local phase;
  * skylines are closed under union, so local-then-global is exact):
  *   1. PIVOT PREFILTER: one aggregate row of per-dim extremes → every
  *      row scored by its summed normalized distance from ideal → the
  *      best single row (orderBy+limit(1) = TakeOrderedAndProject) is
  *      broadcast and everything it strictly dominates is cut. One
  *      codegen'd scan that removes the bulk of 100 TB before any
  *      quadratic work — the skyline itself always survives (a skyline
  *      row is dominated by NO row, the pivot included).
  *   2. LOCAL skyline per partition: in-memory BNL, window bounded by
  *      the partition's own skyline size (small for independent or
  *      correlated dims; the documented worst case — perfectly
  *      anti-correlated data — is a skyline-sized OUTPUT, which no
  *      algorithm compresses).
  *   3. GLOBAL skyline: the unioned local skylines collapse onto one
  *      partition for a final BNL — safe because step 2 already reduced
  *      each partition to its nondominated set.
  * The per-partition imperative loop is genuine per-partition logic (a
  * dominance window has no relational form that isn't the quadratic
  * self-join), the one place mapPartitions is the right tool. */
object Skyline {

  /** `dims`: (column name, maximize?) — false = smaller is better.
    * Dim columns must be numeric and non-null. Returns input rows (input
    * schema preserved) forming the skyline. */
  def skyline(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "at least one dimension")
    val inCols = df.columns.toSeq
    val d = dims.size
    // direction-normalized dim columns up front: after this, EVERY dim is
    // minimized and the row comparator is sign-free
    val dimCols = dims.map { case (c, maximize) =>
      val base = F.col(c).cast("double")
      if (maximize) -base else base
    }
    val prepared = df.select(
      dimCols.zipWithIndex.map { case (c, i) => c.as(s"__d$i") } ++
        inCols.map(F.col): _*)

    // ---- 1. pivot prefilter ------------------------------------------
    val aggCols = (0 until d).flatMap(i =>
      Seq(F.min(F.col(s"__d$i")).as(s"__lo$i"), F.max(F.col(s"__d$i")).as(s"__hi$i")))
    val extremes = prepared.agg(aggCols.head, aggCols.tail: _*)
    val score = (0 until d).map { i =>
      val span = F.col(s"__hi$i") - F.col(s"__lo$i")
      F.when(span === 0.0, F.lit(0.0))
        .otherwise((F.col(s"__d$i") - F.col(s"__lo$i")) / span)
    }.reduce(_ + _)
    val scored = prepared.crossJoin(F.broadcast(extremes))
    val pivot = scored.orderBy(score.asc).limit(1)
      .select((0 until d).map(i => F.col(s"__d$i").as(s"__p$i")): _*)
    // keep rows NOT strictly dominated by the pivot (<= on all dims AND
    // < on at least one); the pivot row itself survives (all ties)
    val dominatedByPivot =
      (0 until d).map(i => F.col(s"__p$i") <= F.col(s"__d$i")).reduce(_ && _) &&
        (0 until d).map(i => F.col(s"__p$i") < F.col(s"__d$i")).reduce(_ || _)
    val pruned = prepared.crossJoin(F.broadcast(pivot)).filter(!dominatedByPivot)
      .select(prepared.columns.map(F.col).toSeq: _*)

    // ---- 2 + 3. local then global BNL skyline ------------------------
    val enc = Encoders.row(pruned.schema)
    val local = pruned.mapPartitions(it => bnl(it, d))(enc)
    val global = local.coalesce(1).mapPartitions(it => bnl(it, d))(enc)
    global.select(inCols.map(F.col): _*)
  }

  /** Block-nested-loop skyline over rows whose first `d` fields are the
    * minimized double dims. */
  private def bnl(it: Iterator[Row], d: Int): Iterator[Row] = {
    val window = ArrayBuffer.empty[(Array[Double], Row)]
    while (it.hasNext) {
      val row = it.next()
      val v = Array.tabulate(d)(row.getDouble)
      var dominated = false
      var i = 0
      while (i < window.length && !dominated) {
        if (dominates(window(i)._1, v, d)) dominated = true
        else if (dominates(v, window(i)._1, d)) {
          // drop the dominated incumbent: swap-with-last, stay in place
          window(i) = window.last
          window.remove(window.length - 1)
          i -= 1 // re-examine the swapped-in entry
        }
        i += 1
      }
      if (!dominated) window += ((v, row))
    }
    window.iterator.map(_._2)
  }

  /** a dominates b: a ≤ b on all dims, a < b on ≥ 1 (all minimized). */
  private def dominates(a: Array[Double], b: Array[Double], d: Int): Boolean = {
    var strict = false
    var i = 0
    while (i < d) {
      if (a(i) > b(i)) return false
      if (a(i) < b(i)) strict = true
      i += 1
    }
    strict
  }
}
