package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{functions => F}

import graft.operators.Dedup

/** Hot-component skew coverage for connected components (VERDICT r4 #8).
  *
  * A web-crawl near-dup graph routinely has one giant boilerplate cluster;
  * in the contraction rounds that component's hub concentrates on one
  * reducer IF anything shuffles per-edge by the hub's key. Two mechanisms
  * keep it balanced:
  *  - every min-aggregate in the rounds is map-side combinable, so the
  *    hub's 10⁵ rows reduce to one row per map partition BEFORE the
  *    exchange — aggregate skew never reaches a reducer;
  *  - the contraction join (adjacency ⋈ per-node minima) is the one
  *    per-edge shuffle keyed by node id; at production scale that is a
  *    sort-merge join whose hot partition AQE's skew-split carves into
  *    median-sized task slices (spark.sql.adaptive.skewJoin, on by
  *    default).
  *
  * This spec builds ONE 10⁵-edge star component, forces the production
  * join shape (broadcasts off, AQE skew thresholds scaled to the fixture's
  * MB scale the way the 256 MB defaults act at cluster scale), and asserts
  * from the task event log that no task read more than 4× the median
  * shuffle-read records of its stage — i.e. the hub did NOT become a
  * straggler. */
class SkewCcSpec extends SparkSpec {

  it("a 1e5-edge star component completes with no task reading >4x its stage's median") {
    val n = 100000L
    val pairs = spark.range(1L, n + 1).select(F.lit(0L).as("a"), F.col("id").as("b"))
    val nodes = spark.range(0L, n + 1).select(F.col("id").as("node"))

    // per-(stage, task) shuffle-read record counts from the event log
    val stageTasks = TrieMap.empty[Int, Vector[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && te.taskInfo != null && te.taskInfo.successful) {
          val rec = m.shuffleReadMetrics.recordsRead
          stageTasks.updateWith(te.stageId)(v => Some(v.getOrElse(Vector.empty) :+ rec))
        }
      }
    }

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    // production join shape at fixture scale: no broadcasts (at 10⁹ nodes
    // the minima table cannot broadcast), skew thresholds scaled from
    // 256 MB to the fixture's MBs so the split logic actually engages
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    spark.sparkContext.addSparkListener(listener)
    val labels =
      try {
        val out = Dedup.connectedComponentsStar(pairs, nodes)
          .agg(F.count(F.lit(1)).as("n"),
            F.sum(F.when(F.col("label") =!= 0L, 1L).otherwise(0L)).as("wrong"))
          .collect()(0)
        // let straggling task-end events drain
        var (prev, tries) = (-1, 0)
        while (stageTasks.values.map(_.size).sum != prev && tries < 50) {
          prev = stageTasks.values.map(_.size).sum; Thread.sleep(100); tries += 1
        }
        out
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        saved.foreach {
          case (k, Some(v)) => conf.set(k, v)
          case (k, None)    => conf.unset(k)
        }
      }

    // correctness: every node labelled with the hub component's minimum
    labels.getLong(0) shouldBe n + 1
    labels.getLong(1) shouldBe 0L

    // skew evidence: in every stage that read a meaningful share of the
    // star's edges over >1 task, the biggest task stayed within 4x the
    // stage median — the hub partition was split, not serialized
    val heavy = stageTasks.toSeq.filter { case (_, recs) =>
      recs.size > 1 && recs.sum >= n / 2
    }
    heavy should not be empty
    heavy.foreach { case (stageId, recs) =>
      val sorted = recs.sorted
      val median = math.max(1L, sorted(sorted.size / 2))
      val ratio = sorted.last.toDouble / median.toDouble
      info(f"stage $stageId: ${recs.size} tasks, max/median shuffle-read = $ratio%.2f " +
        s"(max ${sorted.last}, median $median)")
      ratio should be <= 4.0
    }
  }
}
