package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `mapGroupsWithState` (SURVEY §1.3's
  * "KeyValueGroupedDataset custom state" surface): a per-key running
  * counter that survives across micro-batches — the minimal shape of any
  * stateful enrichment (session counters, per-tenant quotas, dedup TTLs).
  * State is partitioned by key and checkpointed by the engine; scale-out
  * is the shuffle on the grouping key. */
object StatefulCounts {

  final case class KeyedEvent(key: Long, value: Double)
  final case class RunningCount(key: Long, total: Long, sum: Double)

  def userRunningCounts(ds: Dataset[KeyedEvent]): Dataset[RunningCount] = {
    implicit val rcEnc = Encoders.product[RunningCount]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[RunningCount, RunningCount](GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[KeyedEvent], state: GroupState[RunningCount]) =>
          val prev = state.getOption.getOrElse(RunningCount(key, 0L, 0.0))
          var n = prev.total
          var s = prev.sum
          events.foreach { e => n += 1; s += e.value }
          val next = RunningCount(key, n, s)
          state.update(next)
          next
      }
  }
}
