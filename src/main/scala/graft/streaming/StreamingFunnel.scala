package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.funnel]]: the per-user
  * ordered-funnel state machine as `flatMapGroupsWithState`. State is one
  * tiny vector per user — the earliest qualifying timestamp of each
  * reached stage — and each micro-batch advances it with the batch
  * operator's exact semantics (stage k counts only strictly after the
  * user's stage-k-1 time; the earliest qualifying event anchors). A user
  * emits a row whenever their reached stage ADVANCES, so downstream
  * aggregation of the latest row per user equals the batch funnel
  * (FunnelStateSpec proves replay equivalence on in-order streams — the
  * [[StreamingSessionize]] contract; late data would add a watermark +
  * reorder buffer on the same state shape).
  *
  * Scale: state is `stages.length` longs per user, partitioned by user;
  * per-batch work is the shuffle plus an O(events-per-user) scan. */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  final case class FunnelProgress(user_id: Long, stage_idx: Int, stage_ts_us: Long)
  final case class FunnelState(times: Seq[Long]) // -1 = stage not reached

  def track(ds: Dataset[FunnelEvent], stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    implicit val outEnc = Encoders.product[FunnelProgress]
    implicit val stEnc = Encoders.product[FunnelState]
    val k = stages.length
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(k)(-1L))
          val before = times.clone()
          // in-order scan: earliest qualifying event anchors each stage
          events.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            val i = stages.indexOf(e.event_type)
            if (i == 0) {
              if (times(0) == -1L) times(0) = e.ts_us
            } else if (i > 0) {
              if (times(i) == -1L && times(i - 1) != -1L && e.ts_us > times(i - 1))
                times(i) = e.ts_us
            }
          }
          val advanced = (0 until k).filter(i => times(i) != before(i))
          if (advanced.nonEmpty) state.update(FunnelState(times.toSeq))
          advanced.iterator.map(i => FunnelProgress(user, i + 1, times(i)))
      }
  }
}
