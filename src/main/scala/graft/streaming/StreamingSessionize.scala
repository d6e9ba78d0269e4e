package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize]]: gap-based session
  * assignment as `flatMapGroupsWithState` — the per-user session counter
  * lives in engine-checkpointed state instead of a window pass, so
  * assignments stream out per micro-batch with identical semantics to the
  * batch operator (proven by SessionStateSpec's replay equivalence).
  *
  * Within a micro-batch a group's events are sorted by (ts, event_id) —
  * the batch operator's exact order — before the gap scan; across batches
  * the state carries (current index, last event time). Like any
  * non-watermarked stateful op this assumes in-order arrival across
  * batches (the replay case); handling late data would add a watermark +
  * reorder buffer on top of the same state shape.
  *
  * Scale: state is one (long, long) pair per user, partitioned by the
  * grouping key; per-batch work is the shuffle plus an O(events-per-user)
  * scan — the same distribution profile as the batch window pass. */
object StreamingSessionize {

  final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessionAssignment(user_id: Long, event_id: Long, session_idx: Long)
  final case class SessionState(idx: Long, lastUs: Long)

  def assign(ds: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionAssignment] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[SessionAssignment]
    implicit val stEnc = Encoders.product[SessionState]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionAssignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var (idx, last) = state.getOption
            .map(s => (s.idx, s.lastUs)).getOrElse((0L, Long.MinValue))
          val out = sorted.map { e =>
            if (last != Long.MinValue && e.ts_us - last > gapUs) idx += 1
            last = e.ts_us
            SessionAssignment(user, e.event_id, idx)
          }
          if (sorted.nonEmpty) state.update(SessionState(idx, last))
          out.iterator
      }
  }
}
