package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization with EXPLICIT state —
  * `flatMapGroupsWithState` over a per-user session accumulator
  * (SURVEY.md §2.7 "stateful ops"; the batch twin is
  * [[graft.operators.Sessionize]]).
  *
  * State per user is one open session (start, end, count, sum) — O(1), not
  * a buffer of events. A micro-batch's events are sorted locally, folded
  * into the open session, and sessions are CLOSED (emitted) either when a
  * gap appears inside the batch or when the event-time timeout fires
  * (watermark passed session end + gap → no in-order event can extend it).
  * Late events beyond the watermark are dropped by the upstream watermark,
  * matching the batch semantics on in-watermark data.
  */
object StreamingSessions {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(start: Long, end: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long,
                                 sum_value: Double)

  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>

          def close(s: OpenSession): ClosedSession =
            ClosedSession(user, new Timestamp(s.start), new Timestamp(s.end),
              s.n, s.sum)

          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed end+gap: nothing can extend this session.
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.end, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += close(s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
