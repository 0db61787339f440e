package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization over `flatMapGroupsWithState` — the
  * engine's general-purpose state machine for streams (SURVEY.md §2.9:
  * the reference's incremental tracker/allocation patterns lifted onto
  * Structured Streaming state).
  *
  * Unlike `session_window()` (which only aggregates), this emits one
  * closed-session row with arbitrary derived fields the moment the gap
  * passes, and its state is explicit — the shape to extend for
  * de-bounced trackers, allocation queues, or online dedup.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)

  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Close a session after `gapMs` of inactivity — in-stream when a later
    * event arrives past the gap, and via an EVENT-TIME timeout (fired when
    * the watermark passes lastTs + gap) for the final session of a user who
    * goes silent. Without the timeout that session would never be emitted
    * and its state never released; event-time (rather than processing-time)
    * timers keep the query data-driven, so batch tests and
    * `processAllAvailable` terminate deterministically. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def close(userId: Long, s: SessionState): ClosedSession =
      ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.n, s.sum)

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        // user went silent past the gap: flush and release the state
        val last = state.getOption.map(close(userId, _))
        state.remove()
        last.iterator
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[ClosedSession]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs >= gapMs =>
              closed ::= close(userId, s)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
