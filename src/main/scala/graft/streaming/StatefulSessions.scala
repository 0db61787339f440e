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

  /** Close a session after `gapMs` of inactivity (event-time, using the
    * processing-time timeout as the trigger in streaming mode). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs >= gapMs =>
            closed ::= ClosedSession(userId, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach(state.update)
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          closed ::= ClosedSession(userId, new Timestamp(s.start),
            new Timestamp(s.lastTs), s.n, s.sum)
        }
        state.remove()
      }
      closed.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
