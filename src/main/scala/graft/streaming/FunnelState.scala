package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming counterpart of the a17 batch funnel: a per-user stage machine
  * over `mapGroupsWithState` that advances view → click → purchase with the
  * same strictly-after event-time semantics as the batch query's
  * conditional-min windows. Emits the user's current stage depth after
  * every update (Update output mode); state is one (stage, lastAdvanceTs)
  * pair per user, so the store grows with user cardinality, not event
  * volume, and partitions evenly by user_id.
  *
  * Out-of-order arrivals WITHIN a micro-batch are handled by event-time
  * sorting inside the group update; arrivals that cross micro-batches out
  * of order are the documented streaming-vs-batch gap (the batch windows
  * see all history, a stream cannot advance on an event older than its
  * last transition) — the spec pins agreement on in-order feeds.
  */
object FunnelState {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  case class FunnelProgress(user_id: Long, stage: Int)

  private val Stages = Array("view", "click", "purchase")

  /** Current funnel depth per user: 0 = nothing yet, 3 = full conversion.
    *
    * `conversionWindowMs` bounds how long a user's funnel stays open: when
    * the WATERMARK passes lastAdvance + window, the state times out, the
    * final depth is emitted once more, and the store entry is RELEASED.
    * Without the timeout the state store grows monotonically with every
    * user ever seen — the unbounded-state bug every long-running stateful
    * stream eventually hits; with it, store size tracks users active
    * within the window. Pass `0` to keep state forever (tests, bounded
    * replays). Event-time (not processing-time) timers keep the query
    * data-driven, so `processAllAvailable` terminates deterministically. */
  def funnelStages(events: Dataset[FunnelEvent],
                   conversionWindowMs: Long = 0L,
                   watermarkDelay: String = "0 seconds"): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[FunnelEvent],
               state: GroupState[(Int, Long)]): FunnelProgress = {
      if (state.hasTimedOut) {
        val stage = state.getOption.map(_._1).getOrElse(0)
        state.remove()
        return FunnelProgress(userId, stage)
      }
      var (stage, lastTs) = state.getOption.getOrElse((0, Long.MinValue))
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (stage < Stages.length && e.event_type == Stages(stage) &&
            e.ts.getTime > lastTs) {
          stage += 1
          lastTs = e.ts.getTime
        }
      }
      state.update((stage, lastTs))
      if (conversionWindowMs > 0 && lastTs != Long.MinValue)
        state.setTimeoutTimestamp(lastTs + conversionWindowMs)
      FunnelProgress(userId, stage)
    }

    val timeout = if (conversionWindowMs > 0) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout
    val src = if (conversionWindowMs > 0) events.withWatermark("ts", watermarkDelay)
              else events
    src.groupByKey(_.user_id)
      .mapGroupsWithState(timeout)(update)
  }
}
