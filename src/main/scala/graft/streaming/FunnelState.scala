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

  /** Current funnel depth per user: 0 = nothing yet, 3 = full conversion. */
  def funnelStages(events: Dataset[FunnelEvent]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[FunnelEvent],
               state: GroupState[(Int, Long)]): FunnelProgress = {
      var (stage, lastTs) = state.getOption.getOrElse((0, Long.MinValue))
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (stage < Stages.length && e.event_type == Stages(stage) &&
            e.ts.getTime > lastTs) {
          stage += 1
          lastTs = e.ts.getTime
        }
      }
      state.update((stage, lastTs))
      FunnelProgress(userId, stage)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
