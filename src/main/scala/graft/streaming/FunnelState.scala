package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of the a17 batch funnel: a per-user stage machine
  * over `flatMapGroupsWithState` that advances view → click → purchase with
  * the same strictly-after event-time semantics as the batch query's
  * conditional-min windows. Emits the user's current stage depth after
  * every update (Update output mode).
  *
  * Cross-batch out-of-order arrivals are handled by BUFFERING: events are
  * held in state until the watermark passes their timestamp (no
  * still-admissible event can then precede them), and only then folded into
  * the committed stage machine in event-time order. Each batch still emits a
  * SPECULATIVE depth — committed machine plus buffered events applied in
  * sorted order — so emissions reflect everything seen so far; because the
  * greedy machine over a sorted event set equals the batch min-chain
  * (t1 = min view, t2 = min click > t1, ...), the speculative depth is
  * monotone in the event set and the latest emission per user equals the
  * batch answer once all events arrive. State per user is the committed
  * (stage, lastAdvanceTs) pair plus the events inside the watermark lag —
  * bounded by the watermark delay, not event volume.
  */
object FunnelState extends Serializable {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  case class FunnelProgress(user_id: Long, stage: Int)

  /** A buffered event: epoch-ms timestamp + type. */
  case class PendingEvent(ts: Long, kind: String)

  /** Per-user state: committed machine + events awaiting the watermark. */
  case class FunnelBuffer(stage: Int, lastTs: Long, maxSeen: Long,
                          pending: List[PendingEvent])

  private val Stages = Array("view", "click", "purchase")

  /** Greedy advance of the stage machine over `evs` in event-time order;
    * equivalent to the batch conditional-min chain (strict `>` gating makes
    * same-timestamp tie order irrelevant: exactly one type can fire per
    * stage and a fired stage blocks same-ts successors). */
  private def advance(stage0: Int, last0: Long,
                      evs: Seq[PendingEvent]): (Int, Long) = {
    var stage = stage0
    var last = last0
    evs.sortBy(e => (e.ts, e.kind)).foreach { e =>
      if (stage < Stages.length && e.kind == Stages(stage) && e.ts > last) {
        stage += 1
        last = e.ts
      }
    }
    (stage, last)
  }

  /** Current funnel depth per user: 0 = nothing yet, 3 = full conversion.
    *
    * `conversionWindowMs` bounds how long a user's funnel stays open: when
    * the WATERMARK passes the user's last activity + window, the state times
    * out, any still-buffered events are folded in, the final depth is
    * emitted once more, and the store entry is RELEASED. The timeout is
    * armed from the max event time SEEN (not just the last stage advance),
    * so a user whose events never start the funnel — stage stuck at 0 —
    * still times out instead of leaking a store entry forever. Without the
    * timeout the state store grows monotonically with every user ever seen;
    * with it, store size tracks users active within the window. Pass `0` to
    * keep state forever (tests, bounded replays) — that mode has no
    * watermark, so events apply eagerly with only within-batch ordering
    * (the pre-buffering behavior). Event-time (not processing-time) timers
    * keep the query data-driven, so `processAllAvailable` terminates
    * deterministically. */
  def funnelStages(events: Dataset[FunnelEvent],
                   conversionWindowMs: Long = 0L,
                   watermarkDelay: String = "0 seconds"): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowed = conversionWindowMs > 0

    def update(userId: Long, rows: Iterator[FunnelEvent],
               state: GroupState[FunnelBuffer]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) {
        // conversion window closed: fold any still-buffered events into the
        // committed machine, emit the final depth, release the entry
        val s = state.get
        val (stage, _) = advance(s.stage, s.lastTs, s.pending)
        state.remove()
        return Iterator.single(FunnelProgress(userId, stage))
      }
      val prev = state.getOption
        .getOrElse(FunnelBuffer(0, Long.MinValue, Long.MinValue, Nil))
      val incoming = rows.map(e => PendingEvent(e.ts.getTime, e.event_type)).toList
      val maxSeen = (prev.maxSeen :: incoming.map(_.ts)).max
      val all = prev.pending ++ incoming
      if (!windowed) {
        val (stage, last) = advance(prev.stage, prev.lastTs, all)
        state.update(FunnelBuffer(stage, last, maxSeen, Nil))
        Iterator.single(FunnelProgress(userId, stage))
      } else {
        // commit only events the watermark has passed — nothing that could
        // still be reordered by a later batch (later events below the
        // watermark are dropped by the engine before reaching this group)
        val wm = state.getCurrentWatermarkMs()
        val (ripe, hold) = all.partition(_.ts <= wm)
        val (stage, last) = advance(prev.stage, prev.lastTs, ripe)
        state.update(FunnelBuffer(stage, last, maxSeen, hold))
        // armed from max(lastAdvance, maxSeen): stage-0 users time out too;
        // clamped above the current watermark (a fully-late batch could
        // otherwise arm a timer in the past, which the engine rejects)
        val base = math.max(last, maxSeen) + conversionWindowMs
        state.setTimeoutTimestamp(math.max(base, wm + 1))
        val (specStage, _) = advance(stage, last, hold)
        Iterator.single(FunnelProgress(userId, specStage))
      }
    }

    val timeout = if (windowed) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout
    val src = if (windowed) events.withWatermark("ts", watermarkDelay)
              else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(update)
  }
}
