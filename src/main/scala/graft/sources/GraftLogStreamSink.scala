package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink

import graft.io.CommitLog

/** Structured-Streaming SINK over the transactional commit log — the
  * write-side counterpart of [[GraftLogStreamSource]], so log → transform
  * → log pipelines compose without a hand-written `foreachBatch`:
  *
  * {{{
  *   events.writeStream.format("graftlog")
  *     .option("checkpointLocation", ckpt)
  *     .start(table)
  * }}}
  *
  * Exactly-once: each micro-batch lands as ONE `txnAppend` commit whose
  * transaction marker is `<queryIdentity>:<batchId>` — committed
  * atomically WITH the data, so a batch replayed after a crash (the
  * engine re-runs any batch whose offsets were logged but whose commit
  * wasn't) is recognized in the log and skipped, never appended twice
  * (the public Delta sink's idempotence contract; same shape as
  * [[CommitLog.streamingBatchWriter]], which remains the `foreachBatch`
  * form). The query identity defaults to the `checkpointLocation` —
  * stable across restarts of the same query, distinct between different
  * queries appending to one table — and can be pinned explicitly with
  * `option("txnAppId", ...)` (e.g. when a checkpoint directory must be
  * rebuilt without re-ingesting history).
  *
  * `OutputMode.Complete` maps to [[CommitLog.overwrite]]: each batch
  * REPLACES the snapshot in one atomic commit (the natural log form of a
  * complete-mode aggregation result — readers see one result set or the
  * next, never a mix, and every prior result stays time-travelable).
  * Replayed Complete batches are naturally idempotent — overwriting with
  * the same content — so no txn marker is needed there. Update mode is
  * refused: the log is append/replace-only by design.
  */
class GraftLogStreamSink(path: String, txnPrefix: String, complete: Boolean)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands addBatch a frame still FLAGGED streaming (batch
    // writes refuse it); re-flag the same rows as a plain batch frame —
    // the sink-side idiom Spark's own sinks use
    val batch = org.apache.spark.sql.GraftSqlShim.asBatchFrame(data)
    if (complete) { CommitLog.overwrite(batch, path); () }
    else { CommitLog.txnAppend(batch, path, s"$txnPrefix:$batchId"); () }
  }

  override def toString: String =
    s"GraftLogSink[$path, ${if (complete) "complete" else "append"}]"
}
