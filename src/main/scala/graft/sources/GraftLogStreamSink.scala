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

/** The V2 form of the sink — what `df.writeStream.toTable("graft.ns.t")`
  * (and any `STREAMING_WRITE`-capable route) plans: executor tasks write
  * each epoch's parquet files straight into the table dir through the
  * same per-task writer the row-level DML path uses (invisible until
  * committed), and the driver lands ONE txn-marked commit per epoch
  * ([[CommitLog.txnCommitFiles]]). The transaction identity follows the
  * V1 sink's convention exactly — `txnAppId` option, else the
  * `checkpointLocation` (stable across restarts of one query, distinct
  * between queries), marker `<identity>:<epochId>` — so V1- and
  * V2-written logs are mutually replay-safe. A crash-replayed epoch is
  * recognized in the log, commits nothing, and its re-staged files are
  * deleted as garbage: exactly-once, end to end, with no rows moving
  * through the driver. `OutputMode.Complete` maps to an atomic
  * whole-snapshot replacement in the same commit (and, unlike the V1
  * path's plain overwrite, is ALSO replay-skipped via the marker). */
private[sources] final class GraftLogStreamingWrite(
    table: String, txnPrefix: String, complete: Boolean,
    schema: org.apache.spark.sql.types.StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val kit = org.apache.spark.sql.GraftSqlShim.parquetWriteKit(
    org.apache.spark.sql.SparkSession.active,
    graft.io.CommitLog.physicalizeNames(table, schema)) // physical names for renamed columns

  // per-row write invariants at stream START (CHECK constraints + NOT
  // NULL columns; logical names, bound by position): every epoch's rows
  // validate executor-side, so a streaming ingest cannot land rows a
  // batch append would refuse
  private val checks = graft.io.CommitLog.rowCheckSpecs(table).map {
    case (n, e) => (n, org.apache.spark.sql.GraftSqlShim.rowCheck(
      org.apache.spark.sql.SparkSession.active, schema, e))
  }

  private def txnId(epochId: Long) = s"$txnPrefix:$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftLogStreamingWriterFactory(new GraftParquetWriterFactory(table, kit, checks))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.toSeq.collect { case GraftFilesMessage(fs) => fs }.flatten
    if (CommitLog.txnCommitFiles(table, added, txnId(epochId), replace = complete).isEmpty) {
      // a recognized replay: the epoch already committed, so this
      // attempt's re-staged files are unreferenced garbage — reclaim now
      added.foreach(f =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(table, f)))
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case GraftFilesMessage(fs) => fs }.flatten
      .foreach(f =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(table, f)))

  override def toString: String =
    s"GraftLogStreamingWrite[$table, ${if (complete) "complete" else "append"}]"
}

/** Ships to executors (must not capture the driver-side write object):
  * epoch-agnostic — file uniqueness comes from the per-attempt names, and
  * epoch identity lives in the driver's txn-marked commit. */
private[sources] final case class GraftLogStreamingWriterFactory(
    delegate: GraftParquetWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    delegate.createWriter(partitionId, taskId)
}
