package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.io.CommitLog

/** Table-maintenance stored procedures for the `graft` catalog — the
  * lifecycle operations every long-lived table format needs, reachable
  * from SQL (`ProcedureCatalog`, the connector surface behind Iceberg's
  * `CALL` procedures; the Delta analogues are OPTIMIZE / VACUUM /
  * DESCRIBE HISTORY):
  *
  * {{{
  *   CALL graft.system.compact(`table` => 'ns.t', target_files => 2)
  *   CALL graft.system.vacuum('ns.t')      -- reclaim unreferenced files
  *   CALL graft.system.checkpoint('ns.t')  -- roll a log checkpoint + expire
  *   CALL graft.system.history('ns.t')     -- the commit log as a result set
  * }}}
  *
  * Each is a thin SQL binding over the corresponding transactional
  * [[graft.io.CommitLog]] operation, so the ACID/time-travel contract is
  * unchanged: compaction is one conflict-checked rewrite commit readers
  * never see half of; vacuum deletes only files no retained version
  * references; checkpoint + expire keeps snapshot reads O(tail) on a
  * months-running ingest table. Results come back as rows (a driver-side
  * `LocalScan`): the landed version, counts, or the history itself. */
private[sources] object GraftProcedures {

  /** All procedures live in the `system` namespace. */
  val Namespace: Array[String] = Array("system")

  def names: Seq[String] =
    Seq("cluster", "compact", "vacuum", "checkpoint", "history", "purge",
      "zorder", "ingest", "enable_dv", "add_constraint", "drop_constraint",
      "set_not_null", "drop_not_null", "update_mor", "merge_mor", "restore")

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "cluster"    => Some(new ClusterProc(catalog))
      case "compact"    => Some(new CompactProc(catalog))
      case "vacuum"     => Some(new VacuumProc(catalog))
      case "checkpoint" => Some(new CheckpointProc(catalog))
      case "history"    => Some(new HistoryProc(catalog))
      case "purge"      => Some(new PurgeProc(catalog))
      case "zorder"     => Some(new ZOrderProc(catalog))
      case "ingest"     => Some(new IngestProc(catalog))
      case "enable_dv"  => Some(new EnableDvProc(catalog))
      case "add_constraint"  => Some(new AddConstraintProc(catalog))
      case "drop_constraint" => Some(new DropConstraintProc(catalog))
      case "set_not_null"    => Some(new SetNotNullProc(catalog, nullable = false))
      case "drop_not_null"   => Some(new SetNotNullProc(catalog, nullable = true))
      case "update_mor" => Some(new UpdateMorProc(catalog))
      case "merge_mor"  => Some(new MergeMorProc(catalog))
      case "restore"    => Some(new RestoreProc(catalog))
      case _            => None
    }

  private def str(v: Any): UTF8String = UTF8String.fromString(v.toString)

  private def result(schema: StructType, resultRows: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      private val arr = resultRows.toArray
      override def rows(): Array[InternalRow] = arr
      override def readSchema(): StructType = schema
    }).iterator()

  private abstract class TableProc(catalog: GraftCatalog, procName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def tableParam: ProcedureParameter =
      ProcedureParameter.in("table", StringType)
        .comment("catalog-relative table identifier, e.g. 'ns.t'").build()
    /** Resolves the `table` argument (always parameter 0) to its dir. */
    protected def dirOf(input: InternalRow): String =
      catalog.resolveTableDir(input.getUTF8String(0).toString)
  }

  /** `compact(table, target_files)` — bin-pack the live snapshot into at
    * most `target_files` files in one rewrite commit ([[CommitLog
    * .compact]]); returns the landed version (NULL when the table was
    * already at or below the target — a no-op writes no commit). */
  private final class CompactProc(catalog: GraftCatalog)
      extends TableProc(catalog, "compact") {
    override def description(): String =
      "bin-pack the live snapshot into at most target_files files (one commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam, ProcedureParameter.in("target_files", IntegerType)
        .comment("max live data files after compaction").build())
    private val schema = new StructType()
      .add("version", LongType).add("live_files", IntegerType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val v = CommitLog.compact(SparkSession.active, dir, input.getInt(1))
      result(schema, Seq(new GenericInternalRow(Array[Any](
        v.map(Long.box).orNull, CommitLog.snapshotFiles(dir).size))))
    }
  }

  /** `cluster(table, column, buckets)` — re-cluster the live snapshot on
    * an integral column ([[CommitLog.compactClustered]]): one rewrite
    * commit range-partitions the data into `buckets` files and records
    * each file's [min, max] zone range, restoring (or establishing)
    * data skipping on a table whose layout decayed through appends,
    * DML, or plain compaction — the OPTIMIZE ZORDER analogue. */
  private final class ClusterProc(catalog: GraftCatalog)
      extends TableProc(catalog, "cluster") {
    override def description(): String =
      "re-cluster the snapshot on a column, re-recording zone ranges (one commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("column", StringType)
        .comment("integral clustering column for the zone maps").build(),
      ProcedureParameter.in("buckets", IntegerType)
        .comment("range-partition bucket count = resulting data files").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
      .add("live_files", IntegerType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val v = CommitLog.compactClustered(SparkSession.active, dir,
        input.getUTF8String(1).toString, input.getInt(2))
      result(schema, Seq(new GenericInternalRow(Array[Any](
        v, CommitLog.snapshotFiles(dir).size))))
    }
  }

  /** `vacuum(table[, retain_hours])` — delete files no retained version
    * references (aborted stages, overwritten/compacted/DML-removed data
    * past their history), but only files OLDER than `retain_hours`
    * (default 168 = 7 days, Delta's retention convention) so an in-flight
    * write's staged files survive a concurrent vacuum. `retain_hours = 0`
    * reclaims immediately — only safe with no write in flight. Returns
    * the reclaimed file names. */
  private final class VacuumProc(catalog: GraftCatalog)
      extends TableProc(catalog, "vacuum") {
    override def description(): String =
      "delete unreferenced files older than retain_hours (aborted stages, rewritten history)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("retain_hours", IntegerType)
        .defaultValue("168")
        .comment("minimum age in hours before an unreferenced file is reclaimed (0 = immediate)")
        .build())
    private val schema = new StructType().add("removed_file", StringType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val retainHours = if (input.isNullAt(1)) 168 else input.getInt(1)
      val removed = CommitLog.vacuum(dirOf(input), retainHours * 3600L * 1000L)
      result(schema, removed.sorted.map(f =>
        new GenericInternalRow(Array[Any](str(f)))))
    }
  }

  /** `checkpoint(table)` — roll a log checkpoint at the tip and expire the
    * pre-checkpoint commit files (Delta's every-N-commits maintenance, on
    * demand); returns the checkpointed version and how many log files the
    * expiry reclaimed. */
  private final class CheckpointProc(catalog: GraftCatalog)
      extends TableProc(catalog, "checkpoint") {
    override def description(): String =
      "roll a log checkpoint at the tip and expire pre-checkpoint commits"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
      .add("expired_commits", IntegerType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val v = CommitLog.checkpoint(dir)
      val expired = CommitLog.expireLog(dir)
      result(schema, Seq(new GenericInternalRow(Array[Any](v, expired.size))))
    }
  }

  /** `enable_dv(table)` — opt the table into merge-on-read DELETEs (the
    * Delta `enableDeletionVectors` table-property analogue,
    * [[CommitLog.enableDv]]): SQL `DELETE`s whose predicate translates to
    * source filters then land as one deletion-vector commit — no data
    * file is rewritten; cost ∝ files scanned + rows deleted, not ∝ rows
    * kept. Reads anti-join the vectors away; `compact` materializes them
    * back into clean files. Returns the alter commit's version. */
  private final class EnableDvProc(catalog: GraftCatalog)
      extends TableProc(catalog, "enable_dv") {
    override def description(): String =
      "enable merge-on-read DELETE (deletion vectors) on the table"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = CommitLog.enableDv(dirOf(input))
      result(schema, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `add_constraint(table, name, expr)` — declare a CHECK constraint
    * (the Delta `ALTER TABLE ... ADD CONSTRAINT` semantics,
    * [[CommitLog.addConstraint]]): refused if the CURRENT snapshot
    * already violates `expr`; afterwards every batch write that stages
    * a violating row is refused whole, naming the constraint. NULL
    * passes (SQL CHECK semantics). Returns the alter version. */
  private final class AddConstraintProc(catalog: GraftCatalog)
      extends TableProc(catalog, "add_constraint") {
    override def description(): String =
      "declare a CHECK constraint enforced on every write"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType)
        .comment("constraint name (alphanumeric/underscore)").build(),
      ProcedureParameter.in("expr", StringType)
        .comment("boolean SQL expression over the table's columns").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = CommitLog.addConstraint(SparkSession.active, dirOf(input),
        input.getUTF8String(1).toString, input.getUTF8String(2).toString)
      result(schema, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `drop_constraint(table, name)` — drop a CHECK constraint; returns
    * the commit version (NULL when no such constraint existed). */
  private final class DropConstraintProc(catalog: GraftCatalog)
      extends TableProc(catalog, "drop_constraint") {
    override def description(): String = "drop a CHECK constraint by name"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType)
        .comment("constraint name").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = true)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = CommitLog.dropConstraint(dirOf(input),
        input.getUTF8String(1).toString)
      result(schema, Seq(new GenericInternalRow(
        Array[Any](v.map(Long.box).orNull))))
    }
  }

  /** `set_not_null(table, column)` / `drop_not_null(table, column)` —
    * declare or lift a column's NOT NULL constraint
    * ([[CommitLog.setColumnNullability]]). SET validates the current
    * snapshot first (NULL-holding data refuses); enforcement is per-row
    * on every write path, like CHECK. A CALL rather than `ALTER COLUMN
    * ... SET NOT NULL` because Spark's v2 ALTER analysis hard-blocks
    * nullable→non-null for connectors (`DROP NOT NULL` works as plain
    * SQL too). Returns the alter version. */
  private final class SetNotNullProc(catalog: GraftCatalog, nullable: Boolean)
      extends TableProc(catalog, if (nullable) "drop_not_null" else "set_not_null") {
    override def description(): String =
      if (nullable) "lift a column's NOT NULL constraint"
      else "declare a column NOT NULL (validates existing data first)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("column", StringType)
        .comment("top-level column name").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = CommitLog.setColumnNullability(SparkSession.active, dirOf(input),
        input.getUTF8String(1).toString, nullable)
      result(schema, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `update_mor(table, predicate, assignments)` — merge-on-read UPDATE
    * ([[CommitLog.dvUpdate]]): matching rows' old images are suppressed
    * via deletion vectors and the updated images appended in ONE
    * commit — no data file is rewritten (the copy-on-write `UPDATE`
    * refuses on vectored files; this is the vectored-table path).
    * `assignments` is `col = expr [, col = expr ...]` (top-level commas
    * split, each side parsed as SQL). Returns the landed version (NULL
    * when nothing matched). */
  private final class UpdateMorProc(catalog: GraftCatalog)
      extends TableProc(catalog, "update_mor") {
    override def description(): String =
      "merge-on-read UPDATE: suppress old images via deletion vectors, append new"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("predicate", StringType)
        .comment("boolean SQL expression selecting the rows to update").build(),
      ProcedureParameter.in("assignments", StringType)
        .comment("comma-separated `col = expr` SET list").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = true)
      .add("updated_rows", LongType, nullable = false)

    /** Splits on commas at paren/quote depth zero. */
    private def splitTop(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var depth = 0; var quote = ' '
      s.foreach { ch =>
        if (quote != ' ') { cur += ch; if (ch == quote) quote = ' ' }
        else ch match {
          case '\'' | '"' => quote = ch; cur += ch
          case '(' => depth += 1; cur += ch
          case ')' => depth -= 1; cur += ch
          case ',' if depth == 0 => out += cur.result(); cur.clear()
          case c => cur += c
        }
      }
      if (cur.nonEmpty) out += cur.result()
      out.result().map(_.trim).filter(_.nonEmpty)
    }

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.EqualTo
      import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      val spark = SparkSession.active
      val dir = dirOf(input)
      val pred = org.apache.spark.sql.functions.expr(
        input.getUTF8String(1).toString)
      val sets = splitTop(input.getUTF8String(2).toString).map { part =>
        CatalystSqlParser.parseExpression(part) match {
          case EqualTo(a: UnresolvedAttribute, v) =>
            a.nameParts.mkString(".") ->
              org.apache.spark.sql.GraftSqlShim.column(v)
          case other => throw new IllegalArgumentException(
            s"update_mor: assignment must be `col = expr`, got '$part' ($other)")
        }
      }.toMap
      val before = CommitLog.dvRowCount(dir)
      val v = CommitLog.dvUpdate(spark, dir, pred, sets)
      val updated = if (v.isEmpty) 0L else CommitLog.dvRowCount(dir) - before
      result(schema, Seq(new GenericInternalRow(
        Array[Any](v.map(Long.box).orNull, updated))))
    }
  }

  /** `restore(table, version)` — rollback to a historical snapshot (the
    * Delta `RESTORE TABLE ... TO VERSION AS OF` shape,
    * [[CommitLog.restore]]): one metadata commit, zero data IO, history
    * preserved. Returns the landed version (NULL when the table is
    * already at that state). */
  private final class RestoreProc(catalog: GraftCatalog)
      extends TableProc(catalog, "restore") {
    override def description(): String =
      "roll the table back to a historical version in one metadata commit"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("version", LongType)
        .comment("target snapshot version").build())
    private val schema = new StructType().add("version", LongType, nullable = true)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = CommitLog.restore(dirOf(input), input.getLong(1))
      result(schema, Seq(new GenericInternalRow(
        Array[Any](v.map(Long.box).orNull))))
    }
  }

  /** `merge_mor(table, source, keys[, format])` — merge-on-read MERGE
    * ([[CommitLog.dvMerge]]): current rows whose keys match a source row
    * are suppressed via merged deletion vectors and every source row is
    * appended (matched = update, unmatched = insert), one commit, no
    * current file rewritten. The vectored-table sibling of `MERGE INTO`
    * (which refuses on vectored files — resurrection guard). Returns the
    * landed version. */
  private final class MergeMorProc(catalog: GraftCatalog)
      extends TableProc(catalog, "merge_mor") {
    override def description(): String =
      "merge-on-read MERGE: vector-suppress matched images, append the source"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("source", StringType)
        .comment("path of the source batch").build(),
      ProcedureParameter.in("keys", StringType)
        .comment("comma-separated merge key columns").build(),
      ProcedureParameter.in("format", StringType)
        .defaultValue("'parquet'")
        .comment("source format (parquet, orc, json, graftlog, ...)").build())
    private val schema = new StructType().add("version", LongType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val keys = input.getUTF8String(2).toString.split(',').map(_.trim).toSeq
      require(keys.nonEmpty && keys.forall(_.nonEmpty),
        "merge_mor: keys must be a comma-separated column list")
      val fmt = if (input.isNullAt(3)) "parquet" else input.getUTF8String(3).toString
      val batch = SparkSession.active.read.format(fmt)
        .load(input.getUTF8String(1).toString)
      val v = CommitLog.dvMerge(SparkSession.active, batch, dir, keys)
      result(schema, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `ingest(table, source, keys[, format])` — idempotent SQL ingest, the
    * COPY-INTO-with-dedup shape ([[CommitLog.dedupAppend]]): appends only
    * rows whose `keys` combination is not already in the table, so
    * re-running a batch (a retried job, a re-delivered drop) is a NO-OP
    * that writes no commit. The duplicate check is one left-anti join
    * against the zone-pruned key index; landed batches record zone
    * ranges so the next ingest prunes too. Returns the landed version
    * (zero rows = everything was already present). */
  private final class IngestProc(catalog: GraftCatalog)
      extends TableProc(catalog, "ingest") {
    override def description(): String =
      "append only key-unseen rows from a source path (idempotent COPY INTO)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("source", StringType)
        .comment("path of the batch to ingest").build(),
      ProcedureParameter.in("keys", StringType)
        .comment("comma-separated dedup key columns").build(),
      ProcedureParameter.in("format", StringType)
        .defaultValue("'parquet'")
        .comment("source format (parquet, orc, json, graftlog, ...)").build())
    private val schema = new StructType().add("version", LongType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val keys = input.getUTF8String(2).toString.split(',').map(_.trim).toSeq
      require(keys.nonEmpty && keys.forall(_.nonEmpty),
        "ingest: keys must be a comma-separated column list")
      val fmt = if (input.isNullAt(3)) "parquet" else input.getUTF8String(3).toString
      val batch = SparkSession.active.read.format(fmt)
        .load(input.getUTF8String(1).toString)
      CommitLog.dedupAppend(SparkSession.active, batch, dir, keys) match {
        case None    => result(schema, Seq.empty)
        case Some(v) => result(schema, Seq(new GenericInternalRow(Array[Any](v))))
      }
    }
  }

  /** `zorder(table, x, y, buckets)` — Z-ORDER the live snapshot on two
    * or THREE 16-bit-quantized integral columns
    * ([[CommitLog.compactZOrdered]], the OPTIMIZE ZORDER BY analogue):
    * one conflict-checked rewrite range-partitions on the Morton key
    * with per-file zkey ranges recorded and declares the layout for
    * later INSERTs, after which box predicates prune files through the
    * Tropf–Herzog interval decomposition. `x` and `y` are the first two
    * coordinate columns; `z` (optional, empty string = absent) is the
    * third. Four or more dimensions are refused loudly — at 16 bits per
    * coordinate a 4th would need the 64-bit zkey's sign bit, and zone
    * ranges compare signed. */
  private final class ZOrderProc(catalog: GraftCatalog)
      extends TableProc(catalog, "zorder") {
    override def description(): String =
      "Z-order the snapshot on 2-3 columns, recording per-file zkey ranges (one commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("x", StringType)
        .comment("first coordinate column (integral, values in [0, 65535])").build(),
      ProcedureParameter.in("y", StringType)
        .comment("second coordinate column (integral, values in [0, 65535])").build(),
      ProcedureParameter.in("buckets", IntegerType)
        .comment("range-partition bucket count = resulting data files").build(),
      ProcedureParameter.in("z", StringType)
        .comment("optional third coordinate column ('' = 2-D)")
        .defaultValue("''").build())
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
      .add("live_files", IntegerType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val third = if (input.numFields > 4 && !input.isNullAt(4))
        Some(input.getUTF8String(4).toString.trim).filter(_.nonEmpty) else None
      val cols = Seq(input.getUTF8String(1).toString,
        input.getUTF8String(2).toString) ++ third
      val v = CommitLog.compactZOrdered(SparkSession.active, dir, cols,
        input.getInt(3))
      result(schema, Seq(new GenericInternalRow(Array[Any](
        v, CommitLog.snapshotFiles(dir).size))))
    }
  }

  /** `purge(table)` — physically rewrite the live snapshot WITHOUT the
    * tombstoned (dropped) physical columns and lift the tombstones in the
    * same commit ([[CommitLog.purgeDroppedColumns]], Delta's `REORG TABLE
    * ... APPLY (PURGE)` analogue): the dead bytes stop riding every scan
    * and the names become reusable. Returns the landed version and the
    * physical names reclaimed (zero rows = nothing was tombstoned). */
  private final class PurgeProc(catalog: GraftCatalog)
      extends TableProc(catalog, "purge") {
    override def description(): String =
      "rewrite live files without dropped columns and lift their tombstones (one commit)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
      .add("purged_physical_name", StringType, nullable = false)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val tombs = CommitLog.droppedPhysicalNames(dir).toSeq.sorted
      CommitLog.purgeDroppedColumns(SparkSession.active, dir) match {
        case None => result(schema, Seq.empty)
        case Some(v) => result(schema, tombs.map(t =>
          new GenericInternalRow(Array[Any](v, str(t)))))
      }
    }
  }

  /** `history(table)` — the retained commit log as a result set, newest
    * first (the DESCRIBE HISTORY analogue): version, operation, files
    * added/removed. */
  private final class HistoryProc(catalog: GraftCatalog)
      extends TableProc(catalog, "history") {
    override def description(): String =
      "the retained commit history, newest first"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    private val schema = new StructType()
      .add("version", LongType, nullable = false)
      .add("operation", StringType, nullable = false)
      .add("n_added", IntegerType, nullable = false)
      .add("n_removed", IntegerType, nullable = false)
      .add("commit_time", org.apache.spark.sql.types.TimestampType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirOf(input)
      val rows = CommitLog.versions(dir).sorted.reverse.map { v =>
        val c = CommitLog.readCommit(dir, v)
        // commit time = the log file's mtime (what timestamp time travel
        // resolves against); micros, the Catalyst timestamp unit
        val ts: Any = CommitLog.commitTimeMillis(dir, v)
          .map(ms => ms * 1000L).map(Long.box).orNull
        new GenericInternalRow(Array[Any](
          v, str(c.op), c.add.size, c.remove.size, ts))
      }
      result(schema, rows)
    }
  }
}
