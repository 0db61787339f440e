package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.CommitLog

/** Iceberg-style INSPECTION metadata tables over a commit-log table —
  * `SELECT * FROM graft.ns.t.history` / `...t.files` (the identifier
  * twins of `CALL graft.system.history` and the log's per-file
  * vocabulary):
  *
  *  - `history`: the retained commit log, newest first — version,
  *    operation, files added/removed, commit time.
  *  - `files`: the LIVE snapshot's files with the log's recorded footer
  *    row counts, byte sizes, and zone ranges (nulls where a legacy add
  *    recorded none — absence of stats is a first-class fact, it's what
  *    makes a file unprunable).
  *
  * Both are driver-derived (the facts are log metadata — a few KB at any
  * table size) and served through the same V1 bridge as the batch
  * `.changes` form; `.changes` itself stays in
  * [[GraftLogDataSource.resolveChanges]] because it is a full
  * distributed computation, not an inspection row set. */
private[sources] object GraftMetaTables {

  val historySchema: StructType = new StructType()
    .add("version", LongType, nullable = false)
    .add("operation", StringType, nullable = false)
    .add("n_added", IntegerType, nullable = false)
    .add("n_removed", IntegerType, nullable = false)
    .add("commit_time", TimestampType)

  def history(spark: SparkSession, path: String): DataFrame = {
    val rows = CommitLog.versions(path).sorted.reverse.map { v =>
      val c = CommitLog.readCommit(path, v)
      Row(v, c.op, c.add.size, c.remove.size,
        CommitLog.commitTimeMillis(path, v)
          .map(ms => new java.sql.Timestamp(ms)).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), historySchema)
  }

  val filesSchema: StructType = new StructType()
    .add("file", StringType, nullable = false)
    .add("n_rows", LongType)
    .add("size_bytes", LongType)
    .add("stats_col", StringType)
    .add("lo", LongType)
    .add("hi", LongType)

  /** `ns.t.detail` — the one-row table-state summary (Delta's `DESCRIBE
    * DETAIL` shape): tip version, live file count/bytes, the metadata
    * row count (deletion-vector-suppressed rows already subtracted; NULL
    * when a legacy add recorded no count), merge-on-read status, the
    * declared clustering / bloom / constraints, and the checkpoint
    * horizon. All log metadata — milliseconds at any table size. */
  val detailSchema: StructType = new StructType()
    .add("version", LongType, nullable = false)
    .add("num_files", IntegerType, nullable = false)
    .add("size_bytes", LongType, nullable = false)
    .add("num_rows", LongType)
    .add("dv_enabled", org.apache.spark.sql.types.BooleanType, nullable = false)
    .add("dv_suppressed_rows", LongType, nullable = false)
    .add("dv_max_ratio", org.apache.spark.sql.types.DoubleType)
    .add("clustering", StringType)
    .add("bloom_column", StringType)
    .add("num_constraints", IntegerType, nullable = false)
    .add("constraints", StringType)
    .add("last_checkpoint", LongType)

  def detail(spark: SparkSession, path: String): DataFrame = {
    val v = CommitLog.currentVersion(path)
    val files = CommitLog.snapshotFiles(path)
    val cons = CommitLog.constraintsOf(path)
    val row = Row(
      v,
      files.size,
      CommitLog.snapshotSizeBytes(path),
      CommitLog.snapshotRowCount(path).map(Long.box).orNull,
      CommitLog.dvEnabled(path),
      CommitLog.dvRowCount(path),
      CommitLog.dvMaxRatioOf(path).map(Double.box).orNull,
      CommitLog.declaredClustering(path)
        .map { case (c, b) => s"$c ($b buckets)" }.orNull,
      CommitLog.declaredBloom(path).orNull,
      cons.size,
      if (cons.isEmpty) null
      else cons.map { case (n, e) => s"$n: $e" }.mkString("; "),
      CommitLog.lastCheckpoint(path).map(Long.box).orNull)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), detailSchema)
  }

  def files(spark: SparkSession, path: String): DataFrame = {
    val rowCounts = CommitLog.fileRowCounts(path)
    val bytes = CommitLog.fileSizeBytes(path)
    val stats = CommitLog.fileStats(path)
    val statsCols = CommitLog.fileStatsColumns(path)
    val rows = CommitLog.snapshotFiles(path).map { f =>
      Row(f, rowCounts.get(f).map(Long.box).orNull,
        bytes.get(f).map(Long.box).orNull,
        statsCols.getOrElse(f, null),
        stats.get(f).map(s => Long.box(s._1)).orNull,
        stats.get(f).map(s => Long.box(s._2)).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), filesSchema)
  }
}

/** A read-only, driver-derived relation behind a catalog identifier —
  * what the inspection metadata tables resolve to. The row set is built
  * fresh per scan (DESCRIBE-frequency work), so repeated queries observe
  * the live log. */
private[sources] final case class GraftLocalTable(
    tableName: String, schema0: StructType,
    build: SparkSession => DataFrame)
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema0
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = schema0
            override def buildScan(): RDD[Row] =
              GraftLocalTable.this.build(context.sparkSession).rdd
          }.asInstanceOf[T]
      }
    }
}
