package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.CommitLog

/** SQL/DataSource surface for the transactional commit-log table format
  * ([[graft.io.CommitLog]]) — the way Delta exposes its log to Spark:
  *
  * {{{
  *   spark.read.format("graftlog").load("/path/to/table")            // current snapshot
  *   spark.read.format("graftlog")
  *     .option("versionAsOf", 0).load(path)                          // version time travel
  *   spark.read.format("graftlog")
  *     .option("timestampAsOf", "2026-08-14T12:00:00Z").load(path)   // timestamp time travel
  *   spark.read.format("graftlog")
  *     .option("mergeSchema", true).load(path)                       // additive evolution
  * }}}
  *
  * Registered under the short name `graftlog` via the standard
  * `DataSourceRegister` service file, so SQL users reach snapshots,
  * time travel and schema evolution without touching the Scala API
  * (`CREATE TEMPORARY VIEW t USING graftlog OPTIONS (path '...')`
  * works through the same provider).
  *
  * Implementation: a minimal DataSource **V2** `TableProvider` whose scan
  * bridges through [[V1Scan]] — the connector API's sanctioned adapter
  * (JDBC uses it) that hands execution to a `BaseRelation` built from
  * `CommitLog.read`. The heavy lifting — snapshot resolution from the
  * log, live-file pruning, mergeSchema — happens in the commit-log
  * replay, and the actual data movement is Spark's own parquet scan over
  * exactly the snapshot's live files, so pushdown and column pruning
  * apply there as usual. Version resolution happens once per query
  * planning (driver-side log replay, O(retained commits)).
  */
class GraftLogDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftlog"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLogDataSource.resolve(options.asCaseSensitiveMap()).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    GraftLogDataSource.resolve(properties)
}

object GraftLogDataSource {

  /** A resolved snapshot: table path + pinned version + read options. */
  final case class GraftLogTable(path: String, snapshotVersion: Long, mergeSchema: Boolean)
    extends Table with SupportsRead {

    private def spark: SparkSession = SparkSession.active

    /** Pin the schema at resolution so planning and execution agree even
      * if the log advances between them. */
    val schema0: StructType =
      CommitLog.read(spark, path, Some(snapshotVersion), mergeSchema).schema

    override def name(): String = s"graftlog.`$path`@v$snapshotVersion"
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new V1Scan {
        override def readSchema(): StructType = schema0
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = schema0
            override def buildScan(): RDD[Row] =
              CommitLog.read(context.sparkSession, path, Some(snapshotVersion), mergeSchema).rdd
          }.asInstanceOf[T]
      }
  }

  /** Resolve `path` + time-travel options to a pinned snapshot version.
    * `versionAsOf` and `timestampAsOf` are mutually exclusive, exactly as
    * in Delta; a missing path or an empty table fails loudly here, at
    * analysis time. */
  def resolve(properties: util.Map[String, String]): GraftLogTable = {
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlog requires a path: spark.read.format(\"graftlog\").load(\"/table/dir\")"))
    val versionAsOf = opts.get("versionasof").map(_.toLong)
    val tsAsOf = opts.get("timestampasof").map(parseTs)
    require(versionAsOf.isEmpty || tsAsOf.isEmpty,
      "graftlog: versionAsOf and timestampAsOf are mutually exclusive")
    val head = CommitLog.currentVersion(path)
    val version = versionAsOf
      .orElse(tsAsOf.map(ts => CommitLog.versionAt(path, ts)))
      .getOrElse(head)
    require(version >= 0, s"commit-log table $path has no commits")
    // a version past the log head would otherwise silently replay to the
    // current snapshot — refuse it here, at analysis time
    require(version <= head,
      s"commit-log table $path is at version $head; versionAsOf $version does not exist")
    GraftLogTable(path, version,
      opts.get("mergeschema").exists(_.toBoolean))
  }

  /** Epoch millis, an ISO-8601 instant, or an ISO local date-time/date
    * (interpreted as UTC, the engine's session zone). */
  private def parseTs(s: String): Long =
    if (s.forall(c => c.isDigit)) s.toLong
    else try java.time.Instant.parse(s).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDateTime.parse(s)
          .atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli
        }
    }
}
