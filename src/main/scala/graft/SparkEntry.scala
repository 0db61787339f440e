package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from the SURVEY.md §2 inventory
  * (or a north-star extension), expressed Spark-first over the driver corpus;
  * [[oracleSql]] carries the DuckDB twin the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * E1 — the full tank-inventory pipeline (merge clustering, UTM/WGS84
    * georeferencing, broadcast spatial argmax join). */
  def entry(spark: SparkSession): DataFrame =
    queries("e1_inventory")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (JoinQueries.queries, JoinQueries.oracle),
      (AggWindowQueries.queries, AggWindowQueries.oracle),
      (LabelGeomQueries.queries, LabelGeomQueries.oracle),
      (CustomOpQueries.queries, CustomOpQueries.oracle),
      (graft.streaming.EventWindows.queries, graft.streaming.EventWindows.oracle),
      (TextDedupQueries.queries, TextDedupQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (PipelineQueries.queries, PipelineQueries.oracle),
      (CharacteristicsQueries.queries, CharacteristicsQueries.oracle),
      (WorkflowQueries.queries, WorkflowQueries.oracle),
      (AnalyticsQueries.queries, AnalyticsQueries.oracle),
      (TableLogQueries.queries, TableLogQueries.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
