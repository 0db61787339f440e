package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `private[sql]` plan constructors — the standard pattern for
  * libraries that add custom logical operators (a `Dataset` can only be
  * built from a `LogicalPlan` via package-private API). Kept to the single
  * call the engine needs.
  */
object GraftSqlShim {

  /** DataFrame from a custom LogicalPlan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
