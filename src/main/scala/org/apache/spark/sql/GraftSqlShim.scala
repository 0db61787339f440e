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

  /** Column from a custom Expression — the scalar sibling of [[ofRows]]
    * (needed when an expression carries non-Literal state, e.g. a
    * per-iteration centroid table, that no FunctionRegistry signature can
    * express). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Re-bind a materialized (localCheckpoint'd) DataFrame to its RDD through
    * a fresh LogicalRDD that carries NO inherited statistics or constraints.
    *
    * Spark's checkpoint preserves the origin plan's stats; in an iterative
    * algorithm (label propagation, allocation rounds) each round's join
    * multiplies the inherited sizeInBytes estimates, so the BigInt estimate
    * doubles in bit-length every round — after ~30 rounds Catalyst spends
    * its time doing million-digit multiplications in `computeStats`.
    * Dropping the origin stats resets the estimate to the default constant
    * and keeps round cost flat. */
  def detachStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val session = ds.sparkSession
    ofRows(session, org.apache.spark.sql.execution.LogicalRDD(
      ds.queryExecution.analyzed.output, ds.queryExecution.toRdd)(session))
  }

  /** Re-flag a batch DataFrame as a STREAMING one — what a V1
    * `Source.getBatch` must return (`MicroBatchExecution` asserts
    * `isStreaming`; Spark's own `FileStreamSource` builds its batches with
    * exactly this `internalCreateDataFrame(rdd, schema, isStreaming =
    * true)` call, which is `private[sql]` and hence lives in this shim). */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
