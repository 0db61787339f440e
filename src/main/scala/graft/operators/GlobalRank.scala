package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering (VERDICT "What's wrong" #1).
  *
  * `row_number() OVER (ORDER BY ...)` with no partitioning plans as a
  * single-partition sort — every row funnels through one task, a
  * scale-killer on any catalog-sized input. This operator computes the
  * identical rank in three distributed steps, all declarative:
  *
  *  1. range-repartition on the sort key (the same sampled RangePartitioner
  *     shuffle a global sort uses — partitions hold disjoint, ordered key
  *     ranges);
  *  2. per-partition counts -> cumulative offsets. The count aggregation is
  *     tiny (one row per shuffle partition), so the offset window runs over
  *     ~#partitions rows, and the offsets join back as a broadcast;
  *  3. `row_number` partitioned by `spark_partition_id()` (parallel) plus
  *     the partition's offset.
  *
  * Ties across partitions: the RangePartitioner assigns equal keys to one
  * partition, so ranks are total and deterministic whenever the sort key
  * is (callers pass a unique key suffix, as they would for any global
  * order).
  */
object GlobalRank {

  /** Adds `outCol` = 1-based global rank under `orderCols`.
    *
    * The input must be deterministic (a re-computation yields the same
    * rows) — the same precondition any global ordering has. Boundary
    * consistency between the offsets branch and the data branch comes from
    * Spark's exchange reuse: both branches canonicalize to the same range
    * exchange, which plans/executes once (default-on ReuseExchange / AQE
    * stage reuse; GlobalRankSpec asserts the ReusedExchange at runtime).
    * Do not disable spark.sql.exchange.reuse around this operator — the
    * RangePartitioner's sample seed includes the RDD id, so two
    * independent materializations could pick different boundaries. */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
                          outCol: String): DataFrame = {
    require(!df.columns.contains("__pid") && !df.columns.contains("__offset"),
      "input already has a __pid/__offset column — rename it before ranking")
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
    parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, (row_number().over(local) + col("__offset")).cast("long"))
      .drop("__pid", "__offset")
  }

  /** Adds `outCol` = inclusive running total of `valueCol` under the global
    * order `orderCols` — the distributed prefix sum behind sequence packing
    * and token-budget accounting. Same three-step shape as
    * [[withGlobalRowNumber]]: range shuffle, per-partition sums -> broadcast
    * cumulative offsets, partition-local window + offset. A plain
    * `sum(...) OVER (ORDER BY ...)` would plan the same single-partition
    * WindowExec this operator exists to avoid. Preconditions match
    * [[withGlobalRowNumber]] (deterministic input, unique sort key,
    * exchange reuse left on). */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                       outCol: String): DataFrame = {
    require(!df.columns.contains("__pid") && !df.columns.contains("__offset"),
      "input already has a __pid/__offset column — rename it before ranking")
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__val", valueCol.cast("long"))
    val offsets = parted.groupBy("__pid").agg(sum(col("__val")).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, (sum(col("__val")).over(local) + col("__offset")).cast("long"))
      .drop("__pid", "__offset", "__val")
  }
}
