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

  /** Adds `outCol` = inclusive running total of `valueCol` WITHIN each
    * `groupCol` value, ordered by `orderCols` inside the group — i.e.
    * `sum(v) OVER (PARTITION BY g ORDER BY o)` without the g-partition
    * window (a handful of groups = a handful of tasks = the
    * single-partition problem reborn whenever groups are few and large,
    * e.g. train/val/test splits).
    *
    * Same single range shuffle as [[withRunningTotal]], keyed on
    * (group, order): groups are contiguous in that order, so the
    * per-(partition, group) sums — at most #partitions x #groups rows,
    * broadcast-sized for any bounded group count — give each group's
    * carry-in offset per partition directly. No second pass over the
    * data: the offsets branch reads the reused range exchange and
    * map-side-combines straight down to those few rows. Preconditions
    * match [[withRunningTotal]]. */
  def withRunningTotalGrouped(df: DataFrame, groupCol: Column, orderCols: Seq[Column],
                              valueCol: Column, outCol: String): DataFrame = {
    require(!df.columns.contains("__pid") && !df.columns.contains("__offset") &&
      !df.columns.contains("__grp"),
      "input already has a __pid/__offset/__grp column — rename it before ranking")
    val parted = df.repartitionByRange((groupCol +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__grp", groupCol)
      .withColumn("__val", valueCol.cast("long"))
    val offsets = parted.groupBy("__pid", "__grp").agg(sum(col("__val")).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy("__grp").orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__grp", "__offset")
    val local = Window.partitionBy("__pid", "__grp").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offsets), Seq("__pid", "__grp"))
      .withColumn(outCol, (sum(col("__val")).over(local) + col("__offset")).cast("long"))
      .drop("__pid", "__grp", "__offset", "__val")
  }
}
