package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Allocation, GlobalRank}

/** The global-window allocation was VERDICT "What's wrong" #1: an
  * un-partitioned `row_number` plans a single-partition sort of the whole
  * input. These tests pin both the semantics (identical ranks) and the
  * plan shape (range shuffle + partitioned window; no single-partition
  * exchange on the data path) of the replacement. */
class GlobalRankSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select("o_orderkey", "o_orderdate")

  test("global rank equals the single-partition window rank") {
    val fast = GlobalRank.withGlobalRowNumber(
      orders, Seq(col("o_orderdate"), col("o_orderkey")), "rn")
    val slow = orders.withColumn("rn",
      row_number().over(Window.orderBy("o_orderdate", "o_orderkey")).cast("long"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("data path is range-partitioned; only the tiny offset agg is global") {
    val plan = GlobalRank.withGlobalRowNumber(
      orders, Seq(col("o_orderdate"), col("o_orderkey")), "rn")
      .queryExecution.executedPlan.toString
    // the full input is ordered by a RangePartitioning shuffle...
    assert(plan.contains("rangepartitioning"), plan)
    // ...and its row_number window is partitioned (parallel), never global
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    // the only permissible SinglePartition exchange is the per-partition
    // count aggregate (one row per shuffle partition)
    val singles = plan.split("Exchange SinglePartition").length - 1
    assert(singles <= 1, s"expected at most one tiny global exchange:\n$plan")
  }

  test("allocate carries the same plan shape through the operator") {
    val (allocated, rest) = Allocation.allocate(
      orders, Seq("o_orderdate", "o_orderkey"), 100, Seq("a", "b"))
    Seq(allocated, rest).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("rangepartitioning"), plan)
      assert(!plan.contains("windowspecdefinition()"),
        s"un-partitioned window leaked back into allocation:\n$plan")
    }
  }

  test("ranks are dense, unique, and 1-based") {
    val ranked = GlobalRank.withGlobalRowNumber(
      orders, Seq(col("o_orderkey")), "rn")
    val n = orders.count()
    val stats = ranked.agg(
      min("rn").as("mn"), max("rn").as("mx"), countDistinct("rn").as("d")).first()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n && stats.getLong(2) == n)
  }

  test("ranks are identical across shuffle partition counts") {
    // a cluster resize must not change any rank: boundaries move, the
    // offsets move with them, the global order does not
    def ranked(): Seq[(Long, Long)] =
      GlobalRank.withGlobalRowNumber(orders, Seq(col("o_orderdate"), col("o_orderkey")), "rn")
        .select("o_orderkey", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = withConf("spark.sql.shuffle.partitions" -> 3)(ranked())
    val b = withConf("spark.sql.shuffle.partitions" -> 13)(ranked())
    assert(a == b)
  }

  test("offsets and data branches share one range exchange at runtime") {
    val ranked = GlobalRank.withGlobalRowNumber(
      orders, Seq(col("o_orderdate"), col("o_orderkey")), "rn")
    ranked.collect()   // run so AQE finalizes the plan
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || plan.contains("TableCacheQueryStage"),
      s"range exchange not reused between offsets and data branches:\n$plan")
  }

  test("empty input yields an empty ranked frame") {
    val empty = orders.filter(col("o_orderkey") < 0)
    assert(GlobalRank.withGlobalRowNumber(empty, Seq(col("o_orderkey")), "rn").count() == 0)
  }

  test("running total equals the single-partition window cumsum") {
    val withVal = orders.withColumn("v", (col("o_orderkey") % 7).cast("long"))
    val fast = GlobalRank.withRunningTotal(
      withVal, Seq(col("o_orderdate"), col("o_orderkey")), col("v"), "cum")
    val slow = withVal.withColumn("cum",
      sum("v").over(Window.orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("running total data path is range-partitioned, window partitioned") {
    val withVal = orders.withColumn("v", lit(1L))
    val plan = GlobalRank.withRunningTotal(
      withVal, Seq(col("o_orderdate"), col("o_orderkey")), col("v"), "cum")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    val singles = plan.split("Exchange SinglePartition").length - 1
    assert(singles <= 1, s"expected at most one tiny global exchange:\n$plan")
  }

  test("grouped running total equals the per-group window cumsum") {
    val withVal = orders
      .withColumn("g", (col("o_orderkey") % 3).cast("string"))
      .withColumn("v", (col("o_orderkey") % 7).cast("long"))
    val fast = GlobalRank.withRunningTotalGrouped(
      withVal, col("g"), Seq(col("o_orderdate"), col("o_orderkey")), col("v"), "cum")
    val slow = withVal.withColumn("cum",
      sum("v").over(Window.partitionBy("g").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("grouped running total never plans a group-partitioned data window") {
    // 3 groups must NOT become 3 window tasks: the data window is keyed by
    // (__pid, __grp), the range shuffle carries the parallelism
    val withVal = orders
      .withColumn("g", (col("o_orderkey") % 3).cast("string"))
      .withColumn("v", lit(1L))
    val plan = GlobalRank.withRunningTotalGrouped(
      withVal, col("g"), Seq(col("o_orderkey")), col("v"), "cum")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    assert(!plan.contains("Exchange SinglePartition"),
      s"grouped running total should need no global exchange at all:\n$plan")
  }

  test("grouped running total with one group equals the plain running total") {
    val withVal = orders.withColumn("v", (col("o_orderkey") % 5).cast("long"))
    val grouped = GlobalRank.withRunningTotalGrouped(
      withVal.withColumn("g", lit("all")), col("g"),
      Seq(col("o_orderkey")), col("v"), "cum").drop("g")
    val plain = GlobalRank.withRunningTotal(
      withVal, Seq(col("o_orderkey")), col("v"), "cum")
    assert(grouped.exceptAll(plain).count() == 0 && plain.exceptAll(grouped).count() == 0)
  }

  test("running total of all-ones equals the global rank") {
    val withVal = orders.withColumn("v", lit(1L))
    val cum = GlobalRank.withRunningTotal(
      withVal, Seq(col("o_orderkey")), col("v"), "cum").drop("v")
    val rn = GlobalRank.withGlobalRowNumber(
      orders, Seq(col("o_orderkey")), "cum")
    assert(cum.exceptAll(rn).count() == 0 && rn.exceptAll(cum).count() == 0)
  }
}
