package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Aggregation and window-family operators (SURVEY.md §2.4, §2.5) plus the
  * north-star ranking/lag surface the reference lacks. */
object AggWindowQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ A1: rollup counts
  /** Per-class counts + all-objects total (`src/az_proc.py:764-837`,
    * summary_table.csv) via rollup: map-side partial agg, one shuffle. */
  private val a1RollupCounts: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .rollup("event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("event_type"), lit("all_objects")).as("object_class"), col("cnt"))
      .orderBy("object_class")

  private val a1RollupCountsSql =
    """SELECT coalesce(event_type, 'all_objects') AS object_class, count(*) AS cnt
      |FROM events GROUP BY ROLLUP(event_type)
      |ORDER BY object_class""".stripMargin

  /** Full CUBE over two dimensions (all four grouping sets). */
  private val a14Cube: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"))
      .orderBy("status", "priority")

  private val a14CubeSql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ------------------------------------------------------------------ A15: grouping sets
  /** Explicit GROUPING SETS — the general form behind cube/rollup: the
    * exact aggregation grain list ((status, priority), (priority), ()),
    * one shuffle, partial aggregation per grain. */
  private val a15GroupingSets: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("total"))
      .orderBy("status", "priority")

  private val a15GroupingSetsSql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // ------------------------------------------------------------------ A2: unknown labels
  /** Distinct labels outside the known set (`src/az_proc.py:818-832`). */
  private val a2UnknownLabels: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .filter(!col("event_type").isin("click", "view", "purchase"))
      .select(col("event_type").as("unknown_label")).distinct()
      .orderBy("unknown_label")

  private val a2UnknownLabelsSql =
    """SELECT DISTINCT event_type AS unknown_label FROM events
      |WHERE event_type NOT IN ('click', 'view', 'purchase')
      |ORDER BY unknown_label""".stripMargin

  // ------------------------------------------------------------------ A4: distinct
  private val a4Distinct: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).as("order_year"))
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority", "order_year")

  private val a4DistinctSql =
    """SELECT DISTINCT o_orderstatus, o_orderpriority,
      |  CAST(year(o_orderdate) AS INTEGER) AS order_year
      |FROM orders ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------ A5: cardinality stats
  /** Dataset-summary cardinalities (`src/az_proc.py:349-389`). */
  private val a5Cardinality: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    o.agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(year(col("o_orderdate"))).as("n_years"),
      countDistinct(col("o_orderpriority")).as("n_priorities"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))
  }

  private val a5CardinalitySql =
    """SELECT count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT year(o_orderdate)) AS n_years,
      |  count(DISTINCT o_orderpriority) AS n_priorities,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders""".stripMargin

  // ------------------------------------------------------------------ A6: invariant check
  /** allocated + remaining == total (`src/az_proc.py:442-445`) as a
    * single-row audit query. */
  private val a6Invariant: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    // audits the ACTUAL allocated set (first-100 via TakeOrderedAndProject,
    // broadcast back) rather than re-ranking the whole table: one narrow
    // pass + one tiny agg, no global window, no full shuffle.
    val top = o.orderBy(col("o_orderdate"), col("o_orderkey")).limit(100)
      .select(col("o_orderkey")).withColumn("__hit", lit(1))
    o.select("o_orderkey")
      .join(broadcast(top), Seq("o_orderkey"), "left")
      .agg(
        sum(when(col("__hit") === 1, 1).otherwise(0)).as("allocated"),
        sum(when(col("__hit").isNull, 1).otherwise(0)).as("remaining"),
        count(lit(1)).as("total"))
      .withColumn("invariant_holds",
        col("allocated") + col("remaining") === col("total"))
  }

  private val a6InvariantSql =
    """WITH ranked AS (
      |  SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
      |SELECT
      |  CAST(sum(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS allocated,
      |  CAST(sum(CASE WHEN rn > 100 THEN 1 ELSE 0 END) AS BIGINT) AS remaining,
      |  count(*) AS total,
      |  sum(CASE WHEN rn <= 100 THEN 1 ELSE 0 END)
      |    + sum(CASE WHEN rn > 100 THEN 1 ELSE 0 END) = count(*) AS invariant_holds
      |FROM ranked""".stripMargin

  // ------------------------------------------------------------------ A7: min/max envelope
  /** Elementwise bbox envelope per group (`src/form_calcs.py:699-713`). */
  private val a7Envelope: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    l.select(col("l_orderkey"),
        (col("l_partkey") * 13 % 300).as("x1"),
        (col("l_suppkey") * 29 % 300).as("y1"))
      .withColumn("x2", col("x1") + 25)
      .withColumn("y2", col("y1") + 25)
      .groupBy("l_orderkey")
      .agg(min("x1").as("minx"), min("y1").as("miny"),
        max("x2").as("maxx"), max("y2").as("maxy"),
        count(lit(1)).as("n_boxes"))
      .orderBy("l_orderkey")
  }

  private val a7EnvelopeSql =
    """SELECT l_orderkey,
      |  min(l_partkey * 13 % 300) AS minx,
      |  min(l_suppkey * 29 % 300) AS miny,
      |  max(l_partkey * 13 % 300 + 25) AS maxx,
      |  max(l_suppkey * 29 % 300 + 25) AS maxy,
      |  count(*) AS n_boxes
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ W3: top-k rank / lag
  /** Revenue ranking inside each nation with rank + lag — the north-star
    * window surface (no counterpart in the reference; SURVEY.md §2.5 note).
    * Revenue is rounded BEFORE ranking so float summation order cannot
    * reorder ties across engines; supplier key breaks ties. */
  private val w3TopkRank: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val rev = l.groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy("s_nationkey")
      .orderBy(col("revenue").desc, col("suppkey"))
    rev.join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("l_suppkey").as("suppkey"), col("revenue"))
      .withColumn("rnk", rank().over(w))
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .filter(col("rnk") <= 3)
      .orderBy("s_nationkey", "rnk")
  }

  private val w3TopkRankSql =
    """WITH rev AS (
      |  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |  FROM lineitem GROUP BY 1)
      |SELECT s_nationkey, suppkey, revenue, rnk, prev_revenue FROM (
      |  SELECT s.s_nationkey, r.l_suppkey AS suppkey, r.revenue,
      |    rank() OVER (PARTITION BY s.s_nationkey
      |                 ORDER BY r.revenue DESC, r.l_suppkey) AS rnk,
      |    lag(r.revenue, 1) OVER (PARTITION BY s.s_nationkey
      |                 ORDER BY r.revenue DESC, r.l_suppkey) AS prev_revenue
      |  FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey)
      |WHERE rnk <= 3 ORDER BY s_nationkey, rnk""".stripMargin

  // ------------------------------------------------------------------ Q3-style join+agg+topk
  /** Multi-join revenue top-k (bench headline): customer x orders x lineitem,
    * revenue per order, top 10. Joins shuffle on the order key; at scale AQE
    * picks broadcast for the customer dim. */
  private val q3JoinTopk: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3JoinTopkSql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ------------------------------------------------------------------ date scalar surface
  /** Date-function surface (§2.7): per-month order counts + avg ship delay. */
  private val fDateOps: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay"))
      .groupBy("order_year", "order_month")
      .agg(count(lit(1)).as("n_lines"),
        round(avg(col("delay")), 4).as("avg_ship_delay_days"))
      .orderBy("order_year", "order_month")
  }

  private val fDateOpsSql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
      |  count(*) AS n_lines,
      |  round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4)
      |    AS avg_ship_delay_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "a1_rollup_counts" -> a1RollupCounts,
    "a14_cube" -> a14Cube,
    "a15_grouping_sets" -> a15GroupingSets,
    "a2_unknown_labels" -> a2UnknownLabels,
    "a4_distinct" -> a4Distinct,
    "a5_cardinality" -> a5Cardinality,
    "a6_invariant" -> a6Invariant,
    "a7_envelope" -> a7Envelope,
    "w3_topk_rank" -> w3TopkRank,
    "q3_join_topk" -> q3JoinTopk,
    "f_date_ops" -> fDateOps
  )

  val oracle: Map[String, String] = Map(
    "a1_rollup_counts" -> a1RollupCountsSql,
    "a14_cube" -> a14CubeSql,
    "a15_grouping_sets" -> a15GroupingSetsSql,
    "a2_unknown_labels" -> a2UnknownLabelsSql,
    "a4_distinct" -> a4DistinctSql,
    "a5_cardinality" -> a5CardinalitySql,
    "a6_invariant" -> a6InvariantSql,
    "a7_envelope" -> a7EnvelopeSql,
    "w3_topk_rank" -> w3TopkRankSql,
    "q3_join_topk" -> q3JoinTopkSql,
    "f_date_ops" -> fDateOpsSql
  )
}
