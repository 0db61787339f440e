package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.ColumnOps

/** Join-family operators (SURVEY.md §2.3, §2.6): update join, catalog-dup
  * resolution, range (point-in-rect) join, set ops, self theta-join.
  * All small sides broadcast; every oracle is exact-arithmetic SQL.
  */
object JoinQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ J4: update join
  /** Tracker path-refresh (`src/az_proc.py:674-706`): left join the rescan
    * and keep the new path when present (`coalesce(new, old)`). */
  private val j4UpdateJoin: Q = (spark, dir) => {
    val tracker = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      concat(lit("orig/"), col("o_orderkey")).as("old_path"))
    val rescan = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        concat(lit("rescanned/"), col("o_orderkey")).as("new_path"))
    tracker.join(rescan, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("new_path"), col("old_path")).as("chip_pathway"))
      .orderBy("o_orderkey")
  }

  private val j4UpdateJoinSql =
    """SELECT t.o_orderkey,
      |  coalesce(r.new_path, t.old_path) AS chip_pathway
      |FROM (SELECT o_orderkey, 'orig/' || CAST(o_orderkey AS VARCHAR) AS old_path
      |      FROM orders) t
      |LEFT JOIN (SELECT o_orderkey, 'rescanned/' || CAST(o_orderkey AS VARCHAR) AS new_path
      |           FROM orders WHERE o_orderpriority = '1-URGENT') r
      |  ON t.o_orderkey = r.o_orderkey
      |ORDER BY t.o_orderkey""".stripMargin

  // ------------------------------------------------------------------ J5: catalog dup resolution
  /** Catalog lookup with duplicate-storage-account resolution
    * (`src/form_calcs.py:219-246`): one row per stem has 1 URL, a third of
    * them have 2 (two accounts); if duplicated take the second URL in
    * lexicographic order, else the only one — `row_number` window dedup. */
  private val j5CatalogDup: Q = (spark, dir) => {
    val p = Tables.part(spark, dir)
    val acct1 = p.select(col("p_partkey").as("stem"),
      concat(lit("https://naipblobs/acct1/t"), col("p_partkey"), lit(".tif")).as("tile_url"))
    val acct2 = p.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("stem"),
        concat(lit("https://naipeuwest/acct2/t"), col("p_partkey"), lit(".tif")).as("tile_url"))
    val cat = acct1.unionByName(acct2)
    val w = Window.partitionBy("stem").orderBy("tile_url")
    cat.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("stem")))
      .filter((col("cnt") === 1 && col("rn") === 1) || (col("cnt") >= 2 && col("rn") === 2))
      .select("stem", "tile_url")
      .orderBy("stem")
  }

  private val j5CatalogDupSql =
    """WITH cat AS (
      |  SELECT p_partkey AS stem,
      |    'https://naipblobs/acct1/t' || CAST(p_partkey AS VARCHAR) || '.tif' AS tile_url
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey AS stem,
      |    'https://naipeuwest/acct2/t' || CAST(p_partkey AS VARCHAR) || '.tif' AS tile_url
      |  FROM part WHERE p_partkey % 3 = 0),
      |ranked AS (
      |  SELECT stem, tile_url,
      |    row_number() OVER (PARTITION BY stem ORDER BY tile_url) AS rn,
      |    count(*) OVER (PARTITION BY stem) AS cnt
      |  FROM cat)
      |SELECT stem, tile_url FROM ranked
      |WHERE (cnt = 1 AND rn = 1) OR (cnt >= 2 AND rn = 2)
      |ORDER BY stem""".stripMargin

  // ------------------------------------------------------------------ J7: point-in-rect range join
  /** Point -> tile lookup (`src/az_proc.py:133-191`, rtree) as a broadcast
    * range join: event "points" against the 5x5 rect grid; half-open edges
    * make the assignment unique. At cluster scale the small rect index is
    * broadcast, so no shuffle of the big point table. */
  private val j7RangeJoin: Q = (spark, dir) => {
    val pts = Tables.events(spark, dir).select(
      col("event_id"),
      (col("event_id") * 97 % 1000).as("px"),
      (col("event_id") * 31 % 800).as("py"))
    val rects = Tables.nation(spark, dir).select(
      col("n_nationkey").as("county_key"),
      (col("n_nationkey") % 5 * 200).as("kx1"),
      (floor(col("n_nationkey") / 5) * 160).as("ky1"))
      .withColumn("kx2", col("kx1") + 200)
      .withColumn("ky2", col("ky1") + 160)
    pts.join(broadcast(rects),
        col("px") >= col("kx1") && col("px") < col("kx2") &&
          col("py") >= col("ky1") && col("py") < col("ky2"))
      .select("event_id", "county_key", "px", "py")
      .orderBy("event_id")
  }

  private val j7RangeJoinSql =
    """SELECT event_id, n_nationkey AS county_key,
      |  event_id * 97 % 1000 AS px, event_id * 31 % 800 AS py
      |FROM events, nation
      |WHERE event_id * 97 % 1000 >= n_nationkey % 5 * 200
      |  AND event_id * 97 % 1000 <  n_nationkey % 5 * 200 + 200
      |  AND event_id * 31 % 800 >= floor(n_nationkey / 5) * 160
      |  AND event_id * 31 % 800 <  floor(n_nationkey / 5) * 160 + 160
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ J13: binned range join (both sides large)
  /** The same point->rect semantics as J7, planned for the case J7's
    * broadcast CANNOT handle: BOTH sides too large for one executor (a
    * planet-scale tile index joined against a planet-scale point stream).
    * The range predicate is turned into an equi-join by discretizing space
    * into grid cells: each point lands in exactly ONE cell; each rect
    * explodes to the (bounded) set of cells it overlaps; the join is a
    * plain equi-join on the cell key — shuffled, co-partitioned, spillable —
    * with the exact half-open predicate as a residual filter. Because a
    * point lives in one cell, every qualifying (point, rect) pair meets in
    * exactly one cell: no duplicate elimination is needed.
    *
    * The cell size (128, deliberately misaligned with the 200x160 rects)
    * caps rect fan-out at 2x3 cells; at 100 TB you size cells so fan-out
    * stays O(1) while cell occupancy stays balanced. The SHUFFLE_HASH hint
    * pins the both-sides-shuffled plan even at test scale (AQE would
    * otherwise broadcast the small fixture side, which is exactly the plan
    * this variant exists to avoid); `BinnedRangeJoinSpec` asserts the
    * exchange-fed ShuffledHashJoin. Same oracle as J7. */
  private val j13BinnedRangeJoin: Q = (spark, dir) => {
    val cell = 128
    val pts = Tables.events(spark, dir).select(
      col("event_id"),
      (col("event_id") * 97 % 1000).as("px"),
      (col("event_id") * 31 % 800).as("py"))
      .withColumn("cx", floor(col("px") / cell))
      .withColumn("cy", floor(col("py") / cell))
    val rects = Tables.nation(spark, dir).select(
      col("n_nationkey").as("county_key"),
      (col("n_nationkey") % 5 * 200).as("kx1"),
      (floor(col("n_nationkey") / 5) * 160).as("ky1"))
      .withColumn("kx2", col("kx1") + 200)
      .withColumn("ky2", col("ky1") + 160)
    // kx2/ky2 are exclusive edges: the last covered cell is (k2 - 1) / cell
    val rectCells = rects
      .withColumn("cx", explode(sequence(
        floor(col("kx1") / cell), floor((col("kx2") - 1) / cell))))
      .withColumn("cy", explode(sequence(
        floor(col("ky1") / cell), floor((col("ky2") - 1) / cell))))
    pts.join(rectCells.hint("shuffle_hash"), Seq("cx", "cy"))
      .filter(col("px") >= col("kx1") && col("px") < col("kx2") &&
        col("py") >= col("ky1") && col("py") < col("ky2"))
      .select("event_id", "county_key", "px", "py")
      .orderBy("event_id")
  }

  // ------------------------------------------------------------------ U1: union + U4 distinct-union
  /** Catalog append (`pd.concat`/`np.vstack`, `src/az_proc.py:281-288`) with
    * provenance tag, then U4 distinct-union of the key sets. */
  private val u1UnionCatalogs: Q = (spark, dir) => {
    val a = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey")).withColumn("src", lit("open"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey").as("custkey")).withColumn("src", lit("high"))
    a.unionByName(b).distinct().orderBy("custkey", "src")
  }

  private val u1UnionCatalogsSql =
    """SELECT DISTINCT * FROM (
      |  SELECT o_custkey AS custkey, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT o_custkey AS custkey, 'high' AS src FROM orders WHERE o_orderpriority = '2-HIGH')
      |ORDER BY custkey, src""".stripMargin

  // ------------------------------------------------------------------ J9/U3: 3-way intersect
  /** Three-way key intersection (`src/form_calcs.py:1069-1084`). */
  private val u3Intersect: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val b = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val c = o.filter(col("o_totalprice") > 50000).select("o_custkey")
    a.intersect(b).intersect(c).orderBy("o_custkey")
  }

  private val u3IntersectSql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 50000
      |ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------------ J10: self theta-join
  /** All-pairs box-similarity within a group (`src/form_calcs.py:716-760`):
    * lineitems of an order become boxes; emit pairs passing the calc_sim
    * predicate with id_a < id_b. Grouped self-join keeps the theta-join
    * bounded per key (orders have <= 7 lines). */
  private val j10SelfJoinPairs: Q = (spark, dir) => {
    def boxes(d: DataFrame) = d.select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey") * 13 % 300).as("x1"),
      (col("l_suppkey") * 29 % 300).as("y1"),
      (col("l_partkey") * 13 % 300 + 20 + col("l_partkey") % 40).as("x2"),
      (col("l_suppkey") * 29 % 300 + 20 + col("l_suppkey") % 40).as("y2"))
    val l = Tables.lineitem(spark, dir)
    val a = boxes(l).select(
      col("l_orderkey"), col("l_linenumber").as("id_a"),
      col("x1").as("ax1"), col("y1").as("ay1"), col("x2").as("ax2"), col("y2").as("ay2"))
    val b = boxes(l).select(
      col("l_orderkey"), col("l_linenumber").as("id_b"),
      col("x1").as("bx1"), col("y1").as("by1"), col("x2").as("bx2"), col("y2").as("by2"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("id_a") < col("id_b"))
      .filter(ColumnOps.boxesSimilar(
        col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx1"), col("by1"), col("bx2"), col("by2")))
      .select("l_orderkey", "id_a", "id_b")
      .orderBy("l_orderkey", "id_a", "id_b")
  }

  private val j10SelfJoinPairsSql =
    """WITH boxes AS (
      |  SELECT l_orderkey, l_linenumber AS id,
      |    l_partkey * 13 % 300 AS x1, l_suppkey * 29 % 300 AS y1,
      |    l_partkey * 13 % 300 + 20 + l_partkey % 40 AS x2,
      |    l_suppkey * 29 % 300 + 20 + l_suppkey % 40 AS y2
      |  FROM lineitem)
      |SELECT a.l_orderkey, a.id AS id_a, b.id AS id_b
      |FROM boxes a JOIN boxes b
      |  ON a.l_orderkey = b.l_orderkey AND a.id < b.id
      |WHERE (a.x1 <= b.x1 AND a.y1 <= b.y1 AND a.x2 >= b.x2 AND a.y2 >= b.y2)
      |   OR (b.x1 <= a.x1 AND b.y1 <= a.y1 AND b.x2 >= a.x2 AND b.y2 >= a.y2)
      |   OR (greatest(a.x1, b.x1) - least(a.x2, b.x2) <= 5
      |       AND ((a.y1 <= b.y1 AND a.y2 >= b.y2) OR (b.y1 <= a.y1 AND b.y2 >= a.y2)))
      |   OR (greatest(a.y1, b.y1) - least(a.y2, b.y2) <= 5
      |       AND ((a.x1 <= b.x1 AND a.x2 >= b.x2) OR (b.x1 <= a.x1 AND b.x2 >= a.x2)))
      |ORDER BY a.l_orderkey, id_a, id_b""".stripMargin

  // ------------------------------------------------------------------ J8 scale path: grid-bucketed spatial join
  /** The broadcast-free spatial argmax join: both sides bucket into grid
    * cells (the rect side replicated to every cell it overlaps, tanks to
    * the cells their bbox touches), the join becomes an equi-join on the
    * cell id, and duplicate candidate pairs from multi-cell overlap are
    * folded by the argmax window. Same output as the broadcast form —
    * shares its oracle — but shuffles on cell id instead of broadcasting,
    * which is the path when the polygon table outgrows broadcast size.
    * Grid pitch 200x160 matches the county tiling; in general pick
    * ~median-geometry size. */
  private val j8GridJoin: Q = (spark, dir) => {
    val cellW = 200; val cellH = 160
    val tanks = Tables.customer(spark, dir).select(
      col("c_custkey"),
      (col("c_custkey") * 37 % 1000 - 30).as("tx1"),
      (col("c_custkey") * 91 % 800 - 30).as("ty1"),
      (col("c_custkey") * 37 % 1000 + 30).as("tx2"),
      (col("c_custkey") * 91 % 800 + 30).as("ty2"))
      .withColumn("cx", explode(sequence(
        floor(col("tx1") / cellW).cast("int"), floor((col("tx2") - 1) / cellW).cast("int"))))
      .withColumn("cy", explode(sequence(
        floor(col("ty1") / cellH).cast("int"), floor((col("ty2") - 1) / cellH).cast("int"))))
    val counties = Tables.nation(spark, dir).select(
      col("n_nationkey").as("county_key"),
      (col("n_nationkey") % 5 * 200).as("kx1"),
      (floor(col("n_nationkey") / 5) * 160).as("ky1"))
      .withColumn("kx2", col("kx1") + 200)
      .withColumn("ky2", col("ky1") + 160)
      .withColumn("cx", explode(sequence(
        floor(col("kx1") / cellW).cast("int"), floor((col("kx2") - 1) / cellW).cast("int"))))
      .withColumn("cy", explode(sequence(
        floor(col("ky1") / cellH).cast("int"), floor((col("ky2") - 1) / cellH).cast("int"))))
    val overlap =
      greatest(lit(0L), least(col("tx2"), col("kx2")) - greatest(col("tx1"), col("kx1"))) *
        greatest(lit(0L), least(col("ty2"), col("ky2")) - greatest(col("ty1"), col("ky1")))
    val joined = tanks.join(counties, Seq("cx", "cy"))
      .withColumn("overlap", overlap)
      .filter(col("overlap") > 0)
      .select("c_custkey", "county_key", "overlap").distinct()
    val w = Window.partitionBy("c_custkey").orderBy(col("overlap").desc, col("county_key"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_custkey"), col("county_key"), col("overlap").cast("long").as("overlap"))
      .orderBy("c_custkey")
  }

  // ------------------------------------------------------------------ upsert (MERGE INTO shape)
  /** Delta-style upsert via full outer join + per-column coalesce
    * (SURVEY §2.9 tracker lifecycle): source rows update matching targets,
    * unmatched sources insert, unmatched targets persist; each row tagged
    * with the action taken. */
  private val jUpsert: Q = (spark, dir) => {
    val target = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
    val source = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), lit("U").as("status"),
        round(col("o_totalprice") + 1000.0, 2).as("price"))
    target.as("t").join(source.as("s"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("s.status"), col("t.status")).as("status"),
        round(coalesce(col("s.price"), col("t.price")), 2).as("price"),
        when(col("s.status").isNotNull && col("t.status").isNotNull, "update")
          .when(col("s.status").isNotNull, "insert")
          .otherwise("keep").as("action"))
      .orderBy("o_orderkey")
  }

  private val jUpsertSql =
    """WITH target AS (
      |  SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |source AS (
      |  SELECT o_orderkey, 'U' AS status, round(o_totalprice + 1000.0, 2) AS price
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
      |  coalesce(s.status, t.status) AS status,
      |  round(coalesce(s.price, t.price), 2) AS price,
      |  CASE WHEN s.status IS NOT NULL AND t.status IS NOT NULL THEN 'update'
      |       WHEN s.status IS NOT NULL THEN 'insert'
      |       ELSE 'keep' END AS action
      |FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------------ J11 (north-star): as-of join
  /** As-of join composed from built-ins (per the custom-operator policy:
    * window functions express it, so no custom Strategy): for every error
    * event, the user's most recent click at-or-before it. Union-tag +
    * `last(..., ignoreNulls)` running window — one shuffle on user_id,
    * no self-join. */
  private val j11AsofJoin: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val tagged = e.filter(col("event_type").isin("click", "error"))
      .select(col("user_id"), col("event_id"), col("event_type").as("kind"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click_id",
        last(when(col("kind") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts_us",
        last(when(col("kind") === "click", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("kind") === "error")
      .select("user_id", "event_id", "ts_us", "asof_click_id", "asof_click_ts_us")
      .orderBy("user_id", "event_id")
  }

  private val j11AsofJoinSql =
    """WITH tagged AS (
      |  SELECT user_id, event_id, event_type AS kind,
      |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
      |  FROM events WHERE event_type IN ('click', 'error'))
      |SELECT user_id, event_id, ts_us, asof_click_id, asof_click_ts_us FROM (
      |  SELECT *,
      |    last_value(CASE WHEN kind = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, kind, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id,
      |    last_value(CASE WHEN kind = 'click' THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, kind, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_ts_us
      |  FROM tagged)
      |WHERE kind = 'error'
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "j4_update_join" -> j4UpdateJoin,
    "j5_catalog_dup" -> j5CatalogDup,
    "j7_range_join" -> j7RangeJoin,
    "j13_binned_range_join" -> j13BinnedRangeJoin,
    "u1_union_catalogs" -> u1UnionCatalogs,
    "u3_intersect" -> u3Intersect,
    "j10_selfjoin_pairs" -> j10SelfJoinPairs,
    "j11_asof_join" -> j11AsofJoin,
    "j8_grid_join" -> j8GridJoin,
    "j_upsert" -> jUpsert
  )

  val oracle: Map[String, String] = Map(
    "j4_update_join" -> j4UpdateJoinSql,
    "j5_catalog_dup" -> j5CatalogDupSql,
    "j7_range_join" -> j7RangeJoinSql,
    "j13_binned_range_join" -> j7RangeJoinSql,
    "u1_union_catalogs" -> u1UnionCatalogsSql,
    "u3_intersect" -> u3IntersectSql,
    "j10_selfjoin_pairs" -> j10SelfJoinPairsSql,
    "j11_asof_join" -> j11AsofJoinSql,
    "j8_grid_join" -> RelationalQueries.j8ArgmaxOracleSql,
    "j_upsert" -> jUpsertSql
  )
}
