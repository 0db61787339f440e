package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.ColumnOps

/** The relational operator catalog (SURVEY.md §2.2–§2.6, §2.8) re-expressed
  * over the driver corpus, each with a DuckDB-oracle SQL twin.
  *
  * Conventions shared with every oracle:
  *  - every computed column is aliased identically on both sides;
  *  - every query ends in a deterministic total ORDER BY;
  *  - double aggregates are rounded (2 dp for sums of money, 4 dp for ratios)
  *    so summation-order differences between engines cannot flip the hash.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ A1: group-by agg
  /** Pricing-summary aggregation (the reference's hand-rolled per-class count
    * table, `src/az_proc.py:764-837`, generalized to multi-measure agg). */
  private val q1Agg: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ A3: crosstab + margins
  private val priorities = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_notspec", "5-LOW" -> "p5_low")

  /** status x priority crosstab with a Total column and a Total margin row,
    * sorted Total desc — the E3 reporting query shape
    * (`distribution_by_county_state.py:32-48`). */
  private val a3CrosstabCount: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val piv = priorities.foldLeft(
      o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities.map(_._1)).count()
        .na.fill(0)) { case (df, (v, alias)) => df.withColumnRenamed(v, alias) }
    // cached: the margin row re-reads the pivot
    val withTotal = piv.withColumn(
      "total", priorities.map(p => col(p._2)).reduce(_ + _)).cache()
    val marginAggs = priorities.map(p => sum(col(p._2)).as(p._2)) :+ sum(col("total")).as("total")
    val margin = withTotal.groupBy().agg(marginAggs.head, marginAggs.tail: _*)
      .withColumn("o_orderstatus", lit("Total"))
      .select("o_orderstatus", (priorities.map(_._2) :+ "total"): _*)
    withTotal.unionByName(margin)
      .orderBy(col("total").desc, col("o_orderstatus"))
  }

  private val a3CrosstabCountSql =
    """WITH base AS (
      |  SELECT o_orderstatus,
      |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
      |    count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
      |    count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
      |    count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_notspec,
      |    count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low,
      |    count(*) AS total
      |  FROM orders GROUP BY 1),
      |marg AS (
      |  SELECT 'Total' AS o_orderstatus,
      |    CAST(sum(p1_urgent) AS BIGINT) AS p1_urgent,
      |    CAST(sum(p2_high) AS BIGINT) AS p2_high,
      |    CAST(sum(p3_medium) AS BIGINT) AS p3_medium,
      |    CAST(sum(p4_notspec) AS BIGINT) AS p4_notspec,
      |    CAST(sum(p5_low) AS BIGINT) AS p5_low,
      |    CAST(sum(total) AS BIGINT) AS total
      |  FROM base)
      |SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM marg)
      |ORDER BY total DESC, o_orderstatus""".stripMargin

  /** Percent-normalized crosstab (pandas `normalize='all'` in the reference). */
  private val a3CrosstabPct: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val pctAggs = priorities.map { case (v, alias) =>
      count(when(col("o_orderpriority") === v, 1)).as(alias)
    }
    val counts = o.groupBy("o_orderstatus").agg(pctAggs.head, pctAggs.tail: _*)
    val all = Window.partitionBy()
    // materialize the grand total BEFORE overwriting any count column, else
    // later percents would divide by already-percented columns
    val withGrand = counts.withColumn(
      "grand", sum(priorities.map(p => col(p._2)).reduce(_ + _)).over(all))
    priorities.foldLeft(withGrand) { case (df, (_, alias)) =>
      df.withColumn(alias, round(col(alias) * 100.0 / col("grand"), 4))
    }.drop("grand").orderBy("o_orderstatus")
  }

  private val a3CrosstabPctSql =
    """WITH base AS (
      |  SELECT o_orderstatus,
      |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS c1,
      |    count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS c2,
      |    count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS c3,
      |    count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS c4,
      |    count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS c5
      |  FROM orders GROUP BY 1),
      |g AS (SELECT *, sum(c1 + c2 + c3 + c4 + c5) OVER () AS grand FROM base)
      |SELECT o_orderstatus,
      |  round(c1 * 100.0 / grand, 4) AS p1_urgent,
      |  round(c2 * 100.0 / grand, 4) AS p2_high,
      |  round(c3 * 100.0 / grand, 4) AS p3_medium,
      |  round(c4 * 100.0 / grand, 4) AS p4_notspec,
      |  round(c5 * 100.0 / grand, 4) AS p5_low
      |FROM g ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------------ J1/J2: semi/anti joins
  /** Chips-with-XML separation (`src/az_proc.py:528-541`) as a broadcastable
    * left-semi join: customers having at least one order. */
  private val j1Semi: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val j1SemiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** Negative-chip separation (`src/az_proc.py:544-561`) as left-anti:
    * customers with no URGENT order (the urgent filter keeps the result
    * non-degenerate — every customer has *some* order in the corpus). */
  private val j2Anti: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val j2AntiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ W1: first-occurrence dedup
  /** `np.unique(return_index=True)` first-row-per-key dedup
    * (`src/form_calcs.py:105-116`) via row_number. */
  private val w1DedupFirst: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  private val w1DedupFirstSql =
    """SELECT o_custkey, o_orderkey, o_orderdate FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------------ W2/U2: allocation state machine
  /** Allocation: first-N rows under an explicit total order go to annotators
    * round-robin (`src/az_proc.py:408-445` made deterministic, SURVEY.md W2). */
  private val w2LimitAllocation: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    // first-N under a total order: orderBy+limit plans as
    // TakeOrderedAndProject (per-partition top-N, driver merge of P*N
    // rows) — no full shuffle, no global window. The row_number below
    // runs over exactly N=100 rows, bounded by the limit, not the data.
    val top = o.orderBy(col("o_orderdate"), col("o_orderkey")).limit(100)
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    top.withColumn("rn", row_number().over(w))
      .withColumn("annotator", concat(lit("annotator_"), ((col("rn") - 1) % 4).cast("int")))
      .select("o_orderkey", "o_orderdate", "annotator")
      .orderBy("o_orderkey")
  }

  private val w2LimitAllocationSql =
    """SELECT o_orderkey, o_orderdate,
      |  'annotator_' || CAST(CAST((rn - 1) % 4 AS INTEGER) AS VARCHAR) AS annotator
      |FROM (SELECT o_orderkey, o_orderdate,
      |        row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 100 ORDER BY o_orderkey""".stripMargin

  /** Remaining = all minus allocated (`np.delete` offset semantics,
    * `src/az_proc.py:437-438`) via exceptAll. */
  private val u2ExceptRemaining: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    // remaining = all minus the first-100: the allocated set comes from
    // TakeOrderedAndProject (see w2) and is anti-joined back broadcast —
    // one narrow pass over the fact table, no full-table exceptAll
    // shuffle. Keys are unique, so anti-join == EXCEPT ALL here.
    val allocated = o.orderBy(col("o_orderdate"), col("o_orderkey")).limit(100)
      .select("o_orderkey")
    o.select("o_orderkey")
      .join(broadcast(allocated), Seq("o_orderkey"), "left_anti")
      .orderBy("o_orderkey")
  }

  private val u2ExceptRemainingSql =
    """SELECT o_orderkey FROM orders
      |EXCEPT ALL
      |SELECT o_orderkey FROM (
      |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 100
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------------ P4 + P1: URL build / parse
  /** Synthetic tile catalog: blob-URL construction from parts
    * (`src/az_proc.py:255-266,304-336`): concat_ws/lower/lpad/CASE. */
  private def tileCatalog(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    n.select(
      lower(substring(col("n_name"), 1, 2)).as("state"),
      (lit(2018) + col("n_nationkey") % 5).as("year"),
      when(col("n_nationkey") % 2 === 0, "60cm").otherwise("100cm").as("resolution"),
      lpad((col("n_nationkey") * 13 % 100000).cast("string"), 5, "0").as("quad"),
      col("n_nationkey"))
      .withColumn("tile_name",
        concat_ws("_", lit("m"), col("quad"), lit("ne"),
          (col("n_nationkey") % 60).cast("string"), lit("060"),
          concat(col("year").cast("string"), lit("0601"))))
      .withColumn("tile_url",
        concat_ws("/", lit("https://naipblobs.blob.core.windows.net/naip"),
          lit("v002"), col("state"), col("year").cast("string"),
          concat_ws("_", col("state"), col("resolution"), col("year").cast("string")),
          col("quad"), concat(col("tile_name"), lit(".tif"))))
  }

  private val tileCatalogSql =
    """SELECT *,
      |    concat_ws('_', 'm', quad, 'ne', CAST(n_nationkey % 60 AS VARCHAR), '060',
      |              CAST(year AS VARCHAR) || '0601') AS tile_name
      |  FROM (
      |    SELECT lower(substring(n_name, 1, 2)) AS state,
      |      2018 + n_nationkey % 5 AS year,
      |      CASE WHEN n_nationkey % 2 = 0 THEN '60cm' ELSE '100cm' END AS resolution,
      |      lpad(CAST(n_nationkey * 13 % 100000 AS VARCHAR), 5, '0') AS quad,
      |      n_nationkey
      |    FROM nation)""".stripMargin

  private val p4UrlBuild: Q = (spark, dir) =>
    tileCatalog(spark, dir)
      .select("state", "year", "resolution", "quad", "tile_name", "tile_url")
      .orderBy("tile_name")

  private val p4UrlBuildSql =
    s"""SELECT state, year, resolution, quad, tile_name,
       |  concat_ws('/', 'https://naipblobs.blob.core.windows.net/naip', 'v002',
       |    state, CAST(year AS VARCHAR),
       |    concat_ws('_', state, resolution, CAST(year AS VARCHAR)),
       |    quad, tile_name || '.tif') AS tile_url
       |FROM ($tileCatalogSql)
       |ORDER BY tile_name""".stripMargin

  /** Parse the URLs back into catalog columns (`src/az_proc.py:236-243`). */
  private val p1PathParse: Q = (spark, dir) => {
    val urls = tileCatalog(spark, dir).select("tile_url")
    val cols = ColumnOps.parseTileUrl(col("tile_url")).map { case (n, c) => c.as(n) }
    urls.select(cols.toIndexedSeq: _*).orderBy("tile_name")
  }

  private val p1PathParseSql =
    s"""WITH u AS (SELECT concat_ws('/', 'https://naipblobs.blob.core.windows.net/naip', 'v002',
       |    state, CAST(year AS VARCHAR),
       |    concat_ws('_', state, resolution, CAST(year AS VARCHAR)),
       |    quad, tile_name || '.tif') AS tile_url FROM ($tileCatalogSql)),
       |p AS (SELECT string_split(tile_url, '/') AS parts FROM u)
       |SELECT parts[-6] AS version, parts[-5] AS state,
       |  CAST(parts[-4] AS INTEGER) AS year, parts[-3] AS state_res_year,
       |  parts[-2] AS quad,
       |  regexp_replace(parts[-1], '\\.tif$$', '') AS tile_name,
       |  regexp_extract(parts[-3], '_(\\d*cm)_', 1) AS resolution
       |FROM p ORDER BY tile_name""".stripMargin

  /** P5: recency/resolution filter (`src/az_proc.py:244-247`). */
  private val p5RecencyFilter: Q = (spark, dir) =>
    tileCatalog(spark, dir)
      .filter(col("year") >= 2019 && col("resolution").isin("60cm", "060cm"))
      .select("tile_name", "year", "resolution")
      .orderBy("tile_name")

  private val p5RecencyFilterSql =
    s"""SELECT tile_name, year, resolution FROM ($tileCatalogSql)
       |WHERE year >= 2019 AND resolution IN ('60cm', '060cm')
       |ORDER BY tile_name""".stripMargin

  // ------------------------------------------------------------------ G1: chip-grid explode
  /** Tile -> 512px chip grid explode (`src/az_proc.py:501-526`): the
    * reference's only table-generating function, as `explode(sequence(...))`
    * — embarrassingly parallel at any tile count. */
  private val g1ChipGrid: Q = (spark, dir) => {
    val t = tileCatalog(spark, dir)
      .withColumn("tile_h", (lit(5000) + col("n_nationkey") * 613 % 3000).cast("int"))
      .withColumn("tile_w", (lit(6000) + col("n_nationkey") * 389 % 2600).cast("int"))
    t.withColumn("row", explode(sequence(lit(0), ceil(col("tile_h") / lit(512.0)).cast("int") - 1)))
      .withColumn("col", explode(sequence(lit(0), ceil(col("tile_w") / lit(512.0)).cast("int") - 1)))
      .select(
        col("tile_name"),
        col("row"), col("col"),
        ColumnOps.chipName(col("tile_name"), col("row"), col("col")).as("chip_name"),
        (col("col") * 512).as("minx"),
        (col("row") * 512).as("miny"),
        least((col("col") + 1) * 512, col("tile_w")).as("maxx"),
        least((col("row") + 1) * 512, col("tile_h")).as("maxy"))
      .orderBy("tile_name", "row", "col")
  }

  private val g1ChipGridSql =
    s"""WITH t AS (
       |  SELECT tile_name,
       |    CAST(5000 + n_nationkey * 613 % 3000 AS INTEGER) AS tile_h,
       |    CAST(6000 + n_nationkey * 389 % 2600 AS INTEGER) AS tile_w
       |  FROM ($tileCatalogSql))
       |SELECT tile_name, CAST(r.r AS INTEGER) AS row, CAST(c.c AS INTEGER) AS col,
       |  concat_ws('_', tile_name, lpad(CAST(r.r AS VARCHAR), 2, '0'),
       |            lpad(CAST(c.c AS VARCHAR), 2, '0')) AS chip_name,
       |  CAST(c.c * 512 AS INTEGER) AS minx,
       |  CAST(r.r * 512 AS INTEGER) AS miny,
       |  CAST(least((c.c + 1) * 512, tile_w) AS INTEGER) AS maxx,
       |  CAST(least((r.r + 1) * 512, tile_h) AS INTEGER) AS maxy
       |FROM t, generate_series(0, 31) r(r), generate_series(0, 31) c(c)
       |WHERE r.r < CAST(ceil(tile_h / 512.0) AS INTEGER)
       |  AND c.c < CAST(ceil(tile_w / 512.0) AS INTEGER)
       |ORDER BY tile_name, row, col""".stripMargin

  // ------------------------------------------------------------------ J8: spatial argmax join
  /** Greatest-overlap spatial join (`src/form_calcs.py:992-1037`): synthetic
    * tank bboxes x a 5x5 rectangular "county" grid; exact integer overlap
    * area; argmax via row_number; counties broadcast. */
  private val j8SpatialArgmax: Q = (spark, dir) => {
    val tanks = Tables.customer(spark, dir).select(
      col("c_custkey"),
      (col("c_custkey") * 37 % 1000).as("cx"),
      (col("c_custkey") * 91 % 800).as("cy"))
      .select(
        col("c_custkey"),
        (col("cx") - 30).as("tx1"), (col("cy") - 30).as("ty1"),
        (col("cx") + 30).as("tx2"), (col("cy") + 30).as("ty2"))
    val counties = Tables.nation(spark, dir).select(
      col("n_nationkey").as("county_key"),
      (col("n_nationkey") % 5 * 200).as("kx1"),
      (floor(col("n_nationkey") / 5) * 160).as("ky1"))
      .withColumn("kx2", col("kx1") + 200)
      .withColumn("ky2", col("ky1") + 160)
    val overlap =
      greatest(lit(0L), least(col("tx2"), col("kx2")) - greatest(col("tx1"), col("kx1"))) *
        greatest(lit(0L), least(col("ty2"), col("ky2")) - greatest(col("ty1"), col("ky1")))
    val joined = tanks.join(broadcast(counties), overlap > 0)
      .withColumn("overlap", overlap)
    val w = Window.partitionBy("c_custkey").orderBy(col("overlap").desc, col("county_key"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("county_key"), col("overlap").cast("long").as("overlap"))
      .orderBy("c_custkey")
  }

  /** Shared with the JTS-backed variant in PipelineQueries, which must
    * produce byte-identical results through real geometry. */
  private[queries] val j8ArgmaxOracleSql =
    """WITH tanks AS (
      |  SELECT c_custkey,
      |    c_custkey * 37 % 1000 - 30 AS tx1, c_custkey * 91 % 800 - 30 AS ty1,
      |    c_custkey * 37 % 1000 + 30 AS tx2, c_custkey * 91 % 800 + 30 AS ty2
      |  FROM customer),
      |counties AS (
      |  SELECT n_nationkey AS county_key,
      |    n_nationkey % 5 * 200 AS kx1, floor(n_nationkey / 5) * 160 AS ky1,
      |    n_nationkey % 5 * 200 + 200 AS kx2, floor(n_nationkey / 5) * 160 + 160 AS ky2
      |  FROM nation),
      |joined AS (
      |  SELECT c_custkey, county_key,
      |    greatest(0, least(tx2, kx2) - greatest(tx1, kx1)) *
      |      greatest(0, least(ty2, ky2) - greatest(ty1, ky1)) AS overlap
      |  FROM tanks, counties
      |  WHERE greatest(0, least(tx2, kx2) - greatest(tx1, kx1)) *
      |        greatest(0, least(ty2, ky2) - greatest(ty1, ky1)) > 0)
      |SELECT c_custkey, county_key, CAST(overlap AS BIGINT) AS overlap FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |             ORDER BY overlap DESC, county_key) AS rn
      |  FROM joined) WHERE rn = 1 ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "a3_crosstab_count" -> a3CrosstabCount,
    "a3_crosstab_pct" -> a3CrosstabPct,
    "j1_semi" -> j1Semi,
    "j2_anti" -> j2Anti,
    "w1_dedup_first" -> w1DedupFirst,
    "w2_limit_allocation" -> w2LimitAllocation,
    "u2_except_remaining" -> u2ExceptRemaining,
    "p4_url_build" -> p4UrlBuild,
    "p1_path_parse" -> p1PathParse,
    "p5_recency_filter" -> p5RecencyFilter,
    "g1_chip_grid" -> g1ChipGrid,
    "j8_spatial_argmax" -> j8SpatialArgmax
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "a3_crosstab_count" -> a3CrosstabCountSql,
    "a3_crosstab_pct" -> a3CrosstabPctSql,
    "j1_semi" -> j1SemiSql,
    "j2_anti" -> j2AntiSql,
    "w1_dedup_first" -> w1DedupFirstSql,
    "w2_limit_allocation" -> w2LimitAllocationSql,
    "u2_except_remaining" -> u2ExceptRemainingSql,
    "p4_url_build" -> p4UrlBuildSql,
    "p1_path_parse" -> p1PathParseSql,
    "p5_recency_filter" -> p5RecencyFilterSql,
    "g1_chip_grid" -> g1ChipGridSql,
    "j8_spatial_argmax" -> j8ArgmaxOracleSql
  )
}
