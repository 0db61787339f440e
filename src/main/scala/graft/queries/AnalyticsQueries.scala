package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Classic analytic shapes rounding out the north-star surface: deep
  * multi-join aggregation (join-reorder showcase), pushdown-friendly
  * filter aggregation, window frames, and the SQL-text entry point. */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ deep multi-join (Q5 shape)
  /** Revenue by nation through customer/orders/lineitem/supplier with the
    * co-nation constraint — six relations; Catalyst reorders, dims
    * broadcast, fact shuffles once per join key. */
  private val q5NationRevenue: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  private val q5NationRevenueSql =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ filter agg (Q6 shape)
  /** Pure scan+filter+agg — the pushdown showcase (predicates reach the
    * Parquet reader, scan reads 4 of 11 columns). */
  private val q6ForecastRevenue: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_discount").between(0.02, 0.08) &&
        col("l_quantity") < 24 &&
        year(col("l_shipdate")) === 2024)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("promo_revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q6ForecastRevenueSql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS promo_revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.02 AND 0.08
      |  AND l_quantity < 24 AND year(l_shipdate) = 2024""".stripMargin

  // ------------------------------------------------------------------ window frames
  /** Moving average over the customer's last 3 orders — the frame-spec
    * window surface (rows between 2 preceding and current). */
  private val w4MovingAvg: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    // avg is rounded to 4dp, not 2: sum/3 lands exactly on .xx5 decimal
    // boundaries where Spark (exact-BigDecimal HALF_UP) and DuckDB
    // (scale-multiply-then-round) disagree; /3 quotients cannot sit on a
    // .00005 boundary, so 4dp is engine-stable
    o.select(col("o_custkey"), col("o_orderkey"),
        round(avg(col("o_totalprice")).over(w), 4).as("moving_avg_3"),
        round(sum(col("o_totalprice")).over(w), 2).as("moving_sum_3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val w4MovingAvgSql =
    """SELECT o_custkey, o_orderkey,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum_3
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------------------------ ranking family
  /** ntile / percent_rank / cume_dist over a deterministic total order. */
  private val w5RankFamily: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    c.select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  private val w5RankFamilySql =
    """SELECT c_mktsegment, c_custkey,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ------------------------------------------------------------------ array/map scalar family
  /** Array construction, set ops, sort, slice, flatten, and map lookup —
    * results serialized with array_join so comparisons are engine-stable. */
  private val fArrayOps: Q = (spark, dir) => {
    val p = Tables.part(spark, dir)
    val words = split(col("p_name"), " ")
    val brandChars = split(regexp_replace(col("p_brand"), "Brand#", ""), "")
    p.select(col("p_partkey"),
        array_join(array_sort(array_union(words, array(lit("tank")))), ",").as("union_sorted"),
        array_join(array_intersect(words, array(lit("widget"), lit("bolt"), lit("rod"))), ",").as("known_kinds"),
        array_join(slice(words, 1, 1), ",").as("first_word"),
        size(flatten(array(words, brandChars))).cast("int").as("n_flat"),
        element_at(
          map(lit("ECONOMY"), lit(1), lit("PROMO"), lit(2), lit("LARGE"), lit(3),
            lit("MEDIUM"), lit(4), lit("SMALL"), lit(5), lit("STANDARD"), lit(6)),
          col("p_type")).cast("int").as("type_code"))
      .orderBy("p_partkey")
  }

  private val fArrayOpsSql =
    """SELECT p_partkey,
      |  array_to_string(list_sort(list_distinct(
      |      list_concat(string_split(p_name, ' '), ['tank']))), ',') AS union_sorted,
      |  coalesce(array_to_string(list_filter(string_split(p_name, ' '),
      |      x -> x IN ('widget', 'bolt', 'rod')), ','), '') AS known_kinds,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  CAST(len(string_split(p_name, ' '))
      |    + len(string_split(replace(p_brand, 'Brand#', ''), '')) AS INTEGER) AS n_flat,
      |  CAST(CASE p_type WHEN 'ECONOMY' THEN 1 WHEN 'PROMO' THEN 2
      |       WHEN 'LARGE' THEN 3 WHEN 'MEDIUM' THEN 4 WHEN 'SMALL' THEN 5
      |       WHEN 'STANDARD' THEN 6 END AS INTEGER) AS type_code
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------------ SQL-text entry
  /** The spark.sql(...) surface: corpus registered as temp views, query
    * expressed as SQL text — proves the engine's catalog path. */
  private val sqlTextAgg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS cnt
        |FROM graft_lineitem
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  private val sqlTextAggSql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ skew diagnostics
  /** Key-distribution diagnostics — the report an operator runs BEFORE
    * picking a shuffle strategy on a 100 TB join/agg key: key cardinality,
    * max/avg per-key row counts, the skew ratio, the derived salt factor
    * a12-style salting would need, and the top-5 hot keys. One row; the
    * heavy lifting is a single map-side-combined count per key, then a
    * 5-row TakeOrderedAndProject and two tiny broadcast-size aggregates —
    * nothing here grows with the key count except the first exchange. */
  private val a16SkewReport: Q = (spark, dir) => {
    val cnts = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    val hot = cnts.orderBy(col("cnt").desc, col("l_suppkey")).limit(5)
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(-cnt AS negc, l_suppkey AS k, cnt AS c))), x -> concat(x.k, ':', x.c))"),
        ",").as("hot_keys"))
    cnts.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("total_rows"),
      max("cnt").as("max_cnt"),
      round(sum("cnt").cast("double") / count(lit(1)), 4).as("avg_cnt"))
      .withColumn("skew_ratio", round(col("max_cnt") / col("avg_cnt"), 4))
      .withColumn("suggested_salt", ceil(col("max_cnt") / col("avg_cnt")).cast("int"))
      .crossJoin(broadcast(hot))
  }

  private val a16SkewReportSql =
    """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
      |    CAST(max(cnt) AS BIGINT) AS max_cnt,
      |    round(CAST(sum(cnt) AS DOUBLE) / count(*), 4) AS avg_cnt
      |  FROM c),
      |h AS (
      |  SELECT string_agg(l_suppkey || ':' || cnt, ',' ORDER BY cnt DESC, l_suppkey) AS hot_keys
      |  FROM (SELECT * FROM c ORDER BY cnt DESC, l_suppkey LIMIT 5))
      |SELECT n_keys, total_rows, max_cnt, avg_cnt,
      |  round(max_cnt / avg_cnt, 4) AS skew_ratio,
      |  CAST(ceil(max_cnt / avg_cnt) AS INTEGER) AS suggested_salt, hot_keys
      |FROM s, h""".stripMargin

  // ------------------------------------------------------------------ event funnel
  /** a17: ordered-sequence funnel over the event stream — per user, the
    * first 'view', the first 'click' strictly after it, the first
    * 'purchase' strictly after that; summarized as users reaching each
    * stage. The stage times are sequential conditional-min windows over
    * the SAME user_id partitioning (one exchange, three WindowExecs), then
    * a per-user rollup on the same key — the classic product-analytics
    * funnel as one shuffle. At 100 TB this is a single hash shuffle on
    * user_id with all-integer outputs. */
  private val a17EventFunnel: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(spark, dir).select("user_id", "event_type", "ts")
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_view_click_purchase"))
  }

  private val a17EventFunnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t3 FROM s2),
      |pu AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      |  FROM s3 GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(t1) AS BIGINT) AS n_view,
      |  CAST(count(t2) AS BIGINT) AS n_view_click,
      |  CAST(count(t3) AS BIGINT) AS n_view_click_purchase
      |FROM pu""".stripMargin

  // ------------------------------------------------------------------ cohort retention
  /** a18: weekly cohort retention over the event stream — users grouped by
    * first-seen week, counted as retained in each later week they are
    * active. The cohort assignment is one min-window on user_id; the
    * matrix is one distinct + one keyed agg — two shuffles total, both on
    * bounded keys (users, then cohort x offset). Counts are exact
    * integers; week arithmetic is integer days-since-epoch, identical in
    * both engines. */
  private val a18CohortRetention: Q = (spark, dir) => {
    val wk = (c: org.apache.spark.sql.Column) =>
      floor(datediff(c.cast("date"), to_date(lit("2024-01-01"))) / 7).cast("int")
    val w = Window.partitionBy("user_id")
    Tables.events(spark, dir).select(col("user_id"), wk(col("ts")).as("week"))
      .withColumn("cohort_week", min("week").over(w))
      .select("user_id", "cohort_week", "week").distinct()
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  private val a18CohortRetentionSql =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(floor(date_diff('day', DATE '2024-01-01',
      |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) / 7.0) AS INTEGER) AS week
      |  FROM events),
      |c AS (SELECT *, min(week) OVER (PARTITION BY user_id) AS cohort_week FROM e),
      |d AS (SELECT DISTINCT user_id, cohort_week, week FROM c)
      |SELECT cohort_week, week - cohort_week AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_active
      |FROM d GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ------------------------------------------------------------------ resample + gap fill
  /** f_resample_gapfill: the time-series resample operator — events bucketed
    * to 6-hour bins per event_type, joined onto the COMPLETE bin spine
    * (cross of observed types x full calendar range) so empty bins emit
    * explicit zeros. Gap filling is what turns an event log into an
    * equally-spaced series a forecaster can consume; the spine is
    * sequence()+explode (a generator, no driver loop) and the fill is one
    * left join on (type, bin) — broadcast-sized spine at any corpus scale
    * since its cardinality is types x bins, independent of event volume. */
  private val fResampleGapfill: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 21600) * 21600).cast("long").as("bin"))
    val binned = e.groupBy("event_type", "bin").agg(count(lit(1)).as("n_events"))
    val range = e.agg(min("bin").as("lo"), max("bin").as("hi"))
    val spine = binned.select("event_type").distinct()
      .crossJoin(broadcast(range))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(21600L))).as("bin"))
    spine.join(binned, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("event_type", "bin")
  }

  private val fResampleGapfillSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT) AS bin
      |  FROM events),
      |binned AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
      |r AS (SELECT min(bin) AS lo, max(bin) AS hi FROM e),
      |spine AS (
      |  -- static series (DuckDB generate_series takes no lateral args);
      |  -- 1000 bins of 6 h = 250 days of headroom over the 1-month corpus
      |  SELECT t.event_type, CAST(r.lo + s.i * 21600 AS BIGINT) AS bin
      |  FROM (SELECT DISTINCT event_type FROM binned) t, r,
      |    generate_series(0, 999) s(i)
      |  WHERE r.lo + s.i * 21600 <= r.hi)
      |SELECT sp.event_type, sp.bin,
      |  CAST(coalesce(b.n, 0) AS BIGINT) AS n_events
      |FROM spine sp LEFT JOIN binned b
      |  ON b.event_type = sp.event_type AND b.bin = sp.bin
      |ORDER BY sp.event_type, sp.bin""".stripMargin

  // ------------------------------------------------------------------ time-range window frame
  /** w11: value-based (RANGE) window frame — events counted and summed
    * over each row's trailing 24 hours per user, the frame form w4's
    * ROWS-based moving average cannot express (a RANGE frame is bounded
    * by the ORDER-BY value, so rows with equal timestamps always share a
    * frame and tie order cannot change the result). Epoch seconds keep
    * the bound arithmetic integer-exact in both engines. */
  private val w11RangeWindow: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
      .rangeBetween(-86399, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"), col("value"))
      .select(col("user_id"), col("event_id"), col("epoch_s"),
        count(lit(1)).over(w).as("n_last_24h"),
        round(sum(col("value")).over(w), 2).as("sum_last_24h"))
      .orderBy("user_id", "event_id")
  }

  private val w11RangeWindowSql =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s, value
      |  FROM events)
      |SELECT user_id, event_id, epoch_s,
      |  CAST(count(*) OVER w AS BIGINT) AS n_last_24h,
      |  round(sum(value) OVER w, 2) AS sum_last_24h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
      |  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------ unpivot / melt
  /** f_unpivot: wide→long reshaping via `stack` (the inverse of the A3
    * pivot) — each order row melts into one row per measure. A generator
    * expression, so it stays inside whole-stage codegen with no shuffle;
    * the oracle replays it as a UNION ALL. */
  private val fUnpivot: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr(
        """stack(2,
          |  'totalprice', round(o_totalprice, 2),
          |  'custkey', CAST(o_custkey AS DOUBLE)) AS (measure, value)""".stripMargin))
      .orderBy("o_orderkey", "measure")

  private val fUnpivotSql =
    """SELECT o_orderkey, 'totalprice' AS measure, round(o_totalprice, 2) AS value
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS value
      |FROM orders
      |ORDER BY o_orderkey, measure""".stripMargin

  // ------------------------------------------------------------------ null semantics
  /** f_null_semantics: three-valued-logic parity — NULLIF, COALESCE,
    * null-safe equality (`<=>` / IS NOT DISTINCT FROM), and NULL
    * propagation through comparisons, pinned row-by-row against the
    * oracle. Engines disagreeing on null semantics corrupt every
    * downstream join/filter silently, so the parity gets its own gate. */
  private val fNullSemantics: Q = (spark, dir) =>
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg_or_null"),
        expr("coalesce(nullif(c_mktsegment, 'BUILDING'), 'was-building')").as("seg_filled"),
        expr("nullif(c_mktsegment, 'BUILDING') <=> NULL").as("is_building"),
        expr("(nullif(c_mktsegment, 'BUILDING') = 'MACHINERY') IS NULL").as("cmp_is_unknown"))
      .orderBy("c_custkey")

  private val fNullSemanticsSql =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'was-building') AS seg_filled,
      |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS is_building,
      |  (nullif(c_mktsegment, 'BUILDING') = 'MACHINERY') IS NULL AS cmp_is_unknown
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ heavy hitters
  /** a19: frequent items via the native Misra–Gries aggregate
    * ([[graft.plans.ApproxTopK]]) — top-20 supplier-key buckets by line
    * count from a bounded 2048-counter summary. The modulus keeps the key
    * domain <= 701 at every scale factor, inside the exactness window
    * (capacity >= distinct => zero evictions => the sketch IS the exact
    * top-k), so the DuckDB twin is a plain exact top-k; the approximation
    * guarantees under capacity pressure are pinned in `ApproxTopKSpec`.
    * At 100 TB this is the frequent-URLs/tokens shape: per-task state is
    * capped at `capacity` counters no matter the input, partials combine
    * map-side, and only summary buffers cross the exchange — where the
    * exact `groupBy(item)` would shuffle one row per distinct item. */
  private val a19HeavyHitters: Q = (spark, dir) => {
    graft.plans.ApproxTopK.register(spark)
    Tables.lineitem(spark, dir)
      .select((col("l_suppkey") % 701).cast("string").as("item"))
      .agg(expr("approx_top_k(item, 20, 2048)").as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.item").as("item"), col("col.est").as("est"))
      .orderBy("rank")
  }

  private val a19HeavyHittersSql =
    """SELECT CAST(rn AS INTEGER) AS rank, item, est FROM (
      |  SELECT CAST(l_suppkey % 701 AS VARCHAR) AS item,
      |    count(*) AS est,
      |    row_number() OVER (ORDER BY count(*) DESC, CAST(l_suppkey % 701 AS VARCHAR)) AS rn
      |  FROM lineitem GROUP BY 1)
      |WHERE rn <= 20 ORDER BY rank""".stripMargin

  // ------------------------------------------------------------------ count-min point frequency
  /** a20: point-frequency queries via the native Count–Min sketch
    * ([[graft.plans.CmsSketch]]) — build one 4x8192 counter grid over the
    * same bounded supplier-key domain as a19, then answer an estimate per
    * distinct item from the broadcast 1-row sketch. CMS is the dual of
    * a19's Misra–Gries: MG surfaces WHICH items are frequent, CMS answers
    * HOW OFTEN for arbitrary later point queries. The 4x8192 grid leaves
    * every one of the <= 701 items isolated in at least one hash row
    * (deterministic — the hashes are fixed), so estimates are exact and
    * the DuckDB twin is a plain `GROUP BY count(*)`; the never-undercount
    * bound under width pressure is pinned in `CountMinSketchSpec`.
    * At 100 TB: per-task state is exactly depth*width longs (256 KiB)
    * regardless of key cardinality, merge is a pointwise sum (CMS is a
    * linear sketch — merging is lossless), and only the fixed grid crosses
    * the exchange; the estimate side touches the distinct-item list, never
    * the corpus. */
  private val a20CmsFreq: Q = (spark, dir) => {
    graft.plans.CountMinSketch.register(spark)
    val items = Tables.lineitem(spark, dir)
      .select((col("l_suppkey") % 701).cast("string").as("item"))
    val sketch = items.agg(expr("cms_sketch(item, 4, 8192)").as("sk"))
    items.distinct()
      .crossJoin(broadcast(sketch))
      .select(col("item"), expr("cms_estimate(sk, item, 4, 8192)").as("est"))
      .orderBy("item")
  }

  private val a20CmsFreqSql =
    """SELECT CAST(l_suppkey % 701 AS VARCHAR) AS item, count(*) AS est
      |FROM lineitem GROUP BY 1 ORDER BY item""".stripMargin

  // ------------------------------------------------------------------ fixed-iteration PageRank
  /** gr1: three damped PageRank iterations over the symmetric
    * customer<->supplier trade graph (edges = distinct (custkey, suppkey)
    * pairs through orders x lineitem, mirrored so no node dangles) — the
    * Pregel-on-DataFrames shape: each iteration is ONE shuffled equi-join
    * of the rank table onto the edge list (contribution = rank/out-degree)
    * plus ONE keyed aggregation on the destination — both linear in edges,
    * both map-side partial. No vertex ever sees more than its neighborhood;
    * the driver only sequences iterations (bounded, here 3).
    *
    * Determinism across engines AND shuffles: ranks are scaled integers
    * (BASE = 10^12) and every step is integer arithmetic — `div` for the
    * degree split, `(85 * sum) div 100` for damping — so the per-node
    * aggregation is an exact BIGINT sum (order-independent where a double
    * sum is not) and Spark and DuckDB agree bit-for-bit. Headroom: total
    * mass is nodes x BASE; 85x a single node's inflow must stay below
    * 2^63, which holds through ~10^5 nodes and is checked per-iteration
    * at larger scales by the overflow-free BIGINT contract. */
  private val gr1PageRank: Q = (spark, dir) => {
    val base = 1000000000000L // rank scale: 1.0 == 10^12
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val fwd = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    graft.operators.PageRank.ranks(edges, iterations = 3, base = base)
      .orderBy("node")
  }

  private val gr1PageRankSql =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
      |    's:' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
      |c1 AS (SELECT e.dst, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
      |  FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node GROUP BY 1),
      |r1 AS (SELECT n.node, CAST(150000000000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c1 ON n.node = c1.dst),
      |c2 AS (SELECT e.dst, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
      |  FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node GROUP BY 1),
      |r2 AS (SELECT n.node, CAST(150000000000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c2 ON n.node = c2.dst),
      |c3 AS (SELECT e.dst, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
      |  FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON e.src = r.node GROUP BY 1),
      |r3 AS (SELECT n.node, CAST(150000000000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c3 ON n.node = c3.dst)
      |SELECT node, r AS rank FROM r3 ORDER BY node""".stripMargin

  // ------------------------------------------------------------------ recursive SQL
  /** The SAME recursive-CTE text runs on both engines (Spark 4.1's
    * WITH RECURSIVE / UnionLoop execution — the capability the rest of
    * this catalog's oracle-side-only recursive closures predate): BFS
    * from node 0 over a synthetic 2-out-degree ring graph, path counts
    * and min-hop distances per reached node. Iterations are bounded by
    * the hop guard (the recursion ships one frontier per step — the
    * driver-sequenced loop gr1 writes by hand, expressed declaratively);
    * the graph is deliberately small because UNION ALL recursion
    * enumerates PATHS — on a fact-scale graph you bound the frontier
    * (distinct per level) or use the operator form ([[graft.operators.GraphCC]]). */
  private val recursiveBfsTemplate =
    """WITH RECURSIVE edges AS (
      |  SELECT n_nationkey AS x, (n_nationkey + 1) % 25 AS y FROM %TBL%
      |  UNION ALL
      |  SELECT n_nationkey, (n_nationkey + 3) % 25 FROM %TBL%),
      |reach(n, hops) AS (
      |  SELECT 0, 0
      |  UNION ALL
      |  SELECT e.y, r.hops + 1 FROM reach r JOIN edges e ON e.x = r.n WHERE r.hops < 6)
      |SELECT n, min(hops) AS min_hops, count(*) AS n_paths
      |FROM reach GROUP BY n ORDER BY n""".stripMargin

  private val sqlRecursiveBfs: Q = (spark, dir) => {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v")
    spark.sql(recursiveBfsTemplate.replace("%TBL%", "nation_v"))
  }

  private val sqlRecursiveBfsSql = recursiveBfsTemplate.replace("%TBL%", "nation")

  // ------------------------------------------------------------------ triangle counting
  /** gr2: triangle counting on the part co-purchase graph (parts sharing
    * an order) via DEGREE-ORDERED edge orientation — the industrial
    * formulation, not the naive 3-way self-join. Orienting every edge
    * from its lower-(degree, id) endpoint makes the graph a DAG where
    * each triangle has exactly ONE pivot with two out-edges, so the count
    * is pivot-out-pairs joined against the undirected edge set — and,
    * crucially, per-node OUT-degree is bounded by O(sqrt(|E|)) whatever
    * the in-degree skew, which caps the pair-enumeration blowup a hub
    * node causes in the unoriented form (the same reason j10 bounds its
    * self-join per tile). Edge building is bounded per order
    * (lines-per-order choose 2); everything else is equi-joins on node
    * ids — all shuffled, all spillable, integer-exact. */
  /** The distinct undirected co-purchase edge set (x < y), the shared
    * input of both triangle-count forms. Edge building is bounded per
    * order (lines-per-order choose 2). */
  private def coPurchaseEdges(spark: SparkSession, dir: String) = {
    // spread: the pair enumeration above this scan is O(lines-per-order²)
    // CPU per row — a single-split scan (one row group locally) would
    // serialize it on one core; no-op once the table has >= cores splits
    val li = Tables.spread(spark, Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("s")))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
      .select(col("a.s").as("x"), col("b.s").as("y")).distinct()
  }

  private def triangleReport(und: org.apache.spark.sql.DataFrame,
                             tri: org.apache.spark.sql.DataFrame) =
    graft.operators.TriangleCount.degrees(und)
      .agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)

  /** gr2 routes through [[graft.operators.TriangleCount.sizeGatedCount]]'s LIVE
    * size gate: broadcast adjacency while its ~48 B/edge estimate fits
    * `autoBroadcastJoinThreshold` (this scale), the shuffled pair join
    * beyond it — so the 100 TB path is selected automatically, not by
    * hand-editing the query. */
  private val gr2Triangles: Q = (spark, dir) => {
    val und = coPurchaseEdges(spark, dir).cache()
    triangleReport(und, graft.operators.TriangleCount.sizeGatedCount(spark, und))
  }

  /** gr2b: the broadcast-free form FORCED (same oracle as gr2) — proves
    * the fallback the size gate selects on cluster-sized graphs against
    * the same DuckDB truth, and `TriangleCountSpec` pins its plan to
    * shuffled joins only. */
  private val gr2bTrianglesShuffled: Q = (spark, dir) => {
    val und = coPurchaseEdges(spark, dir).cache()
    triangleReport(und, graft.operators.TriangleCount.shuffledCount(
      und, graft.operators.TriangleCount.orient(und, shuffled = true)))
  }

  private val gr2TrianglesSql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
      |und AS (
      |  SELECT DISTINCT a.s AS x, b.s AS y FROM li a JOIN li b
      |  ON a.ok = b.ok AND a.s < b.s),
      |deg AS (
      |  SELECT n, count(*) AS d FROM (
      |    SELECT x AS n FROM und UNION ALL SELECT y AS n FROM und) GROUP BY 1),
      |orient AS (
      |  SELECT CASE WHEN (dx.d, u.x) < (dy.d, u.y) THEN u.x ELSE u.y END AS u,
      |         CASE WHEN (dx.d, u.x) < (dy.d, u.y) THEN u.y ELSE u.x END AS v
      |  FROM und u JOIN deg dx ON dx.n = u.x JOIN deg dy ON dy.n = u.y),
      |tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM orient e1 JOIN orient e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN und w ON w.x = e1.v AND w.y = e2.v)
      |SELECT (SELECT count(*) FROM deg) AS n_nodes,
      |       (SELECT count(*) FROM und) AS n_edges,
      |       n_triangles FROM tri""".stripMargin

  // ------------------------------------------------------------------ exact quantiles
  /** a22: EXACT interpolated quartiles per group — the counterpart of
    * a13's approx sketch. Exact percentile is the right tool when the
    * value domain is bounded (quantities, sizes, ratings): Spark's
    * Percentile aggregate keeps a per-group value->count map, so state
    * is O(distinct values) — here <= 50 — regardless of row count, and
    * partials merge map-side. (Unbounded domains are what a13's
    * approx_percentile sketch is for.) Inputs cast to BIGINT so the
    * linear interpolation lands on exact .0/.5 doubles and both engines
    * agree bit-for-bit (Spark percentile and DuckDB quantile_cont share
    * the p*(n-1) linear-interpolation definition). */
  private val a22ExactMedian: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(q, 0.25)").as("p25"),
        expr("percentile(q, 0.5)").as("median"),
        expr("percentile(q, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val a22ExactMedianSql =
    """SELECT l_returnflag,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------ column profiling
  /** a21: the data-quality profile report — one output row per profiled
    * column with row/null/distinct counts and min/max (rendered as
    * strings so the report schema is column-type-independent). This is
    * the ingest-time audit a training pipeline runs on every new drop
    * before anything downstream trusts it. One corpus pass: all metrics
    * are aggregates of a single scan (Spark plans the multi-column
    * distinct via Expand — rows x #profiled-columns on the wire, the
    * standard exact-distinct trade; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` and keep the same report shape), then a
    * 1-row-to-N-rows stack into long format — no second scan, no join.
    * `err_props` (props of error events, null otherwise) keeps the null
    * metrics non-vacuous on a fully-populated corpus. */
  private val a21Profile: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      when(col("event_type") === "error", col("props")).as("err_props"))
    val cols = Seq("event_id", "user_id", "event_type", "err_props")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = ev.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(expr(
      s"$stackExpr AS (column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"))
      .orderBy("column_name")
  }

  private val a21ProfileSql =
    """WITH src AS (
      |  SELECT event_id, user_id, event_type,
      |    CASE WHEN event_type = 'error' THEN props END AS err_props
      |  FROM events)
      |SELECT 'event_id' AS column_name, count(*) AS n_rows,
      |  count(*) - count(event_id) AS n_nulls,
      |  count(DISTINCT event_id) AS n_distinct,
      |  CAST(min(event_id) AS VARCHAR) AS min_val,
      |  CAST(max(event_id) AS VARCHAR) AS max_val FROM src
      |UNION ALL
      |SELECT 'user_id', count(*), count(*) - count(user_id),
      |  count(DISTINCT user_id), CAST(min(user_id) AS VARCHAR),
      |  CAST(max(user_id) AS VARCHAR) FROM src
      |UNION ALL
      |SELECT 'event_type', count(*), count(*) - count(event_type),
      |  count(DISTINCT event_type), min(event_type), max(event_type) FROM src
      |UNION ALL
      |SELECT 'err_props', count(*), count(*) - count(err_props),
      |  count(DISTINCT err_props), min(err_props), max(err_props) FROM src
      |ORDER BY column_name""".stripMargin

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "a19_heavy_hitters" -> a19HeavyHitters,
    "a20_cms_freq" -> a20CmsFreq,
    "gr1_pagerank" -> gr1PageRank,
    "gr2_triangles" -> gr2Triangles,
    "gr2b_triangles_shuffled" -> gr2bTrianglesShuffled,
    "sql_recursive_bfs" -> sqlRecursiveBfs,
    "a21_profile" -> a21Profile,
    "a22_exact_median" -> a22ExactMedian,
    "w11_range_window" -> w11RangeWindow,
    "f_unpivot" -> fUnpivot,
    "f_null_semantics" -> fNullSemantics,
    "a18_cohort_retention" -> a18CohortRetention,
    "f_resample_gapfill" -> fResampleGapfill,
    "a17_event_funnel" -> a17EventFunnel,
    "a16_skew_report" -> a16SkewReport,
    "q5_nation_revenue" -> q5NationRevenue,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "w4_moving_avg" -> w4MovingAvg,
    "w5_rank_family" -> w5RankFamily,
    "f_array_ops" -> fArrayOps,
    "sql_text_agg" -> sqlTextAgg
  )

  val oracle: Map[String, String] = Map(
    "a19_heavy_hitters" -> a19HeavyHittersSql,
    "a20_cms_freq" -> a20CmsFreqSql,
    "gr1_pagerank" -> gr1PageRankSql,
    "gr2_triangles" -> gr2TrianglesSql,
    "gr2b_triangles_shuffled" -> gr2TrianglesSql,
    "sql_recursive_bfs" -> sqlRecursiveBfsSql,
    "a21_profile" -> a21ProfileSql,
    "a22_exact_median" -> a22ExactMedianSql,
    "w11_range_window" -> w11RangeWindowSql,
    "f_unpivot" -> fUnpivotSql,
    "f_null_semantics" -> fNullSemanticsSql,
    "a18_cohort_retention" -> a18CohortRetentionSql,
    "f_resample_gapfill" -> fResampleGapfillSql,
    "a17_event_funnel" -> a17EventFunnelSql,
    "a16_skew_report" -> a16SkewReportSql,
    "w5_rank_family" -> w5RankFamilySql,
    "f_array_ops" -> fArrayOpsSql,
    "q5_nation_revenue" -> q5NationRevenueSql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "w4_moving_avg" -> w4MovingAvgSql,
    "sql_text_agg" -> sqlTextAggSql
  )
}
