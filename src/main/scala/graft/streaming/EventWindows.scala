package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Streaming-surface operators over the `events` table (SURVEY.md §2.9 /
  * §7 step 8 — a north-star extension, the reference is batch-only).
  *
  * Every query here uses the *streaming-compatible* operator form
  * (`window()`, `session_window()`, keyed dedup) evaluated in batch mode, so
  * the identical expression can be lifted onto `readStream` unchanged; the
  * genuinely-streaming behaviours (watermark drop, state timeout) are
  * exercised with MemoryStream in `StreamingSpec`.
  */
object EventWindows {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ tumbling window
  private val s1Tumbling: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  private val s1TumblingSql =
    """SELECT make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) AS BIGINT) * 300 * 1000000)
      |    AS window_start,
      |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ sliding window
  /** 10-minute windows sliding by 5: each event lands in 2 windows. */
  private val s2Sliding: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .orderBy("window_start")
  }

  private val s2SlidingSql =
    """WITH buckets AS (
      |  SELECT make_timestamp((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) AS BIGINT) - o.o) * 300 * 1000000)
      |      AS window_start
      |  FROM events, generate_series(0, 1) o(o))
      |SELECT window_start, count(*) AS n_events
      |FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ session window
  /** Per-user sessions with a 10-minute inactivity gap; `session_window` is
    * the native Spark op (merges in streaming state too). */
  private val s3Session: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  private val s3SessionSql =
    """WITH t AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                  OR epoch(ts) - epoch(prev_ts) >= 600 THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |sessions AS (
      |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------------------------------ keyed dedup (first event)
  /** First event per (user, type): the batch form of
    * `dropDuplicatesWithinWatermark` keyed dedup. Micros as BIGINT keep the
    * nano->micro truncation identical on both sides. */
  private val s4DedupFirst: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("first_ts_us"))
      .orderBy("user_id", "event_type")
  }

  private val s4DedupFirstSql =
    """SELECT user_id, event_type, event_id,
      |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS first_ts_us
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------------------------ json props extraction
  /** `from_json` over the props column (§2.7 json family). */
  private val s5JsonProps: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")
  }

  private val s5JsonPropsSql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ interval (stream-stream) join
  /** View→click attribution within 10 minutes per user — the canonical
    * stream-stream interval join. This batch form is the exact expression
    * Structured Streaming runs with watermarks on both sides (state pruned
    * by the interval bound); `StreamingSpec` drives the same join through
    * two MemoryStreams. Scale shape: equi-join on user_id with the time
    * bound as a residual predicate — state per key is bounded by the
    * interval, never by stream length. */
  private val s6IntervalJoin: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    v.join(c, Seq("user_id"))
      .filter(col("click_ts") >= col("view_ts") &&
        col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_ts")).as("view_ts_us"),
        unix_micros(col("click_ts")).as("click_ts_us"))
      .orderBy("user_id", "view_id", "click_id")
  }

  private val s6IntervalJoinSql =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      |  CAST(epoch_us(CAST(v.ts AS TIMESTAMP)) AS BIGINT) AS view_ts_us,
      |  CAST(epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS click_ts_us
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id
      | AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
      | AND CAST(c.ts AS TIMESTAMP) < CAST(v.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  // ------------------------------------------------------------------ registry
  val queries: Map[String, Q] = Map(
    "s1_tumbling_window" -> s1Tumbling,
    "s2_sliding_window" -> s2Sliding,
    "s3_session_window" -> s3Session,
    "s4_dedup_first_event" -> s4DedupFirst,
    "s5_json_props" -> s5JsonProps,
    "s6_interval_join" -> s6IntervalJoin
  )

  val oracle: Map[String, String] = Map(
    "s1_tumbling_window" -> s1TumblingSql,
    "s2_sliding_window" -> s2SlidingSql,
    "s3_session_window" -> s3SessionSql,
    "s4_dedup_first_event" -> s4DedupFirstSql,
    "s5_json_props" -> s5JsonPropsSql,
    "s6_interval_join" -> s6IntervalJoinSql
  )
}
