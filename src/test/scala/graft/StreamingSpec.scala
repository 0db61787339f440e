package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Genuinely-streaming behaviour (watermark drop, stateful ops) that the
  * batch-mode oracle queries in `EventWindows` cannot exercise. */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)

  test("tumbling window with watermark emits finalized windows and drops late rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val agg = src.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .count()
      .select(col("window.start").as("ws"), col("event_type"), col("count"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData((ts(1), "click"), (ts(2), "click"), (ts(3), "view"))
      q.processAllAvailable()
      // watermark still at 0 -> nothing finalized
      assert(spark.table("tumbling").count() == 0)
      // event at t=30 pushes watermark to 20 -> first windows finalize
      src.addData((ts(30), "click"))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((0L, "click", 2L), (0L, "view", 1L)))
      // late event at t=2 is behind the watermark -> dropped, no new output
      src.addData((ts(2), "click"))
      q.processAllAvailable()
      assert(spark.table("tumbling").count() == 2)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key counts across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(String, Int)]
    val counted = src.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(next)
          (key, next)
      }
    val q = counted.toDF("user", "total").writeStream.format("memory")
      .queryName("running").outputMode(OutputMode.Update()).start()
    try {
      src.addData(("a", 1), ("a", 2), ("b", 5))
      q.processAllAvailable()
      src.addData(("a", 4))
      q.processAllAvailable()
      val last = spark.table("running").collect()
        .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map("a" -> 7L, "b" -> 5L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.Event
    val src = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(src.toDS(), gapMs = 10 * 60000L)
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events close together, then a 30-minute gap.
      // NOTE: ts(1), not ts(0) — an event equal to the initial watermark
      // (epoch 0 with a 0s delay) is dropped as late by the engine.
      src.addData(Event(1L, ts(1), 1.0), Event(1L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)   // session still open
      src.addData(Event(1L, ts(35), 4.0))            // gap closes session 1
      q.processAllAvailable()
      val r = spark.table("sessions").collect()
      assert(r.length == 1)
      assert(r.head.getAs[Int]("n_events") == 2)
      assert(r.head.getAs[Double]("sum_value") == 3.0)
      assert(r.head.getAs[Timestamp]("session_end").getTime == ts(5).getTime)
      // user 1 goes silent; another user's events push the watermark past
      // lastTs + gap, firing the event-time timeout for the open session
      src.addData(Event(2L, ts(60), 9.0))
      q.processAllAvailable()
      src.addData(Event(2L, ts(61), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(closed.length == 2, "expected the silent user's final session to time out")
      assert(closed.map(_.getAs[Double]("sum_value")).sorted.toSeq == Seq(3.0, 4.0))
    } finally q.stop()
  }

  test("stateful funnel stage machine agrees with the batch funnel windows") {
    import spark.implicits._
    import graft.streaming.FunnelState
    import graft.streaming.FunnelState.FunnelEvent
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    val q = FunnelState.funnelStages(src.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 1 converts fully; user 2 clicks before viewing (click must NOT
      // count), then views; user 3 purchases without clicking (stuck at 1)
      src.addData(
        FunnelEvent(1L, ts(1), "view"), FunnelEvent(2L, ts(1), "click"),
        FunnelEvent(3L, ts(1), "view"))
      q.processAllAvailable()
      src.addData(
        FunnelEvent(1L, ts(2), "click"), FunnelEvent(2L, ts(2), "view"),
        FunnelEvent(3L, ts(2), "purchase"))
      q.processAllAvailable()
      src.addData(FunnelEvent(1L, ts(3), "purchase"), FunnelEvent(2L, ts(3), "click"))
      q.processAllAvailable()
      // memory sink in Update mode appends every update; take the latest per user
      val stages = spark.table("funnel").groupBy("user_id")
        .agg(max("stage").as("stage")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(stages == Map(1L -> 3, 2L -> 2, 3L -> 1))

      // batch replay through the a17 window formulation over the same rows
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val batch = Seq(
        (1L, ts(1), "view"), (2L, ts(1), "click"), (3L, ts(1), "view"),
        (1L, ts(2), "click"), (2L, ts(2), "view"), (3L, ts(2), "purchase"),
        (1L, ts(3), "purchase"), (2L, ts(3), "click"))
        .toDF("user_id", "ts", "event_type")
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .select(col("user_id"),
          (when(col("t1").isNotNull, 1).otherwise(0) +
            when(col("t2").isNotNull, 1).otherwise(0) +
            when(col("t3").isNotNull, 1).otherwise(0)).cast("int").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batch == stages, s"stream $stages vs batch $batch")
    } finally q.stop()
  }

  test("funnel conversion window evicts state and restarts the funnel") {
    import spark.implicits._
    import graft.streaming.FunnelState
    import graft.streaming.FunnelState.FunnelEvent
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    // 10-minute conversion window, zero watermark delay
    val q = FunnelState.funnelStages(src.toDS(), conversionWindowMs = 600000L)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode(OutputMode.Update()).start()
    try {
      src.addData(FunnelEvent(1L, ts(1), "view"), FunnelEvent(2L, ts(1), "view"))
      q.processAllAvailable()
      // user 2's event at t=30 pushes the watermark past user 1's
      // t=1+10min timeout -> user 1's state is flushed and RELEASED
      src.addData(FunnelEvent(2L, ts(30), "click"))
      q.processAllAvailable()
      // user 1 returns: fresh state at stage 0 — a click cannot advance a
      // restarted funnel (it needs a view first)
      src.addData(FunnelEvent(1L, ts(31), "click"))
      q.processAllAvailable()
      val updates = spark.table("funnel_evict").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      // memory-sink row order across batches is an implementation detail:
      // assert on each user's multiset of emissions, not global order
      val u1 = updates.filter(_._1 == 1L).map(_._2)
        .groupBy(identity).view.mapValues(_.length).toMap
      // stage 1 twice (initial view + timeout flush), then 0 once after the
      // restarted funnel rejects the view-less click
      assert(u1 == Map(1 -> 2, 0 -> 1),
        s"user 1 emissions should be {1:2, 0:1}, got ${updates.toSeq}")
      assert(updates.contains((2L, 2)), "user 2 view+click reached stage 2")
    } finally q.stop()
  }

  test("funnel times out and releases state for users whose events never start it") {
    import spark.implicits._
    import graft.streaming.FunnelState
    import graft.streaming.FunnelState.FunnelEvent
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    val q = FunnelState.funnelStages(src.toDS(), conversionWindowMs = 600000L)
      .writeStream.format("memory").queryName("funnel_stage0")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 1's first (and only) event is a click: the stage machine never
      // advances, stage stays 0 — before the fix, no timeout was armed for
      // such users and their store entries leaked forever
      src.addData(FunnelEvent(1L, ts(1), "click"), FunnelEvent(2L, ts(1), "view"))
      q.processAllAvailable()
      // other-user traffic pushes the watermark past user 1's window
      src.addData(FunnelEvent(2L, ts(30), "click"))
      q.processAllAvailable()
      src.addData(FunnelEvent(2L, ts(60), "purchase"))
      q.processAllAvailable()
      val u1 = spark.table("funnel_stage0").collect()
        .filter(_.getLong(0) == 1L).map(_.getInt(1)).toSeq
      // two emissions with NO further user-1 data: the initial update and
      // the timeout flush — proof the timer armed and the entry released
      assert(u1 == Seq(0, 0),
        s"stage-0 user must emit once on update and once on timeout, got $u1")
    } finally q.stop()
  }

  test("funnel agrees with batch when events are shuffled across micro-batches") {
    import spark.implicits._
    import graft.streaming.FunnelState
    import graft.streaming.FunnelState.FunnelEvent
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    // generous watermark delay: every shuffled event stays admissible; the
    // pending buffer + speculative emission must reconstruct event-time order
    val q = FunnelState.funnelStages(src.toDS(),
        conversionWindowMs = 24L * 3600000L, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel_shuffled")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 1 converts fully but its purchase arrives FIRST and its view
      // LAST-but-one; user 2's first click arrives after its later click;
      // user 3's purchase precedes its view in arrival order. An eager
      // stage machine gets users 1 and 3 wrong; the buffered one must not.
      src.addData(
        FunnelEvent(1L, ts(3), "purchase"), FunnelEvent(2L, ts(3), "click"),
        FunnelEvent(3L, ts(2), "purchase"))
      q.processAllAvailable()
      src.addData(FunnelEvent(1L, ts(1), "view"), FunnelEvent(2L, ts(2), "view"))
      q.processAllAvailable()
      src.addData(
        FunnelEvent(1L, ts(2), "click"), FunnelEvent(2L, ts(1), "click"),
        FunnelEvent(3L, ts(1), "view"))
      q.processAllAvailable()
      // speculative depth is monotone in the event set -> max == latest
      val stages = spark.table("funnel_shuffled").groupBy("user_id")
        .agg(max("stage").as("stage")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val batch = Seq(
        (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
        (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "click"),
        (3L, ts(1), "view"), (3L, ts(2), "purchase"))
        .toDF("user_id", "ts", "event_type")
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .select(col("user_id"),
          (when(col("t1").isNotNull, 1).otherwise(0) +
            when(col("t2").isNotNull, 1).otherwise(0) +
            when(col("t3").isNotNull, 1).otherwise(0)).cast("int").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(stages == batch, s"stream $stages vs batch $batch")
      assert(batch == Map(1L -> 3, 2L -> 2, 3L -> 1))
    } finally q.stop()
  }

  test("file-source stream runs the batch window aggregation with AvailableNow") {
    import org.apache.spark.sql.streaming.Trigger
    val batchEvents = graft.io.Tables.events(spark, sf0001)
    // the file source must declare the scan schema up front: use whatever the
    // raw parquet scans back as (long nanos on old corpus drops, TIMESTAMP_NTZ
    // on new ones) and normalize with the same helper the batch loader uses
    val rawSchema =
      spark.read.option("pathGlobFilter", "events.parquet").parquet(sf0001).schema
    val stream = graft.io.Tables.normalizeTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")   // file source needs a dir
        .parquet(sf0001))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = stream.writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("filestream").count()
      val batch = batchEvents
        .groupBy(window(col("ts"), "5 minutes"), col("event_type")).count().count()
      assert(streamed == batch, s"stream $streamed vs batch $batch window groups")
    } finally q.stop()
  }

  test("stream-stream interval join pairs errors with preceding clicks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val errors = MemoryStream[(Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user", "c_id").withWatermark("c_ts", "20 minutes")
    val e = errors.toDF().toDF("e_ts", "e_user", "e_id").withWatermark("e_ts", "20 minutes")
    val joined = e.join(c,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") &&
        col("c_ts") >= col("e_ts") - org.apache.spark.sql.functions.expr("interval 10 minutes"))
    val q = joined.select("e_id", "c_id").writeStream.format("memory")
      .queryName("ssjoin").outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(1), 1L, 100L), (ts(2), 2L, 200L))
      errors.addData((ts(5), 1L, 900L))     // within 10 min of click 100
      errors.addData((ts(30), 2L, 901L))    // 28 min after click 200 -> no match
      q.processAllAvailable()
      val pairs = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((900L, 100L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per key inside the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val dedup = src.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
    val q = dedup.writeStream.format("memory").queryName("wmdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData((ts(1), 7L), (ts(2), 7L), (ts(3), 8L))   // dup of 7 in-batch
      q.processAllAvailable()
      src.addData((ts(4), 7L))                             // dup within watermark
      q.processAllAvailable()
      val keys = spark.table("wmdedup").collect().map(_.getLong(1)).toSeq.sorted
      assert(keys == Seq(7L, 8L), s"got $keys")
    } finally q.stop()
  }

  test("streaming query plans the same tumbling expression used in batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the batch query in EventWindows lifts unchanged onto readStream
    val src = MemoryStream[(Timestamp, String, Double)]
    val stream = src.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("lifted")
      .outputMode(OutputMode.Update()).start()
    try {
      src.addData((ts(1), "click", 1.5), (ts(2), "click", 2.5))
      q.processAllAvailable()
      val r = spark.table("lifted").select("n_events", "sum_value").collect()
      assert(r.length == 1 && r.head.getLong(0) == 2 && r.head.getDouble(1) == 4.0)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to views within the bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the s6_interval_join expression, run as a genuine two-stream join:
    // watermarks on both sides + the interval condition let Spark prune
    // per-key state (without them a stream-stream inner join is unbounded)
    val views = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("view_ts", "v_user", "view_id")
      .withWatermark("view_ts", "20 minutes")
    val c = clicks.toDF().toDF("click_ts", "c_user", "click_id")
      .withWatermark("click_ts", "20 minutes")
    val q = v.join(c,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      // ts(1), not ts(0): an event equal to the initial watermark (epoch 0)
      // is dropped as late before it ever reaches the join state
      views.addData((ts(1), 1L, 100L), (ts(1), 2L, 200L))
      clicks.addData((ts(5), 1L, 900L),   // within 10 min of view 100 -> joins
        (ts(15), 1L, 901L),               // outside the interval -> no join
        (ts(5), 3L, 902L))                // no matching view user -> no join
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 100L, 900L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits the unmatched view only after the watermark closes its window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // outer stream-stream semantics: a view with no click inside its
    // 10-minute attribution window must eventually emit null-padded — but
    // only once the watermark proves no matching click can still arrive.
    // Until then the row sits in state; emitting earlier would be wrong
    // (a click could still show up within the interval bound).
    val views = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("view_ts", "v_user", "view_id")
      .withWatermark("view_ts", "20 minutes")
    val c = clicks.toDF().toDF("click_ts", "c_user", "click_id")
      .withWatermark("click_ts", "20 minutes")
    val q = v.join(c,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((ts(1), 1L, 100L),   // will be clicked
        (ts(1), 2L, 200L))               // never clicked
      clicks.addData((ts(5), 1L, 900L))
      q.processAllAvailable()
      val early = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(1), Option(r.get(2)))).toSet
      assert(!early.contains((200L, None)),
        s"unmatched view must NOT emit before its window is watermark-closed, got $early")
      // advance BOTH watermarks past view 200's window end (t=1 + 10min):
      // watermark = min(sources) = 60 - 20 = 40 min > 11 min
      views.addData((ts(60), 8L, 888L))
      clicks.addData((ts(60), 9L, 998L))
      q.processAllAvailable()
      val got = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
      assert(got == Set(
        (1L, 100L, Some(900L)),   // matched inside the window
        (2L, 200L, None)),        // watermark-proven unmatched, null-padded
        s"got $got")
    } finally q.stop()
  }

  test("foreachBatch upserts each micro-batch into parquet state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the §2.9 tracker-upsert pattern (full-outer + coalesce) driven by a
    // real stream: every micro-batch merges into the parquet state dir,
    // later values win per key, unseen keys append
    val dir = java.nio.file.Files.createTempDirectory("graft-fb-state").toString
    val state = s"$dir/state"
    val src = MemoryStream[(String, Int)]
    val q = src.toDF().toDF("key", "value")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val latest = batch.groupBy("key").agg(max(col("value")).as("value"))
        val prev =
          if (new java.io.File(state).exists) spark.read.parquet(state)
          else latest.limit(0)
        val merged = prev.as("p").join(latest.as("n"), Seq("key"), "full_outer")
          .select(col("key"),
            coalesce(col("n.value"), col("p.value")).as("value"))
        // state write must be atomic w.r.t. the read above: stage then move
        val tmp = s"$dir/stage"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(state), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(state))
        ()
      }
      .start()
    try {
      src.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      src.addData(("a", 5), ("c", 7))     // a updated, c appended
      q.processAllAvailable()
      val got = spark.read.parquet(state).collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      assert(got == Map("a" -> 5, "b" -> 2, "c" -> 7))
    } finally q.stop()
  }

  test("foreachBatch upserts each micro-batch into a commit-log table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the durable form of the tracker stream: every micro-batch is ONE
    // transactional CommitLog.upsert — no hand-rolled stage/rename, and
    // the pre-batch version stays addressable (time travel)
    val table = java.nio.file.Files.createTempDirectory("graft-cl-stream").toString + "/t"
    val src = MemoryStream[(String, Int)]
    val q = src.toDF().toDF("key", "value")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch.groupBy("key").agg(max(col("value")).as("value"))
        graft.io.CommitLog.upsert(batch.sparkSession, latest, table, Seq("key"))
        ()
      }
      .start()
    try {
      src.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      src.addData(("a", 5), ("c", 7))
      q.processAllAvailable()
      val now = graft.io.CommitLog.read(spark, table).collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      assert(now == Map("a" -> 5, "b" -> 2, "c" -> 7))
      // batch 0's state is still readable after batch 1 rewrote it
      val v0 = graft.io.CommitLog.read(spark, table, asOf = Some(0L)).collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      assert(v0 == Map("a" -> 1, "b" -> 2))
    } finally q.stop()
  }

  test("streaming incremental dedup: batches flag against the growing signature index") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the d11 lifecycle driven by a real stream: each micro-batch computes
    // scalar minhash signatures, flags against the signature index built
    // from all PRIOR batches (TextPipeline.incrementalDupFlags), and
    // appends only the survivors' signatures to the commit-log index —
    // duplicates arriving later never enter the index
    graft.plans.GraftFunctions.register(spark)
    val table = java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString + "/idx"
    val flagged = collection.mutable.Map[Long, Boolean]()
    def sigOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), expr("minhash_sig8(text)").as("s"))
        .filter(col("s").isNotNull)
        .select(col("doc_id") +: (0 until 8).map(k => col(s"s.h$k").as(s"h$k")): _*)
    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("doc_id", "text")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        val sig = sigOf(batch)
        val idx =
          if (new java.io.File(table).exists) graft.io.CommitLog.read(s, table)
          else sig.limit(0)
        val verdicts = graft.operators.TextPipeline
          .incrementalDupFlags(idx, sig, "doc_id", 8, 2, minAgree = 6)
        verdicts.collect().foreach(r => flagged(r.getLong(0)) = r.getBoolean(3))
        val survivors = sig.join(
          verdicts.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"), "left_semi")
        graft.io.CommitLog.append(survivors, table)
        ()
      }
      .start()
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      src.addData((1L, base), (2L, "a completely different document about storage tanks"))
      q.processAllAvailable()
      // batch 2: one verbatim copy of doc 1 (dup) and one fresh doc
      src.addData((3L, base), (4L, "fresh unseen content with novel words entirely"))
      q.processAllAvailable()
      assert(flagged(1L) == false && flagged(2L) == false, "first batch has no index yet")
      assert(flagged(3L) == true, "verbatim copy of an indexed doc must be flagged")
      assert(flagged(4L) == false)
      // the dup never entered the index; the three survivors did
      val idxIds = graft.io.CommitLog.read(spark, table)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idxIds == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups in-window and releases state after it") {
    // The built-in bounded-state streaming exact dedup: duplicate ids are
    // suppressed while their event time is inside the watermark delay, and
    // the per-id state is EVICTED once the watermark passes — so the store
    // tracks recent ids, not ids-ever-seen (the unbounded-state trap of
    // plain dropDuplicates on a stream).
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val dedup = src.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    def emitted: Seq[String] =
      spark.table("dedup_wm").collect().map(_.getString(1)).toSeq
    try {
      // in-batch duplicate suppressed, first occurrences emitted at once
      src.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      assert(emitted.sorted == Seq("a", "b"))
      // cross-batch duplicate inside the window: suppressed
      src.addData((ts(4), "a"))
      q.processAllAvailable()
      assert(emitted.sorted == Seq("a", "b"))
      // watermark jumps to 50 -> state for a (expires 11) and b (13) evicted
      src.addData((ts(60), "c"))
      q.processAllAvailable()
      // same id far beyond its window: state is gone, so it re-emits —
      // the documented within-watermark contract, and the proof the store
      // does not grow with distinct ids forever
      src.addData((ts(55), "a"))
      q.processAllAvailable()
      assert(emitted.sorted == Seq("a", "a", "b", "c"))
    } finally q.stop()
  }
}
