package graft

import java.nio.file.{Files, Paths}

import graft.io.CommitLog

/** The `graftlog` DataSource surface: `spark.read.format("graftlog")`
  * (and `USING graftlog` SQL views) must serve exactly what the Scala
  * `CommitLog.read` API serves — current snapshot, version time travel,
  * timestamp time travel, additive schema evolution — and reject
  * ambiguous or impossible requests at analysis time. */
class GraftLogDataSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): String = {
    val root = Paths.get(graft.io.Sinks.scratchDir(s"graftlog_ds_$name"))
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    root.toString
  }

  private def stampCommit(t: String, v: Long, ts: Long): Unit =
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(t, "_log", f"$v%012d.json"),
      java.nio.file.attribute.FileTime.fromMillis(ts))

  test("current snapshot and versionAsOf match the Scala API") {
    val t = freshTable("basic")
    CommitLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)   // v0
    CommitLog.upsert(spark, Seq((2L, "B"), (3L, "c")).toDF("id", "v"), t, Seq("id")) // v1

    val current = spark.read.format("graftlog").load(t)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(current == Seq((1L, "a"), (2L, "B"), (3L, "c")))

    val v0 = spark.read.format("graftlog").option("versionAsOf", 0).load(t)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v0 == Seq((1L, "a"), (2L, "b")), s"versionAsOf 0 should pre-date the upsert: $v0")

    // the API twin agrees bit-for-bit
    val api = CommitLog.read(spark, t, Some(0L))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v0 == api)
  }

  test("timestampAsOf resolves from commit times (epoch millis and ISO forms)") {
    val t = freshTable("ts")
    val base = System.currentTimeMillis() - 1000000
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)   // v0
    CommitLog.append(Seq((2L, "b")).toDF("id", "v"), t)   // v1
    stampCommit(t, 0L, base)
    stampCommit(t, 1L, base + 60000)

    val atV0 = spark.read.format("graftlog")
      .option("timestampAsOf", (base + 30000).toString).load(t)
    assert(atV0.count() == 1L, "timestamp between v0 and v1 must serve v0")

    val iso = java.time.Instant.ofEpochMilli(base + 30000).toString
    val atV0Iso = spark.read.format("graftlog").option("timestampAsOf", iso).load(t)
    assert(atV0Iso.count() == 1L, s"ISO instant $iso must resolve like epoch millis")

    val now = spark.read.format("graftlog")
      .option("timestampAsOf", System.currentTimeMillis().toString).load(t)
    assert(now.count() == 2L)
  }

  test("SQL surface: CREATE TEMPORARY VIEW ... USING graftlog") {
    val t = freshTable("sqlview")
    CommitLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), t)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graftlog_sql_view " +
      s"USING graftlog OPTIONS (path '$t')")
    val n = spark.sql("SELECT count(*) AS n FROM graftlog_sql_view WHERE id > 1")
      .collect().head.getLong(0)
    assert(n == 2L)
  }

  test("mergeSchema serves additive evolution; default read keeps one schema") {
    val t = freshTable("evolve")
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)                     // v0
    CommitLog.append(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), t)        // v1: added column

    val merged = spark.read.format("graftlog").option("mergeSchema", "true").load(t)
    assert(merged.columns.toSet == Set("id", "v", "extra"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", -1L), (2L, "b", 9L)),
      "early files must serve null for the added column")
  }

  test("column pruning and filter pushdown reach the parquet scan") {
    val t = freshTable("prune")
    CommitLog.append((1L to 100L).map(i => (i, s"v$i", i * 10, s"pad$i"))
      .toDF("id", "v", "score", "pad"), t)

    // (a) wiring: the V2 scan builder hands the bridge ONLY the selected
    // columns and the translated predicate — visible on the outer
    // RowDataSourceScan (no full-width scan for a 2-column projection)
    val q = spark.read.format("graftlog").load(t)
      .filter($"score" > 500).select("id", "v")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scan.nonEmpty, s"expected a RowDataSourceScan:\n${q.queryExecution.executedPlan}")
    // Spark keeps the residual-filter column (`score`) in the bridge's
    // required schema so it can re-apply the filter above the scan; the
    // point of pruning is that the UNREFERENCED column never crosses
    val outCols = scan.head.output.map(_.name).toSet
    assert(outCols == Set("id", "v", "score"),
      s"bridge scan must be pruned to selected+filter columns, got $outCols")
    assert(!outCols.contains("pad"), "unreferenced columns must not cross the bridge")
    val meta = scan.head.metadata.getOrElse("PushedFilters", "")
    assert(meta.contains("GreaterThan(score,500)"),
      s"predicate must be pushed into the bridge: PushedFilters=$meta")
    assert(q.count() == 50L)

    // (b) mechanism: the narrowed inner plan (the exact DataFrame
    // buildScan executes) pushes both into the parquet file scan
    val narrowed = graft.sources.GraftLogDataSource.narrowedRead(
      spark, t, 0L, mergeSchema = false,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))),
      Seq(org.apache.spark.sql.sources.GreaterThan("score", 500L)))
    val fileScans = narrowed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.nonEmpty, s"expected a parquet FileSourceScan:\n${narrowed.queryExecution.executedPlan}")
    val readCols = fileScans.head.requiredSchema.fieldNames.toSet
    assert(readCols == Set("id", "v", "score"),
      s"parquet ReadSchema must carry only selected+filter columns, got $readCols")
    assert(!readCols.contains("pad"), "unselected columns must not be read")
    val pushed = fileScans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(score,500)"),
      s"filter must reach the parquet scan: PushedFilters=$pushed")

    // zero-column scan (count(*)) still answers
    assert(spark.read.format("graftlog").load(t).count() == 100L)
  }

  test("zone maps skip files for pushed range filters; only on positive evidence") {
    val t = freshTable("zoneskip")
    // 4 clustered files over k = 0..99, each covering one quartile, with
    // the clustering column NAMED in the add actions
    CommitLog.appendClustered(spark,
      (0L to 99L).map(i => (i, s"v$i")).toDF("k", "v"), t, "k", buckets = 4)
    assert(CommitLog.snapshotFiles(t).length == 4)

    def narrowed(filters: org.apache.spark.sql.sources.Filter*) =
      graft.sources.GraftLogDataSource.narrowedRead(
        spark, t, CommitLog.currentVersion(t), mergeSchema = false,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))),
        filters.toIndexedSeq)

    import org.apache.spark.sql.{sources => f}
    // a one-quartile range reads one file; the result is still exact
    val oneQ = narrowed(f.GreaterThanOrEqual("k", 10L), f.LessThanOrEqual("k", 20L))
    assert(oneQ.inputFiles.length == 1,
      s"BETWEEN inside one quartile must read 1 of 4 files, got ${oneQ.inputFiles.length}")
    assert(oneQ.filter($"k".between(10, 20)).count() == 11L)

    // equality hits one file; an impossible conjunction reads none
    assert(narrowed(f.EqualTo("k", 50L)).inputFiles.length == 1)
    val none = narrowed(f.GreaterThanOrEqual("k", 60L), f.LessThanOrEqual("k", 10L))
    assert(none.inputFiles.isEmpty && none.count() == 0L,
      "lo > hi overlaps no file range: empty relation, zero files")

    // the END-TO-END SQL surface prunes too, and answers exactly
    val viaSql = spark.read.format("graftlog").load(t).filter($"k".between(10, 20))
    assert(viaSql.count() == 11L)
    assert(viaSql.orderBy("k").collect().map(_.getLong(0)).toSeq == (10L to 20L))

    // NEGATIVE evidence is never acted on: filters on a column with no
    // recorded stats read everything
    assert(narrowed(f.EqualTo("v", "v5")).inputFiles.length == 4,
      "stats are on k; a filter on v must not skip files")
    // a case difference in the filter name still matches (Spark default
    // resolution is case-insensitive)
    assert(narrowed(f.EqualTo("K", 50L)).inputFiles.length == 1)

    // a checkpoint preserves the named-column stats (the summary re-emits
    // the col vocabulary)
    CommitLog.checkpoint(t)
    assert(narrowed(f.EqualTo("k", 50L)).inputFiles.length == 1,
      "zone-map column names must survive a log checkpoint")

    // a plain append (no stats) adds a file that is ALWAYS read
    CommitLog.append(Seq((200L, "x")).toDF("k", "v"), t)
    val after = narrowed(f.EqualTo("k", 50L))
    assert(after.inputFiles.length == 2,
      s"stats-less files must never be skipped, got ${after.inputFiles.length}")
    // and time travel back to the pre-append version prunes as before
    val back = graft.sources.GraftLogDataSource.narrowedRead(
      spark, t, 0L, mergeSchema = false,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))),
      Seq(f.EqualTo("k", 50L)))
    assert(back.inputFiles.length == 1)
  }

  test("write path: append and overwrite land as commit-log transactions") {
    import org.apache.spark.sql.SaveMode
    val t = freshTable("write")

    // first write CREATES the table (no prior commits)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graftlog").mode(SaveMode.Append).save(t)
    assert(CommitLog.currentVersion(t) == 0L)
    assert(spark.read.format("graftlog").load(t).count() == 2L)

    // second append is one more version; DataSource read == Scala read
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graftlog").mode(SaveMode.Append).save(t)
    assert(CommitLog.currentVersion(t) == 1L)
    val viaDs = spark.read.format("graftlog").load(t)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaApi = CommitLog.read(spark, t)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaDs == Seq((1L, "a"), (2L, "b"), (3L, "c")) && viaDs == viaApi)

    // overwrite replaces the snapshot in ONE commit; the old version
    // remains time-travelable
    Seq((9L, "z")).toDF("id", "v")
      .write.format("graftlog").mode(SaveMode.Overwrite).save(t)
    assert(CommitLog.currentVersion(t) == 2L, "overwrite must be exactly one commit")
    val after = spark.read.format("graftlog").load(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq((9L, "z")))
    val v1 = spark.read.format("graftlog").option("versionAsOf", 1).load(t)
    assert(v1.count() == 3L, "pre-overwrite snapshot must still time-travel")

    // writing to a time-travel snapshot is refused
    val e = intercept[Exception] {
      Seq((0L, "x")).toDF("id", "v").write.format("graftlog")
        .option("versionAsOf", 1).mode(SaveMode.Append).save(t)
    }
    assert(e.getMessage.contains("time-travel"),
      s"time-travel write must be refused, got: ${e.getMessage}")
  }

  test("misuse fails loudly at analysis time") {
    val t = freshTable("errs")
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)

    val both = intercept[IllegalArgumentException] {
      spark.read.format("graftlog")
        .option("versionAsOf", 0).option("timestampAsOf", "12345").load(t)
    }
    assert(both.getMessage.contains("mutually exclusive"))

    val noPath = intercept[IllegalArgumentException] {
      spark.read.format("graftlog").load()
    }
    assert(noPath.getMessage.contains("path"))

    // a version past the log head must not silently serve the current
    // snapshot (CommitLog.replay just replays every commit <= asOf)
    val gone = intercept[IllegalArgumentException] {
      spark.read.format("graftlog").option("versionAsOf", 99).load(t)
    }
    assert(gone.getMessage.contains("does not exist"))

    // unparseable time-travel options must name the option and accepted
    // forms, not leak a raw NumberFormatException/DateTimeParseException
    val badTs = intercept[IllegalArgumentException] {
      spark.read.format("graftlog").option("timestampAsOf", "not-a-time").load(t)
    }
    assert(badTs.getMessage.contains("timestampAsOf"), badTs.getMessage)
    val emptyTs = intercept[IllegalArgumentException] {
      spark.read.format("graftlog").option("timestampAsOf", "").load(t)
    }
    assert(emptyTs.getMessage.contains("timestampAsOf"), emptyTs.getMessage)
    val badV = intercept[IllegalArgumentException] {
      spark.read.format("graftlog").option("versionAsOf", "one").load(t)
    }
    assert(badV.getMessage.contains("versionAsOf"), badV.getMessage)

    // reading a table that has never been written fails at analysis, and
    // names the missing commits rather than an NPE/empty scan
    val empty = freshTable("nevercommitted")
    val noTable = intercept[Exception] {
      spark.read.format("graftlog").load(empty).collect()
    }
    assert(noTable.getMessage.contains("no"), noTable.getMessage)
  }
}
