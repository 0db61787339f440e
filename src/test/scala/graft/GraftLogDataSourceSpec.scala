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

    // (a) wiring: the NATIVE scan reads ONLY the selected+filter columns
    // through Spark's own columnar parquet scan, with the predicate
    // compiled for row-group skipping (no full-width scan, no Row bridge)
    val q = spark.read.format("graftlog").load(t)
      .filter($"score" > 500).select("id", "v")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scan.nonEmpty, s"expected a native BatchScan:\n${q.queryExecution.executedPlan}")
    // Spark keeps the residual-filter column (`score`) in the scan's
    // required schema so it can re-apply the filter above it; the point
    // of pruning is that the UNREFERENCED column is never read
    val outCols = scan.head.output.map(_.name).toSet
    assert(outCols == Set("id", "v", "score"),
      s"scan must be pruned to selected+filter columns, got $outCols")
    assert(!outCols.contains("pad"), "unreferenced columns must not be read")
    val native = scan.head.scan.asInstanceOf[graft.sources.GraftLogNativeScan]
    assert(native.delegate.pushedFilters.map(_.toString)
      .exists(_.contains("GreaterThan(score,500)")),
      s"predicate must reach the parquet scan: ${native.delegate.pushedFilters.mkString(", ")}")
    assert(native.delegate.readDataSchema.fieldNames.toSet == Set("id", "v", "score"),
      "the delegated parquet ReadSchema must be the pruned projection")
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

    // the END-TO-END SQL surface prunes too, and answers exactly: the
    // native scan's parquet file index holds only the surviving file
    val viaSql = spark.read.format("graftlog").load(t).filter($"k".between(10, 20))
    val sqlScans = viaSql.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(sqlScans.nonEmpty)
    val sqlNative = sqlScans.head.scan.asInstanceOf[graft.sources.GraftLogNativeScan]
    assert(sqlNative.delegate.fileIndex.inputFiles.length == 1,
      s"the SQL scan must read 1 of 4 files, got ${sqlNative.delegate.fileIndex.inputFiles.length}")
    assert(viaSql.count() == 11L)
    assert(viaSql.orderBy("k").collect().map(_.getLong(0)).toSeq == (10L to 20L))

    // round 12: STRING footer bounds prune too — an equality on v reads
    // only the file whose byte range covers it, and stays exact
    val vEq = narrowed(f.EqualTo("v", "v5"))
    assert(vEq.inputFiles.length == 1,
      s"string bounds must prune the v filter, read ${vEq.inputFiles.length}")
    assert(vEq.filter($"v" === "v5").count() == 1L)
    // NEGATIVE evidence is never acted on: a filter SHAPE outside the
    // bounds vocabulary (contains) reads everything
    assert(narrowed(f.StringContains("v", "5")).inputFiles.length == 4,
      "an unbounded filter shape must not skip files")
    // a case difference in the filter name still matches (Spark default
    // resolution is case-insensitive)
    assert(narrowed(f.EqualTo("K", 50L)).inputFiles.length == 1)

    // a checkpoint preserves the named-column stats (the summary re-emits
    // the col vocabulary)
    CommitLog.checkpoint(t)
    assert(narrowed(f.EqualTo("k", 50L)).inputFiles.length == 1,
      "zone-map column names must survive a log checkpoint")

    // a plain append carries footer MULTI-stats now: the k=50 scan still
    // reads 1 file (the new file's k range [200, 200] skips it), and a
    // k=200 probe reads exactly the new file
    CommitLog.append(Seq((200L, "x")).toDF("k", "v"), t)
    assert(narrowed(f.EqualTo("k", 50L)).inputFiles.length == 1,
      "a plain append's footer stats must skip it for out-of-range keys")
    assert(narrowed(f.EqualTo("k", 200L)).inputFiles.length == 1,
      "the k=200 probe must prune to the appended file alone")
    // a LEGACY add (older writer vocabulary: no rows/mstats recorded) is
    // ALWAYS read — absence of stats fails safe
    val donor = CommitLog.snapshotFiles(t).head
    Files.copy(Paths.get(t, donor), Paths.get(t, "legacy.parquet"))
    val v = CommitLog.currentVersion(t) + 1
    Files.write(Paths.get(t, "_log", f"$v%012d.json"),
      "{\"op\":\"append\"}\n{\"add\":\"legacy.parquet\"}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(narrowed(f.EqualTo("k", 50L)).inputFiles.length == 2,
      "stats-less files must never be skipped")
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

  test("scan reports real log statistics: numRows, pruned sizeInBytes, auto-broadcast") {
    val t = freshTable("stats")
    CommitLog.append((1L to 25L).map(i => (i, s"name$i", "x" * 50)).toDF("id", "nm", "pad"), t)

    // numRows and sizeInBytes flow from the commit log into the scan
    // relation's statistics — not the unknown-size default that blocks
    // every planner decision (read off the relation NODE: the size-only
    // stats visitor drops rowCount above leaves when CBO is off)
    def scanStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
      }.head
    val full = spark.read.format("graftlog").load(t)
    val st = scanStats(full)
    assert(st.rowCount.contains(BigInt(25)),
      s"numRows must come from the footer-count vocabulary, got ${st.rowCount}")
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(st.sizeInBytes > 0 && st.sizeInBytes < defaultSize / 1000,
      s"sizeInBytes must be the real on-disk size, got ${st.sizeInBytes}")

    // column pruning scales the size estimate (FileScan's own behavior):
    // a one-narrow-column projection reports a fraction of the full width
    val narrow = spark.read.format("graftlog").load(t).select("id")
    val stNarrow = narrow.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
    }
    assert(stNarrow.nonEmpty && stNarrow.head.sizeInBytes < st.sizeInBytes,
      s"pruned scan must report a smaller size: ${stNarrow.map(_.sizeInBytes)} vs ${st.sizeInBytes}")

    // the stats are what Catalyst plans with: a small graftlog dim joined
    // to a fact frame auto-broadcasts with NO hint. Assert on the STATIC
    // plan (sparkPlan) — AQE can also broadcast from runtime shuffle
    // sizes, which would pass even without scan statistics
    // the BUILD side must be the graftlog scan — the range fact side has
    // known-small stats too, so "some BHJ exists" would pass even with an
    // unknown-size graftlog relation (the planner would broadcast the
    // fact instead); picking the graftlog side requires its reported
    // size to be the smaller KNOWN one
    def graftlogBuilds(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val side = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _                                                 => b.right
          }
          side.collect {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
                if b.scan.isInstanceOf[graft.sources.GraftLogNativeScan] => b
          }.nonEmpty
      }.exists(identity)

    val fact = spark.range(10000).selectExpr("id % 25 + 1 AS id", "id AS v")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "10MB") {
      val joined = fact.join(spark.read.format("graftlog").load(t), "id")
      assert(graftlogBuilds(joined),
        s"the graftlog side must be the broadcast build side:\n${joined.queryExecution.sparkPlan}")
      assert(joined.count() == 10000L)
    }
    // ...and broadcasting stays off when disabled (the stats inform the
    // planner, they don't force a strategy)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(spark.read.format("graftlog").load(t), "id")
      val bhj = joined.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.isEmpty, "threshold -1 must suppress auto-broadcast")
    }

    // time travel reports the PINNED snapshot's stats, not the head's
    CommitLog.append((26L to 100L).map(i => (i, s"name$i", "x" * 50)).toDF("id", "nm", "pad"), t)
    val v0 = spark.read.format("graftlog").option("versionAsOf", 0).load(t)
    val head = spark.read.format("graftlog").load(t)
    assert(scanStats(v0).rowCount.contains(BigInt(25)))
    assert(scanStats(head).rowCount.contains(BigInt(100)))
    assert(scanStats(v0).sizeInBytes < scanStats(head).sizeInBytes)
  }

  test("vectored snapshots report suppression-exact numRows and keep " +
      "auto-broadcast (the V1 fallback reported nothing)") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("dvstats")
    CommitLog.append((1L to 25L).map(i => (i, s"name$i", "x" * 50))
      .toDF("id", "nm", "pad"), t)
    CommitLog.enableDv(t)
    CommitLog.dvDelete(spark, t, col("id") <= 5L) // suppress 5 of 25
    def scanStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
      }.head
    val full = spark.read.format("graftlog").load(t)
    val st = scanStats(full)
    assert(st.rowCount.contains(BigInt(20)),
      s"numRows must subtract the scanned files' suppressed counts, got ${st.rowCount}")
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(st.sizeInBytes > 0 && st.sizeInBytes < defaultSize / 1000,
      s"sizeInBytes must be the real on-disk size, got ${st.sizeInBytes}")
    // a small VECTORED dim still auto-broadcasts — through the
    // suppressing native scan, statically planned (no AQE credit)
    val fact = spark.range(10000).selectExpr("id % 20 + 6 AS id", "id AS v")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "10MB") {
      val joined = fact.join(full, "id")
      val builds = joined.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val side = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _                                                 => b.right
          }
          side.collect {
            case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
                if s.scan.getClass.getSimpleName == "GraftDvNativeScan" => s
          }.nonEmpty
      }
      assert(builds.exists(identity),
        s"the vectored dim must be the broadcast build side:\n" +
          joined.queryExecution.sparkPlan)
      assert(joined.count() == 10000L,
        "every fact row joins a surviving dim row")
    }
  }

  test("suppressing scan survives MULTI-BATCH files (closeIfFreeable must " +
      "not free the reader's reused vectors between batches)") {
    import org.apache.spark.sql.functions.col
    // > columnarReaderBatchSize (4096) rows in ONE file, a dictionary-
    // encodable low-cardinality column, and a sparse vector: every batch
    // after the first re-reads the SAME reused WritableColumnVectors the
    // wrapped batch exposed — if the SelectedColumnVector wrapper's
    // closeIfFreeable() closes for real, batch 2 NPEs/corrupts
    val t = freshTable("dvbatches")
    CommitLog.append(
      (0L until 20000L).map(i => (i, s"s${i % 7}", i * 2)).toDF("id", "tag", "v")
        .coalesce(1), t)
    CommitLog.enableDv(t)
    CommitLog.dvDelete(spark, t, col("id") % 4096L === 0L) // one hit per batch
    val out = spark.read.format("graftlog").load(t)
    assert(out.count() == 20000L - 5L)
    assert(out.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ==
      (0L until 20000L).filter(_ % 4096L != 0L).map(_ * 2).sum)
    // second pass through the same plan (fresh scan) stays healthy
    assert(out.filter(col("tag") === "s0").count() ==
      (0L until 20000L).count(i => i % 7 == 0 && i % 4096L != 0L))
  }

  test("aggregate pushdown: count/min/max answered from the log, zero data reads") {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val t = freshTable("aggpush")
    CommitLog.appendClustered(spark,
      (0L to 99L).map(i => (i, s"v$i")).toDF("k", "v"), t, "k", buckets = 4)

    // complete pushdown: the Aggregate disappears from the optimized plan
    // and the log's metadata row is the answer
    val df = spark.read.format("graftlog").load(t)
      .agg(count(lit(1)).as("n"), min("k").as("lo"), max("k").as("hi"))
    val aggNodes = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggNodes.isEmpty,
      s"count/min/max over a covered snapshot must push down completely:\n${df.queryExecution.optimizedPlan}")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 0L, 99L)))

    // "metadata-only" is literal: plan the count, DELETE the data files,
    // and the answer still serves — a real scan would throw
    val planned = spark.read.format("graftlog").load(t).agg(count(lit(1)).as("n"))
    CommitLog.snapshotFiles(t).foreach(f => Files.delete(Paths.get(t, f)))
    assert(planned.collect().head.getLong(0) == 100L,
      "a pushed count must not touch data files at execution")
    // restore the table for the remaining assertions
    val t2 = freshTable("aggpush_live")
    CommitLog.appendClustered(spark,
      (0L to 99L).map(i => (i, s"v$i")).toDF("k", "v"), t2, "k", buckets = 4)

    // declines, never wrong: a WHERE keeps the ordinary scan + aggregate
    val filtered = spark.read.format("graftlog").load(t2)
      .filter($"k" > 50).agg(count(lit(1)).as("n"))
    assert(filtered.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "a filtered aggregate must not be metadata-answered")
    assert(filtered.collect().head.getLong(0) == 49L)

    // min/max on the column WITHOUT recorded zone ranges declines
    val noStats = spark.read.format("graftlog").load(t2).agg(max("v").as("m"))
    assert(noStats.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "max on a stats-less column must scan")
    assert(noStats.collect().head.getString(0) == "v99")

    // a stats-less append breaks min/max coverage (declines) but count
    // still pushes — each aggregate needs only its own vocabulary
    CommitLog.append(Seq((200L, "x")).toDF("k", "v"), t2)
    val mixed = spark.read.format("graftlog").load(t2).agg(min("k").as("lo"))
    assert(mixed.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "broken zone coverage must fall back to the scan")
    assert(mixed.collect().head.getLong(0) == 0L)
    val cnt = spark.read.format("graftlog").load(t2).agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty && cnt.collect().head.getLong(0) == 101L)

    // group-by declines; time travel answers for the PINNED version
    val grouped = spark.read.format("graftlog").load(t2)
      .groupBy("v").agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty && grouped.count() == 101L)
    val v0 = spark.read.format("graftlog").option("versionAsOf", 0).load(t2)
      .agg(count(lit(1)).as("n"), max("k").as("hi"))
    assert(v0.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, "the pre-append snapshot has full coverage: both must push")
    val rv0 = v0.collect().head
    assert((rv0.getLong(0), rv0.getLong(1)) == ((100L, 99L)))
  }

  test("readChangeFeed option serves the change relation, batch and SQL") {
    val t = freshTable("cdf")
    CommitLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)   // v0
    CommitLog.upsert(spark, Seq((2L, "B")).toDF("id", "v"), t, Seq("id")) // v1

    val cdf = spark.read.format("graftlog").option("readChangeFeed", true).load(t)
    assert(cdf.schema.fieldNames.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val got = cdf.collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      ("insert", 0L, 1L, "a"), ("insert", 0L, 2L, "b"),
      ("insert", 1L, 2L, "B"), ("delete", 1L, 2L, "b")))

    // an inclusive window pins a sub-range
    val windowed = spark.read.format("graftlog")
      .option("readChangeFeed", true)
      .option("startingVersion", 1).option("endingVersion", 1).load(t)
    assert(windowed.count() == 2L)

    // the SQL view form
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW ds_cdf
      USING graftlog OPTIONS (path '$t', readChangeFeed 'true')""")
    assert(spark.sql("SELECT count(*) AS n FROM ds_cdf").head.getLong(0) == 4L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM ds_cdf WHERE _change_type = 'delete'").head.getLong(0) == 1L)

    // read-only and window-validated
    intercept[Exception] {
      spark.read.format("graftlog").option("readChangeFeed", true)
        .option("startingVersion", 5).load(t).collect()
    }
    intercept[Exception] {
      Seq((9L, "z")).toDF("id", "v").write.format("graftlog")
        .option("readChangeFeed", true).mode("append").save(t)
    }
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

  test("change-feed timestamp windows resolve through commit times") {
    import spark.implicits._
    val t = freshTable("cdfts")
    val base = System.currentTimeMillis() - 1000000
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)   // v0
    CommitLog.append(Seq((2L, "b")).toDF("id", "v"), t)   // v1
    CommitLog.append(Seq((3L, "c")).toDF("id", "v"), t)   // v2
    stampCommit(t, 0L, base)
    stampCommit(t, 1L, base + 10000)
    stampCommit(t, 2L, base + 20000)
    def feed(opts: (String, String)*): Seq[Long] = {
      val r = opts.foldLeft(spark.read.format("graftlog")
          .option("readChangeFeed", "true")) { case (rd, (k, v)) => rd.option(k, v) }
      r.load(t).select("id").collect().map(_.getLong(0)).toSeq.sorted
    }
    // startingTimestamp ts = changes SINCE ts: commits after the snapshot
    // current at ts (v0 at base+5000 -> v1, v2)
    assert(feed("startingTimestamp" -> (base + 5000).toString) == Seq(2L, 3L))
    // endingTimestamp bounds the window from above
    assert(feed("startingTimestamp" -> (base + 5000).toString,
      "endingTimestamp" -> (base + 15000).toString) == Seq(2L))
    // a start before the retained history = the whole feed
    assert(feed("startingTimestamp" -> "1") == Seq(1L, 2L, 3L))
    // mixing version and timestamp forms refuses loudly
    val e = intercept[IllegalArgumentException] {
      feed("startingVersion" -> "1", "startingTimestamp" -> (base + 5000).toString)
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }

  test("_commit_timestamp: every change row carries its commit's clock, " +
      "equal within a commit, monotone across versions") {
    import spark.implicits._
    val t = freshTable("cdftscol")
    val base = System.currentTimeMillis() - 1000000
    CommitLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)      // v0
    CommitLog.append(Seq((3L, "c")).toDF("id", "v"), t)                 // v1
    CommitLog.overwrite(Seq((1L, "a"), (9L, "z")).toDF("id", "v"), t)   // v2
    stampCommit(t, 0L, base)
    // deliberately stamp v1 BEHIND v0: serving must monotonize (running
    // max), exactly as timestamp time travel resolves
    stampCommit(t, 1L, base - 5000)
    stampCommit(t, 2L, base + 20000)
    val rows = spark.read.format("graftlog").option("readChangeFeed", "true")
      .load(t)
      .select("_commit_version", "_commit_timestamp")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(rows.nonEmpty && rows.forall(_._2 != null),
      s"every change row must be stamped: $rows")
    val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2.getTime).distinct).toMap
    assert(byV.forall(_._2.size == 1),
      s"one commit's rows must share ONE timestamp: $byV")
    assert(byV(0L) == Seq(base) && byV(1L) == Seq(base) &&
      byV(2L) == Seq(base + 20000),
      s"stamps must be the (monotonized) commit clocks: $byV")
    // the TVF and the typed batch API serve the same column
    graft.sources.TableChanges.register(spark)
    val tvf = spark.sql(
      s"SELECT _commit_version, _commit_timestamp FROM table_changes('$t', 0, 2)")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet
    assert(tvf == Set((0L, base), (1L, base), (2L, base + 20000)), s"got $tvf")
  }

  test("table_changes misuse fails at analysis with named causes") {
    import spark.implicits._
    val t = freshTable("tvferr")
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)
    graft.sources.TableChanges.register(spark)
    def err(sql: String): String =
      intercept[Exception] { spark.sql(sql).collect() }.getMessage
    assert(err(s"SELECT * FROM table_changes('$t', 0)")
      .contains("exactly 3 arguments"))
    assert(err(s"SELECT * FROM table_changes('$t', 'zero', 0)")
      .contains("integer version"))
    assert(err("SELECT * FROM table_changes('not.a.graft.catalog', 0, 0)")
      .contains("CATALOG_NOT_FOUND"))
    assert(err(s"SELECT * FROM table_changes('$t', 5, 99)")
      .contains("must lie within"))
    // happy path still serves after the misuse attempts
    assert(spark.sql(s"SELECT count(*) FROM table_changes('$t', 0, 0)")
      .head.getLong(0) == 1L)
  }
}
