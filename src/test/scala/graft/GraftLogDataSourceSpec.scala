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
  }
}
