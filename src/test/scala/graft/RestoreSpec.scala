package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.CommitLog

/** RESTORE to a historical version: one metadata commit, zero data IO,
  * history preserved, deletion-vector state restored, CDF of the restore
  * = the net row reversal, schema-drift and vacuumed-horizon refusals. */
class RestoreSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_rs_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def content(t: String): Seq[(Long, String)] =
    CommitLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted

  test("restore reverts an upsert + append, zero data IO, history preserved") {
    val t = freshTable("basic")
    CommitLog.append(df(1L -> "a", 2L -> "b"), t)            // v0
    val v0Content = content(t)
    CommitLog.upsert(spark, df(2L -> "B", 3L -> "c"), t, Seq("id")) // v1
    CommitLog.append(df(4L -> "d"), t)                        // v2
    def parquetCount: Int = {
      val s = Files.list(Paths.get(t))
      try s.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val diskBefore = parquetCount
    val v = CommitLog.restore(t, 0L)
    assert(v.contains(3L), s"restore lands as the next commit, got $v")
    assert(parquetCount == diskBefore, "a restore writes no data file")
    assert(content(t) == v0Content)
    // history preserved: the rolled-back states still time-travel
    assert(content(t) != CommitLog.read(spark, t, Some(2L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted)
    assert(CommitLog.read(spark, t, Some(1L)).count() == 3L)
    // CDF of the restore commit: exactly the net reversal
    val w = CommitLog.changes(spark, t, 2L, 3L)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(w == Set((2L, "B", "delete"), (2L, "b", "insert"),
      (3L, "c", "delete"), (4L, "d", "delete")), s"got $w")
    // idempotent: restoring to the now-current state is a no-op
    assert(CommitLog.restore(t, 0L).isEmpty)
  }

  test("restore revives deletion-vector state exactly") {
    val t = freshTable("dv")
    CommitLog.append(df(1L -> "a", 2L -> "b", 3L -> "c").coalesce(1), t) // v0
    CommitLog.enableDv(t)                                                 // v1
    CommitLog.dvDelete(spark, t, col("id") === 2L)                        // v2
    CommitLog.dvDelete(spark, t, col("id") === 3L)                        // v3
    assert(content(t) == Seq(1L -> "a"))
    // back to the one-vector state
    assert(CommitLog.restore(t, 2L).isDefined)
    assert(content(t) == Seq(1L -> "a", 3L -> "c"))
    assert(CommitLog.dvRowCount(t) == 1L)
    // back to the vector-free state
    assert(CommitLog.restore(t, 0L).isDefined)
    assert(content(t) == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(CommitLog.dvRowCount(t) == 0L)
  }

  test("restore rolls the declared schema and constraints back too " +
      "(Delta RESTORE parity); pre-declaration targets refuse") {
    val t = freshTable("schema")
    CommitLog.append(df(1L -> "a"), t)                       // v0
    val base = CommitLog.read(spark, t).schema
    CommitLog.evolveSchema(t, base, CommitLog.currentVersion(t)) // v1: declare
    val vGood = CommitLog.currentVersion(t)
    // the damage: widen the schema, add a constraint, write under both
    CommitLog.evolveSchema(t, base.add("extra",
      org.apache.spark.sql.types.LongType), CommitLog.currentVersion(t)) // v2
    CommitLog.addConstraint(spark, t, "v_nonempty", "length(v) > 0")     // v3
    import spark.implicits._
    CommitLog.append(Seq((9L, "z", 7L)).toDF("id", "v", "extra"), t)     // v4
    // one restore commit: data back, schema back, constraint gone
    assert(CommitLog.restore(t, vGood).nonEmpty)
    assert(content(t) == Seq(1L -> "a"))
    assert(CommitLog.declaredSchema(t).exists(_.fieldNames.toSeq == Seq("id", "v")),
      "the restored schema must be the target version's")
    assert(CommitLog.constraintsOf(t).isEmpty,
      "a constraint added after the target must be rolled back")
    // the damaged era is still time-travelable, with ITS schema
    assert(CommitLog.declaredSchema(t, Some(4L)).exists(
      _.fieldNames.contains("extra")))
    // a target PREDATING any declared schema refuses (cannot un-declare)
    val e = intercept[IllegalArgumentException] { CommitLog.restore(t, 0L) }
    assert(e.getMessage.contains("predates the table's declared schema"))

    val t2 = freshTable("vacuumed")
    CommitLog.append(df(1L -> "a"), t2)                      // v0
    CommitLog.upsert(spark, df(1L -> "A"), t2, Seq("id"))    // v1 (drops v0's file)
    CommitLog.vacuum(t2, retainMillis = 0L)
    val e2 = intercept[IllegalArgumentException] { CommitLog.restore(t2, 0L) }
    assert(e2.getMessage.contains("vacuumed past the restore horizon"))
  }

  test("TBLPROPERTIES opt-ins at CREATE: dv from birth, unknown keys refuse") {
    val root = Paths.get(freshTable("props"))
    Files.createDirectories(root)
    spark.conf.set("spark.sql.catalog.rprop",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rprop.warehouse", root.resolve("wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rprop.s")
    spark.sql("DROP TABLE IF EXISTS rprop.s.t")
    spark.sql(
      """CREATE TABLE rprop.s.t (id BIGINT, v STRING)
        |TBLPROPERTIES ('graft.dv.enabled' = 'true')""".stripMargin)
    val dst = root.resolve("wh").resolve("s").resolve("t").toString
    assert(CommitLog.dvEnabled(dst), "dv must be on from birth")
    spark.sql("INSERT INTO rprop.s.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM rprop.s.t WHERE v = 'a'") // merge-on-read path
    assert(CommitLog.dvRowCount(dst) == 1L)
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE rprop.s.bad (id BIGINT)
          |TBLPROPERTIES ('graft.dv.enable' = 'true')""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("unknown table property")), msgs(e).mkString(" | "))
  }

  test("snapshot streams refuse a restore commit unless ignoreChanges") {
    import org.apache.spark.sql.streaming.Trigger
    val t = freshTable("stream")
    CommitLog.append(df(1L -> "a"), t)          // v0
    CommitLog.append(df(2L -> "b"), t)          // v1
    CommitLog.restore(t, 0L)                    // v2
    val e = intercept[Exception] {
      val q = spark.readStream.format("graftlog").load(t)
        .writeStream.format("memory").queryName("rs_refuse")
        .trigger(Trigger.AvailableNow()).start()
      try { q.processAllAvailable(); q.awaitTermination(60000L) } finally q.stop()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("rollback")), msgs(e).mkString(" | "))
    // with ignoreChanges the restore delivers nothing (not new data)
    val q2 = spark.readStream.format("graftlog").option("ignoreChanges", "true")
      .load(t)
      .writeStream.format("memory").queryName("rs_skip")
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(60000L))
    val got = spark.sql("SELECT id FROM rs_skip ORDER BY id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L), s"got ${got.toSeq}")
  }
}
