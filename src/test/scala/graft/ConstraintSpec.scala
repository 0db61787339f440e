package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.CommitLog

/** CHECK constraints enforced on write (the public Delta table-constraint
  * semantics): declaration validates the existing snapshot, every staging
  * write validates the batch, NULL passes (SQL CHECK), violations refuse
  * the WHOLE write naming the constraint, and the declaration survives
  * checkpoint rolls. */
class ConstraintSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_ck_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  private def df(rows: (Long, java.lang.Long)*) = {
    import spark.implicits._
    rows.toDF("id", "qty")
  }

  test("a violating append is refused whole; a clean one lands") {
    val t = freshTable("basic")
    CommitLog.append(df(1L -> 5L), t)
    CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    val e = intercept[IllegalStateException] {
      CommitLog.append(df(2L -> 3L, 3L -> -1L), t)
    }
    assert(e.getMessage.contains("qty_pos") && e.getMessage.contains("qty > 0"))
    assert(CommitLog.read(spark, t).count() == 1,
      "the violating batch must not land even partially")
    CommitLog.append(df(2L -> 3L), t)
    assert(CommitLog.read(spark, t).count() == 2)
  }

  test("declaring over an already-violating snapshot is refused") {
    val t = freshTable("preexisting")
    CommitLog.append(df(1L -> -5L), t)
    val e = intercept[IllegalArgumentException] {
      CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    }
    assert(e.getMessage.contains("already violates"))
    assert(CommitLog.constraintsOf(t).isEmpty)
  }

  test("NULL passes (SQL CHECK semantics); drop lifts enforcement") {
    val t = freshTable("nulls")
    CommitLog.append(df(1L -> 5L), t)
    CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    CommitLog.append(df(2L -> null), t) // NULL qty: not FALSE, passes
    assert(CommitLog.read(spark, t).count() == 2)
    assert(CommitLog.dropConstraint(t, "qty_pos").isDefined)
    assert(CommitLog.dropConstraint(t, "qty_pos").isEmpty, "second drop: no-op")
    CommitLog.append(df(3L -> -9L), t) // enforcement lifted
    assert(CommitLog.read(spark, t).count() == 3)
  }

  test("upsert and ingest stage through the same enforcement") {
    val t = freshTable("paths")
    CommitLog.append(df(1L -> 5L), t)
    CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    intercept[IllegalStateException] {
      CommitLog.upsert(spark, df(1L -> -2L), t, Seq("id"))
    }
    intercept[IllegalStateException] {
      CommitLog.dedupAppend(spark, df(9L -> 0L), t, Seq("id"))
    }
    assert(CommitLog.read(spark, t).collect().map(_.getLong(1)).toSeq == Seq(5L))
  }

  test("a violating streaming epoch fails the write; nothing lands") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = Paths.get(freshTable("stream"))
    Files.createDirectories(root)
    spark.conf.set("spark.sql.catalog.ckcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.warehouse",
      root.resolve("wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ckcat.s")
    spark.sql("DROP TABLE IF EXISTS ckcat.s.t")
    spark.sql("CREATE TABLE ckcat.s.t (id BIGINT, qty BIGINT)")
    val dst = root.resolve("wh").resolve("s").resolve("t").toString
    CommitLog.addConstraint(spark, dst, "qty_pos", "qty > 0")
    val src = root.resolve("src").toString
    CommitLog.append(Seq((1L, 5L), (2L, -3L)).toDF("id", "qty"), src)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graftlog").load(src)
        .writeStream.option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).toTable("ckcat.s.t")
      q.awaitTermination(120000L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("qty_pos")), msgs(e).mkString(" | "))
    assert(CommitLog.snapshotFiles(dst).count(_.endsWith(".parquet")) >= 0)
    assert(spark.sql("SELECT count(*) AS n FROM ckcat.s.t").head().getLong(0) == 0L,
      "the violating epoch must not land even partially")
  }

  test("renaming or dropping a constrained column refuses at the alter") {
    val t = freshTable("rename")
    CommitLog.append(df(1L -> 5L), t)
    CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    val cur = CommitLog.read(spark, t).schema
    val renamed = org.apache.spark.sql.types.StructType(cur.fields.map(f =>
      if (f.name == "qty") f.copy(name = "quantity") else f))
    val e = intercept[IllegalArgumentException] {
      CommitLog.evolveSchema(t, renamed, CommitLog.currentVersion(t))
    }
    assert(e.getMessage.contains("qty_pos") &&
      e.getMessage.contains("drop the constraint first"))
    // renaming the UNconstrained column is fine; after dropping the
    // constraint the rename lands too
    val otherRenamed = org.apache.spark.sql.types.StructType(cur.fields.map(f =>
      if (f.name == "id") f.copy(name = "key") else f))
    CommitLog.evolveSchema(t, otherRenamed, CommitLog.currentVersion(t))
    CommitLog.dropConstraint(t, "qty_pos")
    CommitLog.evolveSchema(t, org.apache.spark.sql.types.StructType(
      CommitLog.declaredSchema(t).get.fields.map(f =>
        if (f.name == "qty") f.copy(name = "quantity") else f)),
      CommitLog.currentVersion(t))
  }

  test("constraints survive a checkpoint roll + log expiry") {
    val t = freshTable("ckpt")
    CommitLog.append(df(1L -> 5L), t)
    CommitLog.addConstraint(spark, t, "qty_pos", "qty > 0")
    CommitLog.checkpoint(t)
    CommitLog.expireLog(t)
    assert(CommitLog.constraintsOf(t) == Map("qty_pos" -> "qty > 0"))
    intercept[IllegalStateException] {
      CommitLog.append(df(2L -> -1L), t)
    }
  }
}
