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
