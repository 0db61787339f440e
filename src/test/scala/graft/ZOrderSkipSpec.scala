package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

import graft.io.CommitLog
import graft.sources.GraftLogDataSource

/** Z-ORDER table clustering + 2-D file skipping: the write side records
  * per-file zkey ranges under a composite `z(px,py)` spec; the read side
  * decomposes box predicates into zkey intervals and prunes. The core
  * property, brute-forced over many boxes: PRUNING NEVER DROPS A
  * MATCHING ROW — the pruned read equals the full-scan filter exactly —
  * while a small box genuinely skips files. */
class ZOrderSkipSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_zskip_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  private def grid(n: Long) = {
    import spark.implicits._
    // a deterministic scatter over a [0, 63]^2 grid, multiple rows per cell
    (0L until n).map(i => (i, (i * 37) % 64, (i * 53 + 11) % 64)).toDF("id", "x", "y")
  }

  test("box-pruned reads equal brute-force filters over many boxes; small boxes skip files") {
    val t = freshTable("boxes")
    CommitLog.append(grid(4096), t)
    CommitLog.compactZOrdered(spark, t, "x", "y", buckets = 16)
    assert(CommitLog.snapshotFiles(t).size == 16)
    val full = CommitLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    var anySkip = false
    // deterministic box sweep: corners, slivers, single cells, full domain
    val boxes = Seq(
      (0L, 63L, 0L, 63L), (0L, 7L, 0L, 7L), (56L, 63L, 56L, 63L),
      (10L, 12L, 0L, 63L), (0L, 63L, 30L, 31L), (17L, 17L, 42L, 42L),
      (5L, 40L, 20L, 25L), (31L, 32L, 31L, 32L), (0L, 0L, 63L, 63L),
      (60L, 63L, 0L, 3L), (13L, 45L, 13L, 45L), (48L, 55L, 8L, 23L))
    for ((xlo, xhi, ylo, yhi) <- boxes) {
      val filters = Seq(
        GreaterThanOrEqual("x", xlo), LessThanOrEqual("x", xhi),
        GreaterThanOrEqual("y", ylo), LessThanOrEqual("y", yhi))
      val pruned = GraftLogDataSource.prunedFileNames(t,
        CommitLog.currentVersion(t), filters)
      if (pruned.size < 16) anySkip = true
      // every row the box matches must live in a file that SURVIVED
      val got =
        if (pruned.isEmpty) Set.empty[(Long, Long, Long)]
        else spark.read.parquet(pruned.map(f => Paths.get(t, f).toString): _*)
          .filter(col("x").between(xlo, xhi) && col("y").between(ylo, yhi))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = full.filter { case (_, x, y) =>
        x >= xlo && x <= xhi && y >= ylo && y <= yhi }
      assert(got == want,
        s"box [$xlo,$xhi]x[$ylo,$yhi]: pruned read lost/gained rows " +
          s"(got ${got.size}, want ${want.size}; read ${pruned.size}/16 files)")
    }
    assert(anySkip, "at least one small box must actually skip files")
    // one-sided predicates prune too (the other dim defaults to the domain)
    val oneSided = GraftLogDataSource.prunedFileNames(t,
      CommitLog.currentVersion(t),
      Seq(GreaterThanOrEqual("x", 60L), LessThanOrEqual("x", 63L)))
    assert(oneSided.size < 16, s"one-sided x-band must skip, read ${oneSided.size}/16")
  }

  test("out-of-domain and null coordinates refuse loudly at write") {
    import spark.implicits._
    val t1 = freshTable("domain")
    CommitLog.append(Seq((1L, 70000L, 5L)).toDF("id", "x", "y"), t1)
    val e1 = intercept[RuntimeException] {
      CommitLog.compactZOrdered(spark, t1, "x", "y", 2)
    }
    assert(e1.getMessage.contains("16-bit"), e1.getMessage)
    val t2 = freshTable("nulls")
    CommitLog.append(Seq((1L, Some(3L), Option.empty[Long]),
      (2L, Some(4L), Some(5L))).toDF("id", "x", "y"), t2)
    val e2 = intercept[RuntimeException] {
      CommitLog.compactZOrdered(spark, t2, "x", "y", 2)
    }
    assert(e2.getMessage.contains("non-null"), e2.getMessage)
    // an aborted z-stage leaves no live garbage: the snapshot is unchanged
    assert(CommitLog.read(spark, t2).count() == 2L)
  }

  test("impossible boxes skip every z-covered file; the empty read serves schema") {
    val t = freshTable("empty")
    CommitLog.append(grid(256), t)
    CommitLog.compactZOrdered(spark, t, "x", "y", 4)
    val pruned = GraftLogDataSource.prunedFileNames(t,
      CommitLog.currentVersion(t),
      Seq(GreaterThanOrEqual("x", 100L), LessThanOrEqual("x", 40L)))
    assert(pruned.isEmpty, s"an impossible conjunction must skip all files, got $pruned")
  }

  test("upsert on a z-ordered table stays exact; re-zordering restores skipping") {
    import spark.implicits._
    val t = freshTable("zupsert")
    CommitLog.append(grid(1024), t)
    CommitLog.compactZOrdered(spark, t, "x", "y", 8)
    // an upsert rewrite cannot preserve the z layout (its stats column is
    // the composite spec, not a frame column) — content must stay exact,
    // the replaced files simply lose their zkey ranges (fail-safe: they
    // are read, never skipped)
    CommitLog.upsert(spark, Seq((5L, 99L, 99L)).toDF("id", "x", "y"), t, Seq("id"))
    val rows = CommitLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 1024 && rows(5L) == ((99L, 99L)))
    // re-zorder re-establishes full coverage and pruning
    CommitLog.compactZOrdered(spark, t, "x", "y", 8)
    val specs = CommitLog.fileStatsColumns(t)
    assert(CommitLog.snapshotFiles(t).forall(specs.get(_).contains("z(x,y)")))
    val pruned = GraftLogDataSource.prunedFileNames(t, CommitLog.currentVersion(t),
      Seq(GreaterThanOrEqual("x", 0L), LessThanOrEqual("x", 7L),
        GreaterThanOrEqual("y", 0L), LessThanOrEqual("y", 7L)))
    assert(pruned.size < 8, s"corner box must skip after re-zorder, read ${pruned.size}/8")
  }
}
