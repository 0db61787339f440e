package graft

import java.nio.file.{Files, Paths}

import graft.io.CommitLog

/** `CALL` table-maintenance procedures on the graft catalog
  * ([[graft.sources.GraftProcedures]]): compact, vacuum, checkpoint,
  * history — each a SQL binding over the transactional CommitLog
  * operation, with results returned as rows. */
class GraftProceduresSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val root = Paths.get(graft.io.Sinks.scratchDir("graft_proc_wh"))
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(root)
    spark.conf.set("spark.sql.catalog.pcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcat.warehouse", root.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcat.m")
    root.toString
  }

  /** A table with several commits and deliberately many small files. */
  private def build(name: String): String = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS pcat.m.$name")
    spark.sql(s"CREATE TABLE pcat.m.$name AS SELECT id FROM range(0, 20, 1, 4)")
    spark.sql(s"INSERT INTO pcat.m.$name SELECT id FROM range(20, 40, 1, 4)")
    spark.sql(s"INSERT INTO pcat.m.$name SELECT id FROM range(40, 60, 1, 4)")
    Paths.get(warehouse, "m", name).toString
  }

  test("CALL compact bin-packs the snapshot in one commit, content intact") {
    val dir = build("c")
    assert(CommitLog.snapshotFiles(dir).size > 2)
    val vBefore = CommitLog.currentVersion(dir)

    val row = spark.sql("CALL pcat.system.compact(`table` => 'm.c', target_files => 2)").head
    assert(row.getLong(0) == vBefore + 1, "compact must land ONE commit")
    assert(row.getInt(1) <= 2, s"live files after compact: ${row.getInt(1)}")
    assert(CommitLog.snapshotFiles(dir).size == row.getInt(1))
    assert(spark.sql("SELECT sum(id) AS s FROM pcat.m.c").head.getLong(0) ==
      (0L until 60L).sum)

    // already at target: a no-op returns NULL and writes no commit
    val again = spark.sql("CALL pcat.system.compact('m.c', 5)").head
    assert(again.isNullAt(0))
    assert(CommitLog.currentVersion(dir) == vBefore + 1)
  }

  test("CALL cluster re-establishes zone maps; pruned reads follow") {
    val dir = build("z")
    assert(CommitLog.fileStats(dir).isEmpty,
      "CTAS layout declares no clustered zone maps (footer multi-stats " +
        "exist but interleave — the relayout is what establishes pruning)")

    val row = spark.sql(
      "CALL pcat.system.cluster(`table` => 'm.z', `column` => 'id', buckets => 3)").head
    assert(row.getInt(1) == 3, s"3 buckets = 3 live files, got ${row.getInt(1)}")

    val stats = CommitLog.fileStatsOn(dir, "id")
    assert(stats.size == 3, s"every file must carry a zone range: $stats")
    val ranges = stats.values.toSeq.sortBy(_._1)
    assert(ranges.head._1 == 0L && ranges.last._2 == 59L)
    assert(ranges.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => l2 > h1
      case _ => true
    }, s"ranges must be disjoint: $ranges")

    // data skipping is live again: a first-bucket query reads one file
    val (lo, hi) = ranges.head
    assert(CommitLog.prunedFiles(dir, lo, hi).size == 1)
    // metadata min/max is exact again too
    assert(CommitLog.snapshotMinMax(dir, "id").contains((0L, 59L)))
    // content invariant
    assert(spark.sql("SELECT sum(id) AS s FROM pcat.m.z").head.getLong(0) ==
      (0L until 60L).sum)
  }

  test("CALL vacuum reclaims unreferenced files and nothing else") {
    val dir = build("v")
    spark.sql("CALL pcat.system.compact('m.v', 1)")
    val live = CommitLog.snapshotFiles(dir)
    val onDisk = Files.list(Paths.get(dir)).iterator()
    var parquets = 0
    onDisk.forEachRemaining(p =>
      if (p.getFileName.toString.endsWith(".parquet")) parquets += 1)
    assert(parquets > live.size, "pre-vacuum: compacted-away files still on disk")

    val removed = spark.sql("CALL pcat.system.vacuum('m.v', 0)")
      .collect().map(_.getString(0)).toSeq
    assert(removed.nonEmpty)
    assert(removed.toSet.intersect(live.toSet).isEmpty,
      "vacuum must never touch live files")
    removed.foreach(f => assert(!Files.exists(Paths.get(dir, f))))
    assert(spark.sql("SELECT count(*) AS n FROM pcat.m.v").head.getLong(0) == 60L)
  }

  test("CALL checkpoint rolls the log and expires the prefix") {
    val dir = build("k")
    val tip = CommitLog.currentVersion(dir)
    val row = spark.sql("CALL pcat.system.checkpoint('m.k')").head
    assert(row.getLong(0) == tip)
    assert(row.getInt(1) > 0, "the pre-checkpoint commits must be expired")
    // snapshot reads still serve the full content through the checkpoint
    assert(spark.sql("SELECT count(*) AS n FROM pcat.m.k").head.getLong(0) == 60L)
    spark.sql("INSERT INTO pcat.m.k SELECT id FROM range(60, 70)")
    assert(CommitLog.currentVersion(dir) == tip + 1)
  }

  test("CALL history serves the retained commit log, newest first") {
    build("h")
    val rows = spark.sql("CALL pcat.system.history('m.h')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getTimestamp(4)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.reverse.toSeq)
    assert(rows.length == 4) // create(v0) + CTAS insert + 2 inserts
    assert(rows.forall(_._4 == 0))
    assert(rows.last._1 == 0L)
    // commit times come from the log files and are monotone with versions
    assert(rows.forall(_._5 != null))
    assert(rows.map(_._5.getTime).toSeq == rows.map(_._5.getTime).sorted.reverse.toSeq)
  }

  test("an unknown procedure names the offerings") {
    warehouse
    val e = intercept[Exception] { spark.sql("CALL pcat.system.nope('m.h')") }
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; ours is
    // the cause and must name what IS offered
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("system.compact"), messages)
  }
}
