package graft

import java.nio.file.{Files, Paths}

import graft.io.CommitLog

/** Column-mapping schema evolution over commit-log tables: RENAME COLUMN
  * (metadata-only — physical parquet names are fixed at first write,
  * Delta column-mapping `name` mode) and ALTER COLUMN TYPE widening
  * (declared type changes; the parquet reader promotes old narrow pages).
  * Every test reads BOTH eras — files written before and after the
  * evolution — through every surface it exercises, and the refusal tests
  * pin the loud-failure contract for drops, narrowing, and collisions. */
class SchemaEvolutionSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val root = Paths.get(graft.io.Sinks.scratchDir("graft_evo_wh"))
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(root)
    spark.conf.set("spark.sql.catalog.evo", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.warehouse", root.toString)
    root.toString
  }

  test("RENAME COLUMN is metadata-only: zero files move, both eras read") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.r")
    spark.sql("DROP TABLE IF EXISTS evo.r.t")
    spark.sql("CREATE TABLE evo.r.t AS SELECT id, concat('s', id) AS status FROM range(4)")
    val dir = Paths.get(wh, "r", "t").toString
    val filesBefore = CommitLog.snapshotFiles(dir).toSet

    spark.sql("ALTER TABLE evo.r.t RENAME COLUMN status TO state")
    assert(CommitLog.snapshotFiles(dir).toSet == filesBefore,
      "a rename must not move a single data file")

    // old files serve real values under the NEW logical name
    val head = spark.sql("SELECT id, state FROM evo.r.t ORDER BY id").collect()
    assert(head.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      (0L to 3L).map(i => i -> s"s$i"))

    // writes after the rename land under the PHYSICAL name and read back
    spark.sql("INSERT INTO evo.r.t SELECT id + 10, concat('n', id) FROM range(2)")
    val all = spark.sql("SELECT id, state FROM evo.r.t ORDER BY id").collect()
    assert(all.length == 6 && all.last.getString(1) == "n1")
    // new files physically carry the ORIGINAL name (mapping is stable)
    val newFile = (CommitLog.snapshotFiles(dir).toSet -- filesBefore).head
    val physical = spark.read.parquet(Paths.get(dir, newFile).toString).schema.fieldNames
    assert(physical.contains("status") && !physical.contains("state"),
      s"post-rename files must wear the physical name, got ${physical.toSeq}")

    // filters on the renamed column work across eras
    assert(spark.sql("SELECT count(*) FROM evo.r.t WHERE state = 's2'").head.getLong(0) == 1L)

    // rename BACK to the physical name drops the mapping
    spark.sql("ALTER TABLE evo.r.t RENAME COLUMN state TO status")
    val declared = CommitLog.declaredSchema(dir).get
    assert(!CommitLog.hasNameMapping(declared),
      "renaming back to the physical name must drop the mapping metadata")
    assert(spark.sql("SELECT count(*) FROM evo.r.t WHERE status = 's2'").head.getLong(0) == 1L)
  }

  test("rename guards: collisions with logical AND physical names refuse loudly") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.g")
    spark.sql("DROP TABLE IF EXISTS evo.g.t")
    spark.sql("CREATE TABLE evo.g.t AS SELECT id, id * 2 AS a, id * 3 AS b FROM range(3)")
    // logical collision (Spark's analyzer refuses before the catalog does —
    // either layer failing loudly satisfies the contract)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.g.t RENAME COLUMN a TO b")
    }
    assert(e1.getMessage.contains("already exists") || e1.getMessage.contains("taken"),
      e1.getMessage)
    // physical collision: free 'a' by renaming it away, then try to grab it
    spark.sql("ALTER TABLE evo.g.t RENAME COLUMN a TO a2")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.g.t RENAME COLUMN b TO a")
    }
    assert(e2.getMessage.contains("physical"), e2.getMessage)
  }

  test("type widening: int→bigint and float→double read old narrow files") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.w")
    spark.sql("DROP TABLE IF EXISTS evo.w.t")
    spark.sql(
      """CREATE TABLE evo.w.t AS
        |SELECT CAST(id AS INT) AS n, CAST(id AS FLOAT) AS x FROM range(3)""".stripMargin)
    val dir = Paths.get(wh, "w", "t").toString
    val filesBefore = CommitLog.snapshotFiles(dir).toSet

    spark.sql("ALTER TABLE evo.w.t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE evo.w.t ALTER COLUMN x TYPE DOUBLE")
    assert(CommitLog.snapshotFiles(dir).toSet == filesBefore,
      "widening must not rewrite data files")

    val schema = spark.table("evo.w.t").schema
    assert(schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(schema("x").dataType == org.apache.spark.sql.types.DoubleType)

    // old INT32/FLOAT pages read through the widening promotion
    val rows = spark.sql("SELECT n, x FROM evo.w.t ORDER BY n").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, 1.0, 2.0))

    // post-widen inserts land wide; mixed eras aggregate correctly
    spark.sql("INSERT INTO evo.w.t SELECT CAST(1000000000000 AS BIGINT), 1.5D")
    val agg = spark.sql("SELECT sum(n) AS s, sum(x) AS sx FROM evo.w.t").head()
    assert(agg.getLong(0) == 1000000000003L)
    assert(math.abs(agg.getDouble(1) - 4.5) < 1e-9)
  }

  test("narrowing and cross-kind retypes refuse loudly") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.n")
    spark.sql("DROP TABLE IF EXISTS evo.n.t")
    spark.sql("CREATE TABLE evo.n.t AS SELECT id AS n, CAST(id AS STRING) AS s FROM range(3)")
    // Spark's analyzer (Cast.canUpCast) refuses narrowing before the
    // catalog's own widenOk guard — both are loud; accept either message
    def refusedRetype(m: String): Boolean =
      m.contains("widening") || m.contains("NOT_SUPPORTED_CHANGE_COLUMN")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.n.t ALTER COLUMN n TYPE INT") // bigint → int narrows
    }
    assert(refusedRetype(e1.getMessage), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.n.t ALTER COLUMN s TYPE BIGINT") // string → bigint
    }
    assert(refusedRetype(e2.getMessage), e2.getMessage)
    // the catalog's own guard (defense in depth below the analyzer): an
    // up-castable-but-unreadable promotion the analyzer would allow must
    // still refuse — int → double up-casts in Catalyst but is not in the
    // parquet reader's widening set this engine verified
    val cat = spark.sessionState.catalogManager.catalog("evo")
      .asInstanceOf[graft.sources.GraftCatalog]
    val e4 = intercept[Exception] {
      cat.alterTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("n"), "t"),
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("n"), org.apache.spark.sql.types.IntegerType))
    }
    assert(e4.getMessage.contains("widening"), e4.getMessage)
  }

  test("DROP COLUMN is metadata-only; the physical name is tombstoned forever") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.d")
    spark.sql("DROP TABLE IF EXISTS evo.d.t")
    spark.sql("CREATE TABLE evo.d.t AS SELECT id, concat('s', id) AS s, id * 2 AS x FROM range(4)")
    val dir = Paths.get(wh, "d", "t").toString
    val preDrop = CommitLog.currentVersion(dir)
    val filesBefore = CommitLog.snapshotFiles(dir).toSet

    spark.sql("ALTER TABLE evo.d.t DROP COLUMN s")
    assert(CommitLog.snapshotFiles(dir).toSet == filesBefore, "drop must move zero files")
    assert(spark.table("evo.d.t").schema.fieldNames.toSeq == Seq("id", "x"))
    assert(spark.sql("SELECT sum(x) FROM evo.d.t").head.getLong(0) == 12L)
    // time travel below the drop serves the column
    assert(CommitLog.read(spark, dir, Some(preDrop)).schema.fieldNames.contains("s"))

    // tombstone: re-adding the name refuses (stale bytes would resurrect)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.d.t ADD COLUMNS (s STRING)")
    }
    assert(e1.getMessage.contains("DROPPED"), e1.getMessage)
    // ...and renaming onto it refuses the same way
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.d.t RENAME COLUMN x TO s")
    }
    assert(e2.getMessage.contains("DROPPED"), e2.getMessage)
    // a DIFFERENT new column is fine; post-drop inserts read back
    spark.sql("ALTER TABLE evo.d.t ADD COLUMNS (note STRING)")
    spark.sql("INSERT INTO evo.d.t SELECT 10, 20, 'n'")
    assert(spark.sql("SELECT count(*) FROM evo.d.t WHERE note = 'n'").head.getLong(0) == 1L)
    // tombstones survive a log checkpoint
    CommitLog.checkpoint(dir)
    assert(CommitLog.droppedPhysicalNames(dir).contains("s"),
      "tombstones must survive the checkpoint roll")
    // a dropped RENAMED column tombstones its PHYSICAL name
    spark.sql("DROP TABLE IF EXISTS evo.d.t2")
    spark.sql("CREATE TABLE evo.d.t2 AS SELECT id, concat('v', id) AS a, id * 3 AS b FROM range(3)")
    spark.sql("ALTER TABLE evo.d.t2 RENAME COLUMN a TO a2")
    spark.sql("ALTER TABLE evo.d.t2 DROP COLUMN a2")
    val dir2 = Paths.get(wh, "d", "t2").toString
    assert(CommitLog.droppedPhysicalNames(dir2).contains("a"),
      s"the tombstone must be the PHYSICAL name, got ${CommitLog.droppedPhysicalNames(dir2)}")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE evo.d.t2 ADD COLUMNS (a STRING)")
    }
    assert(e3.getMessage.contains("DROPPED"), e3.getMessage)
  }

  test("purge rewrites dropped-column bytes out of live files and lifts tombstones") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.pg")
    spark.sql("DROP TABLE IF EXISTS evo.pg.t")
    spark.sql("CREATE TABLE evo.pg.t AS SELECT id, concat('s', id) AS s, id * 2 AS x FROM range(4)")
    val dir = Paths.get(wh, "pg", "t").toString
    spark.sql("ALTER TABLE evo.pg.t DROP COLUMN s")
    val preDrop = 0L // CTAS landed at v0
    val prePurge = CommitLog.currentVersion(dir)

    // dead bytes still ride the pre-purge files
    assert(CommitLog.snapshotFiles(dir).exists(f =>
      spark.read.parquet(Paths.get(dir, f).toString).schema.fieldNames.contains("s")))

    val purged = spark.sql("CALL evo.system.purge('pg.t')").collect()
    assert(purged.map(_.getString(1)).toSeq == Seq("s"), purged.mkString(","))

    // bytes physically GONE from every live file
    for (f <- CommitLog.snapshotFiles(dir)) {
      val phys = spark.read.parquet(Paths.get(dir, f).toString).schema.fieldNames
      assert(!phys.contains("s"), s"purge left dead column bytes in $f: ${phys.toSeq}")
    }
    // content identical; pre-purge eras still time travel (pre-drop serves s)
    assert(spark.sql("SELECT sum(x) FROM evo.pg.t").head.getLong(0) == 12L)
    assert(CommitLog.read(spark, dir, Some(prePurge)).count() == 4L)
    assert(CommitLog.read(spark, dir, Some(preDrop)).schema.fieldNames.contains("s"))

    // tombstone lifted: the name is reusable, and the re-added column is
    // NULL for purged rows (never the stale resurrected bytes)
    assert(CommitLog.droppedPhysicalNames(dir).isEmpty)
    spark.sql("ALTER TABLE evo.pg.t ADD COLUMNS (s STRING)")
    assert(spark.sql("SELECT count(*) FROM evo.pg.t WHERE s IS NULL").head.getLong(0) == 4L)
    spark.sql("INSERT INTO evo.pg.t SELECT 9, 18, 'fresh'")
    assert(spark.sql("SELECT s FROM evo.pg.t WHERE id = 9").head.getString(0) == "fresh")
    // purge with nothing tombstoned is a no-op: zero rows, no commit
    val tip = CommitLog.currentVersion(dir)
    assert(spark.sql("CALL evo.system.purge('pg.t')").collect().isEmpty)
    assert(CommitLog.currentVersion(dir) == tip)
    // tombstone lift survives a checkpoint roll
    spark.sql("DROP TABLE IF EXISTS evo.pg.t2")
    spark.sql("CREATE TABLE evo.pg.t2 AS SELECT id, concat('a', id) AS a FROM range(3)")
    spark.sql("ALTER TABLE evo.pg.t2 ADD COLUMNS (b INT)")
    spark.sql("ALTER TABLE evo.pg.t2 DROP COLUMN b")
    val dir2 = Paths.get(wh, "pg", "t2").toString
    CommitLog.purgeDroppedColumns(spark, dir2)
    CommitLog.checkpoint(dir2)
    assert(CommitLog.droppedPhysicalNames(dir2).isEmpty,
      "a lifted tombstone must stay lifted across the checkpoint roll")
  }

  test("ADD COLUMNS refuses a name already worn physically by a renamed column") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.ap")
    spark.sql("DROP TABLE IF EXISTS evo.ap.t")
    spark.sql("CREATE TABLE evo.ap.t AS SELECT id, concat('s', id) AS status FROM range(3)")
    spark.sql("ALTER TABLE evo.ap.t RENAME COLUMN status TO state")
    // 'state' still wears physical 'status' in every data file: adding a
    // NEW logical 'status' would collide physically (duplicate parquet
    // fields) or bind old files' stale bytes to the new column
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE evo.ap.t ADD COLUMNS (status STRING)")
    }
    assert(e.getMessage.contains("physical name"), e.getMessage)
    // an unrelated name is fine, and the table stays fully readable
    spark.sql("ALTER TABLE evo.ap.t ADD COLUMNS (note STRING)")
    assert(spark.table("evo.ap.t").count() == 3L)
  }

  test("changes() serves a window spanning a DROP COLUMN era-faithfully") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.cw")
    spark.sql("DROP TABLE IF EXISTS evo.cw.t")
    spark.sql("CREATE TABLE evo.cw.t AS SELECT id, concat('s', id) AS s, id * 2 AS x FROM range(3)")
    val dir = Paths.get(wh, "cw", "t").toString
    val v0 = CommitLog.currentVersion(dir)
    spark.sql("INSERT INTO evo.cw.t SELECT 10, 's10', 20")           // v0+1
    // the case round-11's refusal feared: a rewrite whose rows differ
    // ONLY in the column about to be dropped — at head schema alone the
    // diff would sign-cancel to zero rows; era-split computes it at the
    // pre-drop era, so the delete+insert pair survives
    spark.sql("UPDATE evo.cw.t SET s = 'S0' WHERE id = 0")           // v0+2
    val updV = CommitLog.currentVersion(dir)
    spark.sql("ALTER TABLE evo.cw.t DROP COLUMN s")                  // v0+3
    spark.sql("INSERT INTO evo.cw.t SELECT 11, 22")                  // v0+4
    val head = CommitLog.currentVersion(dir)
    // the window splits just below the drop alter
    assert(CommitLog.changeWindows(dir, v0, head) ==
      Seq((v0, updV), (updV, head)))
    // spanning feed: WINDOW-END schema (s gone), rows from both eras
    val feed = CommitLog.changes(spark, dir, v0, head)
    assert(!feed.columns.contains("s") && feed.columns.contains("x"),
      s"drop-spanning CDF serves the window-end schema: ${feed.columns.toSeq}")
    val rows = feed.collect().map(r => (r.getLong(r.fieldIndex("id")),
      r.getLong(r.fieldIndex("x")), r.getString(r.fieldIndex("_change_type")),
      r.getLong(r.fieldIndex("_commit_version")))).toSeq
    assert(rows.count(_ == ((10L, 20L, "insert", v0 + 1))) == 1, s"insert: $rows")
    assert(rows.count(_ == ((11L, 22L, "insert", head))) == 1, s"post-drop insert: $rows")
    // the s-only UPDATE survives as an update_preimage/update_postimage
    // pair (identical in every SERVED column — the era diff saw the
    // differing s values; the op-level relabel names the pair)
    assert(rows.count(_ == ((0L, 0L, "update_preimage", updV))) == 1,
      s"update preimage: $rows")
    assert(rows.count(_ == ((0L, 0L, "update_postimage", updV))) == 1,
      s"update postimage: $rows")
    // and equals the per-era halves stitched at the window-end schema
    assert(feed.count() ==
      CommitLog.changes(spark, dir, v0, updV).count() +
        CommitLog.changes(spark, dir, updV, head).count())
    // a window that spans a RENAME (values untouched) still serves
    spark.sql("ALTER TABLE evo.cw.t RENAME COLUMN x TO y")           // head+1
    spark.sql("INSERT INTO evo.cw.t SELECT 12, 24")                  // head+2
    val feed2 = CommitLog.changes(spark, dir, updV, head + 2)
    assert(feed2.columns.contains("y") && feed2.count() == 2L,
      "rename-spanning CDF serves under head logical names")
  }

  test("dedupAppend resolves keys through the declared schema after a rename") {
    import spark.implicits._
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.da")
    spark.sql("DROP TABLE IF EXISTS evo.da.t")
    spark.sql("CREATE TABLE evo.da.t AS SELECT id, concat('v', id) AS v FROM range(3)")
    spark.sql("ALTER TABLE evo.da.t RENAME COLUMN id TO key")
    val dir = Paths.get(wh, "da", "t").toString
    // key 0 already present (under physical name 'id') → dropped;
    // key 100 is new → lands. A raw-parquet index read would miss the
    // mapping and either fail on the missing 'key' column or dedup wrong.
    val v = CommitLog.dedupAppend(spark,
      Seq((0L, "DUP"), (100L, "new")).toDF("key", "v"), dir, Seq("key"))
    assert(v.nonEmpty)
    val rows = spark.table("evo.da.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 4 && rows(0L) == "v0" && rows(100L) == "new",
      s"dedupAppend after rename must drop the duplicate key, got $rows")
  }

  test("nested-field evolution is refused loudly (documented decision, SCALE.md)") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.nf")
    spark.sql("DROP TABLE IF EXISTS evo.nf.t")
    spark.sql("CREATE TABLE evo.nf.t AS " +
      "SELECT id, named_struct('a', id, 'b', concat('s', id)) AS s FROM range(3)")
    // struct-level column ops (add/rename a FIELD inside s) arrive as
    // multi-part fieldNames; the catalog refuses them with a stable
    // message rather than corrupting the column-mapping metadata
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE evo.nf.t ADD COLUMNS (s.c STRING)")
    }
    assert(e.getMessage.contains("only top-level column evolution"),
      e.getMessage)
    // whole-struct operations still work: the struct is itself top-level
    spark.sql("ALTER TABLE evo.nf.t RENAME COLUMN s TO st")
    assert(spark.sql("SELECT st.b FROM evo.nf.t WHERE id = 1").head.getString(0) == "s1")
  }

  test("evolution gauntlet: adds/renames/widens/drops interleaved with writes, model-checked") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.m")
    spark.sql("DROP TABLE IF EXISTS evo.m.t")
    spark.sql("CREATE TABLE evo.m.t AS SELECT CAST(id AS INT) AS a, concat('x', id) AS b FROM range(2)")
    val dir = Paths.get(wh, "m", "t").toString
    // model: rows as Map(logicalName -> value); NULL for pre-add eras
    var model = Seq(
      Map("a" -> 0L, "b" -> "x0"),
      Map("a" -> 1L, "b" -> "x1"))
    def check(step: String): Unit = {
      val cols = spark.table("evo.m.t").schema.fieldNames.toSeq
      val got = spark.table("evo.m.t").collect().map { r =>
        cols.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else r.get(i) match {
            case n: Number => n.longValue() // widenings normalize to Long
            case v => v
          })
        }.toMap
      }.toSeq
      val want = model.map(m => cols.map(c => c -> m.getOrElse(c, null)).toMap)
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"after $step: got ${got.sortBy(_.toString)} want ${want.sortBy(_.toString)}")
    }
    // 1. widen a, 2. rename b→c, 3. add d, 4. insert, 5. rename a→k,
    // 6. drop c, 7. insert, 8. rename d→e, 9. widen e... (int d) 10. drop e
    def renamed(from: String, to: String): Unit =
      model = model.map(m => (m - from) ++ m.get(from).map(to -> _))
    spark.sql("ALTER TABLE evo.m.t ALTER COLUMN a TYPE BIGINT"); check("widen a")
    spark.sql("ALTER TABLE evo.m.t RENAME COLUMN b TO c")
    renamed("b", "c"); check("rename b->c")
    spark.sql("ALTER TABLE evo.m.t ADD COLUMNS (d INT)"); check("add d")
    spark.sql("INSERT INTO evo.m.t SELECT 2L, 'x2', 20")
    model :+= Map("k" -> 2L, "a" -> 2L, "c" -> "x2", "d" -> 20L); check("insert1")
    spark.sql("ALTER TABLE evo.m.t RENAME COLUMN a TO k")
    renamed("a", "k"); check("rename a->k")
    spark.sql("ALTER TABLE evo.m.t DROP COLUMN c")
    model = model.map(_ - "c"); check("drop c")
    spark.sql("INSERT INTO evo.m.t SELECT 3L, 30")
    model :+= Map("k" -> 3L, "d" -> 30L); check("insert2")
    spark.sql("ALTER TABLE evo.m.t RENAME COLUMN d TO e")
    model = model.map(m => (m - "d") ++ m.get("d").map("e" -> _)); check("rename d->e")
    spark.sql("ALTER TABLE evo.m.t ALTER COLUMN e TYPE BIGINT"); check("widen e")
    spark.sql("ALTER TABLE evo.m.t DROP COLUMN e")
    model = model.map(_ - "e"); check("drop e")
    // filters + aggregates still plan against the final era
    assert(spark.sql("SELECT sum(k) FROM evo.m.t WHERE k >= 1").head.getLong(0) == 6L)
    // every historical version still time-travels with its own era shape
    (0L to CommitLog.currentVersion(dir)).foreach { v =>
      CommitLog.read(spark, dir, Some(v)).collect() // loud if broken
    }
  }

  test("concurrent ALTERs serialize: every change lands exactly once") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.r2")
    spark.sql("DROP TABLE IF EXISTS evo.r2.t")
    spark.sql("CREATE TABLE evo.r2.t AS SELECT id FROM range(2)")
    val cat = spark.sessionState.catalogManager.catalog("evo")
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("r2"), "t")
    // 6 threads each ADD a distinct column at once: the alterTable retry
    // loop must absorb the version races so ALL columns land (a lost
    // update would silently drop a concurrent writer's evolution)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val adds = (1 to 6).map { i =>
      Future {
        cat.alterTable(ident,
          org.apache.spark.sql.connector.catalog.TableChange.addColumn(
            Array(s"c$i"), org.apache.spark.sql.types.IntegerType, true))
      }
    }
    Await.result(Future.sequence(adds), 120.seconds)
    val cols = spark.table("evo.r2.t").schema.fieldNames.toSet
    assert((1 to 6).forall(i => cols.contains(s"c$i")),
      s"all six concurrent ADDs must land, got $cols")
    assert(spark.table("evo.r2.t").count() == 2)
  }

  test("rename composes with widening, DML, zone pruning, and time travel") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.c")
    spark.sql("DROP TABLE IF EXISTS evo.c.t")
    spark.sql(
      """CREATE TABLE evo.c.t AS
        |SELECT CAST(id AS INT) AS k, concat('v', id) AS v FROM range(6)""".stripMargin)
    val dir = Paths.get(wh, "c", "t").toString
    val preEvo = CommitLog.currentVersion(dir)

    spark.sql("ALTER TABLE evo.c.t RENAME COLUMN k TO key")
    spark.sql("ALTER TABLE evo.c.t ALTER COLUMN key TYPE BIGINT")

    // DML through the renamed+widened column (copy-on-write rewrite)
    spark.sql("DELETE FROM evo.c.t WHERE key = 2")
    spark.sql("UPDATE evo.c.t SET v = 'patched' WHERE key = 4")
    val got = spark.sql("SELECT key, v FROM evo.c.t ORDER BY key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(0L -> "v0", 1L -> "v1", 3L -> "v3", 4L -> "patched", 5L -> "v5"), got)

    // clustering on the RENAMED column records zone maps that prune
    CommitLog.compactClustered(spark, dir, "key", 3)
    val stats = CommitLog.fileStatsOn(dir, "key")
    assert(stats.size == 3, s"3 clustered files with ranges on key, got $stats")
    assert(CommitLog.snapshotMinMax(dir, "key").contains((0L, 5L)))

    // time travel BEFORE the evolution serves the old era's logical shape
    val old = CommitLog.read(spark, dir, Some(preEvo))
    assert(old.schema.fieldNames.toSeq == Seq("k", "v"),
      s"pre-evolution snapshot must serve the era's names, got ${old.schema.fieldNames.toSeq}")
    assert(old.count() == 6)
  }
}
