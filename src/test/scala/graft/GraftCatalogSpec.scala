package graft

import java.nio.file.{Files, Paths}

import graft.io.CommitLog

/** The graft `TableCatalog` ([[graft.sources.GraftCatalog]]): commit-log
  * tables addressed by SQL identifiers — CTAS, INSERT INTO/OVERWRITE,
  * VERSION/TIMESTAMP AS OF, SHOW/DROP/RENAME — with every semantic
  * delegated to the same CommitLog the path surface uses. */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val root = Paths.get(graft.io.Sinks.scratchDir("graft_catalog_wh"))
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(root)
    // the catalog is instantiated lazily on first reference; the conf
    // must be in place before any `gcat.` identifier resolves
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", root.toString)
    root.toString
  }

  test("CTAS, SELECT, SHOW TABLES, INSERT INTO/OVERWRITE") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cur")
    spark.sql("DROP TABLE IF EXISTS gcat.cur.docs")
    spark.sql(
      "CREATE TABLE gcat.cur.docs AS SELECT id, concat('d', id) AS v FROM range(5)")

    // the table is a real commit-log table in the warehouse
    val dir = Paths.get(wh, "cur", "docs").toString
    assert(CommitLog.currentVersion(dir) >= 0L)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.cur.docs").head.getLong(0) == 5L)

    val shown = spark.sql("SHOW TABLES IN gcat.cur").collect().map(_.getString(1)).toSet
    assert(shown.contains("docs"), s"SHOW TABLES must list docs, got $shown")

    // INSERT INTO = one txn append commit
    val vBefore = CommitLog.currentVersion(dir)
    spark.sql("INSERT INTO gcat.cur.docs SELECT id + 10, concat('x', id) FROM range(3)")
    assert(CommitLog.currentVersion(dir) == vBefore + 1, "INSERT INTO must be one commit")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.cur.docs").head.getLong(0) == 8L)

    // INSERT OVERWRITE = one atomic replace; history stays addressable
    spark.sql("INSERT OVERWRITE gcat.cur.docs SELECT id, concat('z', id) FROM range(2)")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.cur.docs").head.getLong(0) == 2L)
    assert(CommitLog.read(spark, dir, Some(vBefore + 1)).count() == 8L,
      "pre-overwrite snapshot must still time-travel")
  }

  test("VERSION AS OF and TIMESTAMP AS OF through SQL identifiers") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    spark.sql("DROP TABLE IF EXISTS gcat.tt.t")
    spark.sql("CREATE TABLE gcat.tt.t AS SELECT id FROM range(3)")     // v0+v1 (create+CTAS write)
    spark.sql("INSERT INTO gcat.tt.t SELECT id + 100 FROM range(2)")   // +1

    val head = spark.sql("SELECT count(*) AS n FROM gcat.tt.t").head.getLong(0)
    assert(head == 5L)
    // the pre-insert version still serves 3 rows
    val pre = spark.sql("SELECT count(*) AS n FROM gcat.tt.t VERSION AS OF 1").head.getLong(0)
    assert(pre == 3L, s"VERSION AS OF 1 must pre-date the insert, got $pre")

    // a timestamp far in the future resolves to the head
    val ts = java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 60000)
      .toString.replace("T", " ").stripSuffix("Z")
    val atNow = spark.sql(
      s"SELECT count(*) AS n FROM gcat.tt.t TIMESTAMP AS OF '$ts'").head.getLong(0)
    assert(atNow == 5L)
  }

  test("plain CREATE TABLE is readable-empty; schema rides the log; DROP/RENAME") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    spark.sql("DROP TABLE IF EXISTS gcat.ddl.t")
    spark.sql("DROP TABLE IF EXISTS gcat.ddl.t2")
    spark.sql("CREATE TABLE gcat.ddl.t (id BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM gcat.ddl.t").collect().isEmpty,
      "a created table must be immediately readable as empty")
    assert(spark.sql("SELECT * FROM gcat.ddl.t").schema.fieldNames.toSeq == Seq("id", "v"))

    spark.sql("INSERT INTO gcat.ddl.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.ddl.t").head.getLong(0) == 2L)

    // the RENAME target is catalog-relative (Spark refuses cross-catalog
    // renames, so the new name carries no catalog prefix)
    spark.sql("ALTER TABLE gcat.ddl.t RENAME TO ddl.t2")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.ddl.t2").head.getLong(0) == 2L)
    assert(!Files.isDirectory(Paths.get(wh, "ddl", "t", "_log")))

    assert(spark.sql("DROP TABLE gcat.ddl.t2").collect().isEmpty)
    assert(!Files.isDirectory(Paths.get(wh, "ddl", "t2")))
    val gone = intercept[Exception] { spark.sql("SELECT * FROM gcat.ddl.t2").collect() }
    assert(gone.getMessage.toLowerCase.contains("t2"), gone.getMessage)
  }

  test("PARTITIONED BY bucket(n, col): declarative clustering rides the log") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cl")
    spark.sql("DROP TABLE IF EXISTS gcat.cl.t")
    spark.sql("CREATE TABLE gcat.cl.t (k BIGINT, v STRING) PARTITIONED BY (bucket(3, k))")
    val dir = Paths.get(wh, "cl", "t").toString
    assert(CommitLog.declaredClustering(dir).contains(("k", 3)))

    // every INSERT lands range-clustered with zone ranges, no writer knobs
    spark.sql("INSERT INTO gcat.cl.t SELECT id, concat('v', id) FROM range(60)")
    val stats = CommitLog.fileStatsOn(dir, "k")
    assert(stats.size == 3, s"3 buckets = 3 zone-mapped files: $stats")
    val ranges = stats.values.toSeq.sortBy(_._1)
    assert(ranges.head._1 == 0L && ranges.last._2 == 59L)
    assert(ranges.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => l2 > h1
      case _ => true
    }, s"bucket ranges must be disjoint: $ranges")

    // INSERT OVERWRITE keeps the declared layout
    spark.sql("INSERT OVERWRITE gcat.cl.t SELECT id, concat('w', id) FROM range(30)")
    assert(CommitLog.snapshotFiles(dir).size == 3)
    assert(CommitLog.fileStatsOn(dir, "k").size == 3)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.cl.t").head.getLong(0) == 30L)

    // the spec surfaces as table partitioning (DESCRIBE shows it)
    val desc = spark.sql("DESCRIBE EXTENDED gcat.cl.t").collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").mkString("\n")
    assert(desc.contains("bucket(3, k)"), s"DESCRIBE must show the clustering:\n$desc")

    // refusals: identity transforms and non-integral clustering columns
    spark.sql("DROP TABLE IF EXISTS gcat.cl.bad")
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.cl.bad (k BIGINT) PARTITIONED BY (k)")
    }
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE gcat.cl.bad (v STRING) PARTITIONED BY (bucket(3, v))")
    }.getMessage.contains("integral"))
  }

  test("ALTER TABLE ADD COLUMNS: schema rides the log, old rows NULL-padded") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ev")
    spark.sql("DROP TABLE IF EXISTS gcat.ev.t")
    spark.sql("CREATE TABLE gcat.ev.t AS SELECT id, concat('v', id) AS v FROM range(4)")
    val dir = Paths.get(wh, "ev", "t").toString
    val vPre = CommitLog.currentVersion(dir)

    spark.sql("ALTER TABLE gcat.ev.t ADD COLUMNS (score DOUBLE COMMENT 'quality')")

    // one alter commit; new column visible, NULL for every existing row
    assert(CommitLog.currentVersion(dir) == vPre + 1)
    assert(spark.table("gcat.ev.t").schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(spark.sql("SELECT count(score) AS n FROM gcat.ev.t").head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.ev.t").head.getLong(0) == 4L)

    // the next insert writes it; old rows stay NULL
    spark.sql("INSERT INTO gcat.ev.t SELECT id, concat('w', id), CAST(id AS DOUBLE) FROM range(10, 12)")
    assert(spark.sql("SELECT count(score) AS n FROM gcat.ev.t").head.getLong(0) == 2L)

    // DML sees the evolved schema even over pre-evolution files
    spark.sql("UPDATE gcat.ev.t SET score = 0.5 WHERE id = 1")
    assert(spark.sql("SELECT score FROM gcat.ev.t WHERE id = 1").head.getDouble(0) == 0.5)

    // time travel BELOW the alter serves the pre-evolution schema
    assert(spark.sql(s"SELECT * FROM gcat.ev.t VERSION AS OF $vPre")
      .schema.fieldNames.toSeq == Seq("id", "v"))

    // the declared schema survives a checkpoint roll + log expiry
    CommitLog.checkpoint(dir)
    CommitLog.expireLog(dir)
    assert(spark.table("gcat.ev.t").schema.fieldNames.toSeq == Seq("id", "v", "score"))

    // refusals: duplicate add, non-nullable add (DROP COLUMN is supported
    // since round 10 — tombstoned metadata-only; see SchemaEvolutionSpec)
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ev.t ADD COLUMNS (score INT)")
    }.getMessage.contains("already exists"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ev.t ADD COLUMNS (req INT NOT NULL)")
    }.getMessage.contains("nullable"))
  }

  test("catalog reads keep the native scan perks: metadata count, reported stats") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.perf")
    spark.sql("DROP TABLE IF EXISTS gcat.perf.t")
    spark.sql("CREATE TABLE gcat.perf.t AS SELECT id AS k FROM range(100)")

    // count(*) through the catalog identifier is metadata-answered: the
    // Aggregate disappears from the optimized plan
    val cnt = spark.sql("SELECT count(*) AS n FROM gcat.perf.t")
    assert(cnt.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, s"catalog count(*) must push down:\n${cnt.queryExecution.optimizedPlan}")
    assert(cnt.head.getLong(0) == 100L)

    // the scan relation reports real statistics
    val st = spark.sql("SELECT * FROM gcat.perf.t").queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
    }.head
    assert(st.rowCount.contains(BigInt(100)), s"stats must flow through the catalog: $st")
  }

  test(".history and .files metadata tables (Iceberg-style inspection identifiers)") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    spark.sql("DROP TABLE IF EXISTS gcat.meta.t")
    spark.sql("CREATE TABLE gcat.meta.t " +
      "PARTITIONED BY (bucket(3, id)) AS SELECT id, concat('v', id) AS v FROM range(30)")
    spark.sql("INSERT INTO gcat.meta.t SELECT id + 100, concat('w', id) FROM range(5)")
    val dir = Paths.get(wh, "meta", "t").toString

    // .history == the retained commit log, newest first
    val hist = spark.sql("SELECT version, operation FROM gcat.meta.t.history").collect()
    assert(hist.map(_.getLong(0)).toSeq ==
      CommitLog.versions(dir).sorted.reverse, s"history rows: ${hist.mkString(",")}")
    assert(hist.last.getString(1) == "create")

    // .files == the live snapshot's vocabulary: every live file listed,
    // clustered files carry their zone ranges, and recorded row counts
    // sum to the table's rows
    val files = spark.sql(
      "SELECT file, n_rows, stats_col, lo, hi FROM gcat.meta.t.files").collect()
    assert(files.map(_.getString(0)).toSet == CommitLog.snapshotFiles(dir).toSet)
    assert(files.map(_.getLong(1)).sum == 35L, "recorded footer rows must sum to the table")
    val clustered = files.filter(!_.isNullAt(2))
    assert(clustered.nonEmpty && clustered.forall(r =>
      r.getString(2) == "id" && r.getLong(3) <= r.getLong(4)))

    // a real table named like a metadata suffix SHADOWS the derived form
    spark.sql("DROP TABLE IF EXISTS gcat.meta.history")
    spark.sql("CREATE TABLE gcat.meta.history AS SELECT 1L AS real_col")
    assert(spark.table("gcat.meta.history").columns.toSeq == Seq("real_col"))
    // ...and the metadata identifiers refuse time travel
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.meta.t.files VERSION AS OF 0").collect()
    }
    assert(e.getMessage.contains("metadata table"), e.getMessage)
  }

  test("an IntegerType clustering column records zone ranges (no long-cast crash)") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ic")
    spark.sql("DROP TABLE IF EXISTS gcat.ic.t")
    spark.sql("CREATE TABLE gcat.ic.t (k INT, v STRING) PARTITIONED BY (bucket(3, k))")
    spark.sql("INSERT INTO gcat.ic.t SELECT CAST(id AS INT), concat('v', id) FROM range(30)")
    val dir = Paths.get(wh, "ic", "t").toString
    val stats = CommitLog.fileStatsOn(dir, "k")
    assert(stats.size == 3 && stats.values.forall { case (lo, hi) => lo <= hi },
      s"int clustering column must record zone ranges, got $stats")
    assert(spark.sql("SELECT count(*) FROM gcat.ic.t WHERE k BETWEEN 0 AND 5")
      .head.getLong(0) == 6L)
  }

  test("a refused CREATE (bad TBLPROPERTIES) leaves no ghost table behind") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ghost")
    spark.sql("DROP TABLE IF EXISTS gcat.ghost.t")
    // bloom column not in the schema: must refuse BEFORE anything lands
    val e = intercept[Throwable] {
      spark.sql("CREATE TABLE gcat.ghost.t (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.bloom.column' = 'nope')")
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).exists(_.contains("not in the schema")))
    // unknown graft.* property: same contract
    intercept[Throwable] {
      spark.sql("CREATE TABLE gcat.ghost.t (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.dv.enable' = 'true')")
    }
    // out-of-range materialization ratio: same contract
    intercept[Throwable] {
      spark.sql("CREATE TABLE gcat.ghost.t (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.dv.maxRatio' = '1.5')")
    }
    // the failed CREATEs left nothing — the retry with valid properties works
    spark.sql("CREATE TABLE gcat.ghost.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.bloom.column' = 'v', 'graft.dv.enabled' = 'true', " +
      "'graft.dv.maxRatio' = '0.5')")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.ghost.t").head.getLong(0) == 0L)
    val dir = java.nio.file.Paths.get(warehouse, "ghost", "t").toString
    assert(CommitLog.dvMaxRatioOf(dir).contains(0.5),
      "the declared ratio must ride the log from CREATE")
    // SET TBLPROPERTIES declares the same opt-ins after the fact
    spark.sql("ALTER TABLE gcat.ghost.t SET TBLPROPERTIES ('graft.dv.maxRatio' = '0.25')")
    assert(CommitLog.dvMaxRatioOf(dir).contains(0.25),
      "ALTER ... SET TBLPROPERTIES must re-declare the ratio")
    intercept[Throwable] {
      spark.sql("ALTER TABLE gcat.ghost.t SET TBLPROPERTIES ('graft.dv.maxRatio' = '7')")
    }
    assert(CommitLog.dvMaxRatioOf(dir).contains(0.25), "a refused ALTER changes nothing")
    intercept[Throwable] {
      spark.sql("ALTER TABLE gcat.ghost.t SET TBLPROPERTIES ('graft.dv.enabled' = 'false')")
    }
    // non-graft properties refuse LOUDLY too: this log has nowhere to
    // persist them, and a silent success would drop 'comment'/'owner'
    intercept[Throwable] {
      spark.sql("ALTER TABLE gcat.ghost.t SET TBLPROPERTIES ('comment' = 'lost?')")
    }
    // SHOW TBLPROPERTIES round-trips every declared opt-in — an ALTER
    // path that dropped a property would be caught here
    val props = spark.sql("SHOW TBLPROPERTIES gcat.ghost.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.dv.enabled").contains("true") &&
        props.get("graft.dv.maxRatio").contains("0.25") &&
        props.get("graft.bloom.column").contains("v"),
      s"declared properties must round-trip through SHOW TBLPROPERTIES: $props")
  }

  test("a mixed ALTER (property + failing column change) applies NOTHING: " +
      "property commits wait for the schema evolution") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.mixed")
    spark.sql("DROP TABLE IF EXISTS gcat.mixed.t")
    spark.sql("CREATE TABLE gcat.mixed.t (id BIGINT, v STRING)")
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("mixed"), "t")
    val dir = java.nio.file.Paths.get(warehouse, "mixed", "t").toString
    import org.apache.spark.sql.connector.catalog.TableChange
    // the column change refuses (duplicate name) — the property in the
    // SAME alter must not have landed first
    intercept[Throwable] {
      cat.alterTable(ident,
        TableChange.setProperty("graft.dv.maxRatio", "0.5"),
        TableChange.addColumn(Array("id"),
          org.apache.spark.sql.types.LongType))
    }
    assert(CommitLog.dvMaxRatioOf(dir).isEmpty,
      "a failed mixed ALTER must leave the property undeclared")
    assert(CommitLog.dvEnabled(dir) == false)
    // the succeeding form lands both, schema first
    cat.alterTable(ident,
      TableChange.setProperty("graft.dv.maxRatio", "0.5"),
      TableChange.addColumn(Array("w"),
        org.apache.spark.sql.types.LongType))
    assert(CommitLog.dvMaxRatioOf(dir).contains(0.5))
    assert(spark.table("gcat.mixed.t").columns.toSeq == Seq("id", "v", "w"))
    // a bloom declared in the SAME alter as the column it targets works:
    // declareBloom validates against the POST-evolution schema
    cat.alterTable(ident,
      TableChange.setProperty("graft.bloom.column", "k"),
      TableChange.addColumn(Array("k"),
        org.apache.spark.sql.types.LongType))
    assert(CommitLog.declaredBloom(dir).contains("k"))
  }
}
