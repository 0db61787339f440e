package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources

import graft.io.CommitLog
import graft.sources.GraftLogDataSource

/** Typed footer stats (tl31): dates/timestamps/decimals/strings recorded
  * unit-faithfully in the add vocabulary, and the read side pruning
  * against them. The core invariant, swept under randomized ranges:
  * PRUNED READ == FULL-SCAN FILTER, always — skipping is only ever an
  * optimization. Plus the unit pins (epoch days / epoch micros / unscaled
  * decimal / UTF-8 byte bounds) that make a wrong-unit regression loud. */
class TypedStatsSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_tstats_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  /** 400 rows keyed 0..399 with every typed column correlated to the key,
    * appended in four key slices — so range predicates on ANY column can
    * prune, and the spec can predict which files survive. */
  private def buildTable(t: String): Unit = {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i)),
        new java.sql.Timestamp((1700000000L + i * 3600L) * 1000L),
        f"doc-$i%05d-${"x" * 40}", // > 32 UTF-8 bytes: exercises truncation
        new java.math.BigDecimal(java.math.BigInteger.valueOf(1000L + i * 7L), 2))
    }
    val df = rows.toDF("id", "d", "ts", "name", "price")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    for (q <- 0 until 4) // coalesce(1): one file per slice, so file
      // counts in the assertions below are deterministic
      CommitLog.append(
        df.filter(col("id") >= q * 100 && col("id") < (q + 1) * 100).coalesce(1), t)
  }

  test("harvest: kinds and units are exact (days / micros / unscaled / bytes)") {
    val t = freshTable("units")
    buildTable(t)
    val d = CommitLog.typedStatsOn(t, "d")
    assert(d.size == 4 && d.values.forall(_.kind == 'd'))
    assert(d.values.map(_.lo).min == 19000L && d.values.map(_.hi).max == 19399L,
      s"date stats must be epoch DAYS: $d")
    val ts = CommitLog.typedStatsOn(t, "ts")
    assert(ts.size == 4 && ts.values.forall(_.kind == 't'))
    assert(ts.values.map(_.lo).min == 1700000000L * 1000000L &&
      ts.values.map(_.hi).max == (1700000000L + 399L * 3600L) * 1000000L,
      s"timestamp stats must be epoch MICROS: $ts")
    val p = CommitLog.typedStatsOn(t, "price")
    assert(p.size == 4 && p.values.forall(c => c.kind == 'c' && c.scale == 2))
    assert(p.values.map(_.lo).min == 1000L && p.values.map(_.hi).max == 1000L + 399L * 7L,
      s"decimal stats must be UNSCALED at scale 2: $p")
    val s = CommitLog.stringStatsOn(t, "name")
    assert(s.size == 4)
    // bounds are truncated to 32 bytes; lo is a plain prefix, hi has its
    // last byte incremented (the 40-x suffix guarantees truncation)
    assert(s.values.forall { case (lo, hi) => lo.length <= 32 && hi.length <= 32 })
    val globalLo = s.values.map(_._1).reduce((a, b) =>
      if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b)
    assert(new String(globalLo, java.nio.charset.StandardCharsets.UTF_8)
      .startsWith("doc-00000"))
    // id stays the plain-int kind, served through the untyped surface too
    assert(CommitLog.typedStatsOn(t, "id").values.forall(_.kind == 'i'))
    assert(CommitLog.fileStatsOn(t, "id").size == 4)
    // and the typed kinds are NOT served through the untyped surface
    assert(CommitLog.fileStatsOn(t, "d").isEmpty &&
      CommitLog.fileStatsOn(t, "ts").isEmpty && CommitLog.fileStatsOn(t, "price").isEmpty,
      "typed ranges must never be served as raw longs — unit mismatch")
  }

  /** The one correctness sweep: random ranges on every typed column,
    * pruned read == full filter, and the prune must fire somewhere. */
  test("sweep: pruned read == full-scan filter for random typed ranges") {
    val t = freshTable("sweep")
    buildTable(t)
    val v = CommitLog.currentVersion(t)
    val all = CommitLog.snapshotFiles(t)
    val full = CommitLog.read(spark, t)
    val rnd = new scala.util.Random(42)
    var prunedSomewhere = false
    def check(f: sources.Filter, colExpr: org.apache.spark.sql.Column): Unit = {
      val files = GraftLogDataSource.prunedFileNames(t, v, Seq(f))
      prunedSomewhere ||= files.size < all.size
      val expected = full.filter(colExpr).count()
      val got =
        if (files.isEmpty) 0L
        else spark.read.parquet(files.map(n => Paths.get(t, n).toString): _*)
          .filter(colExpr).count()
      assert(got == expected, s"pruned read diverged for $f: $got vs $expected " +
        s"(read ${files.size}/${all.size})")
    }
    for (_ <- 0 until 20) {
      val a = rnd.nextInt(500) - 50; val b = a + rnd.nextInt(200)
      val (dLo, dHi) = (java.time.LocalDate.ofEpochDay(19000L + a),
        java.time.LocalDate.ofEpochDay(19000L + b))
      check(sources.And(
        sources.GreaterThanOrEqual("d", java.sql.Date.valueOf(dLo)),
        sources.LessThanOrEqual("d", java.sql.Date.valueOf(dHi))),
        col("d").between(lit(java.sql.Date.valueOf(dLo)), lit(java.sql.Date.valueOf(dHi))))
      val (tsLo, tsHi) = (new java.sql.Timestamp((1700000000L + a * 3600L) * 1000L),
        new java.sql.Timestamp((1700000000L + b * 3600L) * 1000L))
      check(sources.And(sources.GreaterThanOrEqual("ts", tsLo),
        sources.LessThan("ts", tsHi)),
        col("ts") >= lit(tsLo) && col("ts") < lit(tsHi))
      val (pLo, pHi) = (new java.math.BigDecimal(
        java.math.BigInteger.valueOf(1000L + a * 7L), 2),
        new java.math.BigDecimal(java.math.BigInteger.valueOf(1000L + b * 7L), 2))
      check(sources.And(sources.GreaterThan("price", pLo),
        sources.LessThanOrEqual("price", pHi)),
        col("price") > lit(pLo) && col("price") <= lit(pHi))
      val (nLo, nHi) = (f"doc-${math.max(a, 0)}%05d", f"doc-${math.max(b, 0)}%05d")
      check(sources.And(sources.GreaterThanOrEqual("name", nLo),
        sources.LessThanOrEqual("name", nHi)),
        col("name") >= nLo && col("name") <= nHi)
      check(sources.StringStartsWith("name", nLo.take(9)),
        col("name").startsWith(nLo.take(9)))
    }
    assert(prunedSomewhere, "at least one random range must actually prune")
  }

  test("disjoint typed ranges prune to ZERO files; java.time literals work") {
    val t = freshTable("disjoint")
    buildTable(t)
    val v = CommitLog.currentVersion(t)
    assert(GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.GreaterThan("d", java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(19400L))))).isEmpty)
    // NOTE: strict comparisons keep the CLOSED bound (documented weaker
    // pruning, no ±1 edge), so the probe must sit strictly below the min
    assert(GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.LessThan("ts", java.time.Instant.ofEpochSecond(1699999999L)))).isEmpty)
    assert(GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.GreaterThanOrEqual("d", java.time.LocalDate.ofEpochDay(19300L)))).size == 1)
    assert(GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.EqualTo("name", "zzz"))).isEmpty)
    assert(GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.EqualTo("price", new java.math.BigDecimal("99999.00")))).isEmpty)
  }

  test("typed stats survive checkpoint + expireLog and drop with a rewrite") {
    val t = freshTable("ckpt")
    buildTable(t)
    CommitLog.checkpoint(t)
    CommitLog.expireLog(t)
    val ts = CommitLog.typedStatsOn(t, "ts")
    assert(ts.size == 4 && ts.values.forall(_.kind == 't'),
      "typed stats must be re-emitted by the checkpoint")
    assert(CommitLog.stringStatsOn(t, "name").size == 4,
      "string bounds must be re-emitted by the checkpoint")
    // a compaction rewrites every file; the new files carry FRESH typed
    // stats from their own footers and the sweep invariant still holds
    CommitLog.compact(spark, t, 2)
    val v = CommitLog.currentVersion(t)
    val pruned = GraftLogDataSource.prunedFileNames(t, v, Seq(
      sources.LessThan("ts", new java.sql.Timestamp(1699999999L * 1000L))))
    assert(pruned.isEmpty, "post-compaction files carry fresh typed stats")
  }

  test("string truncation: 32-byte-prefix collisions never skip wrongly") {
    val t = freshTable("trunc")
    import spark.implicits._
    val prefix = "P" * 32 // all bounds truncate to the same 32-byte prefix
    CommitLog.append(Seq(prefix + "aaa", prefix + "mmm").toDF("s"), t)
    CommitLog.append(Seq(prefix + "nnn", prefix + "zzz").toDF("s"), t)
    val v = CommitLog.currentVersion(t)
    // every value shares the 32-byte prefix, so lo == prefix and hi ==
    // prefix-incremented for BOTH files: an equality inside either file's
    // true range must read that file (and may read both — never zero)
    val hit = GraftLogDataSource.prunedFileNames(t, v,
      Seq(sources.EqualTo("s", prefix + "mmm")))
    val expected = CommitLog.read(spark, t).filter(col("s") === (prefix + "mmm")).count()
    val got =
      if (hit.isEmpty) 0L
      else spark.read.parquet(hit.map(n => Paths.get(t, n).toString): _*)
        .filter(col("s") === (prefix + "mmm")).count()
    assert(got == expected && expected == 1L)
    // and a probe past the shared prefix's increment skips everything
    assert(GraftLogDataSource.prunedFileNames(t, v,
      Seq(sources.GreaterThanOrEqual("s", "Q"))).isEmpty)
  }

  test("upsert pruning still keys off plain-int stats after the typed extension") {
    val t = freshTable("upsert")
    buildTable(t)
    import spark.implicits._
    val before = CommitLog.snapshotFiles(t).toSet
    // keys 0..9 live in the first slice only: exactly one file rewrites
    val up = (0 until 10).map(i => (i.toLong,
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i)),
      new java.sql.Timestamp((1700000000L + i * 3600L) * 1000L),
      s"upd-$i", new java.math.BigDecimal("0.01")))
      .toDF("id", "d", "ts", "name", "price")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    CommitLog.upsert(spark, up, t, Seq("id"))
    val survivors = CommitLog.snapshotFiles(t).toSet
    assert(before.intersect(survivors).size == 3,
      s"three non-overlapping files must survive BY NAME: " +
        s"${before.intersect(survivors).size}")
  }
}
