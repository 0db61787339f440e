package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.CommitLog

/** Per-file key bloom filters (tl32): declared with
  * [[CommitLog.declareBloom]], recorded by every later add, probed by
  * [[CommitLog.ingestCandidates]] before the duplicate check reads any
  * key column. The load-bearing invariant is NO FALSE NEGATIVES: a file
  * that holds any batch key must always survive the probe — a false
  * positive costs one extra file read, a false negative would silently
  * double-ingest. */
class BloomStatsSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_bloom_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  /** Uniform string keys — the content-hash tracker shape where zone
    * ranges span everything and only the bloom can prune. */
  private def keyed(lo: Long, hi: Long) = {
    spark.range(lo, hi).select(
      md5(col("id").cast("string")).as("key"),
      col("id").as("payload"))
  }

  test("no false negatives: every batch key's file survives the probe") {
    val t = freshTable("nfn")
    CommitLog.declareBloom(spark, t, "key")
    // four single-file ingests; remember which file each batch landed in
    val batchFiles = (0 until 4).map { q =>
      val before = CommitLog.snapshotFiles(t).toSet
      CommitLog.dedupAppend(spark, keyed(q * 100L, (q + 1) * 100L).coalesce(1), t, Seq("key"))
      (q, CommitLog.snapshotFiles(t).toSet.diff(before))
    }
    val head = CommitLog.currentVersion(t)
    val all = CommitLog.snapshotFiles(t)
    assert(CommitLog.fileBlooms(t).keySet == all.toSet,
      "every add on a bloom-declared table must record a bloom")
    for ((q, fs) <- batchFiles) {
      val cands = CommitLog.ingestCandidates(spark, t, head,
        keyed(q * 100L, (q + 1) * 100L), Seq("key"), all).toSet
      assert(fs.subsetOf(cands),
        s"batch $q's own file must survive the probe: $fs vs $cands")
    }
    // and the end-to-end invariant: replaying any batch is a NO-OP
    for (q <- 0 until 4)
      assert(CommitLog.dedupAppend(spark, keyed(q * 100L, (q + 1) * 100L), t,
        Seq("key")).isEmpty, s"replaying batch $q must ingest nothing")
    assert(CommitLog.read(spark, t).count() == 400L)
  }

  test("fresh keys prune to (almost) no candidate files") {
    val t = freshTable("fresh")
    CommitLog.declareBloom(spark, t, "key")
    for (q <- 0 until 8)
      CommitLog.dedupAppend(spark, keyed(q * 500L, (q + 1) * 500L).coalesce(1), t, Seq("key"))
    val all = CommitLog.snapshotFiles(t)
    val fresh = spark.range(0, 200).select(
      md5(concat(lit("other_"), col("id").cast("string"))).as("key"),
      col("id").as("payload"))
    val cands = CommitLog.ingestCandidates(spark, t,
      CommitLog.currentVersion(t), fresh, Seq("key"), all)
    assert(cands.size <= 2, // ~0.8% FP/file over 8 files: overwhelmingly 0
      s"a fresh batch must bloom-prune the check, kept ${cands.size}/${all.size}")
  }

  test("blooms survive checkpoint + expireLog; rewrites drop them (fail-safe)") {
    val t = freshTable("ckpt")
    CommitLog.declareBloom(spark, t, "key")
    for (q <- 0 until 4)
      CommitLog.dedupAppend(spark, keyed(q * 100L, (q + 1) * 100L).coalesce(1), t, Seq("key"))
    CommitLog.checkpoint(t)
    CommitLog.expireLog(t)
    assert(CommitLog.declaredBloom(t).contains("key"),
      "the bloom declaration must survive the checkpoint roll")
    assert(CommitLog.fileBlooms(t).size == CommitLog.snapshotFiles(t).size,
      "per-file blooms must survive the checkpoint roll")
    // a compaction rewrites files through commit(); replacements carry
    // FRESH blooms from their own key column
    CommitLog.compact(spark, t, 2)
    assert(CommitLog.fileBlooms(t).size == CommitLog.snapshotFiles(t).size,
      "compaction replacements must carry fresh blooms")
    for (q <- 0 until 4)
      assert(CommitLog.dedupAppend(spark, keyed(q * 100L, (q + 1) * 100L), t,
        Seq("key")).isEmpty, s"post-compaction replay of batch $q must still no-op")
  }

  test("blooms live in SIDECARS; vacuum reclaims them with their data file") {
    val t = freshTable("sidecar")
    CommitLog.declareBloom(spark, t, "key")
    for (q <- 0 until 3)
      CommitLog.dedupAppend(spark, keyed(q * 100L, (q + 1) * 100L).coalesce(1), t, Seq("key"))
    val live = CommitLog.snapshotFiles(t)
    // one sidecar per data file; the LOG LINE carries only a flag (a
    // replay must never pay bloom bytes — the tier-A3 lesson)
    live.foreach { f =>
      assert(Files.exists(Paths.get(t, f + ".bloom")), s"missing sidecar for $f")
    }
    new java.io.File(t, "_log").listFiles().foreach { p =>
      assert(p.length < 64 * 1024,
        s"log files must stay small with blooms declared: $p ${p.length}")
    }
    // compaction supersedes the originals; vacuum reclaims data files AND
    // their sidecars together
    CommitLog.compact(spark, t, 1)
    val reclaimed = CommitLog.vacuum(t, retainMillis = 0L)
    live.foreach { f =>
      assert(reclaimed.contains(f) && reclaimed.contains(f + ".bloom"),
        s"vacuum must reclaim $f and its sidecar, got $reclaimed")
      assert(!Files.exists(Paths.get(t, f + ".bloom")))
    }
    // the compacted survivor keeps its own live sidecar
    val survivor = CommitLog.snapshotFiles(t)
    assert(survivor.forall(f => Files.exists(Paths.get(t, f + ".bloom"))))
    // a deleted sidecar degrades to always-checked, never an error
    survivor.foreach(f => Files.delete(Paths.get(t, f + ".bloom")))
    val fresh = spark.range(0, 20).select(
      md5(concat(lit("q_"), col("id").cast("string"))).as("key"),
      col("id").as("payload"))
    val cands = CommitLog.ingestCandidates(spark, t,
      CommitLog.currentVersion(t), fresh, Seq("key"), survivor)
    assert(cands == survivor, "a flagged file with no readable sidecar is always checked")
  }

  test("integer width normalizes: an INT batch hits a BIGINT file's bloom") {
    import spark.implicits._
    val t = freshTable("width")
    CommitLog.declareBloom(spark, t, "k")
    CommitLog.append(Seq((5L, "a"), (6L, "b")).toDF("k", "v").coalesce(1), t)
    val all = CommitLog.snapshotFiles(t)
    // batch arrives with k as INT — the canonical string form must still
    // hit the stored BIGINT's bits (a miss here would double-ingest)
    val intBatch = Seq((5, "dup")).toDF("k", "v")
    val cands = CommitLog.ingestCandidates(spark, t,
      CommitLog.currentVersion(t), intBatch, Seq("k"), all)
    assert(cands == all, s"the INT 5 must hit the BIGINT 5's bloom: $cands")
    assert(CommitLog.dedupAppend(spark, intBatch, t, Seq("k")).isEmpty)
  }

  test("pre-declaration files have no bloom and are always checked") {
    val t = freshTable("pre")
    CommitLog.append(keyed(0, 100).coalesce(1), t) // BEFORE any declaration
    CommitLog.declareBloom(spark, t, "key")
    CommitLog.append(keyed(100, 200).coalesce(1), t) // after: has a bloom
    val all = CommitLog.snapshotFiles(t)
    assert(CommitLog.fileBlooms(t).size == 1,
      "only the post-declaration add records a bloom")
    val fresh = spark.range(0, 50).select(
      md5(concat(lit("zz_"), col("id").cast("string"))).as("key"),
      col("id").as("payload"))
    val cands = CommitLog.ingestCandidates(spark, t,
      CommitLog.currentVersion(t), fresh, Seq("key"), all).toSet
    // the bloom-less file MUST survive (absence proves nothing); the
    // bloomed one is pruned for fresh keys
    assert(CommitLog.fileBlooms(t).keySet.intersect(cands).isEmpty &&
      (all.toSet -- CommitLog.fileBlooms(t).keySet).subsetOf(cands),
      s"fail-safe: bloom-less files always checked, got $cands")
  }

  test("declareBloom refuses non-integral/non-string declared columns") {
    import spark.implicits._
    val t = freshTable("refuse")
    CommitLog.append(Seq((1L, 2.5)).toDF("k", "score"), t)
    CommitLog.evolveSchema(t,
      CommitLog.read(spark, t).schema, CommitLog.currentVersion(t))
    val e = intercept[IllegalArgumentException] {
      CommitLog.declareBloom(spark, t, "score")
    }
    assert(e.getMessage.contains("integral or string"), e.getMessage)
    CommitLog.declareBloom(spark, t, "k") // integral: fine
    assert(CommitLog.declaredBloom(t).contains("k"))
  }
}
