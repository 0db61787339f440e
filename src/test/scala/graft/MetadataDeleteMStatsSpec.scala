package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources

import graft.io.CommitLog

/** The metadata-only DELETE proof over footer MULTI-stats (tl35): on a
  * plain-append table (no named zones anywhere), [[MetadataDelete.plan]]
  * must classify from the mstats ranges alone — and when it returns a
  * drop set, dropping those files must remove EXACTLY the predicate's
  * rows (the obligation is exactness, not safety: an over- or under-drop
  * deletes the wrong rows). Swept under random ranges against a
  * brute-force row count. */
class MetadataDeleteMStatsSpec extends graft.SparkSpec {

  private def freshTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_mdel_$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  private def build(t: String): Unit = {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"p$i")).toDF("k", "v")
    for (q <- 0 until 4)
      CommitLog.append(
        df.filter(col("k") >= q * 100 && col("k") < (q + 1) * 100).coalesce(1), t)
  }

  test("plan() proves drops from multi-stats; drop set == predicate rows, swept") {
    val t = freshTable("sweep")
    build(t)
    require(CommitLog.fileStats(t).isEmpty, "no named zones — mstats only")
    val v = CommitLog.currentVersion(t)
    val full = CommitLog.read(spark, t)
    val rnd = new scala.util.Random(19)
    var proved = 0
    for (_ <- 0 until 25) {
      val lo = rnd.nextInt(500).toLong - 50
      val hi = lo + rnd.nextInt(250)
      val plan = MetadataDelete.plan(t, v, Seq(
        sources.GreaterThanOrEqual("k", lo), sources.LessThanOrEqual("k", hi)))
      plan.foreach { drops =>
        proved += 1
        val dropped =
          if (drops.isEmpty) 0L
          else spark.read.parquet(drops.map(n => Paths.get(t, n).toString): _*).count()
        val matching = full.filter(col("k").between(lo, hi)).count()
        assert(dropped == matching,
          s"plan [$lo,$hi] dropped $dropped rows but the predicate matches $matching")
      }
    }
    assert(proved > 0, "at least some aligned ranges must prove metadata-only")
    // slice-aligned range: provable, drops exactly one file by name
    val aligned = MetadataDelete.plan(t, v, Seq(
      sources.GreaterThanOrEqual("k", 100L), sources.LessThanOrEqual("k", 199L)))
    assert(aligned.exists(_.size == 1), s"slice-aligned range must drop 1 file: $aligned")
    // unaligned mid-slice range: some file partially covered -> unprovable
    val unaligned = MetadataDelete.plan(t, v, Seq(
      sources.GreaterThanOrEqual("k", 150L), sources.LessThanOrEqual("k", 250L)))
    assert(unaligned.isEmpty, s"partial coverage must fall back to rewrite: $unaligned")
  }

  test("a NULL in the bounded column blocks the drop (footer null count)") {
    import spark.implicits._
    val t = freshTable("nulls")
    CommitLog.append(Seq((Some(1L), "a"), (None, "n")).toDF("k", "v").coalesce(1), t)
    CommitLog.append(Seq((Some(10L), "b")).toDF("k", "v").coalesce(1), t)
    val v = CommitLog.currentVersion(t)
    // the [0, 5] range covers file 1's non-null range entirely, but the
    // file holds a NULL row the predicate does NOT match — dropping the
    // file would over-delete, so the plan must refuse
    val plan = MetadataDelete.plan(t, v, Seq(
      sources.GreaterThanOrEqual("k", 0L), sources.LessThanOrEqual("k", 5L)))
    assert(plan.isEmpty, s"a NULL-holding file must block the metadata drop: $plan")
  }
}
