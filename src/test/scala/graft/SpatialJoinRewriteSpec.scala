package graft

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._

import graft.functions.SpatialOps
import graft.plans.SpatialJoinRewrite

/** The SURVEY §4.1 optimizer rule: a NAIVE spatial theta join — no manual
  * bbox prefilter, no broadcast hint — must come out of the optimizer with
  * (a) per-row envelope projections below the join, (b) the inclusive
  * interval-overlap conjunct ahead of the JTS predicate, (c) a broadcast
  * nested-loop physical join, and (d) bit-identical results to the
  * hand-optimized form. */
class SpatialJoinRewriteSpec extends SparkSpec {

  /** Install the rule AND pin the enable flag on the shared session. The
    * flag must be pinned here, not assumed: the hand-built j8 gates
    * (`j8_wkt_argmax`, `j8_spatial_argmax`) set it FALSE on entry and —
    * deliberately — never restore it, because their terminal action
    * re-optimizes a fresh QueryExecution after the gate returns, so the
    * flag state has to persist past return (PipelineQueries.scala j8
    * comments). Round 8 ran `RelationalQueriesSpec` (which executes the
    * wkt gate) before this spec and every rewrite assertion failed against
    * a silently-disabled rule. Each spec/gate pins its own flag state;
    * nobody restores. */
  private def installRule(): Unit = {
    if (!spark.experimental.extraOptimizations.contains(SpatialJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRewrite
    spark.conf.set(SpatialJoinRewrite.EnabledKey, "true")
  }

  private def tanks: DataFrame = {
    import spark.implicits._
    (1L to 200L).toDF("id")
      .withColumn("cx", (col("id") * 37 % 1000).cast("double"))
      .withColumn("cy", (col("id") * 91 % 800).cast("double"))
      .withColumn("tank_wkt", SpatialOps.bboxToWkt(
        col("cx") - 30, col("cy") - 30, col("cx") + 30, col("cy") + 30))
      .select("id", "tank_wkt")
  }

  private def counties: DataFrame = {
    import spark.implicits._
    (0L to 24L).toDF("county_key")
      .withColumn("kx1", (col("county_key") % 5 * 200).cast("double"))
      .withColumn("ky1", (floor(col("county_key") / 5) * 160).cast("double"))
      .withColumn("county_wkt", SpatialOps.bboxToWkt(
        col("kx1"), col("ky1"), col("kx1") + 200, col("ky1") + 160))
      .select("county_key", "county_wkt")
  }

  test("naive intersects join is rewritten: envelope prefilter + broadcast NLJ") {
    installRule()
    val naive = tanks.join(counties,
      SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")))

    assert(SpatialJoinRewrite.rewritten(naive.queryExecution.optimizedPlan),
      s"optimized plan lacks the envelope prefilter:\n${naive.queryExecution.optimizedPlan}")
    // executedPlan is wrapped in AdaptiveSparkPlan pre-execution, so assert
    // on the rendered plan: a broadcast nested-loop join whose condition
    // leads with the envelope prefilter (And short-circuits in the
    // generated predicate, so the JTS UDF only sees bbox-overlapping pairs)
    val planStr = naive.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      s"expected BroadcastNestedLoopJoin:\n$planStr")
    assert(planStr.replaceAll("\\s+", " ").matches(
      """(?s).*BroadcastNestedLoopJoin [^\n]*__graft_env[^\n]*st_intersects_or_contains.*"""),
      s"prefilter must precede the JTS predicate in the join condition:\n$planStr")

    // result-invariance against the hand-built form on a session WITHOUT
    // the rule is pinned by the j8_naive_argmax gate; here pin the row set
    // against an inline exact evaluation
    val got = naive.select("id", "county_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = tanks.crossJoin(counties)
      .filter(SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")))
      .select("id", "county_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, "rewrite changed the result set")
    assert(got.size > 200, s"every tank overlaps >=1 county, got ${got.size} pairs")
  }

  test("area > 0 predicate form is recognized; outer joins are left alone") {
    installRule()
    val naiveArea = tanks.join(counties,
      SpatialOps.intersectionArea(col("tank_wkt"), col("county_wkt")) > 0)
    assert(SpatialJoinRewrite.rewritten(naiveArea.queryExecution.optimizedPlan),
      "area>0 join predicate should trigger the rewrite")

    val outer = tanks.join(counties,
      SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")), "left")
    assert(!SpatialJoinRewrite.rewritten(outer.queryExecution.optimizedPlan),
      "outer joins must not be rewritten (strengthened condition changes null-extension)")
  }

  test("area threshold is extracted: exactly ONE overlay UDF in the optimized plan") {
    installRule()
    // the argmax shape: join on the predicate, project the overlay area,
    // threshold it — the round-7 plan evaluated the overlay twice (once in
    // the pushed join condition, once in the projection); the rewrite must
    // share a single __graft_area alias between the Filter and projection
    val naive = tanks.join(counties,
        SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")))
      .withColumn("overlap",
        SpatialOps.intersectionArea(col("tank_wkt"), col("county_wkt")))
      .filter(col("overlap") > 0)
      .select("id", "county_key", "overlap")
    val opt = naive.queryExecution.optimizedPlan
    assert(SpatialJoinRewrite.rewritten(opt), s"rule did not fire:\n$opt")
    val areaUdfs = opt.collectWithSubqueries { case p =>
      p.expressions.map(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
            if u.udfName.exists(_.contains("st_intersection_area")) => u
      }.size).sum
    }.sum
    assert(areaUdfs == 1,
      s"expected exactly one st_intersection_area instance, got $areaUdfs:\n$opt")
    // the join condition itself must carry no overlay — only the bbox
    // prefilter and the prepared-geometry boolean
    val joinConds = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.sql).getOrElse("")
    }
    assert(joinConds.forall(!_.contains("st_intersection_area")),
      s"overlay must not remain in the join condition: $joinConds")
    // and the result must match the overlay evaluated the naive way
    val got = naive.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 100) / 100)).toSet
    val exact = tanks.crossJoin(counties)
      .withColumn("overlap",
        SpatialOps.intersectionArea(col("tank_wkt"), col("county_wkt")))
      .filter(col("overlap") > 0)
      .select("id", "county_key", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100) / 100)).toSet
    assert(got == exact, "extracted-overlay plan changed the result")
  }

  test("rewrite is idempotent under the optimizer's fixpoint") {
    installRule()
    val naive = tanks.join(counties,
      SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")))
    val envAliases = naive.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.count(_.name.startsWith("__graft_env"))
    }.sum
    assert(envAliases == 2, s"expected exactly one envelope alias per side, got $envAliases")
  }

  test("gate order cannot disable the rewrite: wkt gate then naive gate, both ways") {
    // the round-8 regression, encoded: the hand-built wkt gate flips the
    // session flag to false; any later rewrite user (this spec, the naive
    // gate) must still get the rewrite because it pins the flag itself
    val wkt = SparkEntry.queries("j8_wkt_argmax")
    val nve = SparkEntry.queries("j8_naive_argmax")

    // wkt first: since round 10 the gate materializes inside its pinned
    // window and RESTORES the flag on exit (try/finally) — no later
    // consumer inherits it; the naive gate must still rewrite
    val before = spark.conf.getOption(SpatialJoinRewrite.EnabledKey)
    assert(wkt(spark, sf0001).count() > 0)
    assert(spark.conf.getOption(SpatialJoinRewrite.EnabledKey) == before,
      "wkt gate must restore the session flag on exit, not leak its pin")
    assert(nve(spark, sf0001).count() > 0) // gate REQUIREs the rewrite fired
    // and this spec's own assertions must hold right after the wkt gate ran
    spark.conf.set(SpatialJoinRewrite.EnabledKey, "false") // simulate leak
    installRule()
    val naive = tanks.join(counties,
      SpatialOps.intersectsOrContains(col("tank_wkt"), col("county_wkt")))
    assert(SpatialJoinRewrite.rewritten(naive.queryExecution.optimizedPlan),
      "installRule() must re-enable the rewrite whatever a prior gate left behind")

    // naive first: leaves the flag true; the wkt gate's hand-built plan
    // must NOT be rewritten (it opts out on entry)
    assert(nve(spark, sf0001).count() > 0)
    val wktDf = wkt(spark, sf0001)
    assert(!SpatialJoinRewrite.rewritten(wktDf.queryExecution.optimizedPlan),
      "wkt gate's hand-optimized plan must stay un-rewritten after the naive gate")
    assert(wktDf.count() > 0)
  }
}
