package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.queries.JoinQueries

/** j13_binned_range_join: the both-sides-large range-join plan. The gate
  * proves the SEMANTICS (hash-matches j7's oracle); this spec proves the
  * PLAN — the range predicate became a shuffled equi-join on the grid-cell
  * key, with no broadcast of either side, which is the property that lets
  * it run when the tile index itself is cluster-sized.
  */
class BinnedRangeJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("binned range join plans to a shuffled equi-join on the cell key, no broadcast") {
    val df = JoinQueries.queries("j13_binned_range_join")(spark, sf0001)
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan
    val shj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.nonEmpty, s"expected a ShuffledHashJoin on the cell key, got:\n$plan")
    val keySql = shj.head.leftKeys.map(_.sql).mkString(",")
    assert(keySql.contains("cx") && keySql.contains("cy"),
      s"join keys must be BOTH cell coordinates (cx, cy), got $keySql")
    val bcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bcast.isEmpty, s"neither side may be broadcast in the both-sides-large plan:\n$plan")
  }

  test("binned plan agrees row-for-row with the broadcast j7 plan") {
    val binned = JoinQueries.queries("j13_binned_range_join")(spark, sf0001).collect().toSeq
    val bcast = JoinQueries.queries("j7_range_join")(spark, sf0001).collect().toSeq
    assert(binned == bcast, "two physical strategies, one answer")
  }
}
