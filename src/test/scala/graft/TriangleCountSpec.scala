package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.TriangleCount

/** Both physical forms of the degree-ordered triangle count: the
  * broadcast edge-iterator and the broadcast-free pair join must agree
  * bit-for-bit, the shuffled plan must contain NO broadcast of any kind
  * (that is the property that lets it run when the adjacency is
  * cluster-sized), and the size gate must pick each form on its side of
  * the threshold. */
class TriangleCountSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  /** A graph with known triangles: K4 on {1,2,3,4} (4 triangles), a
    * triangle {5,6,7}, a dangling path 7-8-9 (0 triangles), plus a hub
    * node 100 connected to 1..9 — hub closes a triangle for every
    * existing edge among 1..9. */
  private def und: DataFrame = {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tri = Seq((5L, 6L), (5L, 7L), (6L, 7L))
    val path = Seq((7L, 8L), (8L, 9L))
    val hub = (1L to 9L).map(n => (n, 100L))
    (k4 ++ tri ++ path ++ hub).toDF("x", "y")
  }

  // K4: 4; {5,6,7}: 1; hub + each of the 11 base edges: 11
  private val expected = 16L

  test("broadcast and shuffled forms agree with the known count") {
    val b = TriangleCount.broadcastCount(spark, TriangleCount.orient(und))
      .as[Long].head()
    val s = TriangleCount.shuffledCount(und, TriangleCount.orient(und, shuffled = true))
      .as[Long].head()
    assert(b == expected, s"broadcast form counted $b, expected $expected")
    assert(s == expected, s"shuffled form counted $s, expected $expected")
  }

  test("shuffled plan is broadcast-free end to end") {
    val df = TriangleCount.shuffledCount(und, TriangleCount.orient(und, shuffled = true))
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan
    val broadcasts = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(broadcasts.isEmpty,
      s"the fallback exists for graphs whose adjacency cannot broadcast; " +
        s"found broadcast operators in:\n$plan")
    val shuffled = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffled.size >= 2,
      s"expected the pivot self-join and the closing-edge probe as " +
        s"ShuffledHashJoins:\n$plan")
  }

  test("size gate: broadcast under the threshold, shuffled beyond it") {
    val edges = und.cache()
    try {
      val e = edges.count()
      // 19 edges * 48 B/edge = 912 B estimate
      assert(TriangleCount.adjacencyBytesEstimate(e) == 48L * e)

      withConf("spark.sql.autoBroadcastJoinThreshold" -> (1 << 20)) {
        val under = TriangleCount.sizeGatedCount(spark, edges)
        assert(under.queryExecution.executedPlan.toString.contains("Broadcast"),
          "under the threshold the gate must pick the broadcast form")
        assert(under.as[Long].head() == expected)
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" -> 128) {
        val over = TriangleCount.sizeGatedCount(spark, edges)
        over.collect()
        val bc = collectWithSubqueries(over.queryExecution.executedPlan) {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }
        assert(bc.isEmpty, "beyond the threshold the gate must pick the shuffled form")
        assert(over.as[Long].head() == expected)
      }
    } finally edges.unpersist()
  }
}
