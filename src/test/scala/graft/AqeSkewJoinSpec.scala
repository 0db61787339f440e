package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** SCALE.md's skew posture leans on AQE's runtime skew-join split for the
  * hot keys that salting doesn't pre-treat. This spec proves the
  * mechanism actually fires in this engine's session configuration: a
  * join whose shuffle has one oversized partition must come out of
  * adaptive planning with that partition SPLIT (the SortMergeJoin marked
  * `isSkewJoin`), and the answer must be identical to the unsplit join.
  */
class AqeSkewJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // force the shuffle path: no broadcast escape for the small side
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // make the skew detector's thresholds reachable at test size
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
    withConf(confs: _*) {
      val pad = "x" * 120
      // one hot key (0) carrying ~20k padded rows >> threshold; a tail of
      // 50 cold keys; the dim side is uniform
      val fact = spark.range(0, 22000).select(
        when(col("id") < 20000, lit(0L)).otherwise(col("id") % 50 + 1).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(0, 51).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("tag"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe (count() would plan a separate aggregate
      // query and leave joined's own adaptive plan unfinalized)
      val n = joined.collect().length
      assert(n == 22000, s"every fact row has exactly one dim match, got $n")
      val smj = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a SortMergeJoin, got:\n${joined.queryExecution.executedPlan}")
      assert(smj.exists(_.isSkewJoin),
        s"AQE should have marked the join skew-split (isSkewJoin), got:\n${joined.queryExecution.executedPlan}")
    }
  }
}
