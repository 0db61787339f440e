package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: with a selective dimension filter,
  * Spark injects a bloom filter built from the dim side into the fact scan
  * - at 100 TB this prunes fact rows before the shuffle. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a runtime bloom filter on the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"  // force shuffle join
    ) {
      val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    }
  }
}
