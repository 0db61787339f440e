package graft

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md co-location claims: joining two tables
  * bucketed on the join key plans WITHOUT a shuffle exchange on either
  * side, while the unbucketed join needs two. Managed tables land in the
  * default ./spark-warehouse (gitignored) and are dropped afterwards. */
class BucketingSpec extends SparkSpec {

  test("bucketed join avoids shuffle exchanges on both sides") {
    // AQE rewrites small joins to broadcast, which would hide the point
    withConf("spark.sql.autoBroadcastJoinThreshold" -> -1) {
    try {
      val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")

      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val bucketed = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      // the join itself must not shuffle; only the final groupBy may
      val joinSection = bucketedPlan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles:\n$bucketedPlan")

      val plain = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        "expected the unbucketed join to shuffle")

      // and the results agree
      assert(bucketed.orderBy("o_orderstatus").collect().toSeq ==
        plain.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
    }
  }
}
