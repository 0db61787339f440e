package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted plans for headline queries (pushdown/pruning
  * inspection; SCALE.md evidence). Usage: Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q3_join_topk")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
