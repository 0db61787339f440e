package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("declared oracles all correspond to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("driver smoke contract: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg groups by returnflag x linestatus") {
    val df = RelationalQueries.queries("q1_agg")(spark, sf0001)
    assert(df.count() == 6)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "avg_disc", "cnt"))
  }

  test("a3_crosstab_count margin row equals the sum of the others") {
    val rows = RelationalQueries.queries("a3_crosstab_count")(spark, sf0001).collect()
    val total = rows.find(_.getString(0) == "Total").get
    val rest = rows.filterNot(_.getString(0) == "Total")
    (1 to 6).foreach { i =>
      assert(total.getLong(i) == rest.map(_.getLong(i)).sum, s"margin col $i")
    }
  }

  test("a3_crosstab_pct percents sum to ~100") {
    val df = RelationalQueries.queries("a3_crosstab_pct")(spark, sf0001)
    val s = df.select(
      (2 to 6).map(i => sum(col(df.columns(i - 1)))).reduce(_ + _)).first().getDouble(0)
    assert(math.abs(s - 100.0) < 0.01, s"sum of percents = $s")
  }

  test("g1_chip_grid tiles the full grid: per-tile chip count = rows*cols") {
    val df = RelationalQueries.queries("g1_chip_grid")(spark, sf0001)
    val bad = df.groupBy("tile_name")
      .agg(count(lit(1)).as("n"),
        (max(col("row")) + 1).as("nr"), (max(col("col")) + 1).as("nc"))
      .filter(col("n") =!= col("nr") * col("nc"))
    assert(bad.count() == 0)
    // every chip's pixel slab is non-empty and within the tile
    assert(df.filter(col("maxx") <= col("minx") || col("maxy") <= col("miny")).count() == 0)
  }

  test("w2 + u2: allocation partitions the order set") {
    val allocated = RelationalQueries.queries("w2_limit_allocation")(spark, sf0001).count()
    val remaining = RelationalQueries.queries("u2_except_remaining")(spark, sf0001).count()
    val total = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(allocated + remaining == total)
  }

  test("j8_spatial_argmax assigns every tank exactly once") {
    val df = RelationalQueries.queries("j8_spatial_argmax")(spark, sf0001)
    assert(df.count() == df.select("c_custkey").distinct().count())
  }
}
