package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TankInventory

class PipelineSpec extends SparkSpec {

  private lazy val inv = TankInventory.inventory(spark, sf0001).cache()

  test("e1 inventory: every cluster georeferences inside the expected extent") {
    assert(inv.count() > 0)
    assert(inv.filter(!col("geo_ok")).count() == 0)
  }

  test("e1 inventory: merge produced real multi-box clusters and conflicts") {
    assert(inv.filter(col("merged")).count() > 0)
    assert(inv.filter(col("object_class") === "undefined_object").count() > 0)
  }

  test("e1 inventory: county assignment is unique per cluster") {
    val n = inv.count()
    assert(inv.select("tile_id", "cluster_id").distinct().count() == n)
  }

  test("e1 inventory: diameters are positive and bounded by the box feed") {
    // boxes are at most 20+39=59 px on a side -> merged envelopes can grow,
    // but the min side of a single box cluster is <= 59 px * 0.6 m
    assert(inv.filter(col("diameter_m") <= 0).count() == 0)
    assert(inv.filter(!col("merged") && col("diameter_m") > 59 * 0.6).count() == 0)
  }

  test("e3 crosstab margin equals column sums") {
    val rows = TankInventory.crosstab(spark, sf0001).collect()
    val margin = rows.find(_.getInt(0) == -1).get
    val rest = rows.filterNot(_.getInt(0) == -1)
    (1 to 5).foreach { i =>
      assert(margin.getLong(i) == rest.map(_.getLong(i)).sum, s"col $i")
    }
  }
}
