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

  test("e3 percent crosstab cells sum to 1 in the margin row (normalize='all')") {
    Seq("county_key", "state_key").foreach { dim =>
      val rows = TankInventory.crosstab(spark, sf0001, dim, percent = true).collect()
      val margin = rows.find(_.getInt(0) == -1).get
      assert(math.abs(margin.getDouble(5) - 1.0) < 1e-12, s"$dim margin total")
      val cellSum = rows.filterNot(_.getInt(0) == -1).map(_.getDouble(5)).sum
      assert(math.abs(cellSum - 1.0) < 1e-9, s"$dim cells")
    }
  }

  test("e1 inventory: chip_names is a sorted list of this tile's chips") {
    val bad = inv.select(col("tile_id"), col("chip_names"))
      .collect().filter { r =>
        val chips = r.getString(1).split(",")
        val tile = r.getInt(0).toString
        chips.isEmpty || chips.exists(!_.startsWith(s"${tile}_chip_")) ||
          (chips.toSeq != chips.toSeq.sorted) || chips.distinct.length != chips.length
      }
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("e1 inventory: lat/lon agree with an independent inverse of the centroid") {
    // recompute the centroid transform with GeoUtm (real trig, same series)
    // from the UTM columns and compare against the pipeline's portable
    // kernel output — a full-pipeline geodesy consistency check
    val rows = inv.select("cx_utm", "cy_utm", "lat", "lon").limit(500).collect()
    rows.foreach { r =>
      // cx_utm/cy_utm are rounded to cm in the output; 1 cm ~ 1e-7 deg
      val (lat, lon) = graft.functions.GeoUtm.toWgs84(r.getDouble(0), r.getDouble(1), 16)
      assert(math.abs(lat - r.getDouble(2)) < 1e-6, s"lat $r")
      assert(math.abs(lon - r.getDouble(3)) < 1e-6, s"lon $r")
    }
  }

  test("e1 inventory: state matches the assigned county's state") {
    assert(inv.filter(col("state_key") =!= floor(col("county_key") / 5).cast("int"))
      .count() == 0)
  }
}
