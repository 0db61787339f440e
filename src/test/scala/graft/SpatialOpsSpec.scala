package graft

import org.locationtech.jts.geom.GeometryFactory
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpatialOps
import graft.queries.PipelineQueries

/** The cached/prepared-geometry UDF path must be semantically identical to
  * plain JTS — and the WKT argmax query must keep agreeing with the
  * closed-form rect-arithmetic variant it shares an oracle with. */
class SpatialOpsSpec extends SparkSpec {

  private val reader = new WKTReader(new GeometryFactory())

  test("intersectsOrContains via prepared geometry matches plain JTS on edge cases") {
    val a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val cases = Seq(
      "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",      // contained in a
      "POLYGON ((-5 -5, 15 -5, 15 15, -5 15, -5 -5))", // contains a
      "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))",    // touches edge
      "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", // touches corner
      "POLYGON ((11 11, 20 11, 20 20, 11 20, 11 11))", // disjoint
      "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",       // proper overlap
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")       // identical
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = cases.map(b => (a, b)).toDF("a", "b")
      .withColumn("hit", SpatialOps.intersectsOrContains(col("a"), col("b")))
    val got = df.select("b", "hit").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { b =>
      val ga = reader.read(a); val gb = reader.read(b)
      val expect = ga.intersects(gb) || ga.contains(gb) || gb.contains(ga)
      assert(got(b) == expect, s"prepared-path divergence for $b")
    }
  }

  test("containsPoint via prepared geometry matches covers semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val pts = Seq((5.0, 5.0, true), (0.0, 0.0, true), (10.0, 5.0, true),
      (10.0001, 5.0, false), (-1.0, -1.0, false))
    val df = pts.map { case (x, y, _) => (poly, x, y) }.toDF("w", "x", "y")
      .withColumn("hit", SpatialOps.containsPoint(col("w"), col("x"), col("y")))
    val got = df.select("x", "y", "hit").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    pts.foreach { case (x, y, expect) => assert(got((x, y)) == expect, s"($x,$y)") }
  }

  test("j8_wkt_argmax agrees row-for-row with j8_spatial_argmax (shared oracle)") {
    val wkt = PipelineQueries.queries("j8_wkt_argmax")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val rect = graft.queries.RelationalQueries.queries("j8_spatial_argmax")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(wkt.nonEmpty && wkt == rect)
  }
}
