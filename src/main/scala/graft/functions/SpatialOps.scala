package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.{WKTReader, WKTWriter}

/** WKT polygon geometry via JTS (on the Spark classpath), re-expressing the
  * reference's shapely usage: `intersects`/`contains`/`intersection(..).area`
  * (`src/form_calcs.py:992-1037`), polygon construction (`:919`), and
  * point-in-polygon lookup (`src/az_proc.py:161-191`).
  *
  * Geometry travels as WKT strings (Spark has no geometry type); heavy use
  * should pre-filter with the bbox columns so the exact JTS test runs on few
  * candidate pairs (see the spatial argmax join), keeping UDF invocations
  * off the hot path.
  */
object SpatialOps {

  @transient private lazy val factory = new GeometryFactory()

  // WKTReader/WKTWriter are stateful and not thread-safe; task threads share
  // this object, so they get one instance per thread instead of one per row
  @transient private lazy val readers = ThreadLocal.withInitial(
    () => new WKTReader(factory))
  @transient private lazy val writers = ThreadLocal.withInitial(
    () => new WKTWriter())

  private def read(wkt: String) = readers.get().read(wkt)

  def bboxToWktString(minx: Double, miny: Double, maxx: Double, maxy: Double): String = {
    val w = writers.get()
    val shell = Array(
      new Coordinate(minx, miny), new Coordinate(maxx, miny),
      new Coordinate(maxx, maxy), new Coordinate(minx, maxy),
      new Coordinate(minx, miny))
    w.write(factory.createPolygon(shell))
  }

  /** Polygon ctor from bbox columns -> WKT. */
  val bboxToWkt: (Column, Column, Column, Column) => Column = {
    val f = udf((a: Double, b: Double, c: Double, d: Double) => bboxToWktString(a, b, c, d))
    (a, b, c, d) => f(a, b, c, d)
  }

  /** Exact intersection area of two WKT geometries. */
  val intersectionArea: (Column, Column) => Column = {
    val f = udf((a: String, b: String) => read(a).intersection(read(b)).getArea)
    (a, b) => f(a, b)
  }

  /** intersects OR contains (the reference's join predicate,
    * `src/form_calcs.py:1011-1019`). */
  val intersectsOrContains: (Column, Column) => Column = {
    val f = udf((a: String, b: String) => {
      val ga = read(a); val gb = read(b)
      ga.intersects(gb) || ga.contains(gb) || gb.contains(ga)
    })
    (a, b) => f(a, b)
  }

  /** Point-in-polygon (`src/az_proc.py:169-182`). */
  val containsPoint: (Column, Column, Column) => Column = {
    val f = udf((wkt: String, x: Double, y: Double) =>
      read(wkt).covers(factory.createPoint(new Coordinate(x, y))))
    (wkt, x, y) => f(wkt, x, y)
  }

  /** Geometry area. */
  val wktArea: Column => Column = {
    val f = udf((a: String) => read(a).getArea)
    a => f(a)
  }
}
