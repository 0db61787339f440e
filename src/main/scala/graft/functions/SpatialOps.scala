package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKTReader, WKTWriter}

/** WKT polygon geometry via JTS (on the Spark classpath), re-expressing the
  * reference's shapely usage: `intersects`/`contains`/`intersection(..).area`
  * (`src/form_calcs.py:992-1037`), polygon construction (`:919`), and
  * point-in-polygon lookup (`src/az_proc.py:161-191`).
  *
  * Geometry travels as WKT strings (Spark has no geometry type); heavy use
  * should pre-filter with the bbox columns so the exact JTS test runs on few
  * candidate pairs (see the spatial argmax join).
  *
  * All UDFs are backed by a per-thread LRU cache of parsed geometries keyed
  * by WKT, with `PreparedGeometry` wrappers for the predicate forms: in a
  * candidate-pair join the polygon side repeats across pairs (a county meets
  * many tanks), so without the cache every pair re-parses a
  * hundreds-of-vertices polygon per predicate. With it, each distinct WKT is
  * parsed (and prepared) once per task thread and the per-pair work is the
  * actual geometry test. The cache is bounded (LRU, 8192 entries/thread) so
  * an unbounded stream of distinct geometries cannot grow the heap.
  */
object SpatialOps {

  @transient private lazy val factory = new GeometryFactory()

  // WKTReader/WKTWriter are stateful and not thread-safe; task threads share
  // this object, so they get one instance per thread instead of one per row
  @transient private lazy val readers = ThreadLocal.withInitial(
    () => new WKTReader(factory))
  @transient private lazy val writers = ThreadLocal.withInitial(
    () => new WKTWriter())

  private val CacheEntriesPerThread = 8192

  private final class Lru[V](max: Int)
      extends java.util.LinkedHashMap[String, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > max
  }

  // Geometry and PreparedGeometry are not thread-safe either, so the caches
  // are per-thread too (Geometry instances never cross threads)
  @transient private lazy val geomCache = ThreadLocal.withInitial(
    () => new Lru[Geometry](CacheEntriesPerThread))
  @transient private lazy val prepCache = ThreadLocal.withInitial(
    () => new Lru[PreparedGeometry](CacheEntriesPerThread))

  private def read(wkt: String): Geometry = {
    val c = geomCache.get()
    var g = c.get(wkt)
    if (g == null) { g = readers.get().read(wkt); c.put(wkt, g) }
    g
  }

  /** Parsed + prepared (indexed) geometry for repeated predicate evaluation. */
  private def readPrepared(wkt: String): PreparedGeometry = {
    val c = prepCache.get()
    var p = c.get(wkt)
    if (p == null) { p = PreparedGeometryFactory.prepare(read(wkt)); c.put(wkt, p) }
    p
  }

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

  /** Envelope [minx, miny, maxx, maxy] of a WKT geometry (cached parse;
    * JTS keeps the envelope on the geometry, so repeats are free). Used by
    * [[graft.plans.WktEnvelopeExpr]] to derive the bbox-prefilter columns
    * the spatial join rewrite injects. */
  def envelopeOf(wkt: String): Array[Double] = {
    val e = read(wkt).getEnvelopeInternal
    Array(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  /** Exact intersection area of two WKT geometries (cached parse; the
    * overlay itself has no prepared fast path in JTS). Named so
    * [[graft.plans.SpatialJoinRewrite]] can recognize `area > 0` join
    * predicates in the logical plan. */
  val intersectionArea: (Column, Column) => Column = {
    val f = udf((a: String, b: String) => read(a).intersection(read(b)).getArea)
      .withName("st_intersection_area")
    (a, b) => f(a, b)
  }

  /** intersects OR contains (the reference's join predicate,
    * `src/form_calcs.py:1011-1019`). The left side is prepared once per
    * distinct WKT; `b.contains(a)` is evaluated as `prepared(a).within(b)`
    * so every predicate goes through the prepared (indexed) geometry.
    * Named so [[graft.plans.SpatialJoinRewrite]] can recognize it as a
    * join predicate in the logical plan. */
  val intersectsOrContains: (Column, Column) => Column = {
    val f = udf((a: String, b: String) => {
      val pa = readPrepared(a); val gb = read(b)
      pa.intersects(gb) || pa.contains(gb) || pa.within(gb)
    }).withName("st_intersects_or_contains")
    (a, b) => f(a, b)
  }

  /** Point-in-polygon (`src/az_proc.py:169-182`); the polygon is prepared so
    * a tile tested against many points builds its index once. */
  val containsPoint: (Column, Column, Column) => Column = {
    val f = udf((wkt: String, x: Double, y: Double) =>
      readPrepared(wkt).covers(factory.createPoint(new Coordinate(x, y))))
    (wkt, x, y) => f(wkt, x, y)
  }

  /** Geometry area. */
  val wktArea: Column => Column = {
    val f = udf((a: String) => read(a).getArea)
    a => f(a)
  }
}
