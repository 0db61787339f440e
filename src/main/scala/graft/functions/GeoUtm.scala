package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** UTM <-> WGS84 transverse-Mercator conversion in pure Scala
  * (re-expresses the reference's pyproj calls, `src/form_calcs.py:288-307`).
  *
  * Snyder's series (Map Projections: A Working Manual, USGS PP 1395,
  * eq. 8-9..8-25) on the WGS84 ellipsoid; accuracy is sub-millimetre inside
  * a UTM zone, far below the reference's ~0.6 m pixel resolution.
  * Deterministic double math -> safe to hash-compare across runs.
  */
object GeoUtm {

  private val A = 6378137.0                    // WGS84 semi-major axis
  private val F = 1.0 / 298.257223563          // flattening
  private val E2 = F * (2 - F)                 // first eccentricity^2
  private val E4 = E2 * E2
  private val E6 = E4 * E2
  private val EP2 = E2 / (1 - E2)              // second eccentricity^2
  private val K0 = 0.9996                      // UTM scale factor

  /** UTM zone number for a longitude in degrees. */
  def zone(lonDeg: Double): Int =
    math.min(60, math.max(1, (math.floor((lonDeg + 180.0) / 6.0) + 1).toInt))

  private def centralMeridian(zone: Int): Double = math.toRadians(-183.0 + 6.0 * zone)

  /** Meridional arc length M(phi) (Snyder eq. 3-21). */
  private def meridionalArc(phi: Double): Double =
    A * ((1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256) * phi
      - (3 * E2 / 8 + 3 * E4 / 32 + 45 * E6 / 1024) * math.sin(2 * phi)
      + (15 * E4 / 256 + 45 * E6 / 1024) * math.sin(4 * phi)
      - (35 * E6 / 3072) * math.sin(6 * phi))

  /** Forward: (latDeg, lonDeg) -> (easting, northing) in the given zone
    * (northern-hemisphere convention, no 10,000 km false northing). */
  def toUtm(latDeg: Double, lonDeg: Double, zone: Int): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val n = A / math.sqrt(1 - E2 * math.sin(phi) * math.sin(phi))
    val t = math.tan(phi) * math.tan(phi)
    val c = EP2 * math.cos(phi) * math.cos(phi)
    val a0 = math.cos(phi) * (lam - centralMeridian(zone))
    val m = meridionalArc(phi)
    val easting = K0 * n * (a0 + (1 - t + c) * math.pow(a0, 3) / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(a0, 5) / 120) + 500000.0
    val northing = K0 * (m + n * math.tan(phi) * (a0 * a0 / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(a0, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(a0, 6) / 720))
    (easting, northing)
  }

  /** Inverse: (easting, northing, zone) -> (latDeg, lonDeg)
    * (Snyder eq. 8-17..8-25, footpoint-latitude method). */
  def toWgs84(easting: Double, northing: Double, zone: Int): (Double, Double) = {
    val x = easting - 500000.0
    val m = northing / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = math.tan(phi1)
    val c1 = EP2 * cos1 * cos1
    val t1 = tan1 * tan1
    val n1 = A / math.sqrt(1 - E2 * sin1 * sin1)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sin1 * sin1, 1.5)
    val d = x / (n1 * K0)
    val phi = phi1 - (n1 * tan1 / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lam = centralMeridian(zone) + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cos1
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  // -------- Column API (Scala UDFs; candidates for codegen Expressions if
  // they ever show up hot in BENCH — they are per-row O(1) trig) ----------

  /** struct(easting, northing) from lat/lon/zone columns. */
  val utmFromWgs84: (Column, Column, Column) => Column = {
    val f = udf((lat: Double, lon: Double, z: Int) => toUtm(lat, lon, z))
    (lat, lon, z) => f(lat, lon, z)
  }

  /** struct(lat, lon) from easting/northing/zone columns. */
  val wgs84FromUtm: (Column, Column, Column) => Column = {
    val f = udf((e: Double, n: Double, z: Int) => toWgs84(e, n, z))
    (e, n, z) => f(e, n, z)
  }
}
