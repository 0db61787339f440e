package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoUtm

class GeoUtmSpec extends AnyFunSuite {

  test("round trip wgs84 -> utm -> wgs84 within 1e-8 degrees across CONUS") {
    val rng = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val lat = 25.0 + rng.nextDouble() * 24.0      // 25..49 N
      val lon = -124.0 + rng.nextDouble() * 57.0    // -124..-67 (CONUS)
      val z = GeoUtm.zone(lon)
      val (e, n) = GeoUtm.toUtm(lat, lon, z)
      val (lat2, lon2) = GeoUtm.toWgs84(e, n, z)
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat lon $lon")
      assert(math.abs(lon2 - lon) < 1e-8, s"lat $lat lon $lon")
    }
  }

  test("central meridian maps to easting 500000 with k0 scale") {
    // zone 16 central meridian is -87 deg
    val (e, _) = GeoUtm.toUtm(35.0, -87.0, 16)
    assert(math.abs(e - 500000.0) < 1e-6)
  }

  test("northing approximates meridional arc * k0 at equator-origin") {
    val (_, n) = GeoUtm.toUtm(0.0, -87.0, 16)
    assert(math.abs(n) < 1e-6)   // equator on central meridian -> northing 0
  }

  test("known fixpoint: zone boundaries") {
    assert(GeoUtm.zone(-180.0) == 1)
    assert(GeoUtm.zone(-87.0) == 16)
    assert(GeoUtm.zone(0.0) == 31)
    assert(GeoUtm.zone(179.9) == 60)
  }

  test("easting stays within zone bounds for in-zone points") {
    // 3 degrees from the central meridian at mid-latitude stays within
    // the conventional 100k..900k easting envelope
    (25 to 49 by 4).foreach { lat =>
      val (eWest, _) = GeoUtm.toUtm(lat, -89.9, 16)
      val (eEast, _) = GeoUtm.toUtm(lat, -84.1, 16)
      assert(eWest > 100000 && eWest < 500000)
      assert(eEast > 500000 && eEast < 900000)
    }
  }

  test("monotonicity: easting grows with lon, northing with lat") {
    val (e1, n1) = GeoUtm.toUtm(35.0, -88.0, 16)
    val (e2, n2) = GeoUtm.toUtm(36.0, -86.0, 16)
    assert(e2 > e1 && n2 > n1)
  }
}
