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

  test("forAll: round trip holds on generated in-zone points, zone edges included") {
    // lat spans the full UTM validity band; lon is drawn WITHIN a random
    // zone with a bias toward the zone edges (±3° from the central
    // meridian is where the Krueger series error is largest and where the
    // fixed CONUS sweep above never samples — southern hemisphere + high
    // latitudes included here too)
    val genCase = for {
      zone <- org.scalacheck.Gen.choose(1, 60)
      lat <- org.scalacheck.Gen.choose(-80.0, 84.0)
      // offset from the zone's west edge; bias edges (0 and 6 degrees)
      off <- org.scalacheck.Gen.frequency(
        2 -> org.scalacheck.Gen.choose(1e-9, 1e-3),
        2 -> org.scalacheck.Gen.choose(6.0 - 1e-3, 6.0 - 1e-9),
        6 -> org.scalacheck.Gen.choose(0.0, 6.0))
    } yield (zone, lat, -180.0 + (zone - 1) * 6.0 + off)
    PropCheck(org.scalacheck.Prop.forAll(genCase) { case (zone, lat, lon) =>
      val (e, n) = GeoUtm.toUtm(lat, lon, zone)
      val (lat2, lon2) = GeoUtm.toWgs84(e, n, zone)
      math.abs(lat2 - lat) < 1e-6 && math.abs(lon2 - lon) < 1e-6 &&
        GeoUtm.zone(lon) == zone
    }, minTests = 500)
  }

  test("forAll: GeoPortable inverse round-trips generated UTM points within 1e-6 deg") {
    // GeoPortable.inverse is the fixed-coefficient Krueger inverse whose
    // SQL rendering the DuckDB oracles share — forward through GeoUtm then
    // back through GeoPortable must land within the engine-parity
    // tolerance on arbitrary in-zone points, not just anchor fixtures
    val genCase = for {
      zone <- org.scalacheck.Gen.choose(1, 60)
      lat <- org.scalacheck.Gen.choose(-80.0, 84.0)
      off <- org.scalacheck.Gen.choose(0.05, 5.95)
    } yield (zone, lat, -180.0 + (zone - 1) * 6.0 + off)
    PropCheck(org.scalacheck.Prop.forAll(genCase) { case (zone, lat, lon) =>
      val (e, n) = GeoUtm.toUtm(lat, lon, zone)
      val (lat2, lon2) = graft.functions.GeoPortable.inverse(e, n, zone)
      math.abs(lat2 - lat) < 1e-6 && math.abs(lon2 - lon) < 1e-6
    }, minTests = 500)
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
