package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TiffMeta

class TiffMetaSpec extends AnyFunSuite {

  test("round trip: minimal writer -> parser") {
    val bytes = TiffMeta.minimalTiff(6123, 4987, 8, 3, 0.6, 0.6)
    val m = TiffMeta.parse(bytes)
    assert(m.valid)
    assert(m.width == 6123 && m.height == 4987)
    assert(m.bitsPerSample == 8 && m.samplesPerPixel == 3)
    assert(m.pixelScaleX == 0.6 && m.pixelScaleY == 0.6)
    assert(m.epsg == 32616, "default fixture carries zone-16 geokeys")
  }

  test("GeoKeyDirectory: per-file EPSG is read, absence yields 0") {
    val z17 = TiffMeta.parse(TiffMeta.minimalTiff(100, 100, epsg = 32617))
    assert(z17.valid && z17.epsg == 32617)
    val plain = TiffMeta.parse(TiffMeta.minimalTiff(100, 100, epsg = 0))
    assert(plain.valid && plain.epsg == 0, "no geokey directory -> epsg 0")
  }

  test("GeoKeyDirectory: geographic CRS (2048) is the fallback when no projected key") {
    import java.nio.{ByteBuffer, ByteOrder}
    val nEntries = 3
    val ifd = 8
    val valOff = ifd + 2 + nEntries * 12 + 4
    val buf = ByteBuffer.allocate(valOff + 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd)
    buf.putShort(nEntries.toShort)
    buf.putShort(256).putShort(4).putInt(1).putInt(640)
    buf.putShort(257).putShort(4).putInt(1).putInt(480)
    buf.putShort(34735.toShort).putShort(3).putInt(8).putInt(valOff)
    buf.putInt(0)
    buf.putShort(1).putShort(1).putShort(0).putShort(1)
    buf.putShort(2048).putShort(0).putShort(1).putShort(4326)   // WGS84 geographic
    val m = TiffMeta.parse(buf.array())
    assert(m.valid && m.epsg == 4326)
  }

  test("big-endian header parses too") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-build a 2-entry big-endian IFD (width + height, LONG type)
    val buf = ByteBuffer.allocate(8 + 2 + 2 * 12 + 4).order(ByteOrder.BIG_ENDIAN)
    buf.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    buf.putShort(2)
    buf.putShort(256).putShort(4).putInt(1).putInt(1024)
    buf.putShort(257).putShort(4).putInt(1).putInt(768)
    buf.putInt(0)
    val m = TiffMeta.parse(buf.array())
    assert(m.valid && m.width == 1024 && m.height == 768)
  }

  test("multi-sample BitsPerSample (count=3 behind an offset) reads the first value") {
    import java.nio.{ByteBuffer, ByteOrder}
    // real RGB TIFFs store tag 258 as three shorts at an offset
    val nEntries = 3
    val ifd = 8
    val valOff = ifd + 2 + nEntries * 12 + 4
    val buf = ByteBuffer.allocate(valOff + 6).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd)
    buf.putShort(nEntries.toShort)
    buf.putShort(256).putShort(4).putInt(1).putInt(640)
    buf.putShort(257).putShort(4).putInt(1).putInt(480)
    buf.putShort(258).putShort(3).putInt(3).putInt(valOff)   // offset, not value
    buf.putInt(0)
    buf.putShort(8).putShort(8).putShort(8)
    val m = TiffMeta.parse(buf.array())
    assert(m.valid && m.width == 640 && m.height == 480)
    assert(m.bitsPerSample == 8, s"got ${m.bitsPerSample} (would be a pointer fragment pre-fix)")
  }

  test("garbage and truncated input is invalid, not an exception") {
    assert(!TiffMeta.parse(null).valid)
    assert(!TiffMeta.parse(Array[Byte](1, 2, 3)).valid)
    assert(!TiffMeta.parse("not a tiff at all".getBytes).valid)
    val good = TiffMeta.minimalTiff(100, 100)
    assert(!TiffMeta.parse(good.take(10)).valid)   // truncated before IFD
  }

  test("wrong magic rejected") {
    val bytes = TiffMeta.minimalTiff(100, 100)
    bytes(2) = 43
    assert(!TiffMeta.parse(bytes).valid)
  }
}
