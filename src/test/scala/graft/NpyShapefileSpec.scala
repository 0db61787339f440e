package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Npy, Shapefile}

/** Legacy on-ramp formats (VERDICT "What's missing" #6). The .npy codec is
  * additionally cross-checked against real NumPy out-of-band (files
  * written by np.save parse identically; our renders load in np.load). */
class NpyShapefileSpec extends AnyFunSuite {

  // ------------------------------------------------------------------ npy
  test("npy string/long/double arrays round-trip") {
    val s = Npy.StrArr(Seq("tile_1", "a_much_longer_name", "", "x"))
    assert(Npy.parse(Npy.render(s)) == s)
    val l = Npy.LongArr(Seq(0L, -5L, Long.MaxValue, 123456789012L))
    assert(Npy.parse(Npy.render(l)) == l)
    val d = Npy.DoubleArr(Seq(0.25, -1.5, math.Pi, Double.MinPositiveValue))
    assert(Npy.parse(Npy.render(d)) == d)
  }

  test("npy header is NEP-1 v1.0: magic, version, 64-byte alignment") {
    val bytes = Npy.render(Npy.StrArr(Seq("ab")))
    assert((bytes(0) & 0xff) == 0x93 && new String(bytes, 1, 5, "ASCII") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0)
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    assert((10 + headerLen) % 64 == 0, s"header end not 64-aligned: ${10 + headerLen}")
    assert(bytes(10 + headerLen - 1) == '\n')
  }

  test("npy strings are fixed-width UTF-32LE padded with NULs") {
    val bytes = Npy.render(Npy.StrArr(Seq("ab", "c")))
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    val header = new String(bytes, 10, headerLen, "ASCII")
    assert(header.contains("'descr': '<U2'"), header)
    val body = ByteBuffer.wrap(bytes, 10 + headerLen, 16).order(ByteOrder.LITTLE_ENDIAN)
    assert(Seq(body.getInt, body.getInt, body.getInt, body.getInt) ==
      Seq('a'.toInt, 'b'.toInt, 'c'.toInt, 0))
  }

  test("npy rejects non-npy and unsupported inputs loudly") {
    intercept[IllegalArgumentException] { Npy.parse("not numpy".getBytes ++ new Array[Byte](20)) }
  }

  // ------------------------------------------------------------------ shapefile
  test("rect polygon layer round-trips through shp+dbf+zip") {
    val rects = Seq((0.0, 0.0, 200.0, 160.0), (200.0, 0.0, 400.0, 160.0), (0.0, 160.0, 200.0, 320.0))
    val zip = Shapefile.renderZip(Seq(
      "layer.shp" -> Shapefile.renderRectShp(rects),
      "layer.dbf" -> Shapefile.renderDbf("NAME", 10, Seq("alpha", "beta", "gamma"))))
    val out = Shapefile.parseZip(zip)
    assert(out.size == 3)
    assert(out.map(_._1.recordNumber) == Seq(1, 2, 3))
    assert(out.forall(_._1.shapeType == 5))
    assert(out.map(r => (r._1.minx, r._1.miny, r._1.maxx, r._1.maxy)) == rects)
    assert(out.map(_._2("NAME")) == Seq("alpha", "beta", "gamma"))
    assert(out.head._1.wkt == "POLYGON ((0 160, 200 160, 200 0, 0 0, 0 160))")
  }

  test("point records parse from hand-built spec bytes") {
    // minimal .shp: header + one Point record built straight from the
    // published layout (independent of our own writer)
    val contentWords = 2 + 8   // type int + x,y doubles
    val fileWords = 50 + 4 + contentWords
    val bb = ByteBuffer.allocate(fileWords * 2)
    bb.order(ByteOrder.BIG_ENDIAN).putInt(9994)
    (0 until 5).foreach(_ => bb.putInt(0)); bb.putInt(fileWords)
    bb.order(ByteOrder.LITTLE_ENDIAN).putInt(1000).putInt(1)
    (0 until 8).foreach(_ => bb.putDouble(0.0))
    bb.order(ByteOrder.BIG_ENDIAN).putInt(1).putInt(contentWords)
    bb.order(ByteOrder.LITTLE_ENDIAN).putInt(1).putDouble(3.5).putDouble(-7.25)
    val recs = Shapefile.parseShp(bb.array())
    assert(recs == Seq(Shapefile.ShpRecord(1, 1, 3.5, -7.25, 3.5, -7.25, "POINT (3.5 -7.25)")))
  }

  test("dbf alignment survives multiple records and trailing spaces") {
    val dbf = Shapefile.renderDbf("CNTY", 8, Seq("a", "bb cc", "dddddddd"))
    val (names, rows) = Shapefile.parseDbf(dbf)
    assert(names == Seq("CNTY"))
    assert(rows == Seq(Seq("a"), Seq("bb cc"), Seq("dddddddd")))
  }

  test("dbf field names longer than 10 chars are truncated, like the format demands") {
    val dbf = Shapefile.renderDbfFields(
      Seq(("object_class", 20), ("county_fips", 10), ("state_fips", 10), ("short", 5)),
      Seq(Seq("closed_roof_tank", "17", "3", "ab"),
        Seq("water_tower", "4", "0", "cd")))
    val (names, rows) = Shapefile.parseDbf(dbf)
    // the reference's report script depends on exactly these truncations
    // (distribution_by_county_state.py:29-41)
    assert(names == Seq("object_cla", "county_fip", "state_fips", "short"))
    assert(rows == Seq(Seq("closed_roof_tank", "17", "3", "ab"),
      Seq("water_tower", "4", "0", "cd")))
  }

  test("null shapes keep their record numbers and dbf attribute rows") {
    val shapes = Seq(None, Some((0.0, 0.0, 10.0, 10.0)), None, Some((10.0, 0.0, 20.0, 10.0)))
    val zip = Shapefile.renderZip(Seq(
      "layer.shp" -> Shapefile.renderMixedShp(shapes),
      "layer.dbf" -> Shapefile.renderDbf("NAME", 10, Seq("n1", "poly1", "n2", "poly2"))))
    val out = Shapefile.parseZip(zip)
    assert(out.size == 4)
    assert(out.map(_._1.recordNumber) == Seq(1, 2, 3, 4))
    assert(out.map(_._1.shapeType) == Seq(0, 5, 0, 5))
    assert(out.map(_._1.wkt == null) == Seq(true, false, true, false))
    // the quirk this pins: attribute rows 1 and 3 belong to the NULL
    // records — positional zip of surviving geometries would shift them
    assert(out.map(_._2("NAME")) == Seq("n1", "poly1", "n2", "poly2"))
  }

  test("dbf text decodes per the language driver byte (Windows ANSI)") {
    val fields = Seq(("NAME", 'C', 16))
    val rows = Seq(Seq("Doña Ana"), Seq("Añasco"))
    val dbf = Shapefile.renderDbfTyped(fields, rows,
      java.nio.charset.Charset.forName("windows-1252"), languageDriver = 0x57)
    val (_, got) = Shapefile.parseDbfTyped(dbf, None)
    assert(got == rows)
    // the same bytes decoded as ASCII would have mangled the ñ
    assert(dbf.count(b => (b & 0xff) == 0xf1) == 2)
  }

  test("a .cpg sidecar overrides the dbf encoding (UTF-8 layer)") {
    val fields = Seq(("NAME", 'C', 16))
    val rows = Seq(Seq("Doña Ana"))
    val shp = Shapefile.renderRectShp(Seq((0.0, 0.0, 1.0, 1.0)))
    val utf8Dbf = Shapefile.renderDbfTyped(fields, rows,
      java.nio.charset.StandardCharsets.UTF_8, languageDriver = 0)
    val withCpg = Shapefile.parseZip(Shapefile.renderZip(Seq(
      "l.shp" -> shp, "l.dbf" -> utf8Dbf, "l.cpg" -> "UTF-8".getBytes)))
    assert(withCpg.head._2("NAME") == "Doña Ana")
    // without the sidecar the ñ's two UTF-8 bytes mis-decode as Latin-1
    val without = Shapefile.parseZip(Shapefile.renderZip(Seq(
      "l.shp" -> shp, "l.dbf" -> utf8Dbf)))
    assert(without.head._2("NAME") != "Doña Ana")
  }

  test("numeric dbf fields are right-justified and parse back trimmed") {
    val fields = Seq(("ALAND", 'N', 10), ("NAME", 'C', 6))
    val dbf = Shapefile.renderDbfTyped(fields, Seq(Seq("42", "ab")),
      java.nio.charset.StandardCharsets.ISO_8859_1, languageDriver = 0)
    val (fs, rows) = Shapefile.parseDbfTyped(dbf, None)
    assert(fs == Seq(("ALAND", 'N', 10), ("NAME", 'C', 6)))
    assert(rows == Seq(Seq("42", "ab")))
    // the raw record bytes hold the N value right-justified, C left
    val rec = new String(dbf, dbf.length - 1 - 16, 16, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(rec == "        42ab    ")
  }

  test("zip without a .shp entry fails loudly; missing .dbf yields empty attrs") {
    intercept[RuntimeException] {
      Shapefile.parseZip(Shapefile.renderZip(Seq("readme.txt" -> "hi".getBytes)))
    }
    val zipNoDbf = Shapefile.renderZip(Seq(
      "only.shp" -> Shapefile.renderRectShp(Seq((0.0, 0.0, 1.0, 1.0)))))
    val out = Shapefile.parseZip(zipNoDbf)
    assert(out.size == 1 && out.head._2.isEmpty)
  }
}
