package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TiffMeta, TiffPixels}

/** G1 pixel path (VERDICT r3 "What's missing" #2): uncompressed striped
  * gray-8 TIFF round trip and the 512-chip slicer's pad semantics. */
class TiffPixelsSpec extends AnyFunSuite {

  private def pix(x: Int, y: Int): Int = (x % 16) + (y % 16)

  test("gray-8 strips round-trip, including a rowsPerStrip that does not divide height") {
    for ((w, h, rps) <- Seq((100, 80, 16), (100, 81, 16), (37, 53, 7), (64, 64, 64))) {
      val bytes = TiffPixels.renderGray8(w, h, rps, pix)
      val (rw, rh, px) = TiffPixels.readGray8(bytes)
      assert((rw, rh) == (w, h))
      assert(px.length == w * h)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == pix(x, y), s"($x,$y) w=$w h=$h rps=$rps")
    }
  }

  test("single-strip files keep offsets inline and still parse") {
    val bytes = TiffPixels.renderGray8(40, 30, 64, pix)   // one strip
    val (w, h, px) = TiffPixels.readGray8(bytes)
    assert((w, h) == (40, 30) && (px(0) & 0xff) == 0 && (px(41) & 0xff) == pix(1, 1))
  }

  test("the strip layout is also visible to the metadata-only reader") {
    val m = TiffMeta.parse(TiffPixels.renderGray8(300, 200, 64, pix))
    assert(m.valid && m.width == 300 && m.height == 200 &&
      m.bitsPerSample == 8 && m.samplesPerPixel == 1)
  }

  test("chips: grid, pad zeroing, and data placement match G1 semantics") {
    val bytes = TiffPixels.renderGray8(1100, 900, 64, pix)
    val chips = TiffPixels.chips(bytes, 512)
    // ceil(1100/512)=3 cols, ceil(900/512)=2 rows
    assert(chips.size == 6)
    val byPos = chips.map(c => ((c._1, c._2), c)).toMap
    val (_, _, dw, dh, slab) = byPos((1, 2))               // bottom-right
    assert(dw == 1100 - 1024 && dh == 900 - 512)
    // data region replays the pixel formula at global coordinates
    for (y <- 0 until dh; x <- 0 until dw)
      assert((slab(y * 512 + x) & 0xff) == pix(1024 + x, 512 + y))
    // padded region is exactly zero
    for (y <- 0 until 512; x <- 0 until 512
         if x >= dw || y >= dh)
      assert(slab(y * 512 + x) == 0, s"pad at ($x,$y) not zero")
    // interior chip has no padding
    val (_, _, fw, fh, _) = byPos((0, 1))
    assert(fw == 512 && fh == 512)
  }

  private def rgb(x: Int, y: Int): (Int, Int, Int) = ((x % 16) + (y % 16), x % 16, y % 16)

  test("rgb-8 interleaved strips round-trip, odd strip heights included") {
    for ((w, h, rps) <- Seq((100, 80, 16), (37, 53, 7), (64, 64, 64))) {
      val bytes = TiffPixels.renderRgb8(w, h, rps, rgb)
      val (rw, rh, px) = TiffPixels.readRgb8(bytes)
      assert((rw, rh) == (w, h) && px.length == w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgb(x, y)
        val i = (y * w + x) * 3
        assert(((px(i) & 0xff), (px(i + 1) & 0xff), (px(i + 2) & 0xff)) == ((r, g, b)),
          s"($x,$y) w=$w h=$h rps=$rps")
      }
    }
  }

  test("rgb metadata: 3 samples, 8-bit out-of-line BitsPerSample, visible to TiffMeta") {
    val m = TiffMeta.parse(TiffPixels.renderRgb8(300, 200, 64, rgb))
    assert(m.valid && m.width == 300 && m.height == 200 &&
      m.bitsPerSample == 8 && m.samplesPerPixel == 3)
  }

  test("rgb chips: pad zeroing and per-band placement at global coordinates") {
    val bytes = TiffPixels.renderRgb8(1100, 900, 64, rgb)
    val chips = TiffPixels.chipsRgb(bytes, 512)
    assert(chips.size == 6)
    val (_, _, dw, dh, slab) = chips.map(c => ((c._1, c._2), c)).toMap.apply((1, 2))
    assert(dw == 1100 - 1024 && dh == 900 - 512)
    for (y <- 0 until dh; x <- 0 until dw) {
      val (r, g, b) = rgb(1024 + x, 512 + y)
      val i = (y * 512 + x) * 3
      assert(((slab(i) & 0xff), (slab(i + 1) & 0xff), (slab(i + 2) & 0xff)) == ((r, g, b)))
    }
    for (y <- 0 until 512; x <- 0 until 512 if x >= dw || y >= dh; b <- 0 until 3)
      assert(slab((y * 512 + x) * 3 + b) == 0, s"pad at ($x,$y,$b) not zero")
  }

  test("sample-count mismatches between readers fail loudly") {
    intercept[IllegalArgumentException] {
      TiffPixels.readGray8(TiffPixels.renderRgb8(16, 16, 8, rgb))
    }
    intercept[IllegalArgumentException] {
      TiffPixels.readRgb8(TiffPixels.renderGray8(16, 16, 8, pix))
    }
  }

  test("JPEG chip encode -> decode round trip stays within the lossy bound") {
    import graft.multimodal.JpegCodec
    val w = 700
    val h = 600
    val tiff = TiffPixels.renderGray8(w, h, rowsPerStrip = 64, pix)
    val all = TiffPixels.chips(tiff, 512)
    assert(all.size == 4)
    all.foreach { case (r, c, dw, dh, slab) =>
      val jpeg = JpegCodec.encodeGray(slab, 512, 512)
      assert(jpeg.length > 2 &&
        (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "JFIF SOI magic")
      val (jw, jh, bands, px) = JpegCodec.decode(jpeg)
      assert(jw == 512 && jh == 512 && bands == 1)
      var errSum = 0L
      for (y <- 0 until 512; x <- 0 until 512)
        errSum += math.abs((px(y * 512 + x) & 0xff) - (slab(y * 512 + x) & 0xff))
      val mae = errSum.toDouble / (512 * 512)
      assert(mae < 3.0, s"chip ($r,$c) dims ${dw}x$dh mean abs err $mae")
    }
  }

  test("JPEG RGB encode -> decode keeps band order") {
    import graft.multimodal.JpegCodec
    // a solid color disambiguates R/B swaps that gray fixtures can't see
    val w = 64
    val h = 32
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = 200.toByte; px(i + 1) = 80.toByte; px(i + 2) = 20.toByte; i += 3 }
    val (jw, jh, bands, out) = JpegCodec.decode(JpegCodec.encodeRgb(px, w, h))
    assert(jw == w && jh == h && bands == 3)
    val r = out(0) & 0xff; val g = out(1) & 0xff; val b = out(2) & 0xff
    assert(math.abs(r - 200) < 8 && math.abs(g - 80) < 8 && math.abs(b - 20) < 8,
      s"decoded first pixel ($r,$g,$b) != (200,80,20) within JPEG tolerance")
  }

  test("JPEG codec rejects bad input loudly") {
    import graft.multimodal.JpegCodec
    intercept[IllegalArgumentException] {
      JpegCodec.decode("definitely not a jpeg".getBytes)
    }
    intercept[IllegalArgumentException] {
      JpegCodec.encodeGray(new Array[Byte](10), 512, 512)   // slab/dims mismatch
    }
    intercept[IllegalArgumentException] {
      JpegCodec.encodeRgb(new Array[Byte](512 * 512), 512, 512)  // gray-sized slab
    }
  }

  test("Deflate and PackBits strips round-trip, with and without predictor 2") {
    for {
      comp <- Seq(TiffPixels.CompDeflate, TiffPixels.CompPackBits)
      pred <- Seq(1, 2)
      (w, h, rps) <- Seq((100, 81, 16), (37, 53, 7), (64, 64, 64))
    } {
      val bytes = TiffPixels.renderGray8(w, h, rps, pix, comp, pred)
      // compressed fixture must actually be smaller than raw for the
      // regular gradient (otherwise the codec path isn't exercised)
      if (comp == TiffPixels.CompDeflate)
        assert(bytes.length < w * h, s"deflate did not compress w=$w h=$h")
      val (rw, rh, px) = TiffPixels.readGray8(bytes)
      assert((rw, rh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == pix(x, y),
          s"($x,$y) w=$w h=$h rps=$rps comp=$comp pred=$pred")
    }
  }

  test("Deflate RGB strips with predictor 2 round-trip (per-channel differencing)") {
    for ((w, h, rps) <- Seq((100, 80, 16), (37, 53, 7))) {
      val bytes = TiffPixels.renderRgb8(w, h, rps, rgb, TiffPixels.CompDeflate, 2)
      val (rw, rh, px) = TiffPixels.readRgb8(bytes)
      assert((rw, rh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgb(x, y)
        val i = (y * w + x) * 3
        assert(((px(i) & 0xff), (px(i + 1) & 0xff), (px(i + 2) & 0xff)) == ((r, g, b)),
          s"($x,$y) w=$w h=$h rps=$rps")
      }
    }
  }

  test("old-style Deflate code 32946 is accepted on read") {
    val bytes = TiffPixels.renderGray8(32, 32, 8, pix, TiffPixels.CompDeflate)
    // rewrite the Compression entry value (tag 259, 4th entry) to 32946
    val b = bytes.clone()
    val e = 8 + 2 + 3 * 12
    assert((b(e) & 0xff) == 3 && (b(e + 1) & 0xff) == 1)   // tag 259 LE
    b(e + 8) = (32946 & 0xff).toByte
    b(e + 9) = ((32946 >> 8) & 0xff).toByte
    val (w, h, px) = TiffPixels.readGray8(b)
    assert((w, h) == (32, 32) && (px(33) & 0xff) == pix(1, 1))
  }

  test("PackBits copes with incompressible and constant rows") {
    // constant rows become replicate runs; a sawtooth with period > 128
    // forces literal runs through the 128-byte cap
    val bytes = TiffPixels.renderGray8(300, 10, 4, (x, y) => if (y % 2 == 0) 7 else x % 251,
      TiffPixels.CompPackBits)
    val (w, h, px) = TiffPixels.readGray8(bytes)
    assert((w, h) == (300, 10))
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) == (if (y % 2 == 0) 7 else x % 251), s"($x,$y)")
  }

  test("compressed or non-gray input fails loudly") {
    val bytes = TiffPixels.renderGray8(32, 32, 8, pix)
    // flip the Compression entry (tag 259 is the 4th entry) to JPEG (7),
    // the one mainstream codec deliberately out of scope
    val b = bytes.clone()
    val e = 8 + 2 + 3 * 12
    assert((b(e) & 0xff) == 3 && (b(e + 1) & 0xff) == 1)   // tag 259 LE
    b(e + 8) = 7
    intercept[IllegalArgumentException] { TiffPixels.readGray8(b) }
    // RGB fixtures from TiffMeta are metadata-only (no strips): also loud
    intercept[Exception] { TiffPixels.readGray8(TiffMeta.minimalTiff(10, 10)) }
  }

  test("LZW golden bytes: bit packing, code numbering, and early change are the spec's") {
    // Encoding "ABAB": Clear(256), 65, 66, 258 (=AB), EOI(257), all 9-bit
    // MSB-first -> 45 bits -> 6 bytes with 3 pad bits. Hand-packed from the
    // TIFF 6.0 §13 rules; pins the wire convention independent of the
    // encoder so a desync in either half fails this test, not just the
    // round trip.
    val golden = Array(0x80, 0x10, 0x48, 0x50, 0x28, 0x08).map(_.toByte)
    assert(TiffPixels.lzwEncode("ABAB".getBytes("US-ASCII")).sameElements(golden))
    assert(new String(TiffPixels.lzwDecode(golden, 0, golden.length, 4), "US-ASCII") == "ABAB")
  }

  test("LZW round-trips across code-width changes and a table-full Clear reset") {
    // LCG bytes barely compress, so the table grows ~1 entry per 2 input
    // bytes: 64 KiB forces all three width bumps (511/1023/2047) and
    // several 4094-entry Clear resets in one strip.
    var seed = 12345L
    val raw = Array.fill(64 * 1024) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toByte
    }
    val enc = TiffPixels.lzwEncode(raw)
    assert(TiffPixels.lzwDecode(enc, 0, enc.length, raw.length).sameElements(raw))
    // KwKwK path: a constant run makes the decoder hit code == next
    val runs = Array.fill(4096)(42.toByte)
    val encRuns = TiffPixels.lzwEncode(runs)
    assert(encRuns.length < runs.length / 4, "constant run should compress hard")
    assert(TiffPixels.lzwDecode(encRuns, 0, encRuns.length, runs.length).sameElements(runs))
  }

  test("LZW strips round-trip through the TIFF writer/reader, predictor 1 and 2") {
    for {
      pred <- Seq(1, 2)
      (w, h, rps) <- Seq((100, 81, 16), (37, 53, 7), (64, 64, 64))
    } {
      val bytes = TiffPixels.renderGray8(w, h, rps, pix, TiffPixels.CompLzw, pred)
      assert(bytes.length < w * h, s"LZW did not compress w=$w h=$h")
      val (rw, rh, px) = TiffPixels.readGray8(bytes)
      assert((rw, rh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == pix(x, y), s"($x,$y) w=$w h=$h rps=$rps pred=$pred")
    }
    // RGB with per-channel predictor
    val bytes = TiffPixels.renderRgb8(100, 80, 16, rgb, TiffPixels.CompLzw, 2)
    val (rw, rh, px) = TiffPixels.readRgb8(bytes)
    assert((rw, rh) == (100, 80))
    for (y <- 0 until 80; x <- 0 until 100) {
      val (r, g, b) = rgb(x, y)
      val i = (y * 100 + x) * 3
      assert(((px(i) & 0xff), (px(i + 1) & 0xff), (px(i + 2) & 0xff)) == ((r, g, b)), s"($x,$y)")
    }
  }
}
