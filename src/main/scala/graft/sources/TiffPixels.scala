package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pixel-level TIFF strip IO for the G1 chip-slicing path
  * (`az_proc.py:501-526`, `form_calcs.py:166-191`: tile raster -> 512x512
  * chips, right/bottom edges zero-padded to full chip size).
  *
  * 8-bit strips, little-endian on write (either byte order on read),
  * chunky/interleaved samples — gray (SamplesPerPixel=1) and RGB
  * (SamplesPerPixel=3, the NAIP tile shape `az_proc.py:510` actually
  * chips). Strip codecs: none (1), LZW (5, TIFF 6.0 §13 with the spec's
  * early-change code widths), Deflate (8 and the old-style 32946, via
  * `java.util.zip` — no new dependency) and PackBits (32773), with
  * horizontal-differencing predictor 2 — the full set of shapes real
  * NAIP GeoTIFFs ship in (the reference reads them through cv2/rioxarray,
  * `az_proc.py:510`, `form_calcs.py:261-287`). JPEG-in-TIFF stays a
  * loud failure. The slicing itself — strip reads, row copies, pad
  * semantics — is the real computation and runs executor-side over
  * `binaryFile` content (one tile per row, narrow flatMap, no shuffle).
  */
object TiffPixels {

  /** TIFF compression tag values accepted by the reader and writer. */
  val CompNone = 1
  val CompLzw = 5
  val CompDeflate = 8
  val CompDeflateOld = 32946
  val CompPackBits = 32773

  /** Renders a striped gray-8 TIFF whose pixel at (x, y) is
    * `pix(x, y) & 0xff` — deterministic fixtures an oracle can replay.
    * `compression`: CompNone | CompDeflate | CompPackBits; `predictor` 2 =
    * horizontal differencing before compression (the common NAIP layout). */
  def renderGray8(width: Int, height: Int, rowsPerStrip: Int,
                  pix: (Int, Int) => Int,
                  compression: Int = CompNone, predictor: Int = 1): Array[Byte] =
    renderStriped(width, height, rowsPerStrip, samples = 1, photometric = 1,
      (x, y, _) => pix(x, y), compression, predictor)

  /** Renders a striped interleaved RGB-8 TIFF (SamplesPerPixel=3,
    * PhotometricInterpretation=RGB, BitsPerSample the standards-required
    * 3-SHORT out-of-line array). `pix(x, y)` returns the (r, g, b) byte
    * triple. Same codec/predictor options as [[renderGray8]]. */
  def renderRgb8(width: Int, height: Int, rowsPerStrip: Int,
                 pix: (Int, Int) => (Int, Int, Int),
                 compression: Int = CompNone, predictor: Int = 1): Array[Byte] = {
    // bands iterate innermost, so memoize the current pixel's triple — one
    // pix() call (and one tuple) per PIXEL, not per band; at NAIP tile
    // sizes the per-band form tripled the allocation rate of the render
    var lastX = -1; var lastY = -1
    var last: (Int, Int, Int) = null
    renderStriped(width, height, rowsPerStrip, samples = 3, photometric = 2,
      (x, y, band) => {
        if (x != lastX || y != lastY) { last = pix(x, y); lastX = x; lastY = y }
        band match {
          case 0 => last._1
          case 1 => last._2
          case _ => last._3
        }
      }, compression, predictor)
  }

  // ---------------------------------------------------------------- codecs

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def inflate(src: Array[Byte], off: Int, len: Int,
                      expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(src, off, len)
    val out = new Array[Byte](expected)
    var o = 0
    while (o < expected && !inf.finished()) {
      val n = inf.inflate(out, o, expected - o)
      require(n > 0 || !inf.needsInput(), "truncated Deflate strip")
      o += n
    }
    inf.end()
    require(o == expected, s"Deflate strip decoded $o of $expected bytes")
    out
  }

  // TIFF LZW (6.0 spec §13). Codes are packed MSB-first; ClearCode=256,
  // EOI=257, first table entry 258. The spec's "early change" pairing:
  // the ENCODER widens the code one entry earlier than generic LZW
  // (after table size hits 511/1023/2047) and the DECODER — which lags
  // the encoder by exactly one table insert at read time — widens after
  // size 510/1022/2046, so both sides flip width between the same two
  // codes of the stream. A ClearCode is emitted when the table reaches
  // 4094 entries, so 12-bit codes never overflow.
  private val LzwClear = 256
  private val LzwEoi = 257

  private[graft] def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var bitBuf = 0L; var bits = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bits += width
      while (bits >= 8) { out.write(((bitBuf >>> (bits - 8)) & 0xff).toInt); bits -= 8 }
    }
    // (prefixCode << 8 | byte) -> code; prefix < 4096 so the key fits an Int
    val table = new java.util.HashMap[Integer, Integer](8192)
    var next = 258
    put(LzwClear)
    var omega = -1
    var i = 0
    while (i < raw.length) {
      val k = raw(i) & 0xff
      if (omega < 0) omega = k
      else {
        val hit = table.get((omega << 8) | k)
        if (hit != null) omega = hit.intValue()
        else {
          put(omega)
          table.put((omega << 8) | k, next); next += 1
          omega = k
          if (next == 4094) { put(LzwClear); table.clear(); next = 258; width = 9 }
          else if (width < 12 && next == (1 << width) - 1) width += 1
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    put(LzwEoi)
    if (bits > 0) out.write(((bitBuf << (8 - bits)) & 0xff).toInt)
    out.toByteArray
  }

  private[graft] def lzwDecode(src: Array[Byte], off: Int, len: Int,
                               expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var o = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258; var width = 9
    var bitBuf = 0L; var bits = 0; var p = off
    val end = off + len
    def read(): Int = {
      while (bits < width && p < end) {
        bitBuf = (bitBuf << 8) | (src(p) & 0xff); bits += 8; p += 1
      }
      if (bits < width) LzwEoi                   // ran off the strip: stop
      else { bits -= width; ((bitBuf >>> bits) & ((1 << width) - 1)).toInt }
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    // writes string(code) to out; returns its first byte
    def expand(code: Int): Byte = {
      var sp = 0; var c = code
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      require(o + sp + 1 <= expected, s"LZW output overruns $expected bytes")
      out(o) = c.toByte; o += 1
      var j = sp - 1
      while (j >= 0) { out(o) = stack(j); o += 1; j -= 1 }
      c.toByte
    }
    var old = -1
    var done = false
    while (!done && o < expected) {
      val code = read()
      if (code == LzwEoi) done = true
      else if (code == LzwClear) { next = 258; width = 9; old = -1 }
      else if (old < 0) {
        require(code < 256, s"first LZW code after clear must be a literal, got $code")
        expand(code); old = code
      } else {
        require(code <= next && code != 257, s"bad LZW code $code (table size $next)")
        if (code == next) {                      // KwKwK: entry defined by itself
          prefix(next) = old; suffix(next) = firstByteOf(old); next += 1
          expand(code)
        } else {
          val first = expand(code)
          prefix(next) = old; suffix(next) = first; next += 1
        }
        old = code
        if (width < 12 && next == (1 << width) - 2) width += 1
      }
    }
    require(o == expected, s"LZW strip decoded $o of $expected bytes")
    out
  }

  /** PackBits-encodes one row (TIFF spec: encoding never crosses rows). */
  private def packBitsRow(row: Array[Byte], out: java.io.ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < row.length) {
      var runLen = 1
      while (i + runLen < row.length && runLen < 128 && row(i + runLen) == row(i))
        runLen += 1
      if (runLen >= 2) {
        out.write(1 - runLen)                    // -(runLen-1): replicate
        out.write(row(i))
        i += runLen
      } else {
        val start = i
        var j = i + 1
        var cut = -1
        while (j < row.length && (j - start) < 128 && cut < 0) {
          if (j + 2 < row.length && row(j) == row(j + 1) && row(j) == row(j + 2)) cut = j
          else j += 1
        }
        val end = if (cut >= 0) cut else j
        out.write(end - start - 1)               // literal count - 1
        out.write(row, start, end - start)
        i = end
      }
    }
  }

  private def unpackBits(src: Array[Byte], off: Int, len: Int,
                         expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = off; var o = 0
    val end = off + len
    while (o < expected && i < end) {
      val n = src(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        System.arraycopy(src, i, out, o, cnt); i += cnt; o += cnt
      } else if (n != -128) {                    // -128 is a spec'd no-op
        val cnt = 1 - n
        java.util.Arrays.fill(out, o, o + cnt, src(i)); i += 1; o += cnt
      }
    }
    require(o == expected, s"PackBits strip decoded $o of $expected bytes")
    out
  }

  /** Horizontal differencing (predictor 2), in place, per sample channel. */
  private def applyPredictor(strip: Array[Byte], rowBytes: Int, samples: Int): Unit = {
    var r = 0
    while (r * rowBytes < strip.length) {
      val base = r * rowBytes
      var i = rowBytes - 1
      while (i >= samples) {
        strip(base + i) = (strip(base + i) - strip(base + i - samples)).toByte
        i -= 1
      }
      r += 1
    }
  }

  private def undoPredictor(strip: Array[Byte], rowBytes: Int, samples: Int): Unit = {
    var r = 0
    while (r * rowBytes < strip.length) {
      val base = r * rowBytes
      var i = samples
      while (i < rowBytes) {
        strip(base + i) = (strip(base + i) + strip(base + i - samples)).toByte
        i += 1
      }
      r += 1
    }
  }

  private def renderStriped(width: Int, height: Int, rowsPerStrip: Int,
                            samples: Int, photometric: Int,
                            pixByte: (Int, Int, Int) => Int,
                            compression: Int, predictor: Int): Array[Byte] = {
    require(width > 0 && height > 0 && rowsPerStrip > 0)
    require(samples == 1 || samples == 3, s"1 or 3 samples, got $samples")
    require(compression == CompNone || compression == CompLzw ||
      compression == CompDeflate || compression == CompPackBits,
      s"writer supports none/lzw/deflate/packbits, got $compression")
    require(predictor == 1 || predictor == 2, s"predictor 1 or 2, got $predictor")
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val rowBytes = width * samples
    // materialize (predictor'd, compressed) strip payloads first: their
    // encoded lengths drive the offset layout
    val strips: IndexedSeq[Array[Byte]] = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      val raw = new Array[Byte](rows * rowBytes)
      var r = 0
      while (r < rows) {
        val y = s * rowsPerStrip + r
        var x = 0
        while (x < width) {
          var b = 0
          while (b < samples) {
            raw(r * rowBytes + x * samples + b) = (pixByte(x, y, b) & 0xff).toByte
            b += 1
          }
          x += 1
        }
        r += 1
      }
      if (predictor == 2) applyPredictor(raw, rowBytes, samples)
      compression match {
        case CompNone => raw
        case CompLzw => lzwEncode(raw)
        case CompDeflate => deflate(raw)
        case CompPackBits =>
          val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 128 + 16)
          var rr = 0
          while (rr < rows) {
            packBitsRow(java.util.Arrays.copyOfRange(raw, rr * rowBytes,
              (rr + 1) * rowBytes), out)
            rr += 1
          }
          out.toByteArray
      }
    }
    val nEntries = if (predictor == 2) 10 else 9
    val ifdOffset = 8
    // after the IFD + next-IFD pointer: the BitsPerSample SHORT array when
    // samples > 1 (3 shorts do not fit the 4-byte value field), then the
    // strip offset/count arrays (when they don't fit inline), then strips
    val afterIfd = ifdOffset + 2 + nEntries * 12 + 4
    val bitsInline = samples == 1
    val bitsOffset = afterIfd
    val stripArrOffset = bitsOffset + (if (bitsInline) 0 else samples * 2)
    val offsetsInline = nStrips == 1
    val pixelStart = stripArrOffset + (if (offsetsInline) 0 else nStrips * 4 * 2)
    val stripLens = strips.map(_.length)
    val stripOffsets = stripLens.scanLeft(pixelStart)(_ + _).init
    val buf = ByteBuffer.allocate(pixelStart + stripLens.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit =
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    entry(256, 4, 1, width)                      // ImageWidth
    entry(257, 4, 1, height)                     // ImageLength
    if (bitsInline) entry(258, 3, 1, 8)          // BitsPerSample
    else entry(258, 3, samples, bitsOffset)
    entry(259, 3, 1, compression)                // Compression
    entry(262, 3, 1, photometric)                // BlackIsZero / RGB
    if (offsetsInline) entry(273, 4, 1, stripOffsets.head)
    else entry(273, 4, nStrips, stripArrOffset)
    entry(277, 3, 1, samples)                    // SamplesPerPixel
    entry(278, 4, 1, rowsPerStrip)               // RowsPerStrip
    if (offsetsInline) entry(279, 4, 1, stripLens.head)
    else entry(279, 4, nStrips, stripArrOffset + nStrips * 4)
    if (predictor == 2) entry(317, 3, 1, 2)      // Predictor: horizontal
    buf.putInt(0)                                // next-IFD pointer: none
    if (!bitsInline) (0 until samples).foreach(_ => buf.putShort(8))
    if (!offsetsInline) {
      stripOffsets.foreach(buf.putInt)
      stripLens.foreach(buf.putInt)
    }
    strips.foreach(buf.put)
    buf.array()
  }

  /** Reads a striped gray-8 TIFF (none/LZW/Deflate/PackBits strips,
    * predictor 1 or 2) back into (width, height, row-major pixel bytes).
    * Fails loudly on other codecs, non-8-bit, or multi-sample input. */
  def readGray8(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, s, px) = readStriped(bytes)
    require(s == 1, s"gray-8 only, got samples=$s (use readRgb8)")
    (w, h, px)
  }

  /** Reads a striped interleaved RGB-8 TIFF back into
    * (width, height, row-major r,g,b-interleaved bytes). */
  def readRgb8(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, s, px) = readStriped(bytes)
    require(s == 3, s"rgb-8 only, got samples=$s (use readGray8)")
    (w, h, px)
  }

  /** Shared strip reader: (width, height, samplesPerPixel, interleaved
    * bytes). Scope is the fixture formats above plus any
    * standards-conforming chunky 8-bit striped file in none/LZW/Deflate/
    * PackBits compression with predictor 1 or 2. */
  private def readStriped(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val order = (bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => sys.error("not a TIFF (bad byte-order mark)")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    require(buf.getShort(2) == 42, "not a TIFF (bad magic)")
    val ifdOffset = buf.getInt(4)
    val nEntries = buf.getShort(ifdOffset) & 0xffff
    var width = 0; var height = 0; var rowsPerStrip = Int.MaxValue
    var compression = 1; var bits = 1; var samples = 1; var planar = 1
    var predictor = 1
    var offsets = Seq.empty[Int]; var counts = Seq.empty[Int]
    def longArray(e: Int): Seq[Int] = {
      val count = buf.getInt(e + 4)
      if (count == 1) Seq(buf.getInt(e + 8))
      else {
        val off = buf.getInt(e + 8)
        (0 until count).map(i => buf.getInt(off + i * 4))
      }
    }
    var i = 0
    while (i < nEntries) {
      val e = ifdOffset + 2 + i * 12
      val tag = buf.getShort(e) & 0xffff
      def shortOrLong: Int =
        if ((buf.getShort(e + 2) & 0xffff) == 3) buf.getShort(e + 8) & 0xffff
        else buf.getInt(e + 8)
      tag match {
        case 256 => width = shortOrLong
        case 257 => height = shortOrLong
        case 258 =>
          // count > 1 => the value field is an offset to a SHORT array
          // (the standards-conforming multi-sample layout)
          val count = buf.getInt(e + 4)
          bits =
            if (count == 1) shortOrLong
            else {
              val off = buf.getInt(e + 8)
              val all = (0 until count).map(k => buf.getShort(off + k * 2) & 0xffff)
              require(all.distinct.size == 1, s"heterogeneous BitsPerSample $all")
              all.head
            }
        case 259 => compression = shortOrLong
        case 273 => offsets = longArray(e)
        case 277 => samples = shortOrLong
        case 278 => rowsPerStrip = shortOrLong
        case 279 => counts = longArray(e)
        case 284 => planar = shortOrLong
        case 317 => predictor = shortOrLong
        case _ =>
      }
      i += 1
    }
    require(compression == CompNone || compression == CompLzw ||
      compression == CompDeflate || compression == CompDeflateOld ||
      compression == CompPackBits,
      s"unsupported compression $compression (none/LZW/Deflate/PackBits only; " +
        "JPEG-in-TIFF is out of scope)")
    require(bits == 8, s"8-bit samples only, got bits=$bits")
    require(planar == 1, s"chunky (interleaved) samples only, got planar=$planar")
    require(samples == 1 || samples == 3, s"1 or 3 samples only, got $samples")
    require(predictor == 1 || predictor == 2, s"predictor 1 or 2 only, got $predictor")
    require(width > 0 && height > 0 && offsets.nonEmpty, "missing dimensions or strips")
    require(rowsPerStrip > 0, s"bad RowsPerStrip $rowsPerStrip")
    val rowBytes = width * samples
    val out = new Array[Byte](rowBytes * height)
    var row = 0
    offsets.zip(counts).zipWithIndex.foreach { case ((off, len), s) =>
      // expected rows come from RowsPerStrip (the last strip is short);
      // with compression the stored byte count is the ENCODED length
      val rows = math.min(rowsPerStrip.toLong,
        (height - s.toLong * rowsPerStrip)).toInt
      val expected = rows * rowBytes
      val strip = compression match {
        case CompNone =>
          require(len >= expected, s"uncompressed strip $s holds $len of $expected bytes")
          java.util.Arrays.copyOfRange(bytes, off, off + expected)
        case CompLzw => lzwDecode(bytes, off, len, expected)
        case CompDeflate | CompDeflateOld => inflate(bytes, off, len, expected)
        case CompPackBits => unpackBits(bytes, off, len, expected)
      }
      if (predictor == 2) undoPredictor(strip, rowBytes, samples)
      System.arraycopy(strip, 0, out, row * rowBytes, expected)
      row += rows
    }
    require(row == height, s"strips covered $row of $height rows")
    (width, height, samples, out)
  }

  /** Slices a gray-8 tile into `chip`x`chip` slabs, right/bottom edges
    * ZERO-PADDED to the full chip size — the G1 pad semantics
    * (`form_calcs.py:166-191`). Returns (chipRow, chipCol, dataW, dataH,
    * padded slab of chip*chip bytes). Chip grid agrees with the
    * metadata-level `g1_chip_grid`/`g1_chip_pad` accounting:
    * ceil(w/chip) x ceil(h/chip) chips, pad = chip - data. */
  def chips(bytes: Array[Byte], chip: Int): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val (w, h, px) = readGray8(bytes)
    sliceChips(w, h, 1, px, chip)
  }

  /** RGB variant of [[chips]]: slabs are chip*chip*3 interleaved bytes,
    * zero-padded — the `az_proc.py:510` NAIP chip shape. */
  def chipsRgb(bytes: Array[Byte], chip: Int): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val (w, h, px) = readRgb8(bytes)
    sliceChips(w, h, 3, px, chip)
  }

  private def sliceChips(w: Int, h: Int, samples: Int, px: Array[Byte],
                         chip: Int): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val nCols = (w + chip - 1) / chip
    val nRows = (h + chip - 1) / chip
    for {
      r <- 0 until nRows
      c <- 0 until nCols
    } yield {
      val dataW = math.min(chip, w - c * chip)
      val dataH = math.min(chip, h - r * chip)
      val slab = new Array[Byte](chip * chip * samples)  // zero-initialized = pad
      var y = 0
      while (y < dataH) {
        System.arraycopy(px, ((r * chip + y) * w + c * chip) * samples,
          slab, y * chip * samples, dataW * samples)
        y += 1
      }
      (r, c, dataW, dataH, slab)
    }
  }
}
