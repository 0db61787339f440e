package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pixel-level TIFF strip IO for the G1 chip-slicing path
  * (`az_proc.py:501-526`, `form_calcs.py:166-191`: tile raster -> 512x512
  * chips, right/bottom edges zero-padded to full chip size).
  *
  * Uncompressed 8-bit grayscale, little-endian, strip-organized — the
  * layout `TiffMeta`'s IFD walker already understands, extended here with
  * the strip tags (273 StripOffsets, 278 RowsPerStrip, 279
  * StripByteCounts). No codec library exists in this environment, so the
  * *format* scope is honest: uncompressed strips only, loud failure on
  * anything compressed. The slicing itself — strip reads, row copies, pad
  * semantics — is the real computation and runs executor-side over
  * `binaryFile` content (one tile per row, narrow flatMap, no shuffle).
  */
object TiffPixels {

  /** Renders an uncompressed striped gray-8 TIFF whose pixel at (x, y) is
    * `pix(x, y) & 0xff` — deterministic fixtures an oracle can replay. */
  def renderGray8(width: Int, height: Int, rowsPerStrip: Int,
                  pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && rowsPerStrip > 0)
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val nEntries = 9
    val ifdOffset = 8
    // after the IFD + next-IFD pointer: strip offset/count arrays (when
    // they don't fit inline), then pixel strips
    var arrOffset = ifdOffset + 2 + nEntries * 12 + 4
    val stripLens = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      rows * width
    }
    val offsetsInline = nStrips == 1
    val arrBytes = if (offsetsInline) 0 else nStrips * 4 * 2
    val pixelStart = arrOffset + arrBytes
    val stripOffsets = stripLens.scanLeft(pixelStart)(_ + _).init
    val buf = ByteBuffer.allocate(pixelStart + stripLens.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit =
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    entry(256, 4, 1, width)                      // ImageWidth
    entry(257, 4, 1, height)                     // ImageLength
    entry(258, 3, 1, 8)                          // BitsPerSample
    entry(259, 3, 1, 1)                          // Compression: none
    entry(262, 3, 1, 1)                          // Photometric: BlackIsZero
    if (offsetsInline) entry(273, 4, 1, stripOffsets.head)
    else { entry(273, 4, nStrips, arrOffset); arrOffset += nStrips * 4 }
    entry(277, 3, 1, 1)                          // SamplesPerPixel
    entry(278, 4, 1, rowsPerStrip)               // RowsPerStrip
    if (offsetsInline) entry(279, 4, 1, stripLens.head)
    else { entry(279, 4, nStrips, arrOffset) }
    buf.putInt(0)                                // next-IFD pointer: none
    if (!offsetsInline) {
      stripOffsets.foreach(buf.putInt)
      stripLens.foreach(buf.putInt)
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { buf.put((pix(x, y) & 0xff).toByte); x += 1 }
      y += 1
    }
    buf.array()
  }

  /** Reads an uncompressed striped gray-8 TIFF back into
    * (width, height, row-major pixel bytes). Fails loudly on compressed
    * or non-8-bit-gray input — scope is the fixture format above plus any
    * standards-conforming uncompressed gray-8 striped file. */
  def readGray8(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
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
    var compression = 1; var bits = 1; var samples = 1
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
        case 258 => bits = shortOrLong
        case 259 => compression = shortOrLong
        case 273 => offsets = longArray(e)
        case 277 => samples = shortOrLong
        case 278 => rowsPerStrip = shortOrLong
        case 279 => counts = longArray(e)
        case _ =>
      }
      i += 1
    }
    require(compression == 1, s"unsupported compression $compression (uncompressed strips only)")
    require(bits == 8 && samples == 1, s"gray-8 only, got bits=$bits samples=$samples")
    require(width > 0 && height > 0 && offsets.nonEmpty, "missing dimensions or strips")
    val out = new Array[Byte](width * height)
    var row = 0
    offsets.zip(counts).foreach { case (off, len) =>
      val rows = len / width
      System.arraycopy(bytes, off, out, row * width, rows * width)
      row += rows
    }
    require(row == height, s"strips covered $row of $height rows")
    (width, height, out)
  }

  /** Slices a gray-8 tile into `chip`x`chip` slabs, right/bottom edges
    * ZERO-PADDED to the full chip size — the G1 pad semantics
    * (`form_calcs.py:166-191`). Returns (chipRow, chipCol, dataW, dataH,
    * padded slab of chip*chip bytes). Chip grid agrees with the
    * metadata-level `g1_chip_grid`/`g1_chip_pad` accounting:
    * ceil(w/chip) x ceil(h/chip) chips, pad = chip - data. */
  def chips(bytes: Array[Byte], chip: Int): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val (w, h, px) = readGray8(bytes)
    val nCols = (w + chip - 1) / chip
    val nRows = (h + chip - 1) / chip
    for {
      r <- 0 until nRows
      c <- 0 until nCols
    } yield {
      val dataW = math.min(chip, w - c * chip)
      val dataH = math.min(chip, h - r * chip)
      val slab = new Array[Byte](chip * chip)      // zero-initialized = pad
      var y = 0
      while (y < dataH) {
        System.arraycopy(px, (r * chip + y) * w + c * chip, slab, y * chip, dataW)
        y += 1
      }
      (r, c, dataW, dataH, slab)
    }
  }
}
