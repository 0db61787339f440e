package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal TIFF/GeoTIFF *metadata* reader (SURVEY.md S8): byte order,
  * magic, first-IFD walk, ImageWidth/ImageLength/BitsPerSample/
  * SamplesPerPixel and the GeoTIFF ModelPixelScale tag.
  *
  * The reference reads these via rioxarray (`src/form_calcs.py:261-287`);
  * the engine needs only header fields — never pixel data — so a ~60-line
  * pure parser over the first bytes of the blob replaces a raster library.
  * Runs as a scalar function over `binaryFile` content; at scale the
  * binaryFile source already reads lazily, and only the header bytes of
  * each tile are touched.
  */
object TiffMeta {

  /** `epsg` is the projected CRS from the GeoKeyDirectory
    * (ProjectedCSTypeGeoKey 3072), or the geographic CRS (2048) when no
    * projected key is present; 0 when the blob carries no geokeys. The
    * reference reads the same value via rioxarray's `crs.to_epsg()`
    * (`src/form_calcs.py:279-287`) — a tile in a different UTM zone must
    * surface its own code, not an assumed constant. */
  case class Meta(width: Int, height: Int, bitsPerSample: Int,
                  samplesPerPixel: Int, pixelScaleX: Double, pixelScaleY: Double,
                  epsg: Int, valid: Boolean)

  private val Invalid = Meta(0, 0, 0, 0, 0.0, 0.0, 0, valid = false)

  def parse(bytes: Array[Byte]): Meta = {
    if (bytes == null || bytes.length < 8) return Invalid
    val order = (bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => return Invalid
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    if (buf.getShort(2) != 42) return Invalid
    val ifdOffset = buf.getInt(4)
    if (ifdOffset < 8 || ifdOffset + 2 > bytes.length) return Invalid
    val nEntries = buf.getShort(ifdOffset) & 0xffff
    var width = 0; var height = 0; var bits = 1; var samples = 1
    var scaleX = 0.0; var scaleY = 0.0; var epsg = 0
    var i = 0
    while (i < nEntries) {
      val e = ifdOffset + 2 + i * 12
      if (e + 12 > bytes.length) return Invalid
      val tag = buf.getShort(e) & 0xffff
      val typ = buf.getShort(e + 2) & 0xffff
      val count = buf.getInt(e + 4)
      // SHORT(3)/LONG(4) values are inline ONLY when they fit in the 4-byte
      // value field (count*size <= 4); otherwise the field is an offset to
      // the value array — real RGB TIFFs store BitsPerSample as 3 shorts
      // behind an offset, so reading the field directly would return a
      // pointer fragment. We take the FIRST element (uniform per band).
      def intValue: Int = typ match {
        case 3 if count <= 2 => buf.getShort(e + 8) & 0xffff
        case 3 =>
          val off = buf.getInt(e + 8)
          if (off >= 0 && off + 2 <= bytes.length) buf.getShort(off) & 0xffff else 0
        case 4 if count == 1 => buf.getInt(e + 8)
        case 4 =>
          val off = buf.getInt(e + 8)
          if (off >= 0 && off + 4 <= bytes.length) buf.getInt(off) else 0
        case _ => 0
      }
      tag match {
        case 256 => width = intValue
        case 257 => height = intValue
        case 258 => bits = intValue
        case 277 => samples = intValue
        case 33550 => // ModelPixelScale: DOUBLE(12) x3 at offset
          val off = buf.getInt(e + 8)
          if (typ == 12 && off >= 0 && off + 16 <= bytes.length) {
            scaleX = buf.getDouble(off)
            scaleY = buf.getDouble(off + 8)
          }
        case 34735 => // GeoKeyDirectory: SHORT(3) x(4*(numKeys+1)) at offset
          // layout: {version, keyRevision, minorRevision, numKeys} then one
          // {keyId, tagLocation, count, valueOffset} quad per key; a key
          // whose tagLocation is 0 stores its value inline in valueOffset.
          // ProjectedCSTypeGeoKey (3072) IS the EPSG code; fall back to
          // GeographicTypeGeoKey (2048) for unprojected rasters.
          val off = if (typ == 3 && count >= 4) buf.getInt(e + 8) else -1
          if (off >= 0 && off + count * 2 <= bytes.length) {
            val numKeys = buf.getShort(off + 6) & 0xffff
            var geographic = 0
            var k = 0
            while (k < numKeys && (k + 2) * 8 <= count * 2) {
              val ke = off + 8 + k * 8
              val keyId = buf.getShort(ke) & 0xffff
              val tagLoc = buf.getShort(ke + 2) & 0xffff
              val value = buf.getShort(ke + 6) & 0xffff
              if (tagLoc == 0) {
                if (keyId == 3072) epsg = value
                else if (keyId == 2048) geographic = value
              }
              k += 1
            }
            if (epsg == 0) epsg = geographic
          }
        case _ =>
      }
      i += 1
    }
    if (width > 0 && height > 0)
      Meta(width, height, bits, samples, scaleX, scaleY, epsg, valid = true)
    else Invalid
  }

  /** Column form over binary content. */
  val parseTiff: Column => Column = {
    val f = udf((b: Array[Byte]) => parse(b))
    b => f(b)
  }

  // ------------------------------------------------------------------ writer (fixtures/tests)
  /** Builds a minimal valid little-endian GeoTIFF header carrying the given
    * metadata (no pixel strips — metadata-only fixture). `epsg` lands in a
    * ProjectedCSTypeGeoKey (3072) inside a GeoKeyDirectory; pass 0 to omit
    * the directory entirely (a plain, non-geo TIFF). */
  def minimalTiff(width: Int, height: Int, bitsPerSample: Int = 8,
                  samplesPerPixel: Int = 3,
                  pixelScaleX: Double = 0.6, pixelScaleY: Double = 0.6,
                  epsg: Int = 32616): Array[Byte] = {
    val nEntries = if (epsg > 0) 6 else 5
    val ifdOffset = 8
    val scaleOffset = ifdOffset + 2 + nEntries * 12 + 4
    val geoKeyOffset = scaleOffset + 24
    val buf = ByteBuffer.allocate(geoKeyOffset + (if (epsg > 0) 16 else 0))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit =
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    entry(256, 4, 1, width)
    entry(257, 4, 1, height)
    entry(258, 3, 1, bitsPerSample)
    entry(277, 3, 1, samplesPerPixel)
    entry(33550, 12, 3, scaleOffset)
    if (epsg > 0) entry(34735, 3, 8, geoKeyOffset)
    buf.putInt(0)                       // next-IFD pointer: none
    buf.putDouble(pixelScaleX).putDouble(pixelScaleY).putDouble(0.0)
    if (epsg > 0) {
      // directory header {1,1,0,1} + one key {3072, inline, 1, epsg}
      buf.putShort(1).putShort(1).putShort(0).putShort(1)
      buf.putShort(3072.toShort).putShort(0).putShort(1).putShort(epsg.toShort)
    }
    buf.array()
  }
}
