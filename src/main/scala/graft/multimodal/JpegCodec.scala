package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Real JPEG encode/decode for the chip sink (S14) over `javax.imageio` —
  * no external dependency. The reference writes each 512x512 chip as a
  * `.jpg` (ref `src/az_proc.py:524`, `src/form_calcs.py:1110` via cv2);
  * the engine's chip slabs (gray8 or interleaved RGB8, see
  * [[graft.sources.TiffPixels.chips]]) encode executor-side and flow to
  * [[graft.io.Sinks.writeBinaryFiles]] as opaque payload bytes.
  *
  * JPEG is lossy: a decode of an encode returns pixels within a small
  * per-pixel error, not identical bytes — round-trip checks assert a
  * mean-absolute-error bound, never equality (the same contract a cv2 or
  * PIL round trip would carry).
  */
object JpegCodec {

  /** Gray8 slab (row-major, w*h bytes) -> JPEG bytes. */
  def encodeGray(px: Array[Byte], w: Int, h: Int, quality: Float = 0.92f): Array[Byte] = {
    require(px.length == w * h, s"gray slab ${px.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val buf = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    System.arraycopy(px, 0, buf, 0, px.length)
    encode(img, quality)
  }

  /** Interleaved RGB8 slab (row-major, w*h*3 bytes, R,G,B order) -> JPEG. */
  def encodeRgb(px: Array[Byte], w: Int, h: Int, quality: Float = 0.92f): Array[Byte] = {
    require(px.length == w * h * 3, s"rgb slab ${px.length} != $w x $h x 3")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val buf = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    // TYPE_3BYTE_BGR stores bytes B,G,R per pixel — swap while copying
    var i = 0
    while (i < px.length) {
      buf(i) = px(i + 2); buf(i + 1) = px(i + 1); buf(i + 2) = px(i)
      i += 3
    }
    encode(img, quality)
  }

  private def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** JPEG bytes -> (width, height, bands, row-major interleaved samples —
    * gray when bands == 1, R,G,B when bands == 3). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val bands = img.getRaster.getNumBands
    val out = new Array[Byte]((w * h * bands).toInt)
    val raster = img.getRaster
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) {
          out(i) = raster.getSample(x, y, b).toByte
          i += 1
          b += 1
        }
        x += 1
      }
      y += 1
    }
    (w, h, bands, out)
  }
}
