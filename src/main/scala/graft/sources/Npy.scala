package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sinks

/** S2 on-ramp — NumPy `.npy` reader/writer in pure JVM code (the
  * reference's work-queue state lives in `.npy` string arrays,
  * `src/az_proc.py:414-438`; a user switching engines needs a one-time
  * converter for that on-disk state).
  *
  * Format (NumPy NEP-1, v1.0): magic `\x93NUMPY`, version (1,0), uint16 LE
  * header length, then an ASCII python-literal dict
  * `{'descr': ..., 'fortran_order': False, 'shape': (n,), }` padded with
  * spaces to 64-byte alignment ending in `\n`, then the raw array body.
  * Supported descrs: `<U<w>` (UTF-32LE fixed-width strings — what
  * `np.save` of a python string list produces), `<i8`, `<f8`; 1-D shapes
  * (the reference's state arrays are 1-D name lists).
  *
  * Scale shape: files are scanned with binaryFile (distributed listing)
  * and parsed per-file on executors — each `.npy` is one work-queue
  * snapshot, small by construction; the parallelism is across files.
  */
object Npy {

  sealed trait Arr
  final case class StrArr(values: Seq[String]) extends Arr
  final case class LongArr(values: Seq[Long]) extends Arr
  final case class DoubleArr(values: Seq[Double]) extends Arr

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  // ------------------------------------------------------------------ parse
  /** Parses a v1.0 `.npy` byte array. */
  def parse(bytes: Array[Byte]): Arr = {
    require(bytes.length > 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a .npy file (bad magic)")
    require(bytes(6) == 1, s"unsupported .npy major version ${bytes(6)}")
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    val header = new String(bytes, 10, headerLen, StandardCharsets.US_ASCII)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"no descr in header: $header"))
    require("'fortran_order':\\s*False".r.findFirstIn(header).isDefined,
      "fortran_order arrays not supported")
    val shape = "'shape':\\s*\\(([0-9, ]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(sys.error(s"no shape in header: $header"))
    require(shape.size == 1, s"only 1-D arrays supported, got shape $shape")
    val n = shape.head
    val body = ByteBuffer.wrap(bytes, 10 + headerLen, bytes.length - 10 - headerLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    descr match {
      case s if s.startsWith("<U") || s.startsWith("=U") =>
        val w = s.drop(2).toInt
        StrArr((0 until n).map { _ =>
          val cps = (0 until w).map(_ => body.getInt())
          new String(cps.takeWhile(_ != 0).flatMap(Character.toChars(_)).toArray)
        })
      case "<i8" | "=i8" => LongArr((0 until n).map(_ => body.getLong()))
      case "<f8" | "=f8" => DoubleArr((0 until n).map(_ => body.getDouble()))
      case other => sys.error(s"unsupported descr '$other' (need <U*, <i8, <f8)")
    }
  }

  // ------------------------------------------------------------------ write
  /** Renders a v1.0 `.npy` byte array (round-trip partner for [[parse]];
    * also lets tests build fixtures without numpy). */
  def render(arr: Arr): Array[Byte] = {
    val (descr, n, body) = arr match {
      case StrArr(vs) =>
        val width = math.max(1, vs.map(v => v.codePointCount(0, v.length)).foldLeft(0)(math.max))
        val bb = ByteBuffer.allocate(vs.size * width * 4).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach { v =>
          val cps = v.codePoints().toArray
          cps.foreach(bb.putInt)
          (cps.length until width).foreach(_ => bb.putInt(0))
        }
        (s"<U$width", vs.size, bb.array())
      case LongArr(vs) =>
        val bb = ByteBuffer.allocate(vs.size * 8).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putLong)
        ("<i8", vs.size, bb.array())
      case DoubleArr(vs) =>
        val bb = ByteBuffer.allocate(vs.size * 8).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putDouble)
        ("<f8", vs.size, bb.array())
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': ($n,), }"
    val unpadded = Magic.length + 2 + 2 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(header.length.toShort)
      .put(header.getBytes(StandardCharsets.US_ASCII))
      .put(body)
    out.array()
  }

  // ------------------------------------------------------------------ Spark surface
  /** Scans a directory of `.npy` files into (file_name, idx, value_str,
    * value_num) rows — the one-time state converter. String arrays fill
    * value_str; numeric arrays fill value_num (and value_str with the
    * rendered number for uniform downstream handling). */
  def scanNpyDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parsed = Sinks.scanBinaryDir(spark, dir, "*.npy")
      .select(element_at(split(col("path"), "/"), -1).as("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        parse(bytes) match {
          case StrArr(vs)    => vs.zipWithIndex.map { case (v, i) => (name, i, v, None: Option[Double]) }
          case LongArr(vs)   => vs.zipWithIndex.map { case (v, i) => (name, i, v.toString, Some(v.toDouble)) }
          case DoubleArr(vs) => vs.zipWithIndex.map { case (v, i) => (name, i, v.toString, Some(v)) }
        }
      }
    parsed.toDF("file_name", "idx", "value_str", "value_num")
  }
}
