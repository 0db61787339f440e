package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded partition-wise.
  *
  * The actual codec libraries are not available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake; everything
  * around it — the schema, the typed `mapPartitions` batch shape, the
  * frame-sampling explode — is the real Spark-side pipeline a codec would
  * drop into. On a cluster the decode step is a narrow per-partition map
  * (no shuffle); frame sampling is a generator, so downstream operators
  * see one row per frame with full column pruning.
  */
object BinaryMedia {

  case class MediaRow(media_id: Long, payload: Array[Byte])

  case class MediaMeta(media_id: Long, byte_len: Long,
                       width: Int, height: Int, n_frames: Int, format: String)

  /** STUB — deterministic fake decoder (no codec libs in this container).
    * Derives plausible metadata purely from the payload bytes; replace the
    * body with a real header parse (JPEG SOF / WAV fmt / MP4 moov) when
    * codecs are available. The derivation below is part of the test
    * contract (the DuckDB oracle reproduces it from the same bytes). */
  def decodeStub(r: MediaRow): MediaMeta = {
    val len = r.payload.length.toLong
    val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
    MediaMeta(
      media_id = r.media_id,
      byte_len = len,
      width = 32 + (b0 % 64) * 8,
      height = 32 + ((len % 64).toInt) * 8,
      n_frames = (len % 5).toInt + 1,
      format = if (len % 2 == 0) "img/fake-even" else "img/fake-odd")
  }

  /** Partition-wise decode: one pass over the payload bytes per partition,
    * the Scala analog of a pandas-batched decode UDF. */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling: one output row per sampled frame index with a byte
    * offset — a metadata-level generator (`explode(sequence(...))`), the
    * same shape as the tile->chip grid explode. */
  def sampleFrames(meta: DataFrame, everyNth: Int = 1): DataFrame =
    meta.withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .withColumn("frame_offset", col("frame_idx").cast("long") * 1024L)

  /** Wrap a text corpus as fake media payloads (UTF-8 bytes) — the test
    * harness stand-in for `spark.read.format("binaryFile")`. */
  def fakePayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }
}
