package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

/** A decoded deletion vector: membership probe + expansion. Two shapes,
  * chosen PER SIDECAR at write time by encoded size:
  *   - sorted positions (sparse deletes): `O(log n)` probe;
  *   - range bitset (dense deletes — the roaring-style compressed form
  *     scoped to this format's needs): `O(1)` probe, one bit per row of
  *     the covered span.
  * Both expose [[positions]] for the merge paths (vector ∪ fresh
  * deletes), expanded on demand. */
private[graft] sealed trait DvVector {
  def contains(pos: Long): Boolean
  def count: Int
  def positions: Array[Long]
}

private final class DvSorted(ps: Array[Long]) extends DvVector {
  override def contains(pos: Long): Boolean =
    java.util.Arrays.binarySearch(ps, pos) >= 0
  override def count: Int = ps.length
  override def positions: Array[Long] = ps
}

private final class DvBitset(min: Long, words: Array[Long], n: Int)
    extends DvVector {
  override def contains(pos: Long): Boolean = {
    val off = pos - min
    off >= 0 && off < words.length.toLong * 64 &&
      (words((off >>> 6).toInt) & (1L << (off & 63))) != 0
  }
  override def count: Int = n
  override def positions: Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    var w = 0
    while (w < words.length) {
      var bits = words(w)
      while (bits != 0) {
        out(i) = min + w.toLong * 64 + java.lang.Long.numberOfTrailingZeros(bits)
        i += 1
        bits &= bits - 1
      }
      w += 1
    }
    out
  }
}

/** Deletion-vector sidecar codec + per-JVM decoded cache — shared by the
  * driver-side commit machinery ([[CommitLog]]) and the EXECUTOR-side
  * read-path predicate ([[graft.plans.DvFileSuppressed]]), so a reading
  * task loads only ITS file's vector and the driver never has to expand
  * and broadcast every suppressed position table-wide.
  *
  * Two on-disk layouts, self-describing by magic, picked per write by
  * whichever encodes smaller (a sparse delete stays raw positions; a
  * dense delete — the regime where position lists balloon — drops to
  * ~1 bit per spanned row):
  *
  *   GDV1 (sorted positions):
  *     int32 "GDV1" | int32 n | n × int64 sorted positions |
  *     int32 reserved trailer — exactly 12 + 8n bytes.
  *   GDV2 (range bitset):
  *     int32 "GDV2" | int32 n | int64 minPos | int32 wordCount |
  *     wordCount × int64 bitset words | int32 reserved trailer —
  *     exactly 24 + 8·wordCount bytes.
  *
  * Sidecar content is IMMUTABLE: every delete writes a NEW sidecar name
  * and the commit log swaps the reference, so cache entries never
  * invalidate — the same contract the per-file key-bloom sidecars rely
  * on. The cache is a bounded access-ordered LRU per JVM; in `local[*]`
  * driver and executors share one instance, on a cluster each executor
  * warms its own from the files its tasks actually read.
  */
private[graft] object DvSidecars {

  private val Magic1 = 0x47445631 // "GDV1" sorted positions
  private val Magic2 = 0x47445632 // "GDV2" range bitset

  /** Writes `positions` (sorted distinct) atomically under `name`,
    * choosing the smaller encoding. The sidecar lands BEFORE the commit
    * that references it (commit-log visibility — an orphan from a
    * crashed or lost-race delete is vacuumed). */
  def write(table: String, name: String, positions: Array[Long]): Unit = {
    val n = positions.length
    val bb =
      if (n == 0) {
        val b = java.nio.ByteBuffer.allocate(12)
        b.putInt(Magic1); b.putInt(0); b.putInt(0)
        b
      } else {
        val min = positions(0)
        val span = positions(n - 1) - min + 1
        val words = (span + 63) >>> 6
        if (24L + 8L * words < 12L + 8L * n) {
          val w = new Array[Long](words.toInt)
          positions.foreach { p =>
            val off = p - min
            w((off >>> 6).toInt) |= 1L << (off & 63)
          }
          val b = java.nio.ByteBuffer.allocate(24 + 8 * w.length)
          b.putInt(Magic2); b.putInt(n); b.putLong(min); b.putInt(w.length)
          w.foreach(b.putLong)
          b.putInt(0)
          b
        } else {
          val b = java.nio.ByteBuffer.allocate(12 + 8 * n)
          b.putInt(Magic1); b.putInt(n)
          positions.foreach(b.putLong)
          b.putInt(0)
          b
        }
      }
    val tmp = Paths.get(table, s".tmp-dv-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bb.array)
    Files.move(tmp, Paths.get(table, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Decodes one sidecar. Length is checked EXACTLY (long arithmetic — a
    * corrupt count cannot overflow the guard) so truncation or trailing
    * garbage fails loudly here, not as a buffer underflow downstream. */
  def decode(table: String, name: String): DvVector = {
    val bytes = Files.readAllBytes(Paths.get(table, name))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= 8,
      s"$table/$name is not a deletion-vector sidecar")
    bb.getInt match {
      case Magic1 =>
        val n = bb.getInt
        require(n >= 0 && bytes.length.toLong == 12L + n.toLong * 8L,
          s"$table/$name deletion-vector sidecar is corrupt " +
            s"($n positions, ${bytes.length} bytes)")
        new DvSorted(Array.fill(n)(bb.getLong))
      case Magic2 =>
        require(bytes.length >= 20,
          s"$table/$name deletion-vector sidecar is truncated")
        val n = bb.getInt
        val min = bb.getLong
        val w = bb.getInt
        require(n >= 0 && w >= 0 && bytes.length.toLong == 24L + w.toLong * 8L,
          s"$table/$name deletion-vector sidecar is corrupt " +
            s"($n positions, $w words, ${bytes.length} bytes)")
        new DvBitset(min, Array.fill(w)(bb.getLong), n)
      case _ => throw new IllegalArgumentException(
        s"$table/$name is not a deletion-vector sidecar")
    }
  }

  /** Expanded sorted positions of one sidecar (the merge paths' view). */
  def read(table: String, name: String): Array[Long] =
    decode(table, name).positions

  /** Bounded access-ordered LRU of decoded vectors, keyed by
    * `<table>/<sidecar>` (immutable content — entries never invalidate).
    * Bitset vectors stay compact in the cache. */
  private val cache =
    new java.util.LinkedHashMap[String, DvVector](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DvVector]): Boolean = size > 512
    }

  /** Cached decode. Thread-safe; a rare concurrent double-load of the
    * same immutable sidecar is benign. */
  def vector(table: String, sidecar: String): DvVector = {
    val key = s"$table/$sidecar"
    cache.synchronized(Option(cache.get(key))) match {
      case Some(v) => v
      case None =>
        val loaded = decode(table, sidecar)
        cache.synchronized { cache.put(key, loaded); () }
        loaded
    }
  }

  /** Expanded positions through the cache. */
  def positions(table: String, sidecar: String): Array[Long] =
    vector(table, sidecar).positions

  /** Membership probe against one sidecar's vector. */
  def suppressed(table: String, sidecar: String, pos: Long): Boolean =
    vector(table, sidecar).contains(pos)
}
