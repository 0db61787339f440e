package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deletion-vector sidecar codec + per-JVM decoded cache — shared by the
  * driver-side commit machinery ([[CommitLog]]) and the EXECUTOR-side
  * read-path predicate ([[graft.plans.DvFileSuppressed]]), so a reading
  * task loads only ITS file's vector and the driver never has to expand
  * and broadcast every suppressed position table-wide.
  *
  * Layout of `<table>/<file>.dv-<uuid>`:
  *   int32 magic "GDV1" | int32 position count n |
  *   n × int64 sorted distinct suppressed row positions |
  *   int32 reserved TRAILER (zero) — total length exactly 12 + 8n bytes.
  *
  * Sidecar content is IMMUTABLE: every delete writes a NEW sidecar name
  * and the commit log swaps the reference, so cache entries never
  * invalidate — the same contract the per-file key-bloom sidecars rely
  * on. The cache is a bounded access-ordered LRU per JVM; in `local[*]`
  * driver and executors share one instance, on a cluster each executor
  * warms its own from the files its tasks actually read.
  */
private[graft] object DvSidecars {

  private val Magic = 0x47445631 // "GDV1"

  /** Writes `positions` (sorted distinct) atomically under `name`. The
    * sidecar lands BEFORE the commit that references it (commit-log
    * visibility — an orphan from a crashed or lost-race delete is
    * vacuumed). */
  def write(table: String, name: String, positions: Array[Long]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(12 + positions.length * 8)
    bb.putInt(Magic); bb.putInt(positions.length)
    positions.foreach(bb.putLong)
    bb.putInt(0) // reserved trailer: keeps total length self-checking
    val tmp = Paths.get(table, s".tmp-dv-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bb.array)
    Files.move(tmp, Paths.get(table, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Decodes one sidecar. Length is checked EXACTLY (long arithmetic — a
    * corrupt count cannot overflow `n * 8` past the guard) so truncation
    * or trailing garbage fails loudly here, not as a buffer underflow
    * somewhere downstream. */
  def read(table: String, name: String): Array[Long] = {
    val bytes = Files.readAllBytes(Paths.get(table, name))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= 8 && bb.getInt == Magic,
      s"$table/$name is not a deletion-vector sidecar")
    val n = bb.getInt
    require(n >= 0 && bytes.length.toLong == 12L + n.toLong * 8L,
      s"$table/$name deletion-vector sidecar is corrupt " +
        s"($n positions, ${bytes.length} bytes)")
    Array.fill(n)(bb.getLong)
  }

  /** Bounded access-ordered LRU of decoded vectors, keyed by
    * `<table>/<sidecar>` (immutable content — entries never invalidate). */
  private val cache =
    new java.util.LinkedHashMap[String, Array[Long]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[Long]]): Boolean = size > 512
    }

  /** Cached decode. Thread-safe; a rare concurrent double-load of the
    * same immutable sidecar is benign. */
  def positions(table: String, sidecar: String): Array[Long] = {
    val key = s"$table/$sidecar"
    cache.synchronized(Option(cache.get(key))) match {
      case Some(p) => p
      case None =>
        val loaded = read(table, sidecar)
        cache.synchronized { cache.put(key, loaded); () }
        loaded
    }
  }

  /** Membership probe against one sidecar's sorted positions. */
  def suppressed(table: String, sidecar: String, pos: Long): Boolean =
    java.util.Arrays.binarySearch(positions(table, sidecar), pos) >= 0
}
