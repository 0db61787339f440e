package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9 — the memoized download utility (`src/az_proc.py:194-221`): the
  * reference walks a URL catalog and fetches each tile unless the file is
  * already on disk. Here the same contract is distributed:
  *
  *  - the "already downloaded" set is read back from the store directory
  *    itself (a binaryFile listing — the store IS the memo, no side state);
  *  - the pending set is a left-anti join of the catalog against it
  *    (SURVEY.md §2.9 memoization pattern, same shape as J6);
  *  - the fetch runs `foreachPartition` on the executors, with a
  *    skip-if-exists re-check and a temp-file + atomic-move write so a
  *    re-run (or a second executor racing on the same name) never
  *    half-writes or double-counts.
  *
  * The byte source is a caller-supplied function standing in for the HTTP
  * GET — this sandbox has no network, so the gate exercises the plumbing
  * (anti-join, partition-wise side-channel IO, idempotence) with a
  * deterministic payload, exactly as SURVEY.md's fixture strategy frames
  * remote sources.
  */
object Fetcher {

  /** Deterministic stand-in for the HTTP GET: payload derived from the
    * URL, so size/content are oracle-checkable. The sandboxed gate uses
    * this; [[httpGet]] is the real transport. */
  def simulatedGet(url: String): Array[Byte] =
    s"payload:$url".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Real HTTP(S) GET over `HttpURLConnection` — plain JDK, runs on the
    * executor that owns the partition (the same per-worker fan-out the
    * reference's download loop gets from its process pool). Non-2xx or a
    * short read raise, so a failed fetch surfaces as a task error (and the
    * temp-file + atomic-move protocol in [[fetchMissing]] guarantees no
    * half-written store file). FetcherSpec exercises this against a
    * localhost `com.sun.net.httpserver` fixture; the driver gate keeps
    * [[simulatedGet]] because the sandbox has no egress. */
  def httpGet(url: String, connectTimeoutMs: Int = 10000,
              readTimeoutMs: Int = 30000): Array[Byte] = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      require(code >= 200 && code < 300, s"GET $url returned HTTP $code")
      val in = conn.getInputStream
      try in.readAllBytes()
      finally in.close()
    } finally conn.disconnect()
  }

  /** Catalog rows whose `nameCol` is not yet present in `storeDir`. */
  def pending(spark: SparkSession, catalog: DataFrame,
              nameCol: String, storeDir: String): DataFrame = {
    Files.createDirectories(Paths.get(storeDir))
    val existing = Sinks.scanBinaryDir(spark, storeDir, "*")
      .select(element_at(split(col("path"), "/"), -1).as(nameCol))
    catalog.join(existing, Seq(nameCol), "left_anti")
  }

  /** One fetch round: download every pending (name, url) row into
    * `storeDir`. Returns the number of files that were missing when the
    * round started (0 on an idempotent re-run).
    *
    * The count is measured BEFORE the side-effecting pass, not with an
    * executor accumulator — accumulator updates from a task that wrote
    * some files and then died are discarded while its files persist, so an
    * accumulator would undercount on retry (and double-count a
    * speculative duplicate). The pre-count is deterministic and matches
    * the store-state delta whenever catalog names are unique. */
  def fetchMissing(spark: SparkSession, catalog: DataFrame,
                   nameCol: String, urlCol: String, storeDir: String,
                   get: String => Array[Byte] = simulatedGet): Long = {
    val toFetch = pending(spark, catalog, nameCol, storeDir)
      .select(col(nameCol), col(urlCol))
      .localCheckpoint()      // one store listing: count + fetch see the same set
    val n = toFetch.count()
    toFetch.foreachPartition { (rows: java.util.Iterator[org.apache.spark.sql.Row]) =>
      Files.createDirectories(Paths.get(storeDir))
      rows.forEachRemaining { r =>
        val target = Paths.get(storeDir, r.getString(0))
        // skip-if-exists re-check (az_proc.py:205): the anti-join ran at
        // plan time; another round may have landed the file since
        if (!Files.exists(target)) {
          val tmp = Files.createTempFile(target.getParent, ".part_", "")
          Files.write(tmp, get(r.getString(1)))
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    toFetch.unpersist()
    n
  }
}
