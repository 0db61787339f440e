package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.Fetcher

/** S9 contract (`src/az_proc.py:194-221`): fetch what's missing, skip
  * what's on disk, never re-download. */
class FetcherSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test_store", tag)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    p.toString
  }

  private def catalog(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"f_$i.bin", s"https://tiles.invalid/$i")).toDF("file_name", "url")
  }

  test("first run fetches all, second run fetches none") {
    val store = freshStore("idem")
    assert(Fetcher.fetchMissing(spark, catalog(10), "file_name", "url", store) == 10)
    assert(Fetcher.fetchMissing(spark, catalog(10), "file_name", "url", store) == 0)
    assert(Files.list(Paths.get(store)).count() == 10)
  }

  test("catalog growth fetches only the delta") {
    val store = freshStore("delta")
    assert(Fetcher.fetchMissing(spark, catalog(5), "file_name", "url", store) == 5)
    assert(Fetcher.fetchMissing(spark, catalog(12), "file_name", "url", store) == 7)
    assert(Fetcher.pending(spark, catalog(12), "file_name", store).count() == 0)
  }

  test("existing files are never re-downloaded even if the source changes") {
    val store = freshStore("nooverwrite")
    Fetcher.fetchMissing(spark, catalog(3), "file_name", "url", store)
    val target = Paths.get(store, "f_0.bin")
    val before = Files.readAllBytes(target)
    // a changed remote must NOT clobber the memoized local copy
    Fetcher.fetchMissing(spark, catalog(3), "file_name", "url", store,
      get = u => s"CHANGED:$u".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(Files.readAllBytes(target), before))
  }

  test("payload content is the simulated GET of the url") {
    val store = freshStore("payload")
    Fetcher.fetchMissing(spark, catalog(1), "file_name", "url", store)
    val bytes = Files.readAllBytes(Paths.get(store, "f_0.bin"))
    assert(new String(bytes, "UTF-8") == "payload:https://tiles.invalid/0")
  }
}
