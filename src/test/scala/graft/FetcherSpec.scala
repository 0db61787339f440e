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

  test("real HTTP transport: localhost server GET + memoized re-run never re-hits") {
    import spark.implicits._
    // in-process fixture server (plain JDK httpserver, no new dependency)
    // serving deterministic tile bytes; request counter proves the memo
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/tiles/", { exchange =>
      hits.incrementAndGet()
      val name = exchange.getRequestURI.getPath.stripPrefix("/tiles/")
      val body = s"tile-bytes:$name".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val cat = (0 until 8)
        .map(i => (s"t_$i.bin", s"http://127.0.0.1:$port/tiles/t_$i.bin"))
        .toDF("file_name", "url")
      val store = freshStore("http")
      val got = Fetcher.fetchMissing(spark, cat, "file_name", "url", store,
        get = u => Fetcher.httpGet(u))
      assert(got == 8 && hits.get() == 8)
      assert(new String(Files.readAllBytes(Paths.get(store, "t_3.bin")), "UTF-8")
        == "tile-bytes:t_3.bin")
      // idempotent re-run: anti-join empties the pending set BEFORE any
      // transport happens — zero additional requests, not 8 skipped ones
      assert(Fetcher.fetchMissing(spark, cat, "file_name", "url", store,
        get = u => Fetcher.httpGet(u)) == 0)
      assert(hits.get() == 8)
    } finally server.stop(0)
  }

  test("real HTTP transport: non-2xx fails the fetch and leaves no store file") {
    import spark.implicits._
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/tiles/", { exchange =>
      exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val cat = Seq(("missing.bin", s"http://127.0.0.1:$port/tiles/missing.bin"))
        .toDF("file_name", "url")
      val store = freshStore("http404")
      intercept[org.apache.spark.SparkException] {
        Fetcher.fetchMissing(spark, cat, "file_name", "url", store,
          get = u => Fetcher.httpGet(u))
      }
      // atomic-move protocol: the failed fetch left no target (a .part_
      // temp may remain from the aborted task; it is invisible to the memo)
      assert(!Files.exists(Paths.get(store, "missing.bin")))
      assert(Fetcher.pending(spark, cat, "file_name", store).count() == 1)
    } finally server.stop(0)
  }
}
