package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * local[32] with shuffle.partitions=32 (not the 200 default — at this
  * data scale extra partitions are pure scheduling overhead; on a real
  * cluster this knob scales with executor count). AQE stays on so joins
  * re-plan to broadcast at runtime exactly as they would at scale.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: run each query once to warm codegen/JIT/IO
    // caches, then time the second execution. First-run numbers measure
    // compilation, not the operator (e.g. e1 is 5.9s cold, 2.2s warm).
    // SPARK_GRAFT_ONLY=q1_agg,e1_inventory limits the run (dev: repeated
    // timing of hot queries without the full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(names.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_ONLY lists no valid queries (unknown: ${unknown.mkString(", ")})")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()                  // no cross-run cache reuse
        dt
      } catch { case _: Throwable => -1.0 }
    // Warm the WHOLE suite before timing anything: JIT, codegen cache,
    // parquet footers, and any transient co-tenant load (the round-2 driver
    // run showed 2-5x inflation confined to the first queries in run order)
    // land on the untimed pass instead of whichever queries sort first.
    selected.foreach { case (n, f) => runOnce(n, f) }
    // Then two timed passes, per-query min: a transient contention spike
    // anywhere in either pass cannot poison that query's reported number.
    val pass1 = selected.map { case (n, f) => n -> runOnce(n, f) }
    val pass2 = selected.map { case (n, f) => n -> runOnce(n, f) }
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // min is a floor-biased statistic: publish BOTH passes' numbers so the
    // measurement envelope lives in the artifact, not just BASELINE.md prose
    val maxResults = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.max(a, b))
    }
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // a failed query is a -1 sentinel in the per-query map; it must NOT
    // shrink the summed total (a broken run would otherwise look faster) —
    // sum successes only and surface the failures explicitly
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver captures only a bounded tail of stdout: the round-2 full
    // per-query line (~3 KB for 104 queries) was truncated past parseability
    // (BENCH_r02.json parsed:null). Print a compact headline line that always
    // fits; the complete per-query map is persisted to BENCH_FULL.json.
    val headline = Seq(
      "e1_inventory", "e3_inventory_crosstab", "e3e_persisted_crosstabs",
      "a8_merge_clusters", "a8c_merge_unbounded", "d2_lsh_pairs",
      "d2c_lsh_capped", "d9_simhash_pairs", "q1_agg",
      "q3_join_topk", "j8_spatial_argmax", "v1_cosine_topk",
      "s7_voc_roundtrip", "s13_shapefile_sink", "g1_chip_pixels",
      "tracker_build", "tl1_commitlog_snapshot", "e4_text_pipeline",
      "t_token_count", "s3_session_window", "w2_limit_allocation")
    val headlineRs = results.filter { case (k, _) => headline.contains(k) }
    def line(rs: Seq[(String, Double)], withEnvelope: Boolean): String =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"failed":$failedJson,""" +
        s""""queries":${jsonMap(rs)},""" +
        (if (withEnvelope) s""""queries_max":${jsonMap(maxResults)},""" else "") +
        s""""sf":"$sfDir"}"""
    println(line(if (only.isEmpty) headlineRs else results, withEnvelope = false))
    // persist the full per-query artifact in-repo so every round's complete
    // numbers are recorded, not just what survives the driver's tail-grab.
    // A SPARK_GRAFT_ONLY-filtered dev run must NOT clobber the committed
    // full-run record — it only writes when given an explicit path.
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (only.isEmpty) Some("BENCH_FULL.json") else None)
    outPath.foreach { o =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(o), line(results, withEnvelope = true).getBytes("UTF-8"))
      catch { case _: Throwable => () } // bench output must never fail the run
    }
    spark.stop()
  }
}
