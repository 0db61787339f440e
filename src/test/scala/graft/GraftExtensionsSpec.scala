package graft

import org.apache.spark.sql.SparkSession

import graft.functions.SpatialOps
import graft.plans.SpatialJoinRewrite

/** End-to-end check of the DOCUMENTED external install path
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): a session built
  * WITH the extensions must expose the native SQL functions and apply the
  * spatial join rewrite, with no call into library internals. The
  * config-string half is Spark's own plumbing (`spark.sql.extensions` is
  * a STATIC conf read from the SparkContext, so it cannot be turned on
  * against this suite's already-running context); what belongs to this
  * library — the provider class and its injections — is exercised through
  * `builder.withExtensions`, plus the same zero-arg reflective
  * instantiation Spark's loader performs. */
class GraftExtensionsSpec extends SparkSpec {

  /** Builds a NEW SparkSession (same JVM SparkContext) with the extensions
    * applied, runs `body`, and restores the shared test session as
    * active/default so later suites are unaffected. */
  private def withExtensionsSession[A](body: SparkSession => A): A = {
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // instantiate exactly as Spark's config loader does: by class name,
      // zero-arg constructor, then apply
      val provider = Class.forName("graft.plans.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(provider)
        .getOrCreate()
      assert(s ne base, "builder must create a fresh session, not reuse the shared one")
      body(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("config-installed extensions register the native SQL functions") {
    withExtensionsSession { s =>
      val r = s.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
          |       simhash64('a b a').sim0 AS s0,
          |       fingerprint64('abc') AS fp,
          |       minhash_sig8('one two three four five').h0 AS mh0
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getString(3).nonEmpty)
    }
  }

  test("config-installed extensions register the sketch aggregates") {
    withExtensionsSession { s =>
      import s.implicits._
      Seq("a", "a", "a", "b", "b", "c").toDF("item").createOrReplaceTempView("sk_items")
      val top = s.sql(
        "SELECT approx_top_k(item, 2, 16) AS top FROM sk_items")
        .selectExpr("inline(top)").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(top == Seq(("a", 3L), ("b", 2L)), s"got $top")
      val est = s.sql(
        """WITH sk AS (SELECT cms_sketch(item, 4, 256) AS g FROM sk_items)
          |SELECT cms_estimate(g, 'a', 4, 256) AS ea,
          |       cms_estimate(g, 'zzz', 4, 256) AS ez FROM sk""".stripMargin).head()
      assert(est.getLong(0) == 3L && est.getLong(1) == 0L, s"got $est")
    }
  }

  test("config-installed extensions register the table_changes TVF") {
    withExtensionsSession { s =>
      import s.implicits._
      val t = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_ext_tvf").toString
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(t))) {
        java.nio.file.Files.walk(java.nio.file.Paths.get(t))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      graft.io.CommitLog.append(Seq((1L, "a")).toDF("id", "v"), t)          // v0
      graft.io.CommitLog.upsert(s, Seq((1L, "A")).toDF("id", "v"), t, Seq("id")) // v1
      val rows = s.sql(s"SELECT _change_type FROM table_changes('$t', 1, 1)")
        .collect().map(_.getString(0)).sorted
      assert(rows.toSeq == Seq("delete", "insert"),
        s"the injected TVF must serve the v1 window, got ${rows.toSeq}")
    }
  }

  test("config-installed extensions rewrite the naive spatial join") {
    withExtensionsSession { s =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val tanks = (1L to 50L).toDF("id")
        .withColumn("wkt_a", SpatialOps.bboxToWkt(
          (col("id") * 7 % 100).cast("double"), lit(0.0),
          (col("id") * 7 % 100 + 10).cast("double"), lit(10.0)))
      val zones = (0L to 9L).toDF("zone")
        .withColumn("wkt_b", SpatialOps.bboxToWkt(
          (col("zone") * 10).cast("double"), lit(0.0),
          (col("zone") * 10 + 10).cast("double"), lit(10.0)))
      val naive = tanks.join(zones,
        SpatialOps.intersectsOrContains(col("wkt_a"), col("wkt_b")))
      assert(SpatialJoinRewrite.rewritten(naive.queryExecution.optimizedPlan),
        s"extensions session must apply SpatialJoinRewrite:\n${naive.queryExecution.optimizedPlan}")
      assert(naive.count() > 0)
    }
  }
}
