package graft

import org.apache.spark.sql.functions._

import graft.plans.CountMinSketch

/** Count–Min sketch ([[graft.plans.CmsSketch]] / [[graft.plans.CmsEstimate]]):
  * the exactness window is gated against DuckDB (`a20_cms_freq`); this spec
  * pins what no SQL twin can — the CMS guarantees under width pressure,
  * across real partial/merge execution on multiple partitions:
  *
  *  - est(x) >= true(x) always (counters only ever add — never undercounts),
  *  - merge is lossless (CMS is a linear sketch): the same input split
  *    across many partitions yields the bit-identical grid,
  *  - ample width vs domain => exact estimates,
  *  - narrow width => overcounts appear but the floor holds.
  */
class CountMinSketchSpec extends SparkSpec {

  private def estimates(items: Seq[String], depth: Int, width: Int,
                        partitions: Int): Map[String, Long] = {
    import spark.implicits._
    CountMinSketch.register(spark)
    val df = spark.createDataset(items).repartition(partitions).toDF("item")
    val sk = df.agg(expr(s"cms_sketch(item, $depth, $width)").as("sk"))
    df.distinct()
      .crossJoin(broadcast(sk))
      .select(col("item"), expr(s"cms_estimate(sk, item, $depth, $width)").as("est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def trueCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.length.toLong).toMap

  // zipf-ish skew over nKeys keys
  private def skewed(nKeys: Int, c: Int): Seq[String] =
    (for { i <- 1 to nKeys; _ <- 1 to math.max(1, c / i) } yield s"key$i").toSeq

  test("ample width: estimates are exact across multi-partition merge") {
    val items = skewed(50, 400)
    val truth = trueCounts(items)
    val est = estimates(items, depth = 4, width = 1024, partitions = 7)
    assert(est == truth, "4x1024 grid over 50 keys should isolate every key in some row")
  }

  test("never undercounts under heavy width pressure") {
    val items = skewed(200, 500)
    val truth = trueCounts(items)
    val est = estimates(items, depth = 3, width = 16, partitions = 5)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k: est ${est(k)} undercuts true $t — CMS must never undercount")
    }
    // 200 keys into 3x16 cells MUST collide somewhere: the pressure is real
    assert(truth.exists { case (k, t) => est(k) > t },
      "width pressure should produce at least one overcount (else the test is vacuous)")
  }

  test("merge is lossless: partition layout does not change the grid") {
    import spark.implicits._
    CountMinSketch.register(spark)
    val items = skewed(80, 300)
    def grid(partitions: Int): Seq[Long] = {
      spark.createDataset(items).repartition(partitions).toDF("item")
        .agg(expr("cms_sketch(item, 4, 256)").as("sk"))
        .collect()(0).getSeq[Long](0)
    }
    assert(grid(1) == grid(13), "linear-sketch merge: 1-partition and 13-partition grids must be identical")
  }

  test("nulls are ignored, not counted") {
    import spark.implicits._
    CountMinSketch.register(spark)
    val df = spark.createDataset(Seq(Some("a"), None, Some("a"), None, Some("b")))
      .toDF("item")
    val total = df.agg(expr("cms_sketch(item, 2, 64)").as("sk"))
      .select(expr("cms_estimate(sk, 'a', 2, 64)").as("a"),
        expr("cms_estimate(sk, 'b', 2, 64)").as("b"))
      .collect()(0)
    assert(total.getLong(0) == 2L && total.getLong(1) == 1L)
  }

  test("estimate of a never-seen item is bounded by collision mass (and 0 at ample width)") {
    val items = skewed(30, 200)
    import spark.implicits._
    CountMinSketch.register(spark)
    val sk = spark.createDataset(items).toDF("item")
      .agg(expr("cms_sketch(item, 4, 2048)").as("sk"))
    val ghost = sk.select(expr("cms_estimate(sk, 'never-seen-item', 4, 2048)").as("est"))
      .collect()(0).getLong(0)
    assert(ghost == 0L, s"ample width: absent item should estimate 0, got $ghost")
  }
}
