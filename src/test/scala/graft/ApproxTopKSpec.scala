package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.plans.ApproxTopK

/** Misra–Gries heavy hitters ([[graft.plans.ApproxTopK]]): the exactness
  * window is gated against DuckDB (`a19_heavy_hitters`); this spec pins
  * what no SQL twin can — the approximation guarantees under capacity
  * pressure, across real partial/merge execution on multiple partitions:
  *
  *  - est(x) <= true(x) (counts never overshoot),
  *  - true(x) - est(x) <= N / (capacity + 1) (the MG bound, preserved by
  *    the mergeable-summaries merge),
  *  - every true heavy hitter (freq > N / (capacity + 1)) is reported.
  */
class ApproxTopKSpec extends SparkSpec {

  private def runTopK(items: Seq[String], k: Int, capacity: Int,
                      partitions: Int): Seq[(String, Long)] = {
    import spark.implicits._
    ApproxTopK.register(spark)
    spark.createDataset(items).repartition(partitions).toDF("item")
      .agg(expr(s"approx_top_k(item, $k, $capacity)").as("top"))
      .select(explode(col("top")).as("s"))
      .select("s.item", "s.est")
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  // zipf-ish skew: key i gets ~C/i occurrences — few heavy keys, long tail
  private def skewed(nKeys: Int, c: Int): Seq[String] = {
    val items = for {
      i <- 1 to nKeys
      _ <- 1 to math.max(1, c / i)
    } yield s"k$i"
    // deterministic interleave so heavy keys are spread through the stream
    // (a sorted stream would make eviction trivially easy on the sketch)
    items.zipWithIndex.sortBy { case (s, ix) => (ix * 2654435761L) % items.size }.map(_._1)
  }

  test("capacity >= distinct is exact, and invariant to partitioning") {
    val data = skewed(nKeys = 300, c = 2000)
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    for (parts <- Seq(1, 4, 13))
      assert(runTopK(data, k = 10, capacity = 512, partitions = parts) == exact,
        s"partitions=$parts")
  }

  test("under capacity pressure: undercount only, within N/(m+1), no heavy hitter missed") {
    val data = skewed(nKeys = 2000, c = 3000)
    val n = data.size
    val capacity = 64
    val bound = n.toDouble / (capacity + 1)
    val trueCounts = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val got = runTopK(data, k = capacity, capacity = capacity, partitions = 7).toMap
    got.foreach { case (k, est) =>
      val t = trueCounts(k)
      assert(est <= t, s"$k overshoots: est=$est true=$t")
      assert(t - est <= bound, s"$k outside MG bound: est=$est true=$t bound=$bound")
    }
    val heavy = trueCounts.filter { case (_, t) => t > bound }
    assert(heavy.nonEmpty, "fixture must contain true heavy hitters")
    heavy.foreach { case (k, t) =>
      assert(got.contains(k), s"true heavy hitter $k (freq $t > $bound) missing")
    }
  }

  test("top-k order is (est desc, item asc) and truncation respects k") {
    val data = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(3)("c") ++ Seq("d")
    val got = runTopK(data, k = 3, capacity = 16, partitions = 2)
    assert(got == Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }

  test("nulls are ignored, not counted") {
    import spark.implicits._
    ApproxTopK.register(spark)
    val got = spark.createDataset(Seq(Some("x"), None, Some("x"), None))
      .toDF("item")
      .agg(expr("approx_top_k(item, 2, 8)").as("top"))
      .select(explode(col("top")).as("s")).select("s.item", "s.est")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("x", 2L)))
  }
}
