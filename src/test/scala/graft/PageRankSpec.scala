package graft

import graft.operators.PageRank

/** [[graft.operators.PageRank]]: the gate (`gr1_pagerank`) pins engine
  * parity on the corpus graph; this spec pins the arithmetic itself on
  * hand-computed graphs plus the mass-conservation property that makes
  * the integer scheme trustworthy at any parallelism.
  */
class PageRankSpec extends SparkSpec {

  private val B = 1000000000000L

  private def ranksOf(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), iters, B)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("2-cycle is a fixed point: every rank stays exactly 1.0") {
    val r = ranksOf(Seq("a" -> "b", "b" -> "a"), iters = 3)
    assert(r == Map("a" -> B, "b" -> B))
  }

  test("star graph after one iteration matches the hand computation") {
    // center c with leaves l1, l2 (symmetric edges). deg(c)=2, deg(l)=1.
    // r1(c) = 0.15B + 0.85*(B + B)   = 1.85B
    // r1(l) = 0.15B + 0.85*(B div 2) = 0.575B
    val edges = Seq("c" -> "l1", "c" -> "l2", "l1" -> "c", "l2" -> "c")
    val r = ranksOf(edges, iters = 1)
    assert(r("c") == 1850000000000L, s"center: ${r("c")}")
    assert(r("l1") == 575000000000L && r("l2") == 575000000000L, s"leaves: $r")
  }

  test("total mass is conserved up to integer-division floor loss, never created") {
    // asymmetric-degree graph: floor losses strictly shrink the total,
    // but it can never exceed nodes * B (rank is only redistributed)
    val edges = Seq("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a", "b" -> "c", "c" -> "b",
      "d" -> "a", "a" -> "d")
    val r = ranksOf(edges, iters = 3)
    val total = r.values.sum
    val n = r.size
    assert(n == 4)
    assert(total <= n * B, s"mass created: $total > ${n * B}")
    // floor losses are < 1 unit per (edge, iteration) pre-damping and the
    // damping div loses < 1 more per (node, iteration): a crude but safe bound
    val maxLoss = (edges.size + n + 2) * 3L
    assert(total >= n * B - maxLoss * 100, s"unexpectedly large loss: ${n * B - total}")
    // every node keeps at least the teleport floor
    r.values.foreach(v => assert(v >= B * 15 / 100, s"below teleport floor: $r"))
  }

  test("ranks order by degree on a hub-and-chain graph") {
    // hub h touches 3 nodes; chain tail t touches 1 — hub must outrank tail
    val edges = Seq(
      "h" -> "x", "x" -> "h", "h" -> "y", "y" -> "h", "h" -> "z", "z" -> "h",
      "z" -> "t", "t" -> "z")
    val r = ranksOf(edges, iters = 3)
    assert(r("h") > r("t"), s"hub should outrank chain tail: $r")
    assert(r("h") > r("x"), s"hub should outrank its own leaves: $r")
  }
}
