package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorSearch

/** Round-4 VERDICT "What's wrong" #2: SemDeDup's within-cell pair join is
  * quadratic on one shuffle key when near-duplicates flood a single cell —
  * which is exactly the workload SemDeDup exists for. The pathological
  * fixture is the worst case: every vector identical, so nearest-centroid
  * assignment puts the whole corpus in ONE cell. Companion to
  * [[LshSkewSpec]] (the text path's identical guard). */
class SemDedupSkewSpec extends SparkSpec {

  /** `flood` vectors in one cell + `pairs` legitimate 2-vector cells. */
  private def cells(flood: Int, pairs: Int) = {
    import spark.implicits._
    val flooded = (0 until flood).map(i => (i.toLong, "cell_flood"))
    val small = (0 until pairs * 2).map(i => (1000L + i, s"cell_${i / 2}"))
    (flooded ++ small).toDF("vec_id", "cell_id")
      .withColumn("embedding", array(lit(1.0f), lit(0.0f)))
  }

  test("flooded cell is refused by the cap; small cells still pair") {
    val c = cells(flood = 200, pairs = 3)
    val out = VectorSearch.cellPairs(c, "vec_id", "embedding", "cell_id", maxCell = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 200-vector cell would be 19 900 pairs on one key — refused;
    // the three legitimate 2-vector cells each yield their single pair
    assert(out == Set((1000L, 1001L), (1002L, 1003L), (1004L, 1005L)))
    val dropped = VectorSearch.droppedCells(c, "cell_id", maxCell = 100).collect()
    assert(dropped.length == 1)
    assert(dropped.head.getAs[String]("cell_id") == "cell_flood")
    assert(dropped.head.getAs[Long]("cell_n") == 200L)
  }

  test("uncapped run on the same fixture is quadratic — the cap is load-bearing") {
    val n = VectorSearch.cellPairs(cells(flood = 200, pairs = 0),
      "vec_id", "embedding", "cell_id", maxCell = Int.MaxValue).count()
    assert(n == 200L * 199 / 2)
  }

  test("cap does not change results on a skew-free corpus") {
    val c = cells(flood = 0, pairs = 40)
    val capped = VectorSearch.cellPairs(c, "vec_id", "embedding", "cell_id", maxCell = 100)
      .select("id_a", "id_b")
    val uncapped = VectorSearch.cellPairs(c, "vec_id", "embedding", "cell_id",
      maxCell = Int.MaxValue).select("id_a", "id_b")
    assert(capped.exceptAll(uncapped).count() == 0)
    assert(uncapped.exceptAll(capped).count() == 0)
    assert(VectorSearch.droppedCells(c, "cell_id", maxCell = 100).count() == 0)
  }
}
